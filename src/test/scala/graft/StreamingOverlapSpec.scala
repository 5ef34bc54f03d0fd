package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TypedAggregators
import graft.streaming.{OverlapIngest, Stream}

/** The cross-source overlap fold (graft.streaming.OverlapIngest over
  * TypedAggregators.KmvValues). Pins: the k-set is a pure
  * order/partitioning/idempotent function of the input SET; the
  * pair-merge theorem (the union's k smallest distinct hashes compute
  * from the two k-sets alone — what makes per-pair overlap answerable
  * from driver-small state); fold ≡ full recompute bitwise; the
  * endpoint overlap cases (identical ⇒ nShared = kUnion, disjoint ⇒ 0);
  * and the restart story (persist/restore + replay fence). The k-set
  * arithmetic is oracle-checked in the registry (x_sketch_kmv). */
class StreamingOverlapSpec extends SparkSpec {
  import spark.implicits._

  /** Independent truth: the k smallest distinct hash60s. */
  private def truthKset(tokens: Seq[String], k: Int): Seq[Long] =
    tokens.map(TypedAggregators.hash60).distinct.sorted.take(k)

  test("KmvValues: k-set is partitioning-independent, set-semantic, and matches the rule") {
    val tokens = Seq.tabulate(3000)(i => s"tok${i % 700}")
    val want = truthKset(tokens.distinct, 64)
    assert(want.size == 64)
    // duplicates occupy no slots — the full multiset gives the same state.
    assert(truthKset(tokens, 64) == want)
    for (parts <- Seq(1, 3, 32)) {
      val got = tokens.toDF("t").repartition(parts)
        .select(col("t").as[String])
        .select(new TypedAggregators.KmvValues(64).toColumn)
        .head()
      assert(got == want, s"parts=$parts")
    }
    // fewer distincts than k ⇒ the whole (sorted distinct) set.
    val small = Seq("a", "b", "a", "c")
    assert(truthKset(small, 64).size == 3)
    val gotSmall = small.toDF("t").select(col("t").as[String])
      .select(new TypedAggregators.KmvValues(64).toColumn).head()
    assert(gotSmall == truthKset(small, 64))
  }

  test("kmvMerge: the union's k-set computes exactly from the two k-sets") {
    val a = Seq.tabulate(500)(i => s"a$i") ++ Seq.tabulate(200)(i => s"shared$i")
    val b = Seq.tabulate(400)(i => s"b$i") ++ Seq.tabulate(200)(i => s"shared$i")
    val k = 64
    val merged = TypedAggregators.kmvMerge(truthKset(a, k), truthKset(b, k), k)
    assert(merged == truthKset(a ++ b, k),
      "merge of k-sets must equal the k-set of the union")
  }

  test("foldBatch ≡ full recompute bitwise; endpoint overlaps; touched-pair report") {
    val corpus = (for { s <- Seq("s0", "s1", "s2"); i <- 0 until 300 }
      yield (s, if (s == "s2") s"only-$i" else s"common-$i")).toDF("src", "t")
    var st = OverlapIngest.buildState(corpus, "src", "t", k = 32)
    assert(st.ksets.keySet == Set("s0", "s1", "s2"))
    // s0 and s1 saw identical token sets ⇒ full overlap; s2 is disjoint
    // (md5-derived hashes — no sub-kth collisions on this fixture).
    val full = st.overlapOf("s0", "s1")
    assert(full.nShared == full.kUnion && full.kUnion == 32L)
    assert(st.overlapOf("s0", "s2").nShared == 0L)
    assert(st.overlapMatrix.map(p => (p.keyA, p.keyB)) ==
      Seq(("s0", "s1"), ("s0", "s2"), ("s1", "s2")))

    // batch 0: pure duplicates — set semantics, state unchanged (the
    // idempotence HLL shares and CMS lacks).
    val dup = Seq.tabulate(50)(i => ("s0", s"common-$i")).toDF("src", "t")
    val (r0, st0) = OverlapIngest.foldBatch(dup, st, "src", "t", 0L)
    assert(st0.ksets == st.ksets)
    assert(r0.map(p => (p.keyA, p.keyB)) == Seq(("s0", "s1"), ("s0", "s2")),
      "only pairs with a batch-touched side report")
    st = st0

    // batch 1: s2 starts receiving s0's vocabulary + a new source appears;
    // the folded state must be BITWISE a from-scratch build.
    val fresh = (Seq.tabulate(300)(i => ("s2", s"common-$i")) ++
      Seq.tabulate(100)(i => ("s3", s"new-$i"))).toDF("src", "t")
    val (r1, st1) = OverlapIngest.foldBatch(fresh, st, "src", "t", 1L)
    val rebuilt = OverlapIngest.buildState(
      corpus.unionByName(dup).unionByName(fresh), "src", "t", k = 32)
    assert(st1.ksets == rebuilt.ksets, "fold must equal recompute bitwise")
    val byPair = r1.map(p => (p.keyA, p.keyB) -> p).toMap
    assert(byPair(("s0", "s2")).nShared > 0L,
      "s2 absorbing s0's vocabulary must surface as overlap")
    assert(!byPair.contains(("s0", "s1")), "untouched pair must not report")
  }

  test("streamed gate ≡ foldBatch; restore + replay fence") {
    val corpus = (for { i <- 0 until 200 } yield ("s0", s"w$i"))
      .toDF("src", "t")
    val state = new java.util.concurrent.atomic.AtomicReference(
      OverlapIngest.buildState(corpus, "src", "t", k = 32))

    val schema = StructType(Seq(
      StructField("src", StringType), StructField("t", StringType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[OverlapIngest.PairOverlap]]
    val q = OverlapIngest.startGate(s, state, "value.src", "value.t") {
      (report, _, _) => got += report
    }
    def send(rows: Seq[(String, String)], offBase: Long): Unit = {
      ms.addData(rows.zipWithIndex.map { case ((k, t), i) =>
        KMsg("t", 0, offBase + i, new Timestamp(1000L + i), null,
          s"""{"src":"$k","t":"$t"}""".getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    var mirror = state.get()
    val b0 = Seq.tabulate(60)(i => ("s1", s"w$i"))
    val b1 = Seq.tabulate(60)(i => ("s2", s"z$i"))
    val (r0, m0) = OverlapIngest.foldBatch(b0.toDF("src", "t"), mirror, "src", "t", 0L)
    val (r1, m1) = OverlapIngest.foldBatch(b1.toDF("src", "t"), m0, "src", "t", 1L)
    mirror = m1
    send(b0, 0L); send(b1, 100L)
    q.stop()
    assert(got.toList == List(r0, r1))
    assert(state.get().ksets == mirror.ksets && state.get().foldedBatch == 1L)

    // restart from persisted rows; MemoryStream renumbers from 0 ≤ fence.
    val persisted = state.get()
    val restored = new java.util.concurrent.atomic.AtomicReference(
      OverlapIngest.restoreState(persisted.stateRows, persisted.k,
        persisted.version, persisted.foldedBatch))
    assert(restored.get().ksets == persisted.ksets)
    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema)
    var calls = 0
    val q2 = OverlapIngest.startGate(s2, restored, "value.src", "value.t") {
      (_, _, _) => calls += 1
    }
    ms2.addData(b0.zipWithIndex.map { case ((k, t), i) =>
      KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null,
        s"""{"src":"$k","t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    ms2.addData(b1.zipWithIndex.map { case ((k, t), i) =>
      KMsg("t", 0, 100L + i, new Timestamp(2000L + i), null,
        s"""{"src":"$k","t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    assert(calls == 0 && restored.get().ksets == persisted.ksets,
      "replayed batches at/below the fence must not re-fold")
    ms2.addData(Seq.tabulate(10)(i =>
      KMsg("t", 0, 200L + i, new Timestamp(3000L + i), null,
        s"""{"src":"s9","t":"q$i"}""".getBytes("UTF-8"))): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(calls == 1 && restored.get().foldedBatch == 2L)
    assert(restored.get().ksets.contains("s9"))
  }
}
