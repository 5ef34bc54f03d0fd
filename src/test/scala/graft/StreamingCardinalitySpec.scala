package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TypedAggregators
import graft.streaming.{CardinalityIngest, Stream}

/** The distinct-cardinality fold (graft.streaming.CardinalityIngest over
  * TypedAggregators.HllRegisters). The register state is a pure function
  * of the input SET — pinned here: partitioning-independence against an
  * independent recomputation of the registers, fold ≡ full recompute
  * BITWISE, the one-sided novelty guarantee, and the restart story
  * (persist/restore + replay fence). The register arithmetic itself is
  * oracle-checked in the registry (x_distinct_sketch). */
class StreamingCardinalitySpec extends SparkSpec {
  import spark.implicits._

  /** Independent register recomputation (relational form, same rule the
    * x_distinct_sketch oracle states in SQL). */
  private def truthRegisters(tokens: Seq[String], p: Int): Seq[Long] = {
    val m = 1 << p
    val maxBits = 60 - p
    val byReg = tokens.map { t =>
      val h = TypedAggregators.hash60(t)
      val w = h / m
      val rho = if (w == 0L) (maxBits + 1).toLong
        else (maxBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toLong
      (h % m, rho)
    }.groupBy(_._1).map { case (j, rs) => j -> rs.map(_._2).max }
    Seq.tabulate(m)(j => byReg.getOrElse(j.toLong, 0L))
  }

  test("HllRegisters: registers are partitioning-independent and match the stated rule") {
    val tokens = Seq.tabulate(3000)(i => s"tok${i % 700}")
    val want = truthRegisters(tokens.distinct, 6)
    // duplicates cannot move a max — the full multiset gives the same state.
    assert(truthRegisters(tokens, 6) == want)
    for (parts <- Seq(1, 3, 32)) {
      val got = tokens.toDF("t").repartition(parts)
        .select(col("t").as[String])
        .select(new TypedAggregators.HllRegisters(6).toColumn)
        .head()
      assert(got == want, s"parts=$parts")
    }
    // the monotone proxy: more distincts ⇒ strictly smaller scale sum
    // (on this fixture, where the extra tokens raise registers).
    val few = truthRegisters(Seq.tabulate(20)(i => s"tok$i"), 6)
    assert(TypedAggregators.hllScaleSum(want, 6) <
      TypedAggregators.hllScaleSum(few, 6))
  }

  test("foldBatch ≡ full recompute bitwise; novelty evidence is one-sided") {
    val corpus = (for { k <- Seq("en", "de"); i <- 0 until 400 }
      yield (k, s"$k-word${i % 150}")).toDF("lang", "t")
    var st = CardinalityIngest.buildState(corpus, "lang", "t", p = 6)
    assert(st.regs.keySet == Set("en", "de"))

    // batch 0: pure duplicates — max is idempotent, so NO key may report
    // novelty and the state must be unchanged.
    val dup = (for { i <- 0 until 50 } yield ("en", s"en-word${i % 150}"))
      .toDF("lang", "t")
    val (r0, st0) = CardinalityIngest.foldBatch(dup, st, "lang", "t", 0L)
    assert(r0.map(n => n.key -> n.novel) == Seq("en" -> false))
    assert(st0.regs == st.regs)
    st = st0

    // batch 1: fresh vocabulary for "en" plus a new key — novelty must be
    // flagged exactly where registers rose, and the folded state must be
    // BITWISE what a from-scratch build over everything seen produces.
    val fresh = (for { i <- 0 until 200 } yield ("en", s"novel$i")) ++
      (for { i <- 0 until 100 } yield ("fr", s"fr-word$i"))
    val (r1, st1) = CardinalityIngest.foldBatch(
      fresh.toDF("lang", "t"), st, "lang", "t", 1L)
    val byKey = r1.map(n => n.key -> n).toMap
    assert(byKey("en").novel && byKey("fr").novel)
    assert(!byKey.contains("de"), "keys absent from the batch report nothing")
    val rebuilt = CardinalityIngest.buildState(
      corpus.unionByName(dup).unionByName(fresh.toDF("lang", "t")),
      "lang", "t", p = 6)
    assert(st1.regs == rebuilt.regs, "fold must equal recompute bitwise")
    // the proxy moved monotonically for the novel keys.
    assert(byKey("en").postSum < byKey("en").preSum)
    assert(byKey("fr").preSum == st.scaleSum("fr"), "untracked key = all-zero baseline")
  }

  test("streamed gate ≡ foldBatch; restore + replay fence") {
    val corpus = (for { i <- 0 until 300 } yield ("en", s"w${i % 100}"))
      .toDF("lang", "t")
    val state = new java.util.concurrent.atomic.AtomicReference(
      CardinalityIngest.buildState(corpus, "lang", "t", p = 6))

    val schema = StructType(Seq(
      StructField("lang", StringType), StructField("t", StringType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[CardinalityIngest.KeyNovelty]]
    val q = CardinalityIngest.startGate(s, state, "value.lang", "value.t") {
      (report, _, _) => got += report
    }
    def send(rows: Seq[(String, String)], offBase: Long): Unit = {
      ms.addData(rows.zipWithIndex.map { case ((k, t), i) =>
        KMsg("t", 0, offBase + i, new Timestamp(1000L + i), null,
          s"""{"lang":"$k","t":"$t"}""".getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    var mirror = state.get()
    val b0 = Seq.tabulate(60)(i => ("en", s"x$i"))
    val b1 = Seq.tabulate(60)(i => ("de", s"y$i"))
    val (r0, m0) = CardinalityIngest.foldBatch(b0.toDF("lang", "t"), mirror, "lang", "t", 0L)
    val (r1, m1) = CardinalityIngest.foldBatch(b1.toDF("lang", "t"), m0, "lang", "t", 1L)
    mirror = m1
    send(b0, 0L); send(b1, 100L)
    q.stop()
    assert(got.toList == List(r0, r1))
    assert(state.get().regs == mirror.regs && state.get().foldedBatch == 1L)

    // restart from persisted rows; MemoryStream renumbers from 0 ≤ fence.
    val persisted = state.get()
    val restored = new java.util.concurrent.atomic.AtomicReference(
      CardinalityIngest.restoreState(persisted.stateRows, persisted.p,
        persisted.version, persisted.foldedBatch))
    assert(restored.get().regs == persisted.regs)
    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema)
    var calls = 0
    val q2 = CardinalityIngest.startGate(s2, restored, "value.lang", "value.t") {
      (_, _, _) => calls += 1
    }
    ms2.addData(b0.zipWithIndex.map { case ((k, t), i) =>
      KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null,
        s"""{"lang":"$k","t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    ms2.addData(b1.zipWithIndex.map { case ((k, t), i) =>
      KMsg("t", 0, 100L + i, new Timestamp(2000L + i), null,
        s"""{"lang":"$k","t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    assert(calls == 0 && restored.get().regs == persisted.regs,
      "replayed batches at/below the fence must not re-fold")
    ms2.addData(Seq.tabulate(10)(i =>
      KMsg("t", 0, 200L + i, new Timestamp(3000L + i), null,
        s"""{"lang":"fr","t":"z$i"}""".getBytes("UTF-8"))): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(calls == 1 && restored.get().foldedBatch == 2L)
    assert(restored.get().regs.contains("fr"))
  }
}
