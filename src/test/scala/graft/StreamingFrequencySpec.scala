package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TypedAggregators
import graft.streaming.{FrequencyIngest, Stream}

/** The frequency fold (graft.streaming.FrequencyIngest over
  * TypedAggregators.CmsCounts). The cell state is a pure function of the
  * input MULTISET — pinned here: partitioning-independence against an
  * independent recomputation, fold ≡ full recompute BITWISE, the
  * NON-idempotence of the fold (why the replay fence is load-bearing for
  * this gate, unlike HLL's max), the one-sided estimate guarantee, and
  * the restart story. The cell arithmetic itself is oracle-checked in the
  * registry (x_sketch_cms / x_heavy_hitters). */
class StreamingFrequencySpec extends SparkSpec {
  import spark.implicits._

  /** Independent cell recomputation (imperative form, same bit-slice rule
    * the x_sketch_cms oracle states in SQL). */
  private def truthCells(items: Seq[(String, Long)], depth: Int,
                         wb: Int): Seq[Long] = {
    val width = 1 << wb
    val arr = Array.fill(depth * width)(0L)
    items.foreach { case (t, w) =>
      val h = TypedAggregators.hash60(t)
      var j = 0
      while (j < depth) {
        arr(j * width + ((h >>> (j * wb)) & (width - 1)).toInt) += w
        j += 1
      }
    }
    arr.toSeq
  }

  test("CmsCounts: cells are partitioning-independent and match the stated rule") {
    val items = Seq.tabulate(3000)(i => (s"tok${i % 700}", (i % 5 + 1).toLong))
    val want = truthCells(items, 4, 8)
    for (parts <- Seq(1, 3, 32)) {
      val got = items.toDF("t", "w").repartition(parts)
        .select(col("t").as[String], col("w").as[Long])
        .select(new TypedAggregators.CmsCounts(4, 8).toColumn)
        .head()
      assert(got == want, s"parts=$parts")
    }
    // estimates are one-sided: est ≥ true for EVERY item in the domain.
    val exact = items.groupBy(_._1).map { case (t, ws) => t -> ws.map(_._2).sum }
    exact.foreach { case (t, n) =>
      assert(TypedAggregators.cmsEstimate(want, 4, 8, t) >= n, t)
    }
    // the empty relation folds to the all-zero same-shape vector.
    val empty = items.toDF("t", "w").filter(lit(false))
      .select(col("t").as[String], col("w").as[Long])
      .select(new TypedAggregators.CmsCounts(4, 8).toColumn)
      .head()
    assert(empty == Seq.fill(1024)(0L))
    // negative weights would break the one-sided guarantee — fail fast.
    val ex = intercept[org.apache.spark.SparkException] {
      Seq(("a", -1L)).toDF("t", "w")
        .select(col("t").as[String], col("w").as[Long])
        .select(new TypedAggregators.CmsCounts(4, 8).toColumn)
        .head()
    }
    assert(ex.getMessage.contains("negative CMS weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative CMS weight")))
  }

  test("the engine-side conv(md5) hash the registry queries use equals hash60") {
    val strs = Seq.tabulate(300)(i => s"probe-$i-${i * 31}")
    val got = strs.toDF("t")
      .select(expr("CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)").as[Long])
      .collect().toSeq
    assert(got == strs.map(TypedAggregators.hash60))
  }

  test("foldBatch ≡ full recompute bitwise; fold is NOT idempotent; evidence is one-sided") {
    val corpus = (for { i <- 0 until 2000 } yield s"w${i % 40}").toDF("t")
    var st = FrequencyIngest.buildState(corpus, "t", threshold = 50L)
    assert(st.cells == truthCells(
      (0 until 2000).map(i => (s"w${i % 40}", 1L)), 4, 8))

    val batch = ((0 until 200).map(i => s"w${i % 40}") ++
      (0 until 30).map(i => s"rare$i")).toDF("t")
    val (report, st1) = FrequencyIngest.foldBatch(batch, st, "t", 0L)
    // fold ≡ recompute over everything seen, bitwise.
    val rebuilt = FrequencyIngest.buildState(
      corpus.unionByName(batch), "t", threshold = 50L)
    assert(st1.cells == rebuilt.cells, "fold must equal recompute bitwise")
    // NOT idempotent: re-folding the same batch (fence bypassed) corrupts —
    // the replay fence is load-bearing for this gate.
    val (_, st2) = FrequencyIngest.foldBatch(batch, st1, "t", 1L)
    assert(st2.cells != rebuilt.cells, "double fold must double-count")

    // one-sided: every token reported provedLight truly IS below the
    // threshold; every truly-heavy batch token is reported candidate.
    val exact = ((0 until 2000).map(i => s"w${i % 40}") ++
      (0 until 200).map(i => s"w${i % 40}") ++
      (0 until 30).map(i => s"rare$i"))
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val byTok = report.map(e => e.token -> e).toMap
    assert(byTok.keySet == batch.select("t").distinct()
      .as[String].collect().toSet)
    report.foreach { e =>
      assert(e.est >= exact(e.token), s"${e.token}: est must over-estimate")
      if (e.provedLight)
        assert(exact(e.token) < 50L, s"${e.token} reported light but heavy")
      if (exact(e.token) >= 50L)
        assert(e.candidate, s"${e.token} heavy but not a candidate")
    }
    // the fixture exercises both branches.
    assert(report.exists(_.provedLight) && report.exists(_.candidate))
    // batch weights are the batch's own counts, not cumulative.
    assert(byTok("rare0").batchWeight == 1L && byTok("w0").batchWeight == 5L)
  }

  test("heavyHitters: the CMS prune shrinks the groupBy shuffle to ~candidates (measured)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // open-vocabulary fixture: 5 heavy tokens (20k occurrences each)
    // interleaved with ~20k tail tokens (~5 each) — the regime where the
    // exact groupBy would shuffle the whole distinct domain.
    val tf = spark.range(200000).selectExpr(
      "IF(id % 2 = 0, concat('h', id % 5), concat('t', id % 20001)) AS token",
      "CAST(1 AS BIGINT) AS tf")
    def measured(df: => org.apache.spark.sql.DataFrame): (Set[(String, Long)], Long) = {
      val rows = new java.util.concurrent.atomic.AtomicLong()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            rows.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val out = df.as[(String, Long)].collect().toSet
        Thread.sleep(1500) // let the async listener bus drain
        (out, rows.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (pruned, prunedRows) = measured(
      graft.operators.Ranking.heavyHitters(tf, threshold = 5000L,
        widthBits = 10))
    val (plain, plainRows) = measured(
      tf.groupBy(col("token")).agg(sum(col("tf")).as("n"))
        .filter(col("n") >= 5000L)
        .select(col("token"), col("n")))
    // the sketch never changes the answer...
    assert(pruned == plain)
    assert(pruned.map(_._1) == Set("h0", "h1", "h2", "h3", "h4"))
    // ...only what shuffles: the plain aggregate ships every partition's
    // distinct-token partials (~the tail domain); the pruned one ships
    // candidate partials + the 4096-cell sketch buffers.
    assert(plainRows > 50000, s"fixture lost its teeth: plain=$plainRows")
    assert(prunedRows * 10 < plainRows,
      s"prune did not shrink the shuffle: pruned=$prunedRows plain=$plainRows")
  }

  test("streamed gate ≡ foldBatch; restore + replay fence") {
    val corpus = (for { i <- 0 until 500 } yield s"w${i % 25}").toDF("t")
    val state = new java.util.concurrent.atomic.AtomicReference(
      FrequencyIngest.buildState(corpus, "t", threshold = 40L))

    val schema = StructType(Seq(StructField("t", StringType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[FrequencyIngest.TokenEvidence]]
    val q = FrequencyIngest.startGate(s, state, "value.t") {
      (report, _, _) => got += report
    }
    def send(rows: Seq[String], offBase: Long): Unit = {
      ms.addData(rows.zipWithIndex.map { case (t, i) =>
        KMsg("t", 0, offBase + i, new Timestamp(1000L + i), null,
          s"""{"t":"$t"}""".getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    val b0 = Seq.tabulate(60)(i => s"x${i % 10}")
    val b1 = Seq.tabulate(60)(i => s"w${i % 25}")
    val (r0, m0) = FrequencyIngest.foldBatch(b0.toDF("t"), state.get(), "t", 0L)
    val (r1, m1) = FrequencyIngest.foldBatch(b1.toDF("t"), m0, "t", 1L)
    send(b0, 0L); send(b1, 100L)
    q.stop()
    assert(got.toList == List(r0, r1))
    assert(state.get().cells == m1.cells && state.get().foldedBatch == 1L)

    // restart from the persisted cells; MemoryStream renumbers from 0 ≤ fence.
    val p = state.get()
    val restored = new java.util.concurrent.atomic.AtomicReference(
      FrequencyIngest.restoreState(p.cells, p.depth, p.widthBits,
        p.threshold, p.version, p.foldedBatch))
    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema)
    var calls = 0
    val q2 = FrequencyIngest.startGate(s2, restored, "value.t") {
      (_, _, _) => calls += 1
    }
    ms2.addData(b0.zipWithIndex.map { case (t, i) =>
      KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null,
        s"""{"t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    ms2.addData(b1.zipWithIndex.map { case (t, i) =>
      KMsg("t", 0, 100L + i, new Timestamp(2000L + i), null,
        s"""{"t":"$t"}""".getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    assert(calls == 0 && restored.get().cells == p.cells,
      "replayed batches at/below the fence must not re-fold (double-count)")
    ms2.addData(Seq.tabulate(10)(i =>
      KMsg("t", 0, 200L + i, new Timestamp(3000L + i), null,
        s"""{"t":"z$i"}""".getBytes("UTF-8"))): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(calls == 1 && restored.get().foldedBatch == 2L)
    assert(restored.get().estimate("z0") >= 1L)
  }
}
