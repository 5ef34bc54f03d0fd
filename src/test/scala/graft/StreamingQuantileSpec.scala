package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TypedAggregators
import graft.streaming.{QuantileIngest, Stream}

/** Round-11: the mergeable quantile state for folding gates
  * (graft.streaming.QuantileIngest over
  * TypedAggregators.BoundedHistogram). The stated bound is EXACTNESS:
  * merged per-batch histograms make the running threshold identical to a
  * batch recompute over everything seen — pinned here against a plain
  * sort, along with the aggregator's partitioning-independence, the
  * fail-fast bounded-domain contract, the gate-then-fold convention, and
  * the restart story (persist/restore + replay fence). */
class StreamingQuantileSpec extends SparkSpec {
  import spark.implicits._

  /** percentile_disc ground truth by brute sort. */
  private def discTruth(values: Seq[Long], p: Double): Long = {
    val s = values.sorted
    s((math.ceil(s.size * p).toLong - 1L).toInt)
  }

  test("BoundedHistogram: exact counts under any partitioning; cap fails fast") {
    val values = Seq.fill(5000)(scala.util.Random.nextInt(200).toLong)
    val truth = values.groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    for (parts <- Seq(1, 3, 32)) {
      val got = values.toDF("v").repartition(parts)
        .select(col("v").as[Long])
        .select(new TypedAggregators.BoundedHistogram(256).toColumn)
        .head()
      assert(got == truth, s"parts=$parts")
    }
    val e = intercept[Exception] {
      (0L until 1000L).toDF("v").select(col("v").as[Long])
        .select(new TypedAggregators.BoundedHistogram(100).toColumn)
        .head()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxBins"), e.getMessage)
  }

  test("QuantileIngest: per-batch threshold ≡ full recompute; gate uses the pre-batch threshold") {
    // integer "scores": corpus then three batches with shifting
    // distributions, so the threshold must actually MOVE.
    val rnd = new scala.util.Random(31)
    val corpus = Seq.fill(400)((rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    val batches = Seq.tabulate(3) { b =>
      Seq.tabulate(120)(i =>
        (10000L + b * 1000 + i, (rnd.nextInt(50) + 30 * (b + 1)).toLong))
    }

    var st = QuantileIngest.buildState(
      corpus.toDF("doc_id", "score"), "score", p = 0.5, maxBins = 4096)
    var seen = corpus.map(_._2)
    assert(st.threshold.contains(discTruth(seen, 0.5)))

    batches.zipWithIndex.foreach { case (batch, b) =>
      val preThreshold = st.threshold.get
      val (kept, next) = QuantileIngest.foldBatch(
        batch.toDF("doc_id", "score"), st, "score", batchId = b.toLong)
      // gate: the PRE-batch threshold selects (keepAtOrAbove default).
      val expectKept = batch.filter(_._2 >= preThreshold).map(_._1).toSet
      assert(kept.select("doc_id").as[Long].collect().toSet == expectKept)
      // fold: the WHOLE batch enters the population; the new threshold is
      // bit-equal to a recompute over everything seen so far.
      seen = seen ++ batch.map(_._2)
      assert(next.threshold.contains(discTruth(seen, 0.5)),
        s"batch $b: folded=${next.threshold} truth=${discTruth(seen, 0.5)}")
      assert(next.n == seen.size.toLong)
      st = next
    }
    // the shifting mixture moved the threshold — non-vacuous.
    assert(st.threshold.get > discTruth(corpus.map(_._2), 0.5))
  }

  test("streamed gate ≡ foldBatch; restart restores from histRows and fences replays") {
    val corpus = Seq.tabulate(300)(i => (i.toLong, (i % 40).toLong))
    val state = new java.util.concurrent.atomic.AtomicReference(
      QuantileIngest.buildState(corpus.toDF("doc_id", "score"), "score",
        p = 0.8, maxBins = 1024))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("score", LongType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val q = QuantileIngest.startGate(s, state, "value.score") {
      (kept, version, _) =>
        got += ((version, kept.select(col("value.doc_id")).as[Long].collect().toSet))
    }
    def send(rows: Seq[(Long, Long)]): Unit = {
      val payloads = rows.map { case (id, sc) => s"""{"doc_id":$id,"score":$sc}""" }
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    // mirror the stream with direct foldBatch calls on a copy.
    var mirror = state.get()
    val b0 = Seq.tabulate(50)(i => (5000L + i, (i % 80).toLong))
    val b1 = Seq.tabulate(50)(i => (6000L + i, (i % 120).toLong))
    val (k0, m0) = QuantileIngest.foldBatch(b0.toDF("doc_id", "score"), mirror, "score", 0L)
    mirror = m0
    val (k1, m1) = QuantileIngest.foldBatch(b1.toDF("doc_id", "score"), mirror, "score", 1L)
    mirror = m1
    send(b0); send(b1)
    q.stop()
    assert(got.map(_._2).toList == List(
      k0.select("doc_id").as[Long].collect().toSet,
      k1.select("doc_id").as[Long].collect().toSet))
    assert(state.get().hist == mirror.hist)
    assert(state.get().foldedBatch == 1L)

    // restart: persist histRows + fence, restore, and a replayed batch at
    // or below the fence must be SKIPPED (no double fold).
    val persisted = state.get()
    val restored = new java.util.concurrent.atomic.AtomicReference(
      QuantileIngest.restoreState(persisted.histRows, persisted.p,
        persisted.maxBins, persisted.keepAtOrAbove, persisted.version,
        persisted.foldedBatch))
    assert(restored.get().hist == persisted.hist)
    assert(restored.get().threshold == persisted.threshold)
    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema)
    var calls = 0
    val q2 = QuantileIngest.startGate(s2, restored, "value.score") {
      (_, _, _) => calls += 1
    }
    // MemoryStream restarts numbering at 0 ≤ fence 1 → both replayed
    // batches are fenced; a third (batchId 2) folds.
    val payloads = b0.map { case (id, sc) => s"""{"doc_id":$id,"score":$sc}""" }
    ms2.addData(payloads.zipWithIndex.map { case (j, i) =>
      KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    ms2.addData(payloads.zipWithIndex.map { case (j, i) =>
      KMsg("t", 0, 100L + i, new Timestamp(2000L + i), null, j.getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    assert(calls == 0 && restored.get().hist == persisted.hist,
      "replayed batches at/below the fence must not re-fold")
    ms2.addData(payloads.zipWithIndex.map { case (j, i) =>
      KMsg("t", 0, 200L + i, new Timestamp(3000L + i), null, j.getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(calls == 1 && restored.get().foldedBatch == 2L)
    assert(restored.get().n == persisted.n + b0.size)
  }

  // ---------------- unbounded-domain (KLL sketch) gate mode -------------

  /** The deterministic compactor's rank-error bound at the current n
    * (TypedAggregatorSpec's formula — levels ≈ log2(n/k) + slack). */
  private def rankBound(n: Long, k: Int): Long = {
    val levels = math.max(1,
      (math.log(n.toDouble / k) / math.log(2.0)).ceil.toInt + 2)
    (n * levels) / k
  }

  /** |exact rank of the estimate − target rank| — what the sketch bounds. */
  private def rankErr(values: Seq[Double], est: Double, p: Double): Long =
    math.abs(values.count(_ <= est).toLong -
      math.ceil(values.size * p).toLong)

  test("sketch gate: pre-batch threshold gates; post-fold threshold within the rank bound") {
    // CONTINUOUS scores — the domain BoundedHistogram's contract refuses
    // (every value distinct; no integer binning). Batches shift upward so
    // the threshold must move.
    val rnd = new scala.util.Random(7)
    val k = 64
    val corpus = Seq.tabulate(3000)(i => (i.toLong, rnd.nextDouble() * 1000.0))
    val batches = Seq.tabulate(3) { b =>
      Seq.tabulate(800)(i =>
        (10000L + b * 1000 + i, rnd.nextDouble() * 1000.0 + 400.0 * (b + 1)))
    }

    var st = QuantileIngest.buildSketchState(
      corpus.toDF("doc_id", "score"), "score", p = 0.5, k = k)
    var seen = corpus.map(_._2)
    assert(st.n == seen.size.toLong)
    assert(rankErr(seen, st.threshold.get, 0.5) <= rankBound(seen.size, k))

    batches.zipWithIndex.foreach { case (batch, b) =>
      val preT = st.threshold.get
      val (kept, next) = QuantileIngest.foldSketchBatch(
        batch.toDF("doc_id", "score"), st, "score", batchId = b.toLong)
      // gate: the PRE-batch threshold selects, exactly (keepAtOrAbove).
      val expectKept = batch.filter(_._2 >= preT).map(_._1).toSet
      assert(kept.select("doc_id").as[Long].collect().toSet == expectKept)
      // fold: whole batch enters the population; the merged sketch's
      // threshold stays within the deterministic rank-error bound of the
      // exact percentile over everything seen (the merge tree the bound
      // already covers — state ∪ batch is one more branch).
      seen = seen ++ batch.map(_._2)
      assert(next.n == seen.size.toLong)
      val err = rankErr(seen, next.threshold.get, 0.5)
      assert(err <= rankBound(seen.size, k),
        s"batch $b: rank error $err > bound ${rankBound(seen.size, k)}")
      st = next
    }
    // the upward-shifting mixture moved the threshold — non-vacuous.
    assert(st.threshold.get > QuantileIngest.buildSketchState(
      corpus.toDF("doc_id", "score"), "score", p = 0.5, k = k).threshold.get)
  }

  test("sketch gate streamed: gates on pre-batch threshold, folds, fences replays on restore") {
    val rnd = new scala.util.Random(13)
    val k = 64
    val corpus = Seq.tabulate(1500)(i => (i.toLong, rnd.nextDouble() * 100.0))
    val state = new java.util.concurrent.atomic.AtomicReference(
      QuantileIngest.buildSketchState(corpus.toDF("doc_id", "score"),
        "score", p = 0.8, k = k))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("score", DoubleType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = QuantileIngest.startSketchGate(s, state, "value.score") {
      (kept, _, _) =>
        got += kept.select(col("value.doc_id")).as[Long].collect().toSet
    }
    def send(rows: Seq[(Long, Double)]): Unit = {
      val payloads = rows.map { case (id, sc) => s"""{"doc_id":$id,"score":$sc}""" }
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }

    var seen = corpus.map(_._2)
    val b0 = Seq.tabulate(400)(i => (5000L + i, rnd.nextDouble() * 150.0))
    val b1 = Seq.tabulate(400)(i => (6000L + i, rnd.nextDouble() * 200.0))
    for ((batch, bi) <- Seq(b0, b1).zipWithIndex) {
      // the stream is idle between processAllAvailable calls — the
      // pre-batch threshold is readable race-free.
      val preT = state.get().threshold.get
      send(batch)
      assert(got(bi) == batch.filter(_._2 >= preT).map(_._1).toSet)
      seen = seen ++ batch.map(_._2)
      assert(state.get().n == seen.size.toLong)
      assert(rankErr(seen, state.get().threshold.get, 0.8) <=
        rankBound(seen.size, k))
    }
    q.stop()
    assert(state.get().foldedBatch == 1L)

    // restart: persist the driver-small buf + fence, restore, and a
    // replayed batch at/below the fence must be SKIPPED.
    val persisted = state.get()
    val restored = new java.util.concurrent.atomic.AtomicReference(
      QuantileIngest.restoreSketchState(persisted.buf, persisted.p,
        persisted.k, persisted.keepAtOrAbove, persisted.version,
        persisted.foldedBatch))
    assert(restored.get().threshold == persisted.threshold)
    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema)
    var calls = 0
    val q2 = QuantileIngest.startSketchGate(s2, restored, "value.score") {
      (_, _, _) => calls += 1
    }
    val payloads = b0.map { case (id, sc) => s"""{"doc_id":$id,"score":$sc}""" }
    for (base <- Seq(0L, 100L)) { // batchIds 0, 1 — both at/below fence 1
      ms2.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, base + i, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q2.processAllAvailable()
    }
    assert(calls == 0 && restored.get().n == persisted.n,
      "replayed batches at/below the fence must not re-fold")
    ms2.addData(payloads.zipWithIndex.map { case (j, i) =>
      KMsg("t", 0, 200L + i, new Timestamp(3000L + i), null, j.getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(calls == 1 && restored.get().foldedBatch == 2L)
    assert(restored.get().n == persisted.n + b0.size)
  }
}
