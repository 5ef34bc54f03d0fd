package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Retrieval QUALITY of the approximate ANN paths — the dimension the
  * driver's hash oracle cannot see (LSH/IVF are deterministic, so the
  * oracle only proves they compute their own definition). At 100 TB brute
  * force is off the table and the approximate paths are the product:
  * these floors make silently-bad defaults a test failure.
  *
  * Two geometries, because ANN quality is geometry-dependent:
  *  - a CLUSTERED fixture (the regime real embedding corpora live in):
  *    both paths must retrieve near-exactly while scoring a small
  *    fraction of the exhaustive pair count — recall AND pruning;
  *  - the ISOTROPIC RANDOM sf0.01 embeddings table (worst case — neighbors
  *    are barely separated from the bulk): the documented LSH defaults
  *    must still clear a 0.85 floor.
  * Everything here is deterministic (fixed fixture, md5-derived
  * hyperplanes, deterministic k-means init), so the floors are exact
  * pins, not flaky statistical tests. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  /** 10 well-separated unit-ish centers + per-vector noise, cluster =
    * id % 10 (so trainCentroids' first-k init sees every cluster).
    * Deterministic: seeded per-id PRNG. */
  private def clustered(n: Int, dim: Int = 64, noise: Double = 0.35): DataFrame = {
    val centers = Array.tabulate(10) { c =>
      val r = new scala.util.Random(1000 + c)
      Array.fill(dim)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + noise * (r.nextDouble() * 2 - 1)).toFloat).toSeq)
    }
    rows.toDF("id", "embedding")
  }

  private def split(e: DataFrame, nq: Int): (DataFrame, DataFrame) =
    (e.filter(col("id") < nq), e.filter(col("id") >= nq))

  test("clustered corpus: LSH defaults retrieve near-exactly, sub-exhaustively") {
    // the (64, 16) defaults are RECALL-SAFE: width-4 bands collide at
    // ~1/16 per band for unrelated vectors, so the cost floor is
    // 1-(15/16)^16 ≈ 0.64 of exhaustive on any geometry — the price of
    // clearing 0.9 recall on isotropic random data (the worst case).
    val (q, c) = split(clustered(520), 20)
    val exact = Ann.bruteTopK(q, c, k = 10)
    val approx = Ann.lshTopK(q, c, k = 10)
    val recall = Ann.meanRecall(approx, exact)
    assert(recall >= 0.95, f"LSH recall@10 on clustered data: $recall%.3f < 0.95")
    val pairs = AnnRecall.lshScoredPairs(q, c, bits = 64, bands = 16)
    val exhaustive = 20L * 500L
    assert(pairs <= (exhaustive * 7) / 10,
      s"LSH scored $pairs of $exhaustive pairs — above the documented cost ceiling")
  }

  test("clustered corpus: WIDE bands (corpus-tuned) prune hard at high recall") {
    // width-8 bands: unrelated pairs collide at ~2^-8 per band — the
    // production tuning when the corpus has cluster structure (same-
    // cluster pairs at cos≈0.9 agree per band with prob ~0.86^8 ≈ 0.29,
    // caught by ≥1 of 16 bands with prob ≈ 0.996). This is the measured
    // claim behind the scaladoc's "tune width to your corpus" guidance.
    val (q, c) = split(clustered(520), 20)
    val exact = Ann.bruteTopK(q, c, k = 10)
    val approx = Ann.lshTopK(q, c, k = 10, bits = 128, bands = 16)
    val recall = Ann.meanRecall(approx, exact)
    assert(recall >= 0.9, f"wide-band LSH recall@10: $recall%.3f < 0.9")
    val pairs = AnnRecall.lshScoredPairs(q, c, bits = 128, bands = 16)
    val exhaustive = 20L * 500L
    assert(pairs <= exhaustive / 4,
      s"wide-band LSH scored $pairs of $exhaustive pairs — pruning claim broken")
  }

  test("multi-probe: recall never drops vs single-probe at equal params, cost bounded") {
    // wide bands (128, 16: width 8) prune hard but single-probe recall
    // pays for it; multi-probe recovers recall from the SAME index
    // geometry by also probing the 8 one-bit-flip keys per band. The
    // probe set CONTAINS the exact keys, so candidates are a superset —
    // recall is structurally non-decreasing; pin that plus the cost
    // ceiling ((width+1)× single-probe, in practice far less) and a
    // strict improvement on this fixture.
    val (q, c) = split(clustered(520), 20)
    val exact = Ann.bruteTopK(q, c, k = 10)
    val single = Ann.meanRecall(Ann.lshTopK(q, c, k = 10, bits = 128, bands = 16), exact)
    val multi = Ann.meanRecall(
      Ann.lshTopKMultiProbe(q, c, k = 10, bits = 128, bands = 16), exact)
    assert(multi >= single, f"multi-probe recall $multi%.3f < single $single%.3f")
    assert(multi >= 0.97, f"multi-probe recall@10: $multi%.3f < 0.97")
    val sp = AnnRecall.lshScoredPairs(q, c, bits = 128, bands = 16)
    val mp = AnnRecall.lshMultiProbeScoredPairs(q, c, bits = 128, bands = 16)
    assert(mp >= sp && mp <= sp * 9,
      s"multi-probe scored $mp vs single $sp — outside [1, width+1]x")
    // and the index-probe split agrees with the one-shot form bitwise.
    val cb = Ann.bandedRelation(c, "c_id", "ce", bits = 128, bands = 16)
    val viaIndex = Ann.lshTopKMultiProbeAgainstIndex(q, cb, k = 10,
      bits = 128, bands = 16)
    assert(viaIndex.collect().toSet ==
      Ann.lshTopKMultiProbe(q, c, k = 10, bits = 128, bands = 16).collect().toSet)
  }

  test("knnGraph at the defaults retrieves the clustered corpus near-exactly") {
    // the self-join graph inherits lshTopK's recall story; pin it so a
    // banding regression in the graph path (e.g. a lost band key) fails
    // loudly. Ground truth: brute self top-11 minus the self edge.
    val c = clustered(520)
    val g = Ann.knnGraph(c, k = 10)
    val exact = Ann.bruteTopK(c, c, k = 11)
      .filter(col("q_id") =!= col("neighbor_id"))
    val recall = Ann.meanRecall(g, exact)
    assert(recall >= 0.95, f"knnGraph recall@10 on clustered data: $recall%.3f < 0.95")
  }

  test("clustered corpus: trained IVF retrieves near-exactly at nprobe/cents cost") {
    val (q, c) = split(clustered(520), 20)
    val exact = Ann.bruteTopK(q, c, k = 10)
    val cents = Ann.trainCentroids(c, k = 10)
    val approx = Ann.ivfTopK(q, c, cents, k = 10, nprobe = 2)
    val recall = Ann.meanRecall(approx, exact)
    assert(recall >= 0.9, f"IVF recall@10 on clustered data: $recall%.3f < 0.9")
    val pairs = AnnRecall.ivfScoredPairs(q, c, cents, nprobe = 2)
    val exhaustive = 20L * 500L
    assert(pairs <= (exhaustive * 2) / 5,
      s"IVF scored $pairs of $exhaustive pairs — probing did not prune")
  }

  test("isotropic random corpus (worst case): LSH defaults clear the floor") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id").as("id"), col("embedding"))
    val (q, c) = split(e, 10)
    val exact = Ann.bruteTopK(q, c, k = 10)
    val approx = Ann.lshTopK(q, c, k = 10)
    val recall = Ann.meanRecall(approx, exact)
    assert(recall >= 0.85, f"LSH recall@10 on random data: $recall%.3f < 0.85")
  }

  test("isotropic corpus: self-dedup pair recall at the defaults clears the floor") {
    // the x_dedup_embedding_lsh regime: fraction of the full-quadratic
    // cos ≥ 0.45 pair set the banded self-join recovers. Measured 0.972
    // at sf0.1 (README §ANN recall); deterministic, so a floor pins it.
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id").as("id"), col("embedding"))
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val full = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", expr("cosine_sim(a.embedding, b.embedding)"))
      .filter(col("cos") >= 0.45)
      .select(col("a.id").as("va"), col("b.id").as("vb"))
    val nFull = full.count()
    assert(nFull > 0, "fixture has no true pairs — vacuous")
    val hit = Ann.lshSelfPairs(e, threshold = 0.45).select("va", "vb")
      .join(full, Seq("va", "vb"), "left_semi").count()
    assert(hit.toDouble / nFull >= 0.85,
      f"self-dedup pair recall ${hit.toDouble / nFull}%.3f < 0.85 ($hit/$nFull)")
  }

  test("clustered corpus: PQ ADC retrieves against its own exact-L2 baseline") {
    // PQ is compression, not pruning: recall is bounded by quantization
    // error, so the isotropic corpus is hopeless by construction (0.21 at
    // m=8/cb=64, README §ANN recall) and the clustered regime is where it
    // ships. The codebook (64 held-out vectors, 6-7 per cluster so
    // subspace slices give WITHIN-cluster resolution) must be DISJOINT
    // from the corpus: a corpus member that is also a codebook entry
    // quantizes with zero error and crowds true neighbors out of the
    // top-k, silently deflating measured recall. Deterministic fixture →
    // exact pins. Measured: m = 8/16/32 → 0.35/0.51/0.70.
    val e = clustered(584)
    val q = e.filter(col("id") < 20 && col("id") >= 10)
    val c = e.filter(col("id") >= 20 && col("id") < 520)
    val cb = e.filter(col("id") >= 520)
    val exact = Ann.bruteTopKL2(q, c, k = 10)
    val recalls = Seq(8, 16, 32).map { m =>
      m -> Ann.meanRecall(Ann.pqTopK(q, c, cb, k = 10, m = m), exact)
    }
    val byM = recalls.toMap
    assert(byM(32) >= 0.65, f"PQ m=32 recall@10: ${byM(32)}%.3f < 0.65")
    // the quantization-error story: finer subspaces strictly help here.
    assert(byM(8) < byM(16) && byM(16) < byM(32),
      s"recall not improving with m: $recalls")
  }

  test("clustered corpus: IVFADC beats plain ADC while scanning a fraction of the codes") {
    // the x_ann_ivfpq composition: same exact-L2 baseline and clustered
    // regime as the plain-PQ test, both codebooks TRAINED (plain on raw
    // vectors, IVFADC on residuals — the Jégou residual claim is exactly
    // that the latter quantizes tighter at equal budget), same m/cb. Two
    // pins: (a) recall does not drop vs the full-scan ADC baseline even
    // though only nprobe/cents of the codes are scored; (b) the probed
    // volume really is a fraction (the pruning is real, not a no-op).
    val e = clustered(584)
    val q = e.filter(col("id") < 20 && col("id") >= 10)
    val c = e.filter(col("id") >= 20 && col("id") < 520)
    val exact = Ann.bruteTopKL2(q, c, k = 10)
    val cents = Ann.trainCentroids(c, k = 10)
    val cbRaw = Ann.trainCentroids(c, 64)
    val cbRes = Ann.trainCentroids(Ann.residualRelation(c, cents), 64)
    val rPlain = Ann.meanRecall(Ann.pqTopK(q, c, cbRaw, k = 10, m = 16), exact)
    val rIvf = Ann.meanRecall(
      Ann.ivfPqTopK(q, c, cents, cbRes, k = 10, nprobe = 2, m = 16), exact)
    assert(rIvf >= rPlain,
      f"IVFADC recall $rIvf%.3f fell below plain ADC $rPlain%.3f — residual coding should dominate")
    assert(rIvf >= 0.5, f"IVFADC recall@10: $rIvf%.3f < 0.5")
    val scanned = AnnRecall.ivfScoredPairs(q, c, cents, nprobe = 2)
    val exhaustive = 10L * 500L
    assert(scanned <= (exhaustive * 2) / 5,
      s"IVFADC scored $scanned of $exhaustive codes — probing did not prune")
  }

  test("recallAtK: missed queries appear with recall 0") {
    val exact = Seq((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8),
      (2L, 1L, 12L, 0.7)).toDF("q_id", "rank", "neighbor_id", "cos")
    val approx = Seq((1L, 1L, 10L, 0.9), (1L, 2L, 99L, 0.5))
      .toDF("q_id", "rank", "neighbor_id", "cos")
    val got = Ann.recallAtK(approx, exact)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 0.5), (2L, 0L, 1L, 0.0)))
  }
}
