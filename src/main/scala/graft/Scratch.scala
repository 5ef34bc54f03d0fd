package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 14): validate `TextDedup.lshPlan`'s operating
  * curve against MEASURED banding recall/candidate rates. Corpus =
  * pairs constructed at EXACT Jaccard (shared token windows, disjoint
  * per-pair namespaces so cross-pair candidates are impossible):
  * 20,000 pairs at J = 0.75 and 20,000 at J = 0.25, banded at three
  * divisor geometries of a 24-hash signature, verify threshold 0 so
  * the output IS the candidate set. Also times each geometry's pair
  * join on the sf0.1 corpus shingles (the COST side of the planner's
  * recall-vs-candidates tradeoff). Results → README §LSH planner
  * validation; the 500-pair spec floor lives in TextDedupSpec.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.OFF)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.operators.TextDedup
    import graft.sources.Tables

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- controlled-Jaccard corpus: measured vs predicted curve ----
    val n = 20000L
    def half(ns: String, off: Long, idOff: Int, from: Int, to: Int) =
      spark.range(n).selectExpr(
        s"$off + id * 2 + $idOff AS id",
        s"""transform(sequence($from, $to),
           |  j -> concat('$ns', CAST(id AS STRING), ':', CAST(j AS STRING)))
           |  AS sh""".stripMargin)
    val sh = Tables.stage(
      half("p", 0L, 0, 0, 34).union(half("p", 0L, 1, 5, 39))      // J = 0.75
        .union(half("q", 10000000L, 0, 0, 34))
        .union(half("q", 10000000L, 1, 21, 55)))                  // J = 0.25
    println("[lshplan] geometry  predicted@0.75  measured@0.75  " +
      "predicted@0.25  measured@0.25")
    for ((b, r) <- Seq((4, 6), (6, 4), (8, 3))) {
      val out = TextDedup.minhashLshPairs(sh, k = 24, bands = b,
        threshold = 0.0).select(col("da")).as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect()
      val recall = out.count(_ < 10000000L).toDouble / n
      val distant = out.count(_ >= 10000000L).toDouble / n
      println(f"[lshplan] ${b}x$r      " +
        f"${TextDedup.lshCandidateProb(0.75, b, r)}%.4f          $recall%.4f         " +
        f"${TextDedup.lshCandidateProb(0.25, b, r)}%.4f          $distant%.4f")
    }

    // ---- cost side: candidate volume + wall on the sf0.1 corpus ----
    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d))
    val corpusSh = Tables.stage(
      TextDedup.shingleProjection(docs, "doc_id", "text", n = 3))
    for ((b, r) <- Seq((4, 6), (6, 4), (8, 3))) {
      def run() = TextDedup.minhashLshPairs(corpusSh, k = 24, bands = b,
        threshold = 0.5).count()
      run() // warmup
      val (pairs, t) = timed(run())
      println(f"[lshplan] sf0.1 ${b}x$r: verified pairs=$pairs wall=$t%.2f s")
    }
    spark.stop()
  }
}
