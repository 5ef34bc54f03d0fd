package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 9, third continuation): NEW-OPERATOR WALL at
  * sf0.1 — PageRank over the near-dup graph (vs the CC closure it rides
  * next to), DSIR importance scoring (vs the tf-shaped corpus scans it
  * resembles), and PQ encode + ADC scan (vs the brute scans it
  * compresses). Recorded in README §new-operator cost / SURVEY §8.
  *
  * Prior recorded experiments (triangle wedge bound, substring-span
  * scale, span-index gate steady state, streaming gate cost split,
  * verify-join skew) live in git history of this file; their numbers
  * stand in README.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    println("| op | detail | rows | wall s |")
    println("|---|---|---|---|")

    // ---- graph family over the same staged near-dup pair relation.
    val pairs = graft.sources.Tables.stage(
      graft.operators.TextDedup.simhashPairs(
        fanOut(documents(spark, d)), "doc_id", "text", maxHamming = 7))
    val (nPairs, tPairs) = timed(pairs.count())
    println(f"| simhash pairs (input) | maxHamming=7 | $nPairs | $tPairs%.2f |")
    val (nCc, tCc) = timed(graft.operators.Graph
      .componentsForVertices(documents(spark, d), "doc_id", pairs, "da", "db")
      .count())
    println(f"| cc closure | componentsForVertices | $nCc | $tCc%.2f |")
    val (nPr, tPr) = timed(graft.operators.Graph
      .pageRank(documents(spark, d), "doc_id", pairs, "da", "db").count())
    println(f"| pagerank | 3 iter, scale 1e9 | $nPr | $tPr%.2f |")

    // ---- importance scoring vs the tf-shaped scan it resembles.
    val (nTf, tTf) = timed(graft.operators.Ranking
      .tfidfTopK(fanOut(documents(spark, d)), "doc_id", "text", k = 3).count())
    println(f"| tfidf top-k (reference) | k=3 | $nTf | $tTf%.2f |")
    val (nIw, tIw) = timed(graft.operators.Ranking
      .importanceScores(fanOut(documents(spark, d)), "doc_id", "text",
        isTarget = col("lang") === "en").count())
    println(f"| importance scores | 4096 buckets | $nIw | $tIw%.2f |")

    // ---- importance gate: build-once cost + per-batch probe cost (the
    // ScoreIngest steady state: map-side batch projection + broadcast
    // weights join; corpus untouched).
    val (w, tW) = timed {
      val w0 = graft.streaming.ScoreIngest.buildWeights(
        fanOut(documents(spark, d)), "doc_id", "text",
        isTarget = col("lang") === "en")
      w0.weights.count(); w0
    }
    println(f"| importance gate: buildWeights (once/version) | 4096 buckets | ${w.weights.count()} | $tW%.2f |")
    val batch = documents(spark, d).filter(col("doc_id") % 5 === 0).limit(1000)
    val (nB, tB) = timed(graft.operators.Ranking.scoreAgainstWeights(
      graft.operators.Ranking.importanceRelation(batch, "doc_id", "text",
        lit(false)), w.weights).count())
    println(f"| importance gate: per-batch probe | 1000-doc batch | $nB | $tB%.2f |")

    // ---- PQ: encode cost, then ADC scan vs the brute scans.
    val e = embeddings(spark, d).select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") < 50)
    val c = fanOut(e.filter(col("id") >= 50))
    val cb = e.filter(col("id") >= 50 && col("id") < 114)
    val (staged, tCodes) = timed {
      val s0 = graft.sources.Tables.stage(
        graft.operators.Ann.pqCodes(c, cb, m = 8))
      s0.count(); s0
    }
    println(f"| pq encode (once per corpus version) | m=8 cb=64 | ${staged.count()} | $tCodes%.2f |")
    val (nPq, tPq) = timed(graft.operators.Ann
      .pqTopKAgainstCodes(q, staged, cb, k = 10, m = 8).count())
    println(f"| pq adc scan (per query batch) | m=8 cb=64, 50 q | $nPq | $tPq%.2f |")
    val (nBr, tBr) = timed(graft.operators.Ann.bruteTopKL2(q, c, k = 10).count())
    println(f"| brute L2 top-k (reference) | 50 q | $nBr | $tBr%.2f |")
    val (nBc, tBc) = timed(graft.operators.Ann.bruteTopK(q, c, k = 10).count())
    println(f"| brute cosine top-k (reference) | 50 q | $nBc | $tBc%.2f |")

    spark.stop()
  }
}
