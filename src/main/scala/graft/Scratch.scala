package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment: CHARACTERIZE the MinHash-LSH 20× growth curve —
  * the round-7 stress run showed 9.9× wall for 20× docs at bandCap 50;
  * this splits that into CANDIDATE-PAIR growth vs VERIFY cost and sweeps
  * bandCap, producing the tuning table a 100 TB operator needs (recorded
  * in SURVEY §8 / README). Corpus = sf0.1 documents replicated 20× with
  * replica-unique suffix tokens (near-dup structure stays per-replica, so
  * true pairs scale linearly; growth beyond linear is hot-band fan-out).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = documents(spark, d)
    val n = base.count()
    val reps = 20
    val bigPath = "/tmp/graft_scale_docs"
    base.crossJoin(spark.range(reps).select(col("id").as("__r")))
      .select(
        (col("doc_id") + col("__r") * lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" "),
          expr("concat_ws(' ', transform(sequence(1, 8), " +
            "i -> substring(md5(concat(CAST(doc_id AS STRING), ':', " +
            "CAST(__r AS STRING), ':', CAST(i AS STRING))), 1, 12)))"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$bigPath/documents.parquet")
    val big = documents(spark, bigPath)
    println(s"[scratch] docs: base=$n big=${big.count()} (${reps}x)")
    println("| docs | bandCap | candidates | true pairs | cand s | full s | verify s |")
    println("|---|---|---|---|---|---|---|")

    val (k, bands) = (12, 4)
    for ((label, docs) <- Seq(("1x", base), ("20x", big));
         cap <- Seq(Some(25), Some(50), Some(100), None)) {
      val sh = graft.operators.TextDedup.shingleRelation(
        fanOut(docs), "doc_id", "text", 3)
      val bk = graft.operators.TextDedup.minhashBandKeys(sh, k, bands)
      // candidate generation alone: the capped band self-join, distinct.
      def candidates = {
        val capped = cap match {
          case Some(c) =>
            import org.apache.spark.sql.expressions.Window
            bk.withColumn("__bf",
                count(lit(1)).over(Window.partitionBy(col("band_key"))))
              .filter(col("__bf") <= c).drop("__bf")
          case None => bk
        }
        capped.as("a").join(capped.as("b"), "band_key")
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("da"), col("b.id").as("db")).distinct()
      }
      candidates.count() // warm-up: JIT + shuffle-file reuse parity
      val (nc, candSec) = timed(candidates.count())
      val (np, fullSec) = timed {
        val pairs = graft.operators.TextDedup.minhashLshPairs(
          sh, k, bands, 0.5, bandCap = cap)
        pairs.count()
      }
      println(f"| $label (${n * (if (label == "1x") 1 else reps)}%d docs) | ${cap.map(_.toString).getOrElse("none")} " +
        f"| $nc | $np | $candSec%.2f | $fullSec%.2f | ${fullSec - candSec}%.2f |")
    }
    spark.stop()
  }
}
