package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment: SCALING evidence for the dedup family — replicate
  * the sf0.1 documents 20× (ids offset, text perturbed with replica-unique
  * suffix tokens so near-dup structure stays per-replica and pair counts
  * scale LINEARLY), then time the banded pipelines at 5k vs 100k docs.
  * Near-linear wall-clock growth = the candidate-generation claims hold
  * off the toy scale. */
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
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-40s min ${runs.min}%.3f s")
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

    time(s"simhashPairs  ${n} docs")(noop(
      graft.operators.TextDedup.simhashPairs(fanOut(base), "doc_id", "text", 7)))
    time(s"simhashPairs  ${n * reps} docs")(noop(
      graft.operators.TextDedup.simhashPairs(fanOut(big), "doc_id", "text", 7)))

    def mh(df: org.apache.spark.sql.DataFrame) = {
      val sh = graft.operators.TextDedup.shingleRelation(fanOut(df), "doc_id", "text", 3)
      graft.operators.TextDedup.minhashLshPairs(sh, 12, 4, 0.5, bandCap = Some(50))
    }
    time(s"minhashLsh    ${n} docs")(noop(mh(base)))
    time(s"minhashLsh    ${n * reps} docs")(noop(mh(big)))

    def cc(df: org.apache.spark.sql.DataFrame) = {
      val pairs = graft.operators.TextDedup.simhashPairs(fanOut(df), "doc_id", "text", 7)
      graft.operators.Graph.componentsForVertices(df, "doc_id", pairs, "da", "db")
    }
    time(s"cc pipeline   ${n} docs")(noop(cc(base)))
    time(s"cc pipeline   ${n * reps} docs")(noop(cc(big)))
    spark.stop()
  }
}
