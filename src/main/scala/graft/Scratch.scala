package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    Seq("q_percentile_bucketed", "x_dedup_bloom_gate").foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, d)
        println(s"[scratch] $n rows=" + df.count())
      } catch { case t: Throwable =>
        println(s"[scratch] $n FAILED: " + t.toString.take(400)) }
    }
    spark.stop()
  }
}
