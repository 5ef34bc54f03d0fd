package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 11): X_PIPELINE_MODERN WALL — the heaviest
  * bench headliner (9.47 s at sf0.1). Hypothesis: the lazy survivor
  * chain (scored ×2, kept1 ×3, kept2/kept3 ×2 each) re-executes
  * upstream subplans at every reuse point (no automatic subplan reuse
  * across join sides — the Tables.stage rationale); staging the reused
  * intermediates trades ~3 extra small materializations for one-shot
  * upstream execution. Recorded in README.
  *
  * Prior recorded experiments (incremental graph upkeep, new-operator
  * wall, triangle wedge bound, substring-span scale, span-index gate
  * steady state, streaming gate cost split, verify-join skew) live in
  * git history of this file; their numbers stand in README.
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
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val d = "/root/testdata/sf0.1"

    def bench(name: String): Double = {
      def once(): Double = timed(
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save())._2
      once() // warm
      (1 to 3).map(_ => once()).min
    }
    println(f"| x_pipeline_modern | best-of-3 | ${bench("x_pipeline_modern")}%.2f |")
    spark.stop()
  }
}
