package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 15): the r14 verdict flagged x_text_html
  * (+66% raw) and x_text_stats (+60%) between the r13 and r14 DRIVER
  * runs, suspecting the numeric-entity pass added in r14. This probe
  * times exactly those two queries (2 warm-ups + 5 timed runs each,
  * best + all published) plus the Bench calibration sort, so the SAME
  * binary-independent probe can run in a r13 worktree and in the
  * current tree on an idle box — a controlled A/B that the full bench
  * sweep (34 queries, ~12 min, easily contaminated) cannot give.
  * Results → README §Bench calibration.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L).selectExpr("id * 2654435761 % 1000000007 AS h")
        .orderBy("h").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = Seq("x_text_html", "x_text_stats")
    val c0 = (1 to 3).map(_ => calib()).min
    names.foreach(n => (1 to 2).foreach(_ => run(n))) // warm-ups
    val timed = names.map(n => n -> (1 to 5).map(_ => run(n)))
    val c1 = (1 to 3).map(_ => calib()).min
    println(f"[probe] calib=${math.min(c0, c1)}%.3f (before=$c0%.3f after=$c1%.3f)")
    timed.foreach { case (n, ts) =>
      println(f"[probe] $n%s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
