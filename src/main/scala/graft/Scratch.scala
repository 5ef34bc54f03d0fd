package graft

import org.apache.spark.sql.SparkSession

/** Perf-probe harness: isolates ONE registry query on an idle box —
  * 2 untimed warmups, best of 5 timed runs, the Bench calibration
  * probe before and after. `SPARK_GRAFT_PROBE` picks the key
  * (default x_ann_brute_topk — the r16 drift attribution, closed in
  * README §Bench calibration: the code path was byte-identical
  * r14 → r16 and the isolated reading came in at HALF the in-sweep
  * figure, so the driver deltas were sweep-context + machine).
  * The full bench sweep is too contaminable for bisects (the r15
  * lesson) — use THIS, per key, against a worktree binary when a
  * driver delta needs attribution.
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the Bench calibration probe: single-thread 10M long sort.
    def calibrate(): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val a = Array.tabulate(10000000)(i => ((i * 2654435761L) % 100000007L))
        java.util.Arrays.sort(a)
        if (a(0) == -1) println("") // keep the sort observable
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val key = sys.env.getOrElse("SPARK_GRAFT_PROBE", "x_ann_brute_topk")
    val fn = SparkEntry.queries(key)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val calibBefore = calibrate()
    run(); run() // 2 untimed warmups
    val times = (1 to 5).map(_ => run())
    val calibAfter = calibrate()
    println(f"[probe] $key sf=$sfDir")
    println(f"[probe] runs: ${times.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[probe] best: ${times.min}%.3f s  calib: " +
      f"${math.min(calibBefore, calibAfter)}%.3f s (before $calibBefore%.3f / after $calibAfter%.3f)")
    println(f"[probe] normalized best: ${times.min / math.min(calibBefore, calibAfter)}%.3f")
    spark.stop()
  }
}
