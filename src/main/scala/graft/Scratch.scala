package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 16): the x_ann_brute_topk drift attribution.
  * The driver's calibration-normalized reading rose two rounds running
  * (r14 0.67 s → mid-r15 +12% → r15 0.91 s) — but `git diff` shows the
  * ENTIRE code path (Ann.bruteTopK, the query, Tables, the session
  * config, the native cosine expression) is byte-identical across
  * r14 → r15 → r16, so a code regression is impossible; the suspects
  * are the bench sweep's composition (headliners grew 34 → 40 in r15 —
  * the interleaved 3-sweep discipline changes the cache/JIT context a
  * mid-sweep query runs in) and driver-box drift. This probe measures
  * the query ISOLATED on an idle box: 2 untimed warmups, best of 5
  * timed runs, the Bench calibration probe before and after.
  * Attribution rule: isolated best-of-5 / calib at or below the r14
  * level ⇒ the drift is sweep-context/machine, not the operator.
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

    val fn = SparkEntry.queries("x_ann_brute_topk")
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val calibBefore = calibrate()
    run(); run() // 2 untimed warmups
    val times = (1 to 5).map(_ => run())
    val calibAfter = calibrate()
    println(f"[probe] x_ann_brute_topk sf=$sfDir")
    println(f"[probe] runs: ${times.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[probe] best: ${times.min}%.3f s  calib: " +
      f"${math.min(calibBefore, calibAfter)}%.3f s (before $calibBefore%.3f / after $calibAfter%.3f)")
    println(f"[probe] normalized best: ${times.min / math.min(calibBefore, calibAfter)}%.3f")
    spark.stop()
  }
}
