package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for named registry queries to files —
  * the r17 optimization round's plan evidence
  * (`plans/r17/<key>_<tag>.txt`). Usage:
  *
  *   runMain graft.PlanDump <outDir> <tag> <key> [<key> ...]
  *
  * Session config mirrors [[Bench]] (shuffle partitions = cores, nanos
  * parquet, In-filter threshold) so the dumped plan is the plan the
  * bench actually runs — modulo AQE's runtime re-optimization, which
  * explain-before-execution cannot show.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <key>...")
    val outDir = args(0); val tag = args(1); val keys = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "256")
      // sort-based shuffle writer everywhere — see Bench for the rationale.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val f = new java.io.PrintWriter(s"$outDir/${k}_$tag.txt")
      try f.write(plan) finally f.close()
      System.err.println(s"[plandump] wrote $outDir/${k}_$tag.txt")
    }
    spark.stop()
  }
}
