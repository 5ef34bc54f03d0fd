package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 12): the EDIT-DISTANCE HOT CELL — a corpus
  * whose (lang, length-bucket) cells are mostly small except ONE
  * deliberately hot cell (constant-length same-language titles). The
  * quadratic-in-occupancy candidate volume should dominate the whole
  * pair join; `cellCap` should restore the cold-corpus wall at the
  * documented recall trade (pairs touching the capped cell are missed).
  *
  * Prior recorded experiments (entity probe block-attr scale law,
  * frequency fold cost, pipeline staging, incremental graph upkeep,
  * new-operator wall, triangle wedge bound, substring-span scale,
  * span-index gate steady state, streaming gate cost split, verify-join
  * skew) live in git history of this file; their numbers stand in README.
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
    def best3(f: => Unit): Double = { f; (1 to 3).map(_ => timed(f)._2).min }

    val vocabArr = "array('join','hash','row','batch','scan','customer'," +
      "'column','filter','value','table')"
    // 95k COLD rows: variable-length word titles + a 12-hex unique tail
    // (distinct records sit ~11 edits apart), blocked on (lang, cat) —
    // 1000 block groups × ~4 length buckets keeps every cold cell tiny
    // (the well-composed-blockCols regime the operator documents).
    val cold = spark.range(95000L).selectExpr(
      "id",
      s"""concat(
         |  array_join(transform(sequence(1, CAST(3 + id % 5 AS INT)),
         |    j -> element_at($vocabArr,
         |           CAST((id * 7 + j * 13) % 10 + 1 AS INT))), ' '),
         |  ' ', substr(md5(CAST(id AS STRING)), 1, 12)) AS title""".stripMargin,
      "CAST(id % 5 AS STRING) AS lang",
      // independent of lang (id % 200 would be: 5 | 200, lang ≡ cat mod 5
      // — the composed key would collapse to 200 groups of ~475, every
      // cold cell above any sane cap; measured before this comment).
      "CAST((id div 5) % 200 AS STRING) AS cat")
    // HOT cell: n CONSTANT-LENGTH titles in ONE (lang, cat, bucket) cell
    // (fixed prefix + 8-hex tail, length 30). Tails are random hex, so
    // ~no hot pairs pass maxDist — the cost is pure candidate volume,
    // the skew mode blockCols composition cannot fix.
    def hot(n: Long) = spark.range(n).selectExpr(
      "id + 1000000 AS id",
      "concat('hot boilerplate title ', substr(md5(CAST(id AS STRING)), 1, 8)) AS title",
      "'9' AS lang", "'9' AS cat")
    for (hotN <- Seq(0L, 2000L, 5000L)) {
      val docs = cold.unionAll(hot(hotN))
      for (cap <- Seq(None, Some(256)); if cap.isEmpty || hotN > 0) {
        var pairs = 0L
        val t = best3 {
          pairs = graft.operators.TextDedup.editDistancePairs(
            docs, "id", "title", maxDist = 6,
            blockCols = Seq("lang", "cat"),
            bucketWidth = 16, cellCap = cap).count()
        }
        println(f"| editDistancePairs 95k cold + $hotN hot, cap=$cap " +
          f"($pairs pairs) | $t%.2f s |")
      }
    }
    spark.stop()
  }
}
