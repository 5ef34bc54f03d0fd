package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 11, session 3): NEW GATE COSTS —
  * (a) the entity-resolution probe (`EntityIngest` /
  * `TextDedup.editPairsAgainstIndex`): per-1000-record batch against a
  * 100k-title corpus index, and how the cost scales with the batch's
  * candidate volume (blocks × bucket width);
  * (b) the frequency fold (`FrequencyIngest`): build cost over the sf0.1
  * token stream and the per-batch fold — expected FLAT (state is 1024
  * longs; the fold is one map-side sketch of the batch + a driver-side
  * cell merge, independent of corpus size).
  *
  * Prior recorded experiments (pipeline staging, incremental graph
  * upkeep, new-operator wall, triangle wedge bound, substring-span
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

    // ---- (a) entity-resolution probe: 1000-record batch vs 100k index
    val vocabArr = "array('join','hash','row','batch','scan','customer'," +
      "'column','filter','value','table')"
    def titles(n: Long) = spark.range(n).selectExpr(
      "id",
      // word prefix + a 12-hex-char unique tail: distinct records sit
      // ~11 edits apart (random hex), so only planted typos pair.
      s"""concat(
         |  array_join(transform(sequence(1, CAST(3 + id % 5 AS INT)),
         |    j -> element_at($vocabArr,
         |           CAST((id * 7 + j * 13) % 10 + 1 AS INT))), ' '),
         |  ' ', substr(md5(CAST(id AS STRING)), 1, 12)) AS title""".stripMargin,
      "CAST(id % 5 AS STRING) AS lang",
      "CAST(id % 50 AS STRING) AS cat")
    // the batch = 1000 typo'd re-listings of existing records (same
    // structured attrs — the ER premise).
    val batch = titles(100000L).filter(expr("id % 100 = 0"))
      .selectExpr("id + 1000000 AS id", "concat(title, ' xy') AS title",
        "lang", "cat")
    for (blocks <- Seq(Seq("lang"), Seq("lang", "cat"))) {
      val (idx, tIdx) = timed(graft.streaming.EntityIngest.buildIndex(
        titles(100000L), "id", "title", maxDist = 6,
        blockCols = blocks, bucketWidth = 16))
      var pairs = 0L
      val tProbe = best3 {
        pairs = graft.operators.TextDedup.editPairsAgainstIndex(
          batch, "id", "title", idx.index, maxDist = 6,
          blockCols = blocks, bucketWidth = 16).count()
      }
      println(f"| entity probe, blocks=${blocks.mkString("+")} " +
        f"(1000-rec batch, $pairs pairs; index build $tIdx%.2f s) | $tProbe%.2f s |")
    }

    // ---- (b) frequency fold: sf0.1 token stream, per-5000-token batch
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val toks = docs.select(explode(expr("split(lower(text), ' ')")).as("t"))
    val (st0, tBuild) = timed(graft.streaming.FrequencyIngest.buildState(
      toks, "t", threshold = 10000L))
    val batchToks = toks.limit(5000).cache(); batchToks.count()
    var st = st0
    val tFold = best3 {
      st = graft.streaming.FrequencyIngest.foldBatch(
        batchToks, st, "t", st.foldedBatch + 1)._2
    }
    println(f"| frequency state build (sf0.1, 2.7M tokens) | $tBuild%.2f s |")
    println(f"| frequency fold (5000-token batch) | $tFold%.2f s |")
    spark.stop()
  }
}
