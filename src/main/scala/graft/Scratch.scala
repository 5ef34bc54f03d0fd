package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 15, part 2): incremental DIRECTED PageRank at
  * scale — the directed twin of the round-11 lattice measurement
  * (README §Incremental upkeep). 10M directed edges over 5M nodes
  * (out-degree 2: id → id+1, id → id+7919 mod N), a localized
  * 1000-edge batch, parquet staging (the sorted-state pruning needs
  * files). Times: full pageRankDirected recompute, state build (once),
  * refresh (ranks out), fold (state advanced). The directed refresh
  * pays TWO pruned edge probes per iteration (out-edges + in-edges via
  * the dst-sorted layout) where symmetry gave the undirected core one
  * — this probe prices that honestly. Results → README §Incremental
  * upkeep.
  *
  * (Part 1 of this round's Scratch — the r13-vs-r15 x_text_html bisect
  * probe — is recorded in README §Bench calibration and the commit
  * history; this file is the per-investigation convention.)
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
    val dir = java.nio.file.Files.createTempDirectory("graft-scratch-stage")
    spark.conf.set("graft.stage.dir", dir.toString)
    import graft.operators.Graph

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val n = 5000000L
    val edges = spark.range(n).selectExpr(
      "id AS s", s"(id + 1) % $n AS d")
      .unionAll(spark.range(n).selectExpr(
        "id AS s", s"(id + 7919) % $n AS d"))
    // localized batch: 1000 new edges among a 20k-node neighborhood,
    // plus two brand-new nodes (a source and a dst-only sink).
    val batch = spark.range(1000L).selectExpr(
      "1000000 + id * 17 AS s", "1000000 + id * 13 + 5 AS d")
      .unionAll(spark.range(1L).selectExpr(
        s"$n AS s", "1000500 AS d"))
      .unionAll(spark.range(1L).selectExpr(
        "1000501 AS s", s"${n + 1} AS d"))
    val vertices = spark.range(n).toDF("doc_id")

    timed("full pageRankDirected (10M edges, 3 iters)")(
      Graph.pageRankDirected(vertices, "doc_id",
        edges.unionAll(batch), "s", "d")
        .write.format("noop").mode("overwrite").save())
    val st = timed("pageRankDirectedState build (once)")(
      Graph.pageRankDirectedState(edges, "s", "d"))
    timed("pageRankDirectedRefresh (1002-edge batch)")(
      Graph.pageRankDirectedRefresh(vertices, "doc_id", st, batch, "s", "d")
        .write.format("noop").mode("overwrite").save())
    val st2 = timed("pageRankDirectedRefreshState fold")(
      Graph.pageRankDirectedRefreshState(st, batch, "s", "d"))
    // the fold's staged writes are eager; confirm the advanced state
    // answers (and price one pruned read of it).
    timed("folded-state ranks count")(println(
      s"[probe] folded rank rows = ${st2.ranks.count()}"))
    spark.stop()
  }
}
