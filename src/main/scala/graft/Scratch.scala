package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 14, session 2): the link-graph surface.
  *  1. MEGA-HUB anchor profiles: one target with 500k in-links beside
  *     a uniform background — the sort-then-slice collect_list form vs
  *     the bounded `Ranking.MinKTagged` aggregator x_anchor_text now
  *     uses (buffers hold ≤ k rows map-side; outputs must be equal).
  *  2. Link-chain replica stress (README convention: first 10% of
  *     sf0.1 docs replicated 20× under fresh ids): extractLinks →
  *     canonicalize → resolve-join must scale with VOLUME only.
  *  3. x_linkgraph_rank wall decomposition (cumulative prefixes:
  *     links → edges → +3-iteration directed rank).
  * Results → README §New-operator cost / §Replica-stress.
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
    import graft.operators.{Html, Ranking, Web}
    import graft.sources.Tables

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def warmTimed(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // ---- 1. mega-hub anchor aggregation: bounded vs collect-slice ----
    {
      val hub = spark.range(500000L).selectExpr(
        "CAST(0 AS BIGINT) AS dst", "id AS src",
        "id * 1048576 AS pk",
        "concat('anchor text for hub from ', CAST(id AS STRING)) AS anchor")
      val bg = spark.range(1000000L).selectExpr(
        "1 + id % 100000 AS dst", "id AS src",
        "id * 1048576 AS pk",
        "concat('plain anchor ', CAST(id AS STRING)) AS anchor")
      val links = Tables.stage(hub.unionByName(bg))
      val minkt = udaf(new Ranking.MinKTagged(20),
        org.apache.spark.sql.Encoders.product[Ranking.Tagged])
      warmTimed("anchor profile, collect_list+sort+slice (hub 500k)")(
        links.groupBy(col("dst"))
          .agg(expr("""array_join(transform(
            |  slice(sort_array(collect_list(struct(src, pk, anchor))), 1, 20),
            |  e -> e.anchor), ' | ')""".stripMargin).as("anchors"))
          .write.format("noop").mode("overwrite").save())
      warmTimed("anchor profile, MinKTagged(20) (hub 500k)")(
        links.groupBy(col("dst"))
          .agg(minkt(col("pk"), col("anchor")).as("__mk"))
          .select(col("dst"),
            expr("array_join(transform(__mk.items, e -> e.s), ' | ')"))
          .write.format("noop").mode("overwrite").save())
      // equality on the hub row — the bounded form must change nothing.
      val a = links.groupBy(col("dst"))
        .agg(expr("""array_join(transform(
          |  slice(sort_array(collect_list(struct(src, pk, anchor))), 1, 20),
          |  e -> e.anchor), ' | ')""".stripMargin).as("x"))
        .filter(col("dst") === 0L).head().getString(1)
      val b = links.groupBy(col("dst"))
        .agg(minkt(col("pk"), col("anchor")).as("__mk"))
        .filter(col("dst") === 0L)
        .select(expr("array_join(transform(__mk.items, e -> e.s), ' | ')"))
        .head().getString(0)
      println(s"[probe] hub profiles equal: ${a == b}")
    }

    // ---- 2. link-chain replica stress at sf0.1 ----
    val d = "/root/testdata/sf0.1"
    val base = Tables.documents(spark, d).select(col("doc_id"))
    val nBase = base.count()
    val stress = Tables.fanOut(Tables.stage(base.unionByName(
      base.filter(col("doc_id") < nBase / 10)
        .crossJoin(spark.range(1, 20).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + lit(1000000L) * col("rep"))
        .drop("rep"))))
    println(s"[probe] base=$nBase stress=${stress.count()} docs")

    def pages(src: org.apache.spark.sql.DataFrame) = src
      .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
      .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
      .withColumn("url", expr(
        """concat('https://www.site', CAST(doc_id % 7 AS STRING),
          |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
      .withColumn("__html", expr(
        """concat('<p>read <a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
          |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=feed">one</a> and ',
          |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
          |'.com/d/', CAST(__t2 AS STRING), '#sec">two</a>',
          |' plus <a href="https://other.example.org/offsite">ext</a></p>')""".stripMargin))

    def resolveEdges(src: org.apache.spark.sql.DataFrame) = {
      val p = pages(src)
      val lc = Web.withCanonicalUrl(
        Html.extractLinks(p, "doc_id", "__html"), "href", "__c")
        .select(col("doc_id").as("src"), col("__c").as("canon"))
      val pc = Web.withCanonicalUrl(
        p.select(col("doc_id"), col("url")), "url", "__c")
        .select(col("doc_id").as("dst"), col("__c").as("canon"))
      lc.join(pc, "canon").select(col("src"), col("dst"))
    }
    warmTimed("extract+canon+resolve 1x")(
      resolveEdges(Tables.fanOut(base))
        .write.format("noop").mode("overwrite").save())
    warmTimed("extract+canon+resolve 20%x20")(
      resolveEdges(stress).write.format("noop").mode("overwrite").save())

    // ---- 3. x_linkgraph_rank wall decomposition (cumulative) ----
    {
      def run(upTo: Int): Double = {
        val t0 = System.nanoTime()
        val edges = resolveEdges(Tables.fanOut(
          Tables.documents(spark, d).select(col("doc_id"))))
        if (upTo >= 2) {
          graft.operators.Graph.pageRankDirected(
            Tables.documents(spark, d), "doc_id", edges, "src", "dst",
            iterations = 3)
            .write.format("noop").mode("overwrite").save()
        } else edges.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      for ((label, k) <- Seq("edges only" -> 1, "+rank3 (full)" -> 2)) {
        run(k) // warmup
        println(f"[linkgraph] $label: ${run(k)}%.2f s cumulative")
      }
    }
    spark.stop()
  }
}
