package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 14): validate `TextDedup.lshPlan`'s operating
  * curve against MEASURED banding recall/candidate rates. Corpus =
  * pairs constructed at EXACT Jaccard (shared token windows, disjoint
  * per-pair namespaces so cross-pair candidates are impossible):
  * 20,000 pairs at J = 0.75 and 20,000 at J = 0.25, banded at three
  * divisor geometries of a 24-hash signature, verify threshold 0 so
  * the output IS the candidate set. Also times each geometry's pair
  * join on the sf0.1 corpus shingles (the COST side of the planner's
  * recall-vs-candidates tradeoff). Results → README §LSH planner
  * validation; the 500-pair spec floor lives in TextDedupSpec.
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
    import graft.operators.TextDedup
    import graft.sources.Tables

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- controlled-Jaccard corpus: measured vs predicted curve ----
    val n = 20000L
    def half(ns: String, off: Long, idOff: Int, from: Int, to: Int) =
      spark.range(n).selectExpr(
        s"$off + id * 2 + $idOff AS id",
        s"""transform(sequence($from, $to),
           |  j -> concat('$ns', CAST(id AS STRING), ':', CAST(j AS STRING)))
           |  AS sh""".stripMargin)
    val sh = Tables.stage(
      half("p", 0L, 0, 0, 34).union(half("p", 0L, 1, 5, 39))      // J = 0.75
        .union(half("q", 10000000L, 0, 0, 34))
        .union(half("q", 10000000L, 1, 21, 55)))                  // J = 0.25
    println("[lshplan] geometry  predicted@0.75  measured@0.75  " +
      "predicted@0.25  measured@0.25")
    for ((b, r) <- Seq((4, 6), (6, 4), (8, 3))) {
      val out = TextDedup.minhashLshPairs(sh, k = 24, bands = b,
        threshold = 0.0).select(col("da")).as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect()
      val recall = out.count(_ < 10000000L).toDouble / n
      val distant = out.count(_ >= 10000000L).toDouble / n
      println(f"[lshplan] ${b}x$r      " +
        f"${TextDedup.lshCandidateProb(0.75, b, r)}%.4f          $recall%.4f         " +
        f"${TextDedup.lshCandidateProb(0.25, b, r)}%.4f          $distant%.4f")
    }

    // ---- cost side: candidate volume + wall on the sf0.1 corpus ----
    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d))
    val corpusSh = Tables.stage(
      TextDedup.shingleProjection(docs, "doc_id", "text", n = 3))
    for ((b, r) <- Seq((4, 6), (6, 4), (8, 3))) {
      def run() = TextDedup.minhashLshPairs(corpusSh, k = 24, bands = b,
        threshold = 0.5).count()
      run() // warmup
      val (pairs, t) = timed(run())
      println(f"[lshplan] sf0.1 ${b}x$r: verified pairs=$pairs wall=$t%.2f s")
    }

    // ---- replica-stress rehearsal, r14 newcomers (README convention:
    // first 10% of sf0.1 docs replicated 20× under fresh ids) ----
    def warmTimed(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = Tables.documents(spark, d)
    val nBase = base.count()
    val stress = Tables.fanOut(Tables.stage(base.unionByName(
      base.filter(col("doc_id") < nBase / 10)
        .crossJoin(spark.range(1, 20).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + lit(1000000L) * col("rep"))
        .drop("rep"))))
    println(s"[stress] base=$nBase stress=${stress.count()} docs")

    // html extraction (the crawl chrome over the text) — per-row map,
    // must scale with VOLUME only.
    def pages(src: org.apache.spark.sql.DataFrame) = src
      .withColumn("__t", expr("split(text, ' ')"))
      .withColumn("__html", expr(
        """concat('<html><head><title>Doc ', CAST(doc_id AS STRING),
          |'</title><script>var x = 1 < 2;</script></head><body>',
          |'<div id="nav"><a href="/">Home</a></div>',
          |'<p>', concat_ws(' ', slice(__t, 1, 5)),
          |' &amp; &#8217; &mdash;</p>',
          |'<p>', concat_ws(' ', slice(__t, 6, 100000)), '</p>',
          |'</body></html>')""".stripMargin))
    warmTimed("extractText 1x")(graft.operators.Html
      .extractText(pages(Tables.fanOut(base)), "doc_id", "__html")
      .write.format("noop").mode("overwrite").save())
    warmTimed("extractText 20%x20")(graft.operators.Html
      .extractText(pages(stress), "doc_id", "__html")
      .write.format("noop").mode("overwrite").save())
    warmTimed("extractTitle 20%x20")(graft.operators.Html
      .extractTitle(pages(stress), "doc_id", "__html")
      .write.format("noop").mode("overwrite").save())

    // 5-gram LM: replicas add gram FREQUENCY, not vocabulary — the
    // broadcast model must not grow.
    warmTimed("lm5_quality 1x")(graft.operators.Ranking
      .lmQualityScores(Tables.fanOut(base), "doc_id", "text", n = 5)
      .write.format("noop").mode("overwrite").save())
    warmTimed("lm5_quality 20%x20")(graft.operators.Ranking
      .lmQualityScores(stress, "doc_id", "text", n = 5)
      .write.format("noop").mode("overwrite").save())
    val v1 = graft.operators.Ranking
      .ngramFrequencies(Tables.fanOut(base), "doc_id", "text", 5)
      .select("ng").distinct().count()
    val v2 = graft.operators.Ranking
      .ngramFrequencies(stress, "doc_id", "text", 5)
      .select("ng").distinct().count()
    println(s"[stress] lm5 vocab 1x=$v1 20%x20=$v2 (must be equal)")

    // domain accounting: corpus-count build at 2.9× volume + the
    // per-batch probe+fold arithmetic a gate pays (1000-row batch).
    {
      val stageDir = java.nio.file.Files.createTempDirectory("graft-stress").toString
      spark.conf.set("graft.stage.dir", stageDir)
      def urls(src: org.apache.spark.sql.DataFrame) = src.select(col("doc_id"),
        concat(lit("https://www.site"), (col("doc_id") % 997).cast("string"),
          lit(".co.uk/d/"), col("doc_id").cast("string")).as("url"))
      val (st, tBuild) = timed(graft.streaming.DomainIngest
        .buildCounts(urls(stress), "doc_id", "url", cap = 200L))
      println(f"[stress] domain buildCounts 20%%x20: $tBuild%.2f s")
      val batch = urls(base.filter(col("doc_id") < 1000))
      val (_, tProbe) = timed {
        val bd = graft.streaming.DomainIngest.domains(batch, "doc_id", "url")
        bd.join(broadcast(st.counts.df), Seq("domain"), "left")
          .select(col("id"), coalesce(col("cnt"), lit(0L)).as("prior"))
          .write.format("noop").mode("overwrite").save()
        Tables.stage(st.counts.df
          .unionByName(bd.groupBy(col("domain"))
            .agg(count(lit(1)).cast("long").as("cnt")))
          .groupBy(col("domain")).agg(sum(col("cnt")).cast("long").as("cnt")))
      }
      println(f"[stress] domain probe+fold 1000-row batch: $tProbe%.2f s")
      spark.conf.unset("graft.stage.dir")
    }

    // ---- x_pipeline_crawl wall decomposition (cumulative prefixes of
    // the exact query chain at sf0.1; README §crawl decomposition) ----
    {
      import graft.operators.{Html, Ranking, Web}
      def run(upTo: Int): Double = {
        val basePages = Tables.documents(spark, d).select(col("doc_id"), col("text"))
        val prev = basePages.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__ptext"))
        val t0 = System.nanoTime()
        val pages = Tables.stage(Tables.fanOut(
          basePages.join(prev, Seq("doc_id"), "left")
            .withColumn("__page", expr(
              "IF(doc_id % 5 = 4 AND __ptext IS NOT NULL, __ptext, text)")))
          .withColumn("url", expr(
            """IF(doc_id % 10 = 0,
              |   concat('https://Seo.Farm.COM:443/p', CAST(doc_id AS STRING),
              |          '/?utm_source=x&id=', CAST(doc_id AS STRING)),
              |   concat('https://www.site', CAST(doc_id % 97 AS STRING),
              |          '.co.uk/d/', CAST(doc_id AS STRING)))""".stripMargin))
          .withColumn("__t", expr("split(__page, ' ')"))
          .withColumn("__html", expr(
            """concat('<html><head><title>Doc ', CAST(doc_id AS STRING),
              |'</title></head><body><p>', concat_ws(' ', slice(__t, 1, 5)),
              |'</p><p>', concat_ws(' ', slice(__t, 6, 100000)),
              |'</p></body></html>')""".stripMargin))
          .select(col("doc_id"), col("url"), col("__html")))
        if (upTo >= 2) {
          val kept = Tables.stage(Web.capPerDomain(
            pages.select(col("doc_id"), col("url")), "url", "doc_id", cap = 25))
          if (upTo >= 3) {
            val ext = Tables.stage(Html.extractText(
              pages.join(kept.select(col("doc_id")), Seq("doc_id")),
              "doc_id", "__html", 10, 34))
            if (upTo >= 4) {
              val k1 = ext.filter(col("n_kept") >= 2)
              val tf = Tables.stage(Ranking.bigramFrequencies(k1, "doc_id", "text"))
              val (lm, cx, tot) = Ranking.ngramLm(tf)
              val k2 = k1.join(Ranking.scoreAgainstLm(tf, lm, cx, tot)
                .filter(expr("cost_bits * 100 <= n_grams * 420"))
                .select(col("doc_id"), col("cost_bits"), col("n_grams")), "doc_id")
              val dg = Tables.stage(k2.withColumn("digest", md5(col("text")))
                .select(col("doc_id"), col("digest"), col("cost_bits"), col("n_grams")))
              val canon = dg.groupBy(col("digest")).agg(
                min(col("doc_id")).as("doc_id"),
                count(lit(1)).cast("long").as("n_copies"))
              dg.join(canon, Seq("digest", "doc_id")).join(kept, Seq("doc_id"))
                .write.format("noop").mode("overwrite").save()
            } else ext.write.format("noop").mode("overwrite").save()
          } else kept.write.format("noop").mode("overwrite").save()
        } else pages.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      for ((label, k) <- Seq("pages stage" -> 1, "+cap" -> 2, "+extract" -> 3,
        "+lm+dedup (full)" -> 4)) {
        run(k) // warmup
        println(f"[crawl] $label: ${run(k)}%.2f s cumulative")
      }
    }
    spark.stop()
  }
}
