package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 12): WHERE x_pipeline_modern's wall goes —
  * per-staging-point materialization times at sf0.1, then an id-set
  * staging variant (stage tiny doc_id sets for the survivor filters,
  * re-attach text from the staged `clean` at use sites) vs the current
  * full-relation staging.
  *
  * Prior recorded experiments (edit-distance hot cell, entity probe
  * block-attr scale law, frequency fold cost, pipeline staging,
  * incremental graph upkeep, new-operator wall, triangle wedge bound,
  * substring-span scale, span-index gate steady state, streaming gate
  * cost split, verify-join skew) live in git history of this file;
  * their numbers stand in README.
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
    import graft.sources.Tables
    import org.apache.spark.sql.DataFrame

    // ---- instrumented replica of x_pipeline_modern's body: time every
    // staging materialization and the final consume.
    def run(stageNames: Boolean): Unit = {
      val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def st(name: String)(df: DataFrame): DataFrame = {
        val (r, t) = timed(Tables.stage(df))
        // localCheckpoint(eager=false) is lazy — force it to attribute cost
        val (_, t2) = timed(r.write.format("noop").mode("overwrite").save())
        times += ((name, t + t2)); r
      }
      val docs = Tables.fanOut(graft.sources.Tables.documents(spark, d))
      val spans = graft.operators.TextDedup
        .repeatedSpans(docs, "doc_id", "text", k = 8)
      val spanSets = spans.groupBy(col("doc_id"))
        .agg(collect_list(struct(col("span_start").as("s"),
          col("span_end").as("e"))).as("sp"))
      val clean = st("clean")(docs
        .join(broadcast(spanSets), Seq("doc_id"), "left")
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("ctoks", expr(
          """IF(sp IS NULL, toks,
            |   filter(toks, (t, i) -> NOT exists(sp, z -> i >= z.s AND i <= z.e)))""".stripMargin))
        .filter(size(col("ctoks")) > 0)
        .select(col("doc_id"), col("source"),
          concat_ws(" ", col("ctoks")).as("text_clean"),
          size(col("ctoks")).cast("long").as("n_tokens_clean")))
      val scored = st("scored")(graft.operators.Ranking.qualityClassifier(clean,
        "doc_id", "text_clean",
        isPositive = col("source").isin("src0", "src1", "src2"))
        .select(col("doc_id"), col("score"), col("keep")))
      val kept1 = st("kept1")(clean.join(
        scored.filter(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi"))
      val sh = graft.operators.TextDedup.shingleRelation(
        kept1.select(col("doc_id"), col("text_clean")), "doc_id", "text_clean", n = 3)
      val pairs = graft.operators.TextDedup
        .minhashLshPairs(sh, k = 12, bands = 4, threshold = 0.5)
      val cc = graft.operators.Graph.connectedComponents(pairs, "da", "db")
      val members = kept1.select(col("doc_id"), col("n_tokens_clean"))
        .join(broadcast(cc), col("doc_id") === col("node"))
      val nonCanon = members
        .groupBy(col("component"))
        .agg(max(struct(col("n_tokens_clean"), (-col("doc_id")).as("nd"))).as("__m"),
          collect_list(col("doc_id")).as("ids"))
        .select(explode(expr("filter(ids, x -> x != -__m.nd)")).as("doc_id"))
      val kept2 = st("kept2")(kept1.join(broadcast(nonCanon), Seq("doc_id"), "left_anti"))
      val e = graft.sources.Tables.embeddings(spark, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val eSurv = e.join(kept2.select(col("doc_id")),
        col("id") === col("doc_id"), "left_semi")
      val sem = graft.operators.Ann.semanticDedup(
        corpus = eSurv, centroids = e.filter(col("id") < 8), threshold = 0.45)
      val kept3 = st("kept3")(kept2.join(
        sem.filter(col("kept") === 1L).select(col("vec_id")),
        col("doc_id") === col("vec_id"), "left_semi"))
      val per = st("per")(kept3.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens_clean")).as("n_tokens")))
      val rates = per
        .join(broadcast(per.agg(min(col("n_tokens")).as("min_tokens"))))
        .withColumn("th", expr(
          """CASE WHEN n_tokens = min_tokens THEN 'g'
            |     ELSE lower(lpad(hex(CAST(floor(sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) * 4294967296) AS BIGINT)), 8, '0')) END""".stripMargin))
      val kept4 = kept3
        .join(broadcast(rates.select(col("source"), col("th"))), "source")
        .filter(expr("substring(md5(CAST(doc_id AS STRING)), 1, 8) < th"))
      val counts = graft.operators.Subword.docBpeCounts(
        kept4.select(col("doc_id"), col("text_clean")), "doc_id", "text_clean",
        graft.queries.TextAnalysis.demoMerges)
      import org.apache.spark.sql.expressions.Window
      val w9 = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val out = counts
        .withColumn("shard", col("doc_id") % 8)
        .withColumn("cum", sum(col("n_bpe_tokens")).over(w9))
        .withColumn("bin", expr("(cum - n_bpe_tokens) div 512"))
        .join(scored.select(col("doc_id"), col("score")), Seq("doc_id"))
        .select(col("doc_id"), col("score"), col("n_words"),
          col("n_bpe_tokens"), col("shard"), col("bin"))
        .orderBy(col("doc_id"))
      val (_, tFinal) = timed(out.write.format("noop").mode("overwrite").save())
      times += (("final", tFinal))
      println(times.map { case (n, t) => f"$n=$t%.2f" }.mkString("| stages: ", " ", s" | total=${times.map(_._2).sum}%.2f s |"))
    }
    run(true); run(true); run(true)
    spark.stop()
  }
}
