package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // point-set probes on range-sorted state (Graph.stageSorted) need
      // the In filter pushed as points, not a min/max range — scattered
      // ball ids make the range fallback prune nothing.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "256")
      // sort-based shuffle writer everywhere — see Bench for the rationale.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    // headline bench queries + the non-headline heavy hitters worth
    // eyeballing after every change (staged dedup joins, iterative CC
    // feeders, the new ranking/line-dedup shapes).
    val extra = Set("x_dedup_incremental", "x_line_dedup", "x_tfidf_topk",
      "x_inverted_index", "x_quality_gate", "x_source_mix",
      "x_dedup_embedding_lsh", "x_media_pixels",
      "x_dedup_substring", "x_dedup_semantic", "x_knn_graph",
      "x_source_temperature", "x_decontaminate_spans",
      "x_dedup_semantic_incremental",
      "x_graph_triangles", "x_zorder", "x_split_assign", "x_sample_weighted",
      "x_source_jsonl",
      "x_graph_pagerank", "x_dedup_canonical", "x_importance_weights",
      "x_importance_incremental", "x_ann_pq", "x_source_csv",
      "q_retention_cohort",
      "x_heavy_hitters", "x_sketch_cms", "x_token_unigram",
      "x_dedup_edit", "x_dedup_edit_incremental",
      "q_recursive_cte", "q_lateral_topk",
      "x_graph_hits", "x_graph_walks", "x_linkgraph_incremental",
      "x_search_eval", "x_text_links")
    (SparkEntry.headlines ++
      SparkEntry.registry.filter(q => extra(q.name))).foreach { q =>
      val df = q.fn(spark, d)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val ops = plan.linesIterator
        .filter(l => l.matches("^\\(\\d+\\) .*"))
        .map(_.replaceAll("^\\(\\d+\\) ", "")).toSeq
      val exchanges = ops.count(_.startsWith("Exchange"))
      println(s"[plan] ${q.name} (exchanges=$exchanges): ${ops.mkString(" | ")}")
    }
    spark.stop()
  }
}
