package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Curation, Dedup, Multimodal, Parity, Pipeline, Q, Quality, Relational, Relational2, Relational3, Search, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extension surface) is declared here as a named query; `oracleSql` carries
  * the DuckDB-equivalent SQL the driver hash-checks at sf0.01.
  */
object SparkEntry {

  /** All registered queries, one per operator (SURVEY.md §2 + extensions). */
  def registry: Seq[Q] =
    Parity.all ++ Relational.all ++ Relational2.all ++ Relational3.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      Pipeline.all ++ Curation.all ++ Search.all ++ Quality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q1_agg").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** Queries timed by [[Bench]]. */
  def headlines: Seq[Q] = registry.filter(_.headline)
}
