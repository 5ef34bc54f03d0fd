package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: registers the corpus tables as temp views (plus the
  * graft native functions) so the whole engine is usable as plain
  * `spark.sql` — a surface the reference never had (SURVEY.md §2.3: "SQL /
  * parser / query language: none").
  *
  * Views are lazy metadata: nothing is scanned until a query runs, and
  * Catalyst sees straight through a view to the parquet relation, so
  * pushdown/pruning behave exactly as in the DataFrame API.
  */
object GraftCatalog {

  /** Register every corpus table under its TESTDATA.md name. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** One-call SQL: tables + native functions registered, then run. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    registerTables(spark, dir)
    spark.sql(query)
  }
}
