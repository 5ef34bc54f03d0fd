package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join building block for the
  * 100 TB design: writing both sides of a recurring join bucketed by the
  * join key lets Spark plan a SortMergeJoin with NO Exchange on either
  * side (the shuffle is paid once at write time, then amortized over
  * every subsequent join/aggregation on that key).
  *
  * Uses `bucketBy` + `saveAsTable` (bucketing metadata lives in the
  * session catalog). `BucketingSpec` proves the exchange elimination on
  * the lineitem⋈orders join.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (replacing any
    * previous table AND its location — overwrite alone refuses to reuse a
    * leftover managed-table directory). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (warehouse.getScheme == null) warehouse.toString else warehouse.getPath,
      table)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
