package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver's TPC-H-ish corpus
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst owns predicate
  * pushdown / column pruning — callers select/filter lazily and the scan
  * only reads the referenced columns (verified via `.explain` in specs).
  */
object Tables {
  import org.apache.spark.sql.functions._

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert to a
    * microsecond timestamp with integer division (`div`, not `/` — an
    * epoch-nanos value ~1.7e18 exceeds double's 2^53 integer range).
    * The driver's data has zero sub-microsecond part, so this is lossless
    * and matches DuckDB, which surfaces the column as µs TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a low-parallelism scan out to the cluster's width BEFORE heavy
    * per-row compute (hashing, signatures). Single-file/single-row-group
    * parquet yields one scan task no matter how many cores exist; hash-heavy
    * operators then run serially. The repartition is CONDITIONAL — if the
    * source already splits to ≥ default parallelism (any real 100 TB
    * table), it's a no-op and costs nothing; only starved scans pay one
    * small shuffle to unlock every core. (Same remedy as for gzip/csv
    * unsplittable sources.) */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Materialize an expensive intermediate relation ONCE before a self-join.
    *
    * Spark has no automatic subplan reuse across the two sides of a
    * self-join (each side re-executes the whole subtree — verified: zero
    * `ReusedExchange` nodes in the MinHash band-join plan), so a
    * signature/band relation built with per-row hashing would be computed
    * twice. `localCheckpoint(eager = false)` truncates lineage and caches
    * the partitions on first use — the single-job equivalent of writing the
    * relation to a staging table, which is exactly what the 100 TB pipeline
    * does between the signature pass and the band join (multi-TB
    * intermediates go to a parquet staging table; the semantics are the
    * same: compute once, join against the materialization). */
  def stage(df: DataFrame): DataFrame = df.localCheckpoint(false)
}
