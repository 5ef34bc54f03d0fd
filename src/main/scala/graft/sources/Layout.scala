package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Output data layout for scan efficiency at 100 TB — the write-side
  * companion to [[Bucketing]] (which co-locates JOINS, while this
  * accelerates predicate SCANS).
  *
  * `repartitionByRange` samples the key distribution and assigns each
  * output task a contiguous, non-overlapping key range;
  * `sortWithinPartitions` orders rows inside each file. Every parquet
  * file (and row group) then covers a narrow key band, so any downstream
  * scan with a range/equality predicate on the layout key skips whole
  * files via the parquet min/max zone maps — the scan cost becomes
  * proportional to the selected range, not the table size. This is the
  * standard layout for time-partitioned event tables and id-ranged
  * corpora; `LayoutSpec` asserts the written ranges are genuinely
  * disjoint (the property pruning depends on).
  */
object Layout {

  /** Write `df` as range-sorted parquet on `keys` into `shards` files.
    * `shards` is the output parallelism — set it to the cluster width ×
    * a small factor at scale (the oracle-free analogue of
    * Curation.packSequences' shard parameter). */
  def writeSorted(df: DataFrame, path: String, shards: Int,
                  keys: String*): Unit = {
    require(keys.nonEmpty, "at least one layout key")
    df.repartitionByRange(shards, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Read back a sorted layout. Plain parquet — the layout is a physical
    * property, not a format change; pushed filters prune files/row groups
    * via zone maps automatically. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
