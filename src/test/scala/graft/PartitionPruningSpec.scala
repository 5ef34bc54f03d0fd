package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Demonstrates partition pruning — the other half of the 100 TB scan
  * story next to column pruning and filter pushdown: a date-partitioned
  * layout lets a date predicate skip whole directories before any I/O. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + date filter prunes partitions in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf("sf0.001"))
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val days = spark.read.parquet(dir).select(countDistinct(col("day")))
      .collect()(0).getLong(0)
    assert(days > 3, s"need several day partitions, got $days")

    val pruned = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-02").cast("date"))
      .groupBy(col("event_type")).agg(count(lit(1)))
    val plan = pruned.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory skip),
    // not PushedFilters (row-group skip) nor a post-scan Filter.
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("day"), plan.take(2000))
    assert(pruned.count() > 0)
  }
}
