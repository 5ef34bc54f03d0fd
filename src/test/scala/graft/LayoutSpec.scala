package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Range-sorted layout (Layout.scala): the written files must cover
  * DISJOINT key ranges — the physical property parquet zone-map pruning
  * depends on — and the plan must range-partition, not hash. */
class LayoutSpec extends SparkSpec {

  test("writeSorted produces disjoint per-file key ranges and prunes scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val o = Tables.orders(spark, sf("sf0.001")).select("o_orderkey", "o_totalprice")

    // the write plan range-partitions on the layout key.
    val planned = o.repartitionByRange(4, col("o_orderkey"))
    assert(planned.queryExecution.executedPlan.toString
      .contains("rangepartitioning"), "expected a range partitioning exchange")

    Layout.writeSorted(o, s"$dir/orders_sorted", shards = 4, "o_orderkey")

    // per-file min/max ranges are pairwise disjoint when ordered by min.
    val files = new java.io.File(s"$dir/orders_sorted").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 2, s"want multiple files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $hi > $lo (${ranges.toSeq})")
    }

    // a narrow range predicate on the layout key reaches the scan pushed
    // down — together with disjoint ranges, that is file-level pruning.
    val narrow = Layout.read(spark, s"$dir/orders_sorted")
      .filter(col("o_orderkey") < ranges.head._2)
    val scan = narrow.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey"),
      scan.take(1500))
    assert(narrow.count() > 0)
  }
}
