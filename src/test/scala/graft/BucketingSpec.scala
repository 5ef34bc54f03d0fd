package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Proves the co-located-join claim from the scale design: joining two
  * tables bucketed on the join key plans with NO Exchange (shuffle) on
  * either side. */
class BucketingSpec extends SparkSpec {

  test("join of bucket-aligned tables has no Exchange on either side") {
    val d = sf("sf0.001")
    Bucketing.writeBucketed(
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 8)

    // hint away the broadcast (these test tables are tiny); at scale the
    // planner picks SortMergeJoin on its own and bucketing removes both
    // exchanges.
    val joined = Bucketing.table(spark, "orders_b")
      .hint("merge")
      .join(Bucketing.table(spark, "lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
    assert(joined.count() > 0)

    // and the same join on the raw (un-bucketed) tables DOES shuffle.
    val raw = Tables.orders(spark, d).select("o_orderkey", "o_totalprice")
      .hint("merge")
      .join(Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert(rawPlan.contains("Exchange hashpartitioning"), rawPlan.take(3000))
  }
}
