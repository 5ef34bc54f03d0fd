package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** Histogram-path exact discrete percentiles (Quantiles.scala): value
  * equivalence with the rank-window definition, duplicate-value handling,
  * and the scale claim (the window runs over the distinct-value histogram,
  * not the input rows). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches the ceil(p*n)-th smallest value, duplicates included") {
    // group a: values 1,2,2,3,10 (n=5): p50 -> k=3 -> 2; p90 -> k=5 -> 10.
    // group b: values 4,4 (n=2): p50 -> k=1 -> 4; p90 -> k=2 -> 4.
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("a", 3), ("a", 10),
      ("b", 4), ("b", 4)).toDF("g", "v")
    val got = Quantiles.groupPercentilesDisc(df, "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(String, Int, Int)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got == Map("a" -> ((2, 10)), "b" -> ((4, 4))))
  }

  test("agrees with the rank-window spec on real data (orders per priority)") {
    val o = graft.sources.Tables.orders(spark, sf("sf0.001"))
    val hist = Quantiles.groupPercentilesDisc(
      o, "o_orderpriority", "o_totalprice", Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val spec = o
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))))
      .filter(col("rn") === ceil(col("n") * 0.5) || col("rn") === ceil(col("n") * 0.9))
      .groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("p50"), max(col("o_totalprice")).as("p90"))
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(hist == spec)
  }

  test("the window input is the histogram, not the raw rows") {
    val o = graft.sources.Tables.orders(spark, sf("sf0.001"))
    val plan = Quantiles.groupPercentilesDisc(
      o, "o_orderpriority", "o_totalprice", Seq("p50" -> 0.5))
      .queryExecution.optimizedPlan
    // the Window node's child subtree must contain the histogram Aggregate.
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty,
        s"window runs over raw rows (no histogram Aggregate below it):\n$w")
    }
  }
}
