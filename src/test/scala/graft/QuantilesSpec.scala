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

  test("bucketed two-level path: exact on a near-unique double domain") {
    // distinct ≈ rows — the domain where the one-level histogram
    // degenerates. 5000 near-unique doubles in 2 groups, irregular mass
    // (cube root skews values toward the top end).
    val rows = (0 until 5000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, math.cbrt(i.toDouble) * 1000.0 + i * 1e-7)
    }
    val df = rows.toDF("g", "v")
    val ps = Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99)
    val got = Quantiles.groupPercentilesDiscBucketed(df, "g", "v", ps, buckets = 64)
      .as[(String, Double, Double, Double)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      def kth(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
      g -> ((kth(0.1), kth(0.5), kth(0.99)))
    }
    assert(got == expected)
    // and it agrees with the one-level path (same discrete definition).
    val oneLevel = Quantiles.groupPercentilesDisc(df, "g", "v", ps)
      .as[(String, Double, Double, Double)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(got == oneLevel)
  }

  test("bucketed path: single-valued and duplicate-heavy groups survive") {
    // lo == hi (constant group) exercises the degenerate-width branch;
    // duplicates across bucket boundaries exercise exact prior counts.
    val df = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0),
      ("d", 1.0), ("d", 2.0), ("d", 2.0), ("d", 3.0), ("d", 10.0))
      .toDF("g", "v")
    val got = Quantiles.groupPercentilesDiscBucketed(df, "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9), buckets = 4)
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got == Map("c" -> ((7.0, 7.0)), "d" -> ((2.0, 10.0))))
  }

  test("auto-recursion: oversized target bucket re-buckets, never whole-group") {
    // group "e" is the documented degenerate case: 2000 near-constant
    // doubles (FP dust apart) plus one outlier that stretches the domain,
    // so the ENTIRE mass lands in level-1 bucket 0 (target-bucket count
    // 2000 > refineBound 100 → the one-level re-bucketing must engage and
    // split the dust by its own min/max). Group "f" stays on the easy
    // path in the same call — the union of both routes must be exact.
    val rows = (0 until 2000).map(i => ("e", 1e9 + i * 1e-4)) ++
      Seq(("e", 9e12)) ++ (0 until 100).map(i => ("f", i.toDouble))
    val df = rows.toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p99" -> 0.99)
    val got = Quantiles.groupPercentilesDiscBucketed(df, "g", "v", ps,
      buckets = 64, refineBound = 100)
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      def kth(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
      g -> ((kth(0.5), kth(0.99)))
    }
    assert(got == expected)
    // and ≡ the one-level histogram path (the exactness cross-check).
    val one = Quantiles.groupPercentilesDisc(df, "g", "v", ps)
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got == one)
  }

  test("NULL group keys: one-level and bucketed paths agree (null-safe joins)") {
    // groupBy treats NULL as a group; the bucketed path's equi-joins must
    // be null-safe (<=>) or the NULL group's rows silently vanish and the
    // two "same exact answer" paths diverge.
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 5.0), (None, 6.0), (None, 7.0), (None, 8.0))
      .toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    def toMap(r: Array[(Option[String], Double, Double)]) =
      r.map { case (k, a, b) => k -> ((a, b)) }.toMap
    val one = toMap(Quantiles.groupPercentilesDisc(df, "g", "v", ps)
      .as[(Option[String], Double, Double)].collect())
    val two = toMap(Quantiles.groupPercentilesDiscBucketed(df, "g", "v", ps, buckets = 4)
      .as[(Option[String], Double, Double)].collect())
    assert(one == Map(Some("a") -> ((2.0, 3.0)), None -> ((6.0, 8.0))))
    assert(two == one)
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
