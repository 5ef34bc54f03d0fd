package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT discrete percentiles per group.
  *
  * The naive plan (rank window partitioned by the group key) ships every
  * row of the largest group to one reducer — fatal when the group key is
  * low-cardinality (5 order priorities, 5 languages) and the table is
  * 100 TB. This operator computes the same discrete percentile (the
  * ceil(p·n)-th smallest VALUE) from the (group, value) HISTOGRAM instead:
  *
  *   1. groupBy(group, value).count() — map-side partial counts; only one
  *      row per DISTINCT (group, value) pair shuffles, bounded by the
  *      value domain (prices in cents, doc lengths in chars), not the row
  *      count;
  *   2. a cumulative-count window over that histogram — partitions hold
  *      one row per distinct value, orders of magnitude smaller than the
  *      group itself;
  *   3. threshold(p) = MIN(value | cum ≥ ceil(p·n)) — a tiny final agg.
  *
  * Exactly equivalent to the rank-window spec (the k-th smallest value is
  * the smallest value whose ≤-cumulative count reaches k), bit-for-bit:
  * counts are integers and no interpolation happens, so any engine agrees.
  * Complements q_approx_quantile (mergeable sketch) as the EXACT scale
  * path for low-cardinality-group percentiles.
  */
object Quantiles {

  /** One row per group: (groupCol, p_<label> ...) discrete thresholds, one
    * column per requested percentile. `ps` maps column label -> p.
    * NULL values are excluded (standard SQL percentile semantics): they
    * would otherwise inflate n while never being returnable as a
    * threshold, silently shifting every percentile upward. */
  def groupPercentilesDisc(df: DataFrame, groupCol: String, valCol: String,
                           ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 }, ps.toString)
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol)).agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cum",
        sum(col("__c")).over(Window.partitionBy(col(groupCol))
          .orderBy(col(valCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
    val aggs: Seq[Column] = ps.map { case (label, p) =>
      min(when(col("__cum") >= ceil(col("__n") * p), col(valCol))).as(label)
    }
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
