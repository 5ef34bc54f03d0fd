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
    * threshold, silently shifting every percentile upward.
    *
    * DOMAIN CONTRACT: the histogram bounds the window partition by the
    * number of DISTINCT values per group. For a near-continuous domain
    * (timestamps in nanos, raw doubles — distinct ≈ rows) that bound is
    * vacuous and the low-cardinality-group window skew returns; use
    * [[groupPercentilesDiscBucketed]] there — same exact answer, partition
    * sizes bounded by the bucket count / per-bucket distincts instead. */
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

  /** [[groupPercentilesDisc]] for NEAR-CONTINUOUS domains (distinct values
    * ≈ rows, where the one-level histogram degenerates back into
    * whole-group window skew): the same exact discrete percentile via a
    * two-level histogram.
    *
    *   1. per-group (min, max, n) — one tiny broadcast aggregate;
    *   2. COARSE pass: rows map monotonically onto `buckets` equal-width
    *      buckets; groupBy(group, bucket).count shuffles ≤ `buckets` rows
    *      per group, and the cumulative window partition is ≤ `buckets`
    *      rows regardless of the value domain;
    *   3. per (group, percentile): the TARGET bucket where the
    *      ceil(p·n)-th value lands + the exact row count before it — a
    *      tiny broadcast relation;
    *   4. REFINE pass: only rows INSIDE a target bucket (≈ n/buckets of
    *      the group under any non-degenerate mass distribution) build the
    *      exact per-value histogram; its window partition is the distinct
    *      values of ONE bucket.
    *
    * Exactness does not depend on the bucketing: bucket assignment only
    * PARTITIONS the ordered domain (floor of a monotone map is monotone —
    * FP rounding in the width division cannot reorder values), and the
    * coarse cumulative count gives the exact number of rows preceding the
    * target bucket. Both passes are map-side partial aggregations; the
    * input is scanned twice (the price of not shipping whole groups to
    * single reducers).
    *
    * Degenerate mass (a group's whole weight inside ONE bucket width —
    * e.g. a constant plus FP dust next to an outlier that stretches the
    * domain) is handled AUTOMATICALLY: any percentile whose target bucket
    * holds more than `refineBound` rows gets one RE-BUCKETING level inside
    * that bucket (same monotone-map argument, bounds recomputed from the
    * bucket's own min/max), so no refinement window ever runs over a
    * whole group. The oversized-bucket rows are staged once (they feed
    * the re-bucket stats, the level-2 coarse pass, and the final refine),
    * costing one extra input scan ONLY when recursion triggers. The
    * per-(group, percentile) target relation is collected to the driver to
    * route easy/hard refinement — ≤ |groups|·|ps| rows, bounded by this
    * operator's low-cardinality-group domain contract (same documented
    * by-contract-tiny collect as the ANN centroid literal). */
  def groupPercentilesDiscBucketed(df: DataFrame, groupCol: String, valCol: String,
                                   ps: Seq[(String, Double)],
                                   buckets: Int = 4096,
                                   refineBound: Long = 1L << 20): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 }, ps.toString)
    require(buckets > 1, s"buckets=$buckets")
    val spark = df.sparkSession
    val base = df.filter(col(valCol).isNotNull)
    // the tiny per-group stats relation is staged: `bucketed` (its only
    // direct consumer) is itself consumed by BOTH the coarse and refine
    // passes, and each would otherwise re-run the stats aggregate's full
    // input scan — 4 scans instead of the 3-scan (stats+coarse+refine)
    // minimum.
    val stats = graft.sources.Tables.stage(base.groupBy(col(groupCol))
      .agg(min(col(valCol)).as("__lo"), max(col(valCol)).as("__hi")))
    // null-safe group equality (<=>): a NULL group key is a group like any
    // other to groupBy, and the one-level histogram path returns a row for
    // it — plain `===` joins here would silently drop those rows and make
    // the two "same exact answer" paths diverge on null keys.
    val bucketed = base.as("b")
      .join(broadcast(stats).as("s"), col(s"b.$groupCol") <=> col(s"s.$groupCol"))
      .select(col("b.*"), col("s.__lo"), col("s.__hi"))
      .withColumn("__b",
        when(col("__lo") === col("__hi"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col(valCol) - col("__lo")).cast("double") /
              ((col("__hi") - col("__lo")).cast("double") / buckets)).cast("int"))))
    val coarse = bucketed.groupBy(col(groupCol), col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum",
        sum(col("__c")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
    import spark.implicits._
    val psDf = ps.toDF("__label", "__p")
    // per (group, percentile): k = ceil(p·n), its bucket + that bucket's
    // row count (min over the (bucket, count) struct = first bucket whose
    // cumulative reaches k, carrying its own count), rows before it.
    val targets = coarse.crossJoin(broadcast(psDf))
      .withColumn("__k", ceil(col("__n") * col("__p")).cast("long"))
      .groupBy(col(groupCol), col("__label"))
      .agg(
        min(when(col("__cum") >= col("__k"), struct(col("__b"), col("__c")))).as("__t"),
        coalesce(max(when(col("__cum") < col("__k"), col("__cum"))), lit(0L))
          .as("__prior"),
        first(col("__k")).as("__k"))
      .select(col(groupCol), col("__label"), col("__t.__b").as("__tb"),
        col("__t.__c").as("__tc"), col("__prior"), col("__k"))
    // by-contract-tiny collect (see scaladoc): route each (group, label)
    // to direct refinement or the one-level re-bucketing.
    val targetRows = targets.collect()
    val spark2 = spark
    def literal(rows: Array[org.apache.spark.sql.Row]): DataFrame =
      spark2.createDataFrame(java.util.Arrays.asList(rows: _*), targets.schema)
    val tcIdx = targets.schema.fieldIndex("__tc")
    val (hardRowsArr, easyRowsArr) = targetRows.partition(_.getLong(tcIdx) > refineBound)

    // the exact value-histogram refinement, partitioned by (group, label):
    // `rows` carries (groupCol, __label, __prior, __k, __v).
    def refine(rows: DataFrame): DataFrame = rows
      .groupBy(col(groupCol), col("__label"), col("__prior"), col("__k"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum",
        sum(col("__c")).over(Window.partitionBy(col(groupCol), col("__label"))
          .orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__prior") + col("__cum") >= col("__k"))
      .groupBy(col(groupCol), col("__label"))
      .agg(min(col("__v")).as("__v"))

    def targetBucketRows(t: DataFrame): DataFrame = bucketed.as("r")
      .join(broadcast(t).as("t"),
        col(s"r.$groupCol") <=> col(s"t.$groupCol") && col("r.__b") === col("t.__tb"))
      .select(col(s"r.$groupCol").as(groupCol), col("t.__label").as("__label"),
        col("t.__prior").as("__prior"), col("t.__k").as("__k"),
        col(s"r.$valCol").as("__v"))

    val easy = refine(targetBucketRows(literal(easyRowsArr)))
    val thresholds = if (hardRowsArr.isEmpty) easy else {
      // ONE re-bucketing level inside each oversized target bucket: staged
      // once (feeds its own stats, the level-2 coarse pass, and the final
      // refine), bounds recomputed from the bucket's own min/max.
      val hardRows = graft.sources.Tables.stage(
        targetBucketRows(literal(hardRowsArr)))
      val hstats = hardRows.groupBy(col(groupCol), col("__label"))
        .agg(min(col("__v")).as("__lo2"), max(col("__v")).as("__hi2"))
      val hb = hardRows.as("h")
        .join(broadcast(hstats).as("s"),
          col(s"h.$groupCol") <=> col(s"s.$groupCol") &&
            col("h.__label") === col("s.__label"))
        .select(col(s"h.$groupCol").as(groupCol), col("h.__label").as("__label"),
          col("h.__prior").as("__prior"), col("h.__k").as("__k"),
          col("h.__v").as("__v"), col("s.__lo2").as("__lo2"), col("s.__hi2").as("__hi2"))
        .withColumn("__b2",
          when(col("__lo2") === col("__hi2"), lit(0))
            .otherwise(least(lit(buckets - 1),
              floor((col("__v") - col("__lo2")).cast("double") /
                ((col("__hi2") - col("__lo2")).cast("double") / buckets)).cast("int"))))
      val coarse2 = hb
        .groupBy(col(groupCol), col("__label"), col("__b2"))
        .agg(count(lit(1)).as("__c2"), first(col("__prior")).as("__prior"),
          first(col("__k")).as("__k"))
        .withColumn("__cum2",
          sum(col("__c2")).over(Window.partitionBy(col(groupCol), col("__label"))
            .orderBy(col("__b2"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val targets2 = coarse2
        .groupBy(col(groupCol), col("__label"))
        .agg(
          min(when(col("__prior") + col("__cum2") >= col("__k"), col("__b2"))).as("__tb2"),
          (first(col("__prior")) + coalesce(
            max(when(col("__prior") + col("__cum2") < col("__k"), col("__cum2"))),
            lit(0L))).as("__prior2"),
          first(col("__k")).as("__k"))
      val hard = refine(hb.as("r")
        .join(broadcast(targets2).as("t"),
          col(s"r.$groupCol") <=> col(s"t.$groupCol") &&
            col("r.__label") === col("t.__label") && col("r.__b2") === col("t.__tb2"))
        .select(col(s"r.$groupCol").as(groupCol), col("r.__label").as("__label"),
          col("t.__prior2").as("__prior"), col("t.__k").as("__k"),
          col("r.__v").as("__v")))
      easy.unionByName(hard)
    }
    val aggs: Seq[Column] = ps.map { case (label, _) =>
      min(when(col("__label") === label, col("__v"))).as(label)
    }
    thresholds.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
