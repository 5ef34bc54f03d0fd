package graft

/** Plan-shape assertions for the event/time-series corpus (Relational3):
  * each query's scale story is a claim about exchanges, and these pin it. */
class Relational3Spec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  private def hashExchanges(p: String): Int =
    p.linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("sessionize: one hash exchange serves lag, running sum, and the agg") {
    val p = plan("q_sessionize")
    assert(hashExchanges(p) == 1, s"expected 1 hash exchange:\n$p")
  }

  test("keep-latest dedup plans a window filter, not a join") {
    val p = plan("q_dedup_latest")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(hashExchanges(p) == 1, s"expected 1 hash exchange:\n$p")
  }

  test("correlated subquery decorrelates to a window agg (no join, one exchange)") {
    val p = plan("q_correlated_subquery")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(hashExchanges(p) == 1, s"expected 1 hash exchange:\n$p")
  }

  test("gap-fill joins the generated hour dimension by broadcast") {
    val p = plan("q_resample_gapfill")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"hour dimension not broadcast:\n$p")
  }

  test("sliding window aggregates with a map-side partial before the shuffle") {
    val p = plan("q_window_sliding")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"no partial aggregate:\n$p")
  }

  test("SCD2 and RANGE frame: one hash exchange each (single user_id shuffle)") {
    Seq("q_scd2", "q_window_range_frame").foreach { name =>
      val p = plan(name)
      assert(hashExchanges(p) == 1, s"$name expected 1 hash exchange:\n$p")
      assert(!p.contains("Join"), s"$name unexpected join:\n$p")
    }
  }

  test("funnel: every stage prunes with a pushed event_type filter") {
    val p = plan("q_funnel")
    // three stage scans, each with its event_type pushed to the reader.
    val pushed = p.linesIterator.count(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(event_type,"))
    assert(pushed >= 3, s"expected 3 pushed event_type filters ($pushed):\n${p.take(2000)}")
  }

  test("packing shuffles once on the shard key, then aggregates co-partitioned") {
    val p = plan("x_pack_sequences")
    // window on shard + groupBy (shard, bin): the groupBy reuses the
    // window's partitioning — one hash exchange before the final sort.
    val nonSortExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(nonSortExchanges == 1, s"expected 1 hash exchange:\n$p")
  }

  test("stratified sampling is two-phase aggregation, not a rank window") {
    val p = plan("x_sample_stratified")
    assert(!p.contains("Window"), s"rank window found:\n$p")
    assert(p.contains("partial_"), s"no map-side partial min-k:\n$p")
  }

  test("retention cohort matches a hand-computed matrix; no raw-event shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // users: 1 starts week 0, active 0/1/3; 2 starts week 1, active 1/2;
    // 3 starts week 0, active 0 only (plus a same-week duplicate event).
    val wk = 604800L
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 0L), (3L, 0L)).map { case (u, w) =>
      (u, new java.sql.Timestamp(w * wk * 1000L + 1000L))
    }
    rows.toDF("user_id", "ts").createOrReplaceTempView("__ret_events")
    val got = spark.table("__ret_events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 604800L").as("week"))
      .groupBy(col("user_id")).agg(collect_set(col("week")).as("__weeks"))
      .select(explode(col("__weeks")).as("week"),
        array_min(col("__weeks")).as("cohort"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L),  // users 1 and 3 in their first week
      (0L, 1L, 1L), (0L, 3L, 1L),  // user 1 retained at +1 and +3
      (1L, 0L, 1L), (1L, 1L, 1L)), // user 2's cohort
      s"retention matrix: $got")
    // plan claim: raw events cross no shuffle (set-aggregated per user
    // map-side first); two hash exchanges total (user agg + final agg).
    val p = plan("q_retention_cohort")
    assert(hashExchanges(p) == 2, s"expected 2 hash exchanges:\n$p")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }
}
