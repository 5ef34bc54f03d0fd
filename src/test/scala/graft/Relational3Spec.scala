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
}
