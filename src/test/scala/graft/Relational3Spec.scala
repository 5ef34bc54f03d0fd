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
}
