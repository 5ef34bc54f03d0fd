package graft

/** Whole-registry plan audit: no query may plan an unexpected cartesian
  * product, and every query must keep its scan columnar (parquet) —
  * the "would this survive 100×" smoke test, automated. */
class PlanSanitySpec extends SparkSpec {

  // pair-generators that intentionally cross small/bounded sides:
  //  - q_join_cross: 5×5 regions by design
  //  - x_dedup_embedding: all-pairs oracle baseline (LSH is the scale path)
  //  - x_ann_brute_topk: broadcast query set × corpus (BroadcastNestedLoop)
  //  - q_subquery_scalar: broadcast 1-row aggregate
  private val allowedCartesian =
    Set("q_join_cross", "x_dedup_embedding", "x_ann_brute_topk", "q_subquery_scalar")

  test("no unexpected CartesianProduct in any registered plan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      assert(!cartesian || allowedCartesian.contains(q.name),
        s"${q.name} plans a CartesianProduct:\n${plan.take(1500)}")
    }
  }

  test("every query reads via the columnar parquet scan") {
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      // Queries that stage an intermediate relation (Tables.stage =
      // localCheckpoint) truncate lineage: the visible plan reads the
      // checkpointed RDD and the parquet scan lives in the producing job.
      // "Scan ExistingRDD" + the staging marker is the expected shape there.
      val scansParquet =
        plan.contains("FileScan parquet") || plan.contains("Scan parquet")
      val readsStagedRelation = plan.contains("Scan ExistingRDD")
      assert(scansParquet || readsStagedRelation,
        s"${q.name} does not scan parquet:\n${plan.take(800)}")
    }
  }
}
