package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaRecord, MediaStub, TypedAggregators}

class TypedAggregatorSpec extends SparkSpec {

  test("MeanStd aggregator matches built-in avg/stddev_pop, incl. in window aggs") {
    val meanStd = udaf(TypedAggregators.MeanStd)
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val got = ev.groupBy(col("event_type"))
      .agg(meanStd(col("value")).as("ms"),
        avg(col("value")).as("m"), stddev_pop(col("value")).as("s"))
      .select(col("event_type"), col("ms.mean"), col("ms.std"), col("m"), col("s"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9, r)
      assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 1e-9, r)
    }
    // and the plan keeps a partial (map-side) aggregation stage.
    val plan = ev.groupBy(col("event_type")).agg(meanStd(col("value")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan.take(1500))
  }

  test("resizeStub yields the target payload budget deterministically") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "jpeg", "payload-one".getBytes("UTF-8")),
      MediaRecord(2L, "jpeg", "payload-two".getBytes("UTF-8"))))
    val out = MediaStub.resizeStub(ds, 64, 64).collect().sortBy(_.id)
    assert(out.forall(_.payload.length == 64 * 64 / 64))
    val again = MediaStub.resizeStub(ds, 64, 64).collect().sortBy(_.id)
    assert(out(0).payload.toSeq == again(0).payload.toSeq)
  }
}
