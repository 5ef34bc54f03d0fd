package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaRecord, Media, TypedAggregators}

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

  test("resize performs real nearest-neighbor resampling; undecodable passes through") {
    import spark.implicits._
    // 4×4 image of four 2×2 solid quadrants — nearest-neighbor to 2×2
    // must pick the top-left pixel of each quadrant exactly.
    val quad = Media.encodePng(4, 4, (x, y) =>
      (if (y < 2) (if (x < 2) 0xff0000 else 0x00ff00)
       else (if (x < 2) 0x0000ff else 0x102030)))
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "png", quad),
      MediaRecord(2L, "bin", "not an image".getBytes("UTF-8"))))
    val out = Media.resize(ds, 2, 2).collect().sortBy(_.id)
    val p = Media.decodePixels(out(0).payload).get
    assert((p.width, p.height) == (2, 2))
    assert(p.argb.map(_ & 0xffffff).toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030))
    // deterministic: identical bytes on re-run (exact integer sampling).
    val again = Media.resize(ds, 2, 2).collect().sortBy(_.id)
    assert(out(0).payload.toSeq == again(0).payload.toSeq)
    // the quarantine route: undecodable payloads are passed through.
    assert(out(1).payload.toSeq == "not an image".getBytes("UTF-8").toSeq)
  }
}
