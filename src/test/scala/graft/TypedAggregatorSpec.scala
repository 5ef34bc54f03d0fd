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

  test("FrequentItems: Misra-Gries bounds hold under arbitrary partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    // skewed synthetic stream: two heavy hitters over a long cold tail.
    val stream: Seq[String] =
      Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
        (0 until 250).flatMap(i => Seq(s"cold_$i", s"cold_$i")) // 500 items
    val n = stream.length                   // 920
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cap = 16
    val slack = n / (cap + 1)               // 54
    val agg = udaf(new TypedAggregators.FrequentItems(cap), Encoders.STRING)
    for (parts <- Seq(1, 3, 32)) {
      // deterministic interleaving varies with the partitioning → counter
      // values may differ; the GUARANTEES must not.
      val out = stream.toDF("w").repartition(parts)
        .agg(agg(col("w")).as("fi"))
        .select(explode(col("fi.items")).as("x"))
        .select(col("x.item"), col("x.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= cap, s"parts=$parts: ${out.size} counters")
      out.foreach { case (k, est) =>
        val t = truth(k)
        assert(est <= t && t <= est + slack,
          s"parts=$parts: $k est=$est true=$t slack=$slack")
      }
      // every item above the frequency threshold is reported.
      truth.filter(_._2 > slack).keys.foreach { k =>
        assert(out.contains(k), s"parts=$parts: heavy hitter $k missing")
      }
    }
  }

  test("QuantileSketch: rank-error and memory bounds hold under any partitioning; weight ≡ n") {
    import spark.implicits._
    // a hostile-ish distribution for a sketch: half clustered tightly,
    // half spread over a long tail — and shuffled so insertion order is
    // not sorted.
    val rnd = new scala.util.Random(42)
    val values: Seq[Double] =
      rnd.shuffle(Seq.tabulate(60000)(i =>
        if (i % 2 == 0) 1000.0 + (i % 97) * 0.25 else i.toDouble * 7.3))
    val n = values.size
    val sorted = values.sorted
    def exactRank(v: Double): Long = sorted.count(_ <= v).toLong
    val k = 200
    val levels = (math.log(n.toDouble / k) / math.log(2.0)).ceil.toInt + 2
    // the deterministic compactor bound: each level-i compaction shifts
    // any rank by ≤ 2^i; ≤ n/(k·2^i) compactions per level.
    val bound = (n.toLong * levels) / k
    val agg = udaf(new TypedAggregators.QuantileSketch(k),
      org.apache.spark.sql.Encoders.scalaDouble)
    for (parts <- Seq(1, 4, 32)) {
      val row = values.toDF("v").repartition(parts)
        .agg(agg(col("v")).as("s")).select(col("s.items"), col("s.n")).head()
      val items = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(row.getLong(1) == n.toLong)
      // weight conservation: Σ weights ≡ n exactly (even-compaction rule).
      assert(items.map(_._2).sum == n.toLong, s"parts=$parts")
      // memory: ≤ k live items per level (+1 cascade slack per level).
      assert(items.size <= k * (levels + 2),
        s"parts=$parts: ${items.size} summary items")
      // rank error at every decile.
      val summary = TypedAggregators.KllSummary(
        items.map { case (v, w) => TypedAggregators.KllItem(v, w) }, n.toLong)
      for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = summary.quantile(q)
        val err = math.abs(exactRank(est) - math.ceil(n * q).toLong)
        assert(err <= bound,
          s"parts=$parts q=$q: rank error $err > bound $bound (est=$est)")
      }
    }
  }

  test("kllSketchOrdered: frozen-input compaction trace matches the closed form (k=8, n=24)") {
    // The deterministic alternating-parity compactor is a pure function
    // of the insertion SEQUENCE — this pins the exact trace the
    // x_quantile_sketch oracle restates in closed form: with k = 8 and
    // 24 inserts, compactions fire at inserts 8 (offset 0), 16 (offset 1,
    // cascading level 1 → 2 at offset 0), and 24 (offset 0 again).
    val rnd = new scala.util.Random(99)
    val vs = rnd.shuffle((1 to 24).map(i => i * 137.0 + (i % 7))).toSeq
    val sm = TypedAggregators.kllSketchOrdered(vs, 8)
    def keep(xs: Seq[Double], offset: Int): Seq[Double] =
      xs.sorted.zipWithIndex.collect { case (v, i) if i % 2 == offset => v }
    val c1 = keep(vs.slice(0, 8), 0)    // compaction #1: parity0 false
    val c2 = keep(vs.slice(8, 16), 1)   // compaction #2: parity0 true
    val l2 = keep(c1 ++ c2, 0)          // cascade: parity1 false
    val l1 = keep(vs.slice(16, 24), 0)  // compaction #3: parity0 false again
    val expect = (l1.map(v => (v, 2L)) ++ l2.map(v => (v, 4L))).sortBy(identity)
    assert(sm.items.map(i => (i.v, i.w)) == expect)
    assert(sm.n == 24L && sm.items.map(_.w).sum == 24L)
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
