package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Stream

/** Specs for the streaming extension surface (beyond reference parity):
  * sliding/session windows, watermark-bounded dedup, keyed running state. */
class StreamExtensionsSpec extends SparkSpec {

  private def msg(json: String, tsMillis: Long, offset: Long): KMsg =
    KMsg("t", 0, offset, new Timestamp(tsMillis), null,
      if (json == null) null else json.getBytes("UTF-8"))

  private val schema = StructType(Seq(StructField("a", DoubleType)))

  test("sliding window: 4s window / 2s slide assigns rows to two windows") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      .slidingWindow("4 seconds", "2 seconds", "0 seconds",
        Seq(sum(col("value.a")).as("total")))
    val q = s.toMemory("sliding_t", outputMode = "update")
    ms.addData(msg("""{"a":1}""", 1000L, 0), msg("""{"a":2}""", 3000L, 1))
    q.processAllAvailable()
    val rows = spark.table("sliding_t")
      .select(col("metadata.window_start").cast("long"), col("value.total"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    // ts=1 → windows [-2,2),[0,4); ts=3 → [0,4),[2,6).
    assert(rows.toSeq == Seq((-2L, 1.0), (0L, 3.0), (2L, 2.0)))
    q.stop()
  }

  test("session window: rows within gap merge; a gap closes the session") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    // session windows only support append mode: sessions emit once the
    // watermark passes their end.
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      .sessionWindow("5 seconds", "0 seconds",
        Seq(count(lit(1)).as("n"), sum(col("value.a")).as("total")),
        keyed = Seq(col("metadata.topic").as("topic")))
    val q = s.toMemory("session_t", outputMode = "append")
    ms.addData(
      msg("""{"a":1}""", 1000L, 0), msg("""{"a":2}""", 3000L, 1),
      msg("""{"a":10}""", 60000L, 2))
    q.processAllAvailable()
    // close both sessions by pushing the watermark far ahead.
    ms.addData(msg("""{"a":0}""", 500000L, 3))
    q.processAllAvailable()
    val rows = spark.table("session_t")
      .select(col("value.n"), col("value.total")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._2)
    assert(rows.toSeq == Seq((2L, 3.0), (1L, 10.0)))
    q.stop()
  }

  test("dropDuplicates within watermark removes same-key re-deliveries") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      .dropDuplicates(Seq(col("metadata.offset")), "10 seconds")
    val q = s.toMemory("dedup_t")
    ms.addData(
      msg("""{"a":1}""", 1000L, 7), msg("""{"a":1}""", 1000L, 7),
      msg("""{"a":2}""", 2000L, 8))
    q.processAllAvailable()
    assert(spark.table("dedup_t").count() == 2)
    q.stop()
  }

  test("joinStatic enriches the stream from a broadcast dimension") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val schema = StructType(Seq(StructField("uid", IntegerType)))
    val dim = Seq((1, "alice"), (2, "bob")).toDF("uid_d", "name")
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      .joinStatic(dim, col("value.uid") === col("uid_d"))
    val q = s.toMemory("enrich_t")
    ms.addData(msg("""{"uid":1}""", 1000L, 0), msg("""{"uid":3}""", 2000L, 1))
    q.processAllAvailable()
    val rows = spark.table("enrich_t")
      .select(col("value.value.uid"), col("value.name")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "alice"))) // uid=3 has no dim row (inner)
    q.stop()
  }

  test("joinStream matches keys within the event-time bound") {
    import spark.implicits._
    val m1 = MemoryStream[KMsg]
    val m2 = MemoryStream[KMsg]
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val s = Stream.fromKafkaShaped(spark, m1.toDF(), schema)
      .joinStream(Stream.fromKafkaShaped(spark, m2.toDF(), schema),
        col("value.k"), col("value.k"), "10 seconds", "5 seconds")
    val q = s.toMemory("sjoin_t")
    m1.addData(msg("""{"k":1}""", 1000L, 0), msg("""{"k":2}""", 1000L, 1))
    // k=1 within 5s (match), k=2 at +30s (no match), k=9 unmatched key.
    m2.addData(msg("""{"k":1}""", 3000L, 0), msg("""{"k":2}""", 31000L, 1),
      msg("""{"k":9}""", 2000L, 2))
    q.processAllAvailable()
    m1.addData(msg("""{"k":7}""", 100000L, 2)) // advance both watermarks
    m2.addData(msg("""{"k":8}""", 100000L, 3))
    q.processAllAvailable()
    val rows = spark.table("sjoin_t")
      .select(col("value.left.k"), col("value.right.k")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 1)))
    q.stop()
  }

  test("joinStream left_outer emits unmatched left rows with null right after watermark") {
    import spark.implicits._
    val m1 = MemoryStream[KMsg]
    val m2 = MemoryStream[KMsg]
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val s = Stream.fromKafkaShaped(spark, m1.toDF(), schema)
      .joinStream(Stream.fromKafkaShaped(spark, m2.toDF(), schema),
        col("value.k"), col("value.k"), "10 seconds", "5 seconds",
        joinType = "left_outer")
    val q = s.toMemory("sjoin_lo")
    m1.addData(msg("""{"k":1}""", 1000L, 0), msg("""{"k":2}""", 1000L, 1))
    m2.addData(msg("""{"k":1}""", 3000L, 0)) // only k=1 matches
    q.processAllAvailable()
    // advance both watermarks far enough to prove k=2 can't match anymore.
    m1.addData(msg("""{"k":7}""", 100000L, 2))
    m2.addData(msg("""{"k":8}""", 100000L, 3))
    q.processAllAvailable()
    val rows = spark.table("sjoin_lo")
      .select(col("value.left.k"),
        col("value.right.k").as("rk"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toSet
    assert(rows.contains((1, Some(1))), rows)
    assert(rows.contains((2, None)), s"unmatched left row not emitted: $rows")
    q.stop()
  }

  test("runningCount keeps per-key state across micro-batches") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      .runningCount(col("value.a"))
    val q = s.toMemory("running_t", outputMode = "update")
    ms.addData(msg("""{"a":1}""", 1000L, 0), msg("""{"a":1}""", 2000L, 1))
    q.processAllAvailable()
    ms.addData(msg("""{"a":1}""", 3000L, 2), msg("""{"a":2}""", 4000L, 3))
    q.processAllAvailable()
    val last = spark.table("running_t")
      .groupBy(col("value.key")).agg(max(col("value.count")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(last == Map("1.0" -> 3L, "2.0" -> 1L))
    q.stop()
  }

  test("typed min-k aggregator runs inside a streaming window (deterministic sample)") {
    // the typed-Aggregator claim made for batch top-k/sampling holds in
    // Structured Streaming too: udaf(MinKByHash) as a windowed agg gives a
    // deterministic k-per-window sample with map-side partial buffers in
    // the state store — the streaming twin of x_sample_stratified.
    import spark.implicits._
    import graft.operators.Sampling.{HashedId, MinKByHash}
    val mink = udaf(new MinKByHash(2), org.apache.spark.sql.Encoders.product[HashedId])
    val ms = MemoryStream[KMsg]
    val idSchema = StructType(Seq(StructField("id", LongType)))
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), idSchema)
      .window("4 seconds", "0 seconds",
        Seq(mink(md5(col("value.id").cast("string")), col("value.id")).as("sample")))
    val q = s.toMemory("minkwin_t", outputMode = "update")
    ms.addData((0 until 6).map(i => msg(s"""{"id":$i}""", 1000L + i, i)): _*)
    q.processAllAvailable()
    val got = spark.table("minkwin_t")
      .select(expr("value.sample.items.id")).as[Seq[Long]].collect()
    assert(got.length == 1)
    // expected: the 2 ids with the smallest md5(id) among 0..5 — fixed.
    val expected = (0L until 6L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString))
      .take(2)
    assert(got.head.toSet == expected.toSet, s"got ${got.head}, want $expected")
    q.stop()
  }

  test("curation gates compose on streams: hash-sample + digest dedup") {
    // The batch curation pipeline's per-row gates are plain Column
    // predicates, so the SAME expressions run unchanged on a stream:
    // deterministic md5-gate sampling (graft.operators.Sampling semantics)
    // + exact-dedup on the content digest within the watermark.
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val txtSchema = StructType(Seq(StructField("id", IntegerType),
      StructField("text", StringType)))
    val threshold = graft.operators.Sampling.hexThreshold(0.5)
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), txtSchema)
      .filter(expr(s"substring(md5(CAST(value.id AS STRING)), 1, 8) < '$threshold'"))
      .dropDuplicates(Seq(md5(col("value.text"))), grace = "10 seconds",
        includeEventTime = false)
    val q = s.toMemory("cur_stream", outputMode = "append")
    val ids = 0 until 20
    ms.addData(ids.map(i =>
      msg(s"""{"id":$i,"text":"doc ${i % 10}"}""", 1000L + i, i)): _*)
    q.processAllAvailable()
    val got = spark.table("cur_stream").select(col("value.id")).as[Int].collect().toSet
    // expected: ids passing the 50% md5 gate, then first-arrival per text.
    def gate(i: Int): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.substring(0, 8) < threshold
    }
    val surviving = ids.filter(gate)
    val expected = surviving.groupBy(_ % 10).values.map(_.min).toSet
    assert(got == expected, s"got=$got expected=$expected")
    q.stop()
  }

  test("malformed JSON never kills the stream: null value row, droppable") {
    // divergence from the reference pinned here: its bare JSON.parse
    // throws on the first poison message and the consumer loop dies; we
    // surface a null-value row (metadata intact) and keep consuming —
    // or drop it at the source with dropMalformed.
    import spark.implicits._
    val schema = StructType(Seq(StructField("a", IntegerType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val q = s.toMemory("mal_t", outputMode = "append")
    ms.addData(msg("""{"a":1}""", 1000L, 0), msg("not json at all", 2000L, 1),
      msg("""{"a":3}""", 3000L, 2))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mal_t")
      .select(col("value.a"), col("metadata.offset")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1)))
      .sortBy(_._2)
    assert(rows.length == 3, s"stream dropped rows: ${rows.toSeq}")
    assert(rows.map(_._1).toSeq == Seq(Some(1), None, Some(3)), rows.toSeq)
    // a legitimately-empty JSON object is NOT malformed: it must survive
    // dropMalformed (null FIELDS, not a corrupt record).

    val ms2 = MemoryStream[KMsg]
    val s2 = Stream.fromKafkaShaped(spark, ms2.toDF(), schema, dropMalformed = true)
    val q2 = s2.toMemory("mal_drop_t", outputMode = "append")
    ms2.addData(msg("""{"a":1}""", 1000L, 0), msg("garbage", 2000L, 1),
      msg("{}", 3000L, 2))
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.table("mal_drop_t")
      .select(col("value.a"), col("metadata.offset")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1)))
      .sortBy(_._2)
    assert(kept.toSeq == Seq((Some(1), 0L), (None, 2L)), kept.toSeq)
  }

  test("fromRate: a live dependency-free source flows through the façade") {
    val s = Stream.fromRate(spark, rowsPerSecond = 100)
      .filter(col("value") % 2 === 0)
      .map(struct(col("value").as("v")))
    val q = s.toMemory("rate_t", outputMode = "append")
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table("rate_t").isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
    }
    q.stop()
    val vals = spark.table("rate_t").select(col("value.v")).collect().map(_.getLong(0))
    assert(vals.nonEmpty, "rate source produced no rows within 30s")
    assert(vals.forall(_ % 2 == 0), "filter not applied on rate stream")
    q.stop()
  }

  test("forEachBatch applies a batch MERGE per micro-batch (CDC-apply shape)") {
    import spark.implicits._
    val ms = MemoryStream[KMsg]
    val kvSchema = StructType(Seq(StructField("k", IntegerType),
      StructField("v", IntegerType)))
    // the "target table": upserted by key from each micro-batch.
    val state = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), kvSchema)
    val q = s.forEachBatch { (batch, id) =>
      seenBatches += id
      // last-writer-wins within the batch, keyed by offset order.
      batch.select(col("value.k"), col("value.v"), col("metadata.offset"))
        .orderBy(col("offset"))
        .collect()
        .foreach(r => state.put(r.getInt(0), r.getInt(1)))
    }
    ms.addData(msg("""{"k":1,"v":10}""", 1000L, 0), msg("""{"k":2,"v":20}""", 2000L, 1))
    q.processAllAvailable()
    ms.addData(msg("""{"k":1,"v":11}""", 3000L, 2), msg("""{"k":3,"v":30}""", 4000L, 3))
    q.processAllAvailable()
    assert(state.toMap == Map(1 -> 11, 2 -> 20, 3 -> 30), state)
    assert(seenBatches.distinct.size >= 2, seenBatches)
    q.stop()
  }
}
