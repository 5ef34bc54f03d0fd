package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextDedup
import graft.sources.Tables
import graft.streaming.{DedupIngest, Stream}

/** The production ingest loop end-to-end: a document stream deduplicated
  * per micro-batch against ONE persisted corpus LSH index
  * (graft.streaming.DedupIngest). Asserts the two load-bearing claims:
  *  1. the union of per-batch pairs equals the batch operator's output for
  *     the same documents (x_dedup_incremental's shape), and
  *  2. the corpus is staged EXACTLY once — no per-batch staging dirs, the
  *     index is scanned, not rebuilt, by every micro-batch. */
class StreamingDedupSpec extends SparkSpec {

  test("DedupIngest: micro-batch pairs match the batch operator; corpus staged once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)

      val index = DedupIngest.buildIndex(corpus, "doc_id", "text")
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      val afterBuild = stageDirs
      assert(afterBuild == 2, s"corpus index = shingles + band keys, got $afterBuild dirs")

      // the batch-mode truth for the SAME documents via the same reuse
      // overload (x_dedup_incremental's semantics).
      val expected = TextDedup.minhashLshPairsAgainstIndex(
          TextDedup.shingleProjection(fresh, "doc_id", "text", 3),
          index.shingled, index.bandKeys)
        .select(col("da"), col("db"), col("jaccard"))
        .as[(Long, Long, Double)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no near-dup pairs — test is vacuous")

      // stream the same 50 new docs in 3 micro-batches (JSON payloads).
      val payloads = fresh
        .select(to_json(struct(col("doc_id"), col("text"))).as("j")).as[String].collect()
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
      val batchIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = DedupIngest.start(s, index, "value.doc_id", "value.text") { (pairs, id) =>
        batchIds += id
        got ++= pairs.select(col("da"), col("db"), col("jaccard"))
          .as[(Long, Long, Double)].collect()
      }
      payloads.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1).foreach { case (_, grp) =>
        ms.addData(grp.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      q.stop()

      assert(batchIds.distinct.size >= 3, s"expected ≥3 micro-batches, saw $batchIds")
      assert(got.toSet == expected,
        s"streaming pairs diverge from batch operator:\n got=${got.toSet}\n want=$expected")
      assert(stageDirs == afterBuild,
        s"micro-batches staged new dirs: $afterBuild → $stageDirs — batch side must stay unstaged")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("DedupIngest resumes from checkpoint: no pair lost or re-emitted") {
    // the exactly-once composition the operator's doc promises: the
    // checkpoint replays unacknowledged batches only, so a keyed sink
    // sees every pair exactly once across a stop/restart.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)
      val index = DedupIngest.buildIndex(corpus, "doc_id", "text")
      val expected = TextDedup.minhashLshPairsAgainstIndex(
          TextDedup.shingleProjection(fresh, "doc_id", "text", 3),
          index.shingled, index.bandKeys)
        .select(col("da"), col("db")).as[(Long, Long)].collect().toSet

      val payloads = fresh
        .select(to_json(struct(col("doc_id"), col("text"))).as("j")).as[String].collect()
      val (half1, half2) = payloads.zipWithIndex.splitAt(payloads.length / 2)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      // keyed sink: replays overwrite, so duplicates would be visible as
      // nothing while LOSES would — count arrivals per pair instead.
      val arrivals = scala.collection.concurrent.TrieMap.empty[(Long, Long), Int]
      def mkStream = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      def run(): org.apache.spark.sql.streaming.StreamingQuery =
        DedupIngest.start(mkStream, index, "value.doc_id", "value.text",
          checkpoint = Some(ckpt)) { (pairs, _) =>
          pairs.select(col("da"), col("db")).as[(Long, Long)].collect()
            .foreach(p => arrivals.updateWith(p) { c => Some(c.getOrElse(0) + 1) })
        }
      val q1 = run()
      ms.addData(half1.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new java.sql.Timestamp(1000L + i), null,
          j.getBytes("UTF-8")) }.toIndexedSeq: _*)
      q1.processAllAvailable()
      q1.stop()
      ms.addData(half2.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new java.sql.Timestamp(1000L + i), null,
          j.getBytes("UTF-8")) }.toIndexedSeq: _*)
      val q2 = run()
      q2.processAllAvailable()
      q2.stop()

      assert(arrivals.keySet == expected,
        s"pairs after restart diverge: got=${arrivals.keySet} want=$expected")
      val replayed = arrivals.filter(_._2 > 1)
      assert(replayed.isEmpty, s"pairs emitted more than once: $replayed")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
