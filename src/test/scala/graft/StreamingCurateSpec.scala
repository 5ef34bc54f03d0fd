package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ranking
import graft.sources.Tables
import graft.streaming.{CurateIngest, DedupIngest, ScoreIngest, Stream}

/** The COMPOSED ingest loop end-to-end (graft.streaming.CurateIngest):
  * classifier gate → self-growing dedup gate in one foreachBatch body.
  * Asserts:
  *  1. per-batch verdicts ≡ the batch classifier on the same rows;
  *  2. only KEPT rows reach the dedup gate and only kept NOVEL rows
  *     fold — the grown state equals a fresh build over
  *     corpus ∪ kept-novel rows (filter bytes);
  *  3. a later copy of a kept doc is flagged as an exact duplicate;
  *     a later copy of a dropped doc is dropped again (same text, same
  *     verdict) and never becomes a duplicate pair. */
class StreamingCurateSpec extends SparkSpec {

  test("CurateIngest: classify → dedup → grow, composed per micro-batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id"), col("text"), col("source"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val freshDf = docs.filter(col("doc_id") % 10 === 0)

      val classifier = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildClassifier(corpus, "doc_id", "text",
          isPositive = col("source").isin("src0", "src1", "src2")))
      val dedup = new java.util.concurrent.atomic.AtomicReference(
        DedupIngest.buildGrowingState(corpus.select(col("doc_id"), col("text")),
          "doc_id", "text", capacityItems = 10000L))

      // batch-operator truth for the fresh rows' verdicts.
      val truthVerdicts = Ranking.classifyAgainstWeights(
        Ranking.classifierRelation(freshDf, "doc_id", "text", lit(false)),
        classifier.get().weights)
        .as[(Long, Long, Long, Boolean)].collect()
      val keptIds = truthVerdicts.filter(_._4).map(_._1).toSet
      val dropIds = truthVerdicts.filterNot(_._4).map(_._1).toSet
      assert(keptIds.nonEmpty && dropIds.nonEmpty, "need both verdicts")
      val fresh = freshDf.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val keptDoc = fresh.find(r => keptIds.contains(r._1)).get
      val dropDoc = fresh.find(r => dropIds.contains(r._1)).get

      // b1: all fresh rows; b2: copies of one kept + one dropped b1 doc.
      val b1 = fresh.toSeq
      val b2 = Seq((900001L, keptDoc._2), (900002L, dropDoc._2))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val verdictsGot = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, Boolean)]]
      val exactGot = scala.collection.mutable.Set.empty[(Long, Long)]
      val q = CurateIngest.start(s, classifier, dedup, "value.doc_id", "value.text") {
        (verdicts, exact, _, _, _) =>
          verdictsGot += verdicts.as[(Long, Long, Long, Boolean)].collect().toSet
          exactGot ++= exact.as[(Long, Long)].collect()
      }
      def send(rows: Seq[(Long, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "text")
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(b1)
      assert(verdictsGot.head == truthVerdicts.toSet,
        "streamed verdicts must equal the batch classifier's")
      send(b2)
      // the kept copy is an exact dup of the GROWN corpus (b1's kept doc
      // folded); the dropped copy is dropped again — same text, same
      // verdict — and never reaches the dedup gate.
      assert(exactGot.contains((900001L, keptDoc._1)),
        s"copy of kept doc not flagged: $exactGot")
      assert(!exactGot.exists(_._1 == 900002L),
        s"copy of dropped doc must not reach the gate: $exactGot")
      assert(verdictsGot.last.exists(v => v._1 == 900002L && !v._4),
        "dropped doc's copy must be dropped again")

      // only kept NOVEL rows folded: grown filter ≡ fresh union build.
      val keptNovel = fresh.filter(r => keptIds.contains(r._1)).toSeq
      // b2's kept copy also folded? It was an exact dup — NOT novel.
      val union = corpus.select(col("doc_id"), col("text"))
        .union(keptNovel.toDF("doc_id", "text"))
      val freshState = DedupIngest.buildGrowingState(union, "doc_id", "text",
        capacityItems = 10000L)
      assert(java.util.Arrays.equals(
        dedup.get().cs.exactFilter, freshState.cs.exactFilter),
        "grown filter must equal a fresh build over corpus + kept novel rows")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
