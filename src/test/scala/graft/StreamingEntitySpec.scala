package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextDedup
import graft.streaming.{EntityIngest, Stream}

/** Streaming entity-resolution dedup end-to-end
  * (graft.streaming.EntityIngest): batches of short-field records probe
  * the persisted length-blocked edit index; results must equal the batch
  * operator's and a brute-force edit-distance ground truth (the lossless
  * blocking theorem carried through the broadcast probe). */
class StreamingEntitySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("streamed probes ≡ batch operator ≡ brute force; blocking params ride the state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
    val rnd = new scala.util.Random(23)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(5)).toChar).mkString
    val corpus = (0 until 120).map { i =>
      (i.toLong, randStr(10 + rnd.nextInt(20)), if (i % 2 == 0) "en" else "de")
    }
    val state = new java.util.concurrent.atomic.AtomicReference(
      EntityIngest.buildIndex(corpus.toDF("id", "title", "lang"),
        "id", "title", maxDist = 6, blockCols = Seq("lang"),
        bucketWidth = 16))
    def stageDirs: Int = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("stage_"))
    assert(stageDirs == 1, s"index = one staged relation, got $stageDirs")

    // batch 0: typo'd re-listings of corpus records — including one whose
    // 2-char suffix pushes it across a length-bucket boundary (len 15 →
    // 17) — plus a same-lang-only clone; batch 1: pure novelty.
    val b0 = Seq(
      (1000L, corpus(4)._2 + "xy", corpus(4)._3),
      (1001L, corpus(7)._2.drop(1), corpus(7)._3),
      (1002L, corpus(10)._2, if (corpus(10)._3 == "en") "de" else "en"))
    val b1 = Seq((1100L, randStr(40), "en"))

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("title", StringType), StructField("lang", StringType)))
    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
    val q = EntityIngest.start(s, state, "value.id", "value.title",
      batchBlockCols = Some(Seq("value.lang"))) {
      (pairs, _, _) =>
        got += pairs.as[(Long, Long, Long)].collect().toSet
    }
    def send(rows: Seq[(Long, String, String)], offBase: Long): Unit = {
      ms.addData(rows.zipWithIndex.map { case ((id, t, l), i) =>
        KMsg("t", 0, offBase + i, new Timestamp(1000L + i), null,
          s"""{"id":$id,"title":"$t","lang":"$l"}""".getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    send(b0, 0L); send(b1, 100L)
    q.stop()

    def truth(batch: Seq[(Long, String, String)]): Set[(Long, Long, Long)] =
      (for {
        (bi, bt, bl) <- batch; (ci, ct, cl) <- corpus
        if bl == cl
        d = lev(bt, ct) if d <= 6
      } yield (bi, ci, d.toLong)).toSet

    assert(got(0) == truth(b0), s"batch 0: got=${got(0)} want=${truth(b0)}")
    // the boundary-straddling re-listing was found...
    assert(got(0).contains((1000L, 4L, 2L)))
    // ...and the cross-lang clone was blocked out by the ER attribute.
    assert(!got(0).exists(_._1 == 1002L) ||
      truth(b0).exists(_._1 == 1002L))
    assert(got(1) == truth(b1))

    // probing is STAGING-FREE per batch (the family contract).
    assert(stageDirs == 1, "no per-batch staging dirs may appear")

    // streamed ≡ the batch operator, bitwise.
    val viaBatch = TextDedup.editPairsAgainstIndex(
      b0.toDF("id", "title", "lang"), "id", "title",
      state.get().index, maxDist = 6, blockCols = Seq("lang"),
      bucketWidth = 16).as[(Long, Long, Long)].collect().toSet
    assert(viaBatch == got(0))
    } finally spark.conf.unset("graft.stage.dir")
  }
}
