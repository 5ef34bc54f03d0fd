package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Media
import graft.streaming.{Stream, VideoIngest}

/** Streaming video dedup end-to-end (graft.streaming.VideoIngest): an
  * upload stream probed per micro-batch against ONE persisted
  * frame-digest index. Asserts:
  *  1. per-batch pairs ≡ the batch containment ground truth (re-muxed
  *     and trimmed copies caught, different videos not);
  *  2. the corpus is demuxed + staged EXACTLY once; micro-batches create
  *     no staging dirs;
  *  3. version rotation swaps the index atomically between batches. */
class StreamingVideoSpec extends SparkSpec {
  import spark.implicits._

  private def frames(base: Long, n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Media.jpegBytes(
      (40 + (base * 3 + f * 7) % 90).toInt, (30 + (base + f * 5) % 70).toInt))

  test("VideoIngest: per-batch pairs ≡ batch containment; staged once; rotation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpusVids = (0L until 10L).map(b =>
        (b, Media.aviBytes(frames(b, 6), 100, 80)))
      val corpus = corpusVids.toDF("vid_id", "payload")
      val state = new java.util.concurrent.atomic.AtomicReference(
        VideoIngest.buildIndex(corpus, "vid_id", "payload"))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 2,
        s"index = digest sets + exploded index staged, got $stageDirs")

      // batch: re-muxed copies of videos 0..3 (same frames, different
      // fps metadata), a trimmed copy of 4 (first frame cut), 3 fresh.
      val batchVids =
        (0L until 4L).map(b => (100L + b, Media.aviBytes(frames(b, 6), 100, 80, 40000))) ++
        Seq((104L, Media.aviBytes(frames(4L, 6).drop(1), 100, 80))) ++
        (0L until 3L).map(j => (200L + j, Media.aviBytes(frames(50L + j, 6), 100, 80)))
      // ground truth from the batch arithmetic over digest sets.
      def sets(vids: Seq[(Long, Array[Byte])]) = vids.map { case (id, p) =>
        id -> Media.aviVideoFrames(p).get
          .map(f => java.security.MessageDigest.getInstance("MD5").digest(f)
            .map("%02x".format(_)).mkString).toSet
      }
      val corpusSh = sets(corpusVids)
      val batchSh = sets(batchVids)
      val expected = (for {
        (da, sa) <- batchSh; (db, sb) <- corpusSh
        inter = sa.intersect(sb).size
        cab = inter.toDouble / sa.size
        cba = inter.toDouble / sb.size
        if math.max(cab, cba) >= 0.8
      } yield (da, db)).toSet
      assert(expected.size >= 5,
        s"fixture: the 5 planted copies must hit: $expected")

      val schema = StructType(Seq(
        StructField("vid_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = VideoIngest.start(s, state, "value.vid_id", "value.payload",
        threshold = 0.8) { (pairs, version, _) =>
          versions += version
          got ++= pairs.select(col("da"), col("db")).as[(Long, Long)].collect()
      }
      def send(rows: Seq[(Long, Array[Byte])]): Unit = {
        val payloads = rows.toDF("vid_id", "payload")
          .select(to_json(struct(col("vid_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(batchVids.take(4))
      send(batchVids.drop(4))
      assert(got.toSet == expected,
        s"streamed pairs diverge:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 2, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus additionally holds an exact copy of fresh video
      // 200 under id 500 — must surface after the swap.
      val v1 = corpusVids ++ Seq((500L, Media.aviBytes(frames(50L, 6), 100, 80)))
      state.set(VideoIngest.buildIndex(
        v1.toDF("vid_id", "payload"), "vid_id", "payload", version = 1L))
      assert(stageDirs == 4, "rotation rebuilds exactly two staged relations")
      got.clear()
      send(batchVids.filter(_._1 == 200L))
      assert(got.contains((200L, 500L)),
        s"post-rotation exact copy not found: $got")
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
    } finally spark.conf.unset("graft.stage.dir")
  }

  // Staircase MJPEG frames (the x_dedup_video_percept construction):
  // closed-form dHash at any encode quality, so re-encoded copies share
  // every perceptual digest while sharing zero bytes.
  private def stairFrame(base: Long, f: Int, q: Float): Array[Byte] = {
    def t(gy: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      ((md.digest(s"$base:$f:$gy".getBytes("US-ASCII"))(0) >> 4) & 0xf) % 5
    }
    Media.encodeJpeg(72, 64, q, (x, y) => {
      val g = ((x / 8 + t(y / 8)) % 5) * 60
      (g << 16) | (g << 8) | g
    })
  }

  test("VideoIngest perceptual gate: re-encoded uploads match; byte gate loses them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def vid(base: Long, drop: Int, q: Float): Array[Byte] =
        Media.aviBytes((drop until 5).map(stairFrame(base, _, q)), 72, 64)
      val corpus = (0L until 8L).map(b => (b, vid(b, 0, 0.9f))).toDF("vid_id", "payload")
      // batch: re-encoded copies of 0 and 1, a trimmed re-encode of 2, one fresh.
      val batch = Seq((100L, vid(0L, 0, 0.45f)), (101L, vid(1L, 0, 0.45f)),
        (102L, vid(2L, 2, 0.7f)), (200L, vid(60L, 0, 0.9f)))
      val expected = Set((100L, 0L), (101L, 1L), (102L, 2L))

      val byteState = new java.util.concurrent.atomic.AtomicReference(
        VideoIngest.buildIndex(corpus, "vid_id", "payload"))
      val percState = new java.util.concurrent.atomic.AtomicReference(
        VideoIngest.buildIndex(corpus, "vid_id", "payload", perceptual = true))

      val schema = StructType(Seq(
        StructField("vid_id", LongType), StructField("payload", BinaryType)))
      def run(state: java.util.concurrent.atomic.AtomicReference[
          VideoIngest.CorpusVideoIndex]): Set[(Long, Long)] = {
        val ms = MemoryStream[KMsg]
        val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
        val got = scala.collection.mutable.Set.empty[(Long, Long)]
        val q = VideoIngest.start(s, state, "value.vid_id", "value.payload",
          threshold = 0.9) { (pairs, _, _) =>
            got ++= pairs.select(col("da"), col("db")).as[(Long, Long)].collect()
        }
        val payloads = batch.toDF("vid_id", "payload")
          .select(to_json(struct(col("vid_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable(); q.stop()
        got.toSet
      }
      assert(run(byteState).isEmpty,
        "byte-digest gate must lose every lossy re-encode (the gap being closed)")
      assert(run(percState) == expected,
        s"perceptual gate must catch the re-encoded uploads")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
