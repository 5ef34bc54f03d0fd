package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Media
import graft.streaming.{AudioIngest, Stream}

/** Streaming trim-robust audio dedup end-to-end
  * (graft.streaming.AudioIngest): a recording stream probed per
  * micro-batch against ONE persisted contour-shingle index. Asserts:
  *  1. per-batch pairs ≡ the batch containment ground truth (trimmed and
  *     re-volumed copies caught, different signals not);
  *  2. the corpus is parsed + staged EXACTLY once (two relations:
  *     shingles + exploded index); micro-batches create no staging dirs;
  *  3. version rotation swaps the index atomically between batches. */
class StreamingAudioSpec extends SparkSpec {
  import spark.implicits._

  // md5-derived per-window amplitude, even so /2 is exact (see
  // x_dedup_audio_trim). One signal family per base.
  private def amp(base: Long, w: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"stream:$base:$w".getBytes("UTF-8"))
    val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
    (h16 % 8192 - 4096) * 2
  }
  private def wav(base: Long, off: Int, windows: Int,
                  f: Int => Int = identity): Array[Byte] =
    Media.wavBytes(8000,
      Array.tabulate(windows * 4)(i => f(amp(base, i / 4 + off)).toShort))

  test("AudioIngest: per-batch pairs ≡ batch containment; staged once; rotation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpusWavs = (0L until 12L).map(b => (b, wav(b, 0, 130)))
      val corpus = corpusWavs.toDF("rec_id", "payload")
      val state = new java.util.concurrent.atomic.AtomicReference(
        AudioIngest.buildIndex(corpus, "rec_id", "payload", win = 4, hop = 4))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 2,
        s"index = shingles + exploded index staged, got $stageDirs")

      // batch: trimmed copies of recordings 0..5, a trimmed+halved copy
      // of 6, and 3 fresh signals.
      val batchWavs =
        (0L until 6L).map(b => (100L + b, wav(b, 8, 122))) ++
        Seq((106L, wav(6L, 4, 126, _ / 2))) ++
        (0L until 3L).map(j => (200L + j, wav(1000L + j, 0, 130)))
      // ground truth from the BATCH operator arithmetic: containment of
      // shingle sets at the same threshold.
      val corpusSh = corpusWavs.map { case (id, p) =>
        id -> Media.audioShingles64(p, 4, 4).get.toSet }
      val batchSh = batchWavs.map { case (id, p) =>
        id -> Media.audioShingles64(p, 4, 4).get.toSet }
      val expected = (for {
        (da, sa) <- batchSh; (db, sb) <- corpusSh
        inter = sa.intersect(sb).size
        cab = inter.toDouble / sa.size
        cba = inter.toDouble / sb.size
        if math.max(cab, cba) >= 0.85
      } yield (da, db, cab, cba)).toSet
      assert(expected.size == 7,
        s"fixture: exactly the 7 planted copies must hit: $expected")

      val schema = StructType(Seq(
        StructField("rec_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double, Double)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = AudioIngest.start(s, state, "value.rec_id", "value.payload",
        threshold = 0.85) { (pairs, version, _) =>
          versions += version
          got ++= pairs.as[(Long, Long, Double, Double)].collect()
      }
      def send(rows: Seq[(Long, Array[Byte])]): Unit = {
        val payloads = rows.toDF("rec_id", "payload")
          .select(to_json(struct(col("rec_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(batchWavs.take(5))
      send(batchWavs.drop(5))
      assert(got.toSet == expected,
        s"streamed pairs diverge:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 2, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus additionally holds an exact copy of fresh
      // signal 200 under id 500 — containment 1.0, must surface after
      // the swap.
      val v1 = corpusWavs ++ Seq((500L, wav(1000L, 0, 130)))
      state.set(AudioIngest.buildIndex(
        v1.toDF("rec_id", "payload"), "rec_id", "payload",
        win = 4, hop = 4, version = 1L))
      assert(stageDirs == 4, "rotation rebuilds exactly two staged relations")
      got.clear()
      send(batchWavs.filter(_._1 == 200L))
      assert(got.exists(p => p._1 == 200L && p._2 == 500L && p._3 == 1.0),
        s"post-rotation exact copy not found: $got")
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 4, "post-rotation micro-batch staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("rate-normalized gate: a resampled re-upload is flagged where the sample grid misses it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // corpus at 16 kHz (4 samples per 1/4000 s hop); the re-upload is
      // its exact 2× decimation at 8 kHz AND half volume.
      def wavAt(rate: Int, perWin: Int, base: Long, windows: Int,
                f: Int => Int = identity): Array[Byte] =
        Media.wavBytes(rate,
          Array.tabulate(windows * perWin)(i => f(amp(base, i / perWin)).toShort))
      val corpus = (0L until 8L).map(b => (b, wavAt(16000, 4, b, 130)))
        .toDF("rec_id", "payload")
      val rateState = new java.util.concurrent.atomic.AtomicReference(
        AudioIngest.buildIndex(corpus, "rec_id", "payload",
          rateNorm = Some((4000, 1))))
      val sampleState = new java.util.concurrent.atomic.AtomicReference(
        AudioIngest.buildIndex(corpus, "rec_id", "payload", win = 4, hop = 4))

      val batch = Seq((700L, wavAt(8000, 2, 3L, 130, _ / 2)))
      val schema = StructType(Seq(
        StructField("rec_id", LongType), StructField("payload", BinaryType)))
      def run(state: java.util.concurrent.atomic.AtomicReference[AudioIngest.CorpusAudioIndex]): Set[(Long, Long)] = {
        val ms = MemoryStream[KMsg]
        val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
        val got = scala.collection.mutable.Set.empty[(Long, Long)]
        val q = AudioIngest.start(s, state, "value.rec_id", "value.payload",
          threshold = 0.85) { (pairs, _, _) =>
          got ++= pairs.select("da", "db").as[(Long, Long)].collect()
        }
        val payloads = batch.toDF("rec_id", "payload")
          .select(to_json(struct(col("rec_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
        q.stop()
        got.toSet
      }
      assert(run(sampleState).isEmpty,
        "the sample-sized grid must provably lose the resampled copy")
      assert(run(rateState) == Set((700L, 3L)),
        "the time-normalized gate must flag the resampled re-upload")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("cdc gate: an arbitrarily-trimmed re-upload is flagged where the grids miss it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // per-SAMPLE md5 amplitudes (CDC anchors at sample level); the
      // re-upload of recording 3 is front-trimmed by 37 samples — a
      // multiple of nothing, so every fixed grid loses it.
      def sAmp(base: Long, i: Int): Int = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = md.digest(s"cdcstream:$base:$i".getBytes("UTF-8"))
        (((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096)
      }
      def sWav(base: Long, off: Int, n: Int): Array[Byte] =
        Media.wavBytes(8000, Array.tabulate(n)(i => sAmp(base, i + off).toShort))
      val corpus = (0L until 8L).map(b => (b, sWav(b, 0, 520)))
        .toDF("rec_id", "payload")
      val cdcState = new java.util.concurrent.atomic.AtomicReference(
        AudioIngest.buildIndex(corpus, "rec_id", "payload",
          cdc = Some((8, 32))))
      val gridState = new java.util.concurrent.atomic.AtomicReference(
        AudioIngest.buildIndex(corpus, "rec_id", "payload", win = 4, hop = 4))

      val batch = Seq((700L, sWav(3L, 37, 483)))
      val schema = StructType(Seq(
        StructField("rec_id", LongType), StructField("payload", BinaryType)))
      def run(state: java.util.concurrent.atomic.AtomicReference[AudioIngest.CorpusAudioIndex]): Set[(Long, Long)] = {
        val ms = MemoryStream[KMsg]
        val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
        val got = scala.collection.mutable.Set.empty[(Long, Long)]
        val q = AudioIngest.start(s, state, "value.rec_id", "value.payload",
          threshold = 0.8) { (pairs, _, _) =>
          got ++= pairs.select("da", "db").as[(Long, Long)].collect()
        }
        val payloads = batch.toDF("rec_id", "payload")
          .select(to_json(struct(col("rec_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
        q.stop()
        got.toSet
      }
      assert(run(gridState).isEmpty,
        "the fixed grid must provably lose the 37-sample trim")
      assert(run(cdcState) == Set((700L, 3L)),
        "the CDC gate must flag the arbitrarily-trimmed re-upload")
      // streamed ≡ batch arithmetic at the same threshold.
      val chFull = Media.audioCdcChunks(sWav(3L, 0, 520)).get.toSet
      val chTrim = Media.audioCdcChunks(sWav(3L, 37, 483)).get.toSet
      assert(chTrim.intersect(chFull).size.toDouble / chTrim.size >= 0.8)
      // the two mode flags refuse to combine (distinct invariances).
      intercept[IllegalArgumentException] {
        AudioIngest.buildIndex(corpus, "rec_id", "payload",
          rateNorm = Some((4000, 1)), cdc = Some((8, 32)))
      }
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("containmentPairsAgainstIndex: batch broadcasts, corpus never shuffles") {
    val corpusSh = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(10)(j => (i * 100 + j).toLong)))
      .toDF("id", "sh")
    val idx = corpusSh.select(col("id"), explode(col("sh")).as("s"))
    val batch = Seq((900L, Array.tabulate(10)(j => (100 + j).toLong)))
      .toDF("id", "sh")
    val plan = graft.operators.TextDedup
      .containmentPairsAgainstIndex(batch, corpusSh, idx, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
