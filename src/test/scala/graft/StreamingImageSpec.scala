package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Media
import graft.streaming.{ImageIngest, Stream}

/** Streaming perceptual image dedup end-to-end (graft.streaming
  * .ImageIngest): an image stream probed per micro-batch against ONE
  * persisted corpus dHash band index. Asserts:
  *  1. per-batch pairs ≡ the full quadratic Hamming ground truth
  *     (banding at budget 7 = 8 bands is pigeonhole-lossless);
  *  2. the corpus is decoded + staged EXACTLY once; micro-batches create
  *     no staging dirs;
  *  3. version rotation swaps the index atomically between batches. */
class StreamingImageSpec extends SparkSpec {
  import spark.implicits._

  private def blockImage(base: Long): Array[Byte] =
    Media.encodePng(32, 32, (x, y) => {
      val v = scala.util.hashing.MurmurHash3
        .productHash((base, x * 8 / 32, y * 8 / 32)).abs % 256
      (v << 16) | (v << 8) | v
    })

  /** Driver-side NN resample (the "republished copy" transform). */
  private def resized(b: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val p = Media.decodePixels(b).get
    Media.encodePng(w, h, (x, y) =>
      p.argb((y * p.height / h) * p.width + x * p.width / w) & 0xffffff)
  }

  test("ImageIngest: per-batch pairs ≡ quadratic truth; staged once; rotation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpusImgs = (0 until 24).map(b => (b.toLong, blockImage(b.toLong)))
      val corpus = corpusImgs.toDF("img_id", "payload")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildIndex(corpus, "img_id", "payload", maxHamming = 7))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"index = one staged band relation, got $stageDirs")

      // batch: resized copies of corpus images 0..9 + 5 fresh images.
      val batchImgs =
        (0 until 10).map(b => (100L + b, resized(blockImage(b.toLong), 48, 32))) ++
        (0 until 5).map(j => (200L + j, blockImage(1000L + j)))
      // ground truth: FULL quadratic Hamming ≤ 7 over the real hashes.
      val corpusH = corpusImgs.map { case (id, p) => id -> Media.dhash64(p).get }
      val batchH = batchImgs.map { case (id, p) => id -> Media.dhash64(p).get }
      val expected = (for {
        (da, ha) <- batchH; (db, hb) <- corpusH
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
      } yield (da, db, d.toLong)).toSet
      assert(expected.size >= 10, s"fixture: every resized copy must hit: $expected")

      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = ImageIngest.start(s, state, "value.img_id", "value.payload") {
        (pairs, version, _) =>
          versions += version
          got ++= pairs.as[(Long, Long, Long)].collect()
      }
      def send(rows: Seq[(Long, Array[Byte])]): Unit = {
        val payloads = rows.toDF("img_id", "payload")
          .select(to_json(struct(col("img_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(batchImgs.take(7))
      send(batchImgs.drop(7))
      assert(got.toSet == expected,
        s"streamed pairs diverge:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 1, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus additionally holds an exact byte copy of fresh
      // image 200 under id 500 — hamming 0, must surface after the swap.
      val v1 = corpusImgs ++ Seq((500L, batchImgs.find(_._1 == 200L).get._2))
      state.set(ImageIngest.buildIndex(
        v1.toDF("img_id", "payload"), "img_id", "payload",
        maxHamming = 7, version = 1L))
      assert(stageDirs == 2, "rotation rebuilds exactly one staged relation")
      got.clear()
      send(batchImgs.filter(_._1 == 200L))
      assert(got.exists(p => p._1 == 200L && p._2 == 500L && p._3 == 0L),
        s"post-rotation exact copy not found: $got")
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 2, "post-rotation micro-batch staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("canonical gate: a rotated re-upload pairs at Hamming 0 where the plain gate misses it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // rotated payload: pixel (x, y) of the copy = original (y, 31-x) —
      // a lossless 90° republication.
      def rotated(b: Array[Byte]): Array[Byte] = {
        val p = Media.decodePixels(b).get
        Media.encodePng(p.height, p.width, (x, y) =>
          p.argb((p.width - 1 - x) * p.width + y) & 0xffffff)
      }
      val corpus = (0 until 12).map(b => (b.toLong, blockImage(b.toLong)))
        .toDF("img_id", "payload")
      val plain = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildIndex(corpus, "img_id", "payload", maxHamming = 7))
      val canon = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildIndex(corpus, "img_id", "payload", maxHamming = 7,
          canonical = true))

      val batch = Seq((700L, rotated(blockImage(3L))))
      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      def run(state: java.util.concurrent.atomic.AtomicReference[ImageIngest.CorpusImageIndex]): Set[(Long, Long, Long)] = {
        val ms = MemoryStream[KMsg]
        val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
        val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
        val q = ImageIngest.start(s, state, "value.img_id", "value.payload") {
          (pairs, _, _) => got ++= pairs.as[(Long, Long, Long)].collect()
        }
        val payloads = batch.toDF("img_id", "payload")
          .select(to_json(struct(col("img_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
        q.stop()
        got.toSet
      }
      assert(run(plain).isEmpty,
        "the plain dHash gate must provably lose the rotated copy")
      assert(run(canon) == Set((700L, 3L, 0L)),
        "the canonical gate must flag the rotation at Hamming 0")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("keypoint gate: an ARBITRARY-offset cropped re-upload is flagged where the dHash gate misses it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // per-pixel md5 grays; the re-upload of image 3 is cropped at
      // offsets (3, 2) — a multiple of nothing, so both the whole-image
      // grid and any hop-aligned tiling lose it.
      def g(base: Long, x: Int, y: Int): Int = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(s"kpstream:$base:$x:$y".getBytes("US-ASCII"))(0) & 0xff
      }
      def png(base: Long, ox: Int, oy: Int, w: Int, h: Int): Array[Byte] =
        Media.encodePng(w, h, (x, y) => {
          val v = g(base, x + ox, y + oy); (v << 16) | (v << 8) | v
        })
      val corpus = (0L until 8L).map(b => (b, png(b, 0, 0, 48, 40)))
        .toDF("img_id", "payload")
      val kpState = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildKeypointIndex(corpus, "img_id", "payload"))
      val dhState = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildIndex(corpus, "img_id", "payload", maxHamming = 7))

      val batch = Seq((700L, png(3L, 3, 2, 43, 37)))
      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      val payloads = batch.toDF("img_id", "payload")
        .select(to_json(struct(col("img_id"), col("payload"))).as("j"))
        .as[String].collect()
      def send(ms: MemoryStream[KMsg], q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
        q.stop()
      }

      // dHash gate: the (3, 2) offset re-frames the 9×8 grid — lost.
      val dhGot = scala.collection.mutable.Set.empty[(Long, Long)]
      val ms1 = MemoryStream[KMsg]
      val q1 = ImageIngest.start(Stream.fromKafkaShaped(spark, ms1.toDF(), schema),
        dhState, "value.img_id", "value.payload") { (pairs, _, _) =>
        dhGot ++= pairs.select("da", "db").as[(Long, Long)].collect()
      }
      send(ms1, q1)
      assert(dhGot.isEmpty,
        s"the dHash gate must provably lose the arbitrary-offset crop: $dhGot")

      // keypoint gate: interior anchors survive the crop verbatim —
      // flagged, with containment exactly 1.0 from the cropped side.
      val kpGot = scala.collection.mutable.Set.empty[(Long, Long, Double)]
      val ms2 = MemoryStream[KMsg]
      val q2 = ImageIngest.startKeypointGate(
        Stream.fromKafkaShaped(spark, ms2.toDF(), schema),
        kpState, "value.img_id", "value.payload", threshold = 0.9) {
        (pairs, _, _) =>
          kpGot ++= pairs.select("da", "db", "c_ab").as[(Long, Long, Double)].collect()
      }
      send(ms2, q2)
      assert(kpGot == Set((700L, 3L, 1.0)),
        s"the keypoint gate must flag the crop at containment 1.0: $kpGot")

      // streamed ≡ batch arithmetic: the gate's key sets ARE the batch
      // operator's (subset structure checked on the driver).
      val kFull = graft.operators.ImageDedup.keypointHashes(png(3L, 0, 0, 48, 40)).get.toSet
      val kCrop = graft.operators.ImageDedup.keypointHashes(png(3L, 3, 2, 43, 37)).get.toSet
      assert(kCrop.nonEmpty && kCrop.subsetOf(kFull))
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("dhashPairsAgainstIndex: batch broadcasts, corpus side never shuffles") {
    val hashes = (0 until 50).map(i => (i.toLong, i.toLong * 1234567L)).toDF("id", "h")
    val idx = graft.operators.ImageDedup.bandedKeys(hashes, maxHamming = 7)
    val batch = Seq((1000L, 1234567L)).toDF("id", "h")
    val plan = graft.operators.ImageDedup
      .dhashPairsAgainstIndex(batch, idx, maxHamming = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("startGrowing: probe-then-grow; re-upload of an earlier batch flagged; fenced") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = (0 until 10).map(b => (b.toLong, blockImage(b.toLong)))
        .toDF("img_id", "payload")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ImageIngest.buildGrowingIndex(corpus, "img_id", "payload", maxHamming = 7))

      // b1: 5 fresh images (not in the corpus); b2: an exact re-upload of
      // a b1 image — only the fold makes it a pair.
      val b1 = (0 until 5).map(j => (100L + j, blockImage(500L + j)))
      val b2 = Seq((900L, blockImage(500L)))

      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = ImageIngest.startGrowing(s, state, "value.img_id", "value.payload") {
        (pairs, version, _) =>
          versions += version
          got += pairs.as[(Long, Long, Long)].collect().toSet
      }
      def send(rows: Seq[(Long, Array[Byte])]): Unit = {
        val payloads = rows.toDF("img_id", "payload")
          .select(to_json(struct(col("img_id"), col("payload"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(b1)
      send(b2)
      assert(versions.toSeq == Seq(1L, 2L), s"fold versions: $versions")
      assert(got.last.contains((900L, 100L, 0L)),
        s"re-upload of a b1 image not flagged by the grown index: ${got.last}")
      // grown index content ≡ a fresh build over all ingested images.
      val union = corpus.union((b1 ++ b2).toDF("img_id", "payload"))
      val freshIdx = ImageIngest.buildGrowingIndex(union, "img_id", "payload",
        maxHamming = 7)
      def keySet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(keySet(state.get().banded) == keySet(freshIdx.banded),
        "grown banded relation must equal the fresh union build's")
      // RETIRE the b1 image: its re-upload must stop pairing.
      val retired = ImageIngest.retire(state.get(), Seq(100L).toDF("img_id"), tag = 500L)
      val pairsAfter = graft.operators.ImageDedup.dhashPairsAgainstIndex(
        ImageIngest.dhashes(b2.toDF("img_id", "payload"), "img_id", "payload"),
        retired.banded, retired.maxHamming)
        .select(col("db")).as[Long].collect()
      assert(!pairsAfter.contains(100L), s"retired image still pairs: ${pairsAfter.toSeq}")
      state.set(retired)

      // RESTART: rebuilt-from-dirs index answers identically.
      val restoredIdx = ImageIngest.restoreGrowingIndex(spark,
        state.get().path, state.get().tombstonesPath, maxHamming = 7,
        foldedBatch = state.get().foldedBatch)
      assert(keySet(restoredIdx.banded) == keySet(state.get().banded),
        "restored index must equal the live index")

      // replay fence.
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      val before = versions.size
      send(b2)
      assert(versions.size == before && (state.get() eq fenced),
        "fenced batch must neither fold nor emit")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
