package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Media
import graft.streaming.{AudioIngest, ContainmentIngest, ImageIngest, Stream}

/** Growing set-containment gate end-to-end
  * (graft.streaming.ContainmentIngest) — ONE probe-then-grow loop
  * generic over modality. Asserts:
  *  1. a crop/trim of an EARLIER batch's content is flagged (only the
  *     fold makes it a pair — the probe-then-grow claim), with the image
  *     KEYPOINT projection;
  *  2. the grown key sets ≡ a fresh build over everything ingested;
  *  3. retire stops pairing immediately; restore answers identically;
  *     the replay fence skips re-delivered batches;
  *  4. the SAME loop runs the audio CDC projection unchanged — the
  *     modality-generic claim. */
class StreamingContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def g(tag: String, base: Long, x: Int, y: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$tag:$base:$x:$y".getBytes("US-ASCII"))(0) & 0xff
  }
  private def png(base: Long, ox: Int, oy: Int, w: Int, h: Int): Array[Byte] =
    Media.encodePng(w, h, (x, y) => {
      val v = g("cgrow", base, x + ox, y + oy); (v << 16) | (v << 8) | v
    })

  test("keypoint growing gate: arbitrary crop of an earlier batch flagged; retire; restore; fence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = (0L until 6L).map(b => (b, png(b, 0, 0, 48, 40)))
        .toDF("img_id", "payload")
      def proj(df: org.apache.spark.sql.DataFrame, idCol: String, pCol: String) =
        ImageIngest.keypoints(df, idCol, pCol, divisor = 4)
      val state = new java.util.concurrent.atomic.AtomicReference(
        ContainmentIngest.buildGrowing(proj(corpus, "img_id", "payload")))

      // b1: 3 fresh images; b2: an ARBITRARY (3, 2)-offset crop of a b1
      // image — only the fold makes it a pair.
      val b1 = (0 until 3).map(j => (100L + j, png(500L + j, 0, 0, 48, 40)))
      val b2 = Seq((900L, png(500L, 3, 2, 43, 37)))

      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = ContainmentIngest.startGrowing(s, state,
        b => proj(b, "value.img_id", "value.payload"), threshold = 0.9) {
        (pairs, version, _) =>
          versions += version
          got += pairs.select("da", "db").as[(Long, Long)].collect().toSet
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
      assert(got(0).isEmpty, s"fresh images must not pair: ${got(0)}")
      send(b2)
      assert(versions.toSeq == Seq(1L, 2L), s"fold versions: $versions")
      assert(got(1) == Set((900L, 100L)),
        s"crop of a b1 image not flagged by the grown index: ${got(1)}")

      // grown key sets ≡ a fresh union build.
      val union = corpus.union((b1 ++ b2).toDF("img_id", "payload"))
      def keySet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), explode(col("sh")).as("s"))
          .as[(Long, Long)].collect().toSet
      assert(keySet(state.get().shingled) ==
        keySet(proj(union, "img_id", "payload")),
        "grown shingle relation must equal the fresh union build's")

      // RETIRE the b1 original: the crop must stop pairing with it.
      val retired = ContainmentIngest.retire(state.get(),
        Seq(100L).toDF("img_id"), tag = 500L)
      val pairsAfter = graft.operators.TextDedup.containmentPairsAgainstIndex(
        proj(b2.toDF("img_id", "payload"), "img_id", "payload"),
        retired.shingled, retired.ex, threshold = 0.9)
        .select(col("db")).as[Long].collect()
      assert(!pairsAfter.contains(100L),
        s"retired image still pairs: ${pairsAfter.toSeq}")
      state.set(retired)

      // RESTART: rebuilt-from-dirs state answers identically.
      val live = state.get()
      val restored = ContainmentIngest.restoreGrowing(spark, live.shPath,
        live.exPath, live.tombstonesPath, live.version, live.foldedBatch)
      assert(keySet(restored.shingled) == keySet(live.shingled),
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

  test("compaction + retention over the paired roots: probes bitwise-unchanged, crash windows repair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def proj(df: org.apache.spark.sql.DataFrame, idCol: String, pCol: String) =
        ImageIngest.keypoints(df, idCol, pCol, divisor = 4)
      val state = new java.util.concurrent.atomic.AtomicReference(
        ContainmentIngest.buildGrowing(proj(
          (0L until 2L).map(b => (b, png(b, 0, 0, 48, 40)))
            .toDF("img_id", "payload"), "img_id", "payload")))
      val b1 = (0 until 3).map(j => (100L + j, png(600L + j, 0, 0, 48, 40)))
      val b2 = Seq((901L, png(600L, 3, 2, 43, 37)))
      val schema = StructType(Seq(
        StructField("img_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val q = ContainmentIngest.startGrowing(s, state,
        b => proj(b, "value.img_id", "value.payload"), threshold = 0.9) {
        (pairs, _, _) => pairs.count(); ()
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
      send(b1) // fold 0
      send(b2) // fold 1
      q.stop()

      // the reference probe: a crop of a folded image + a fresh image.
      val probe = proj(Seq((7000L, png(601L, 5, 4, 40, 33)),
        (7001L, png(777L, 0, 0, 48, 40))).toDF("img_id", "payload"),
        "img_id", "payload")
      def pairsOf(st: ContainmentIngest.GrowingContainmentIndex) =
        graft.operators.TextDedup.containmentPairsAgainstIndex(
          probe, st.shingled, st.ex, threshold = 0.9)
          .select(col("da"), col("db")).as[(Long, Long)].collect().toSet
      val before = pairsOf(state.get())
      assert(before == Set((7000L, 101L)), s"reference pairs: $before")

      // CRASH WINDOW between the two expiries: one root expired at
      // horizon 0, the other not — re-running at the SAME horizon
      // completes the pair (the already-expired root passes through).
      graft.streaming.Gate.expireGrown(spark, state.get().shPath, 0L)
      val expired = ContainmentIngest.expireGrowing(spark, state.get(), 0L)
      assert(pairsOf(expired) == before,
        "retention must not change the live probe answer")
      // time travel below the horizon refuses on BOTH roots.
      for (root <- Seq(expired.shPath, expired.exPath)) {
        val e = intercept[IllegalArgumentException] {
          graft.streaming.Gate.readGrownAsOf(spark, root, -1L)
        }
        assert(e.getMessage.contains("0"), s"refusal must name the horizon: ${e.getMessage}")
      }
      state.set(expired)

      // RETIRE one folded image, then COMPACT: the probe answer equals
      // the post-retire answer bitwise, the retired rows are gone from
      // STORAGE (not just filtered), tombstones reset, fence carries.
      val retired = ContainmentIngest.retire(state.get(),
        Seq(101L).toDF("img_id"), tag = 900L)
      val postRetire = pairsOf(retired)
      assert(postRetire.isEmpty, s"retired id must stop pairing: $postRetire")
      val compacted = ContainmentIngest.compactGrowing(retired)
      assert(pairsOf(compacted) == postRetire,
        "compaction must not change the probe answer")
      assert(compacted.shPath != retired.shPath &&
        compacted.exPath != retired.exPath, "compaction writes fresh roots")
      assert(spark.read.parquet(compacted.shPath)
        .filter(col("id") === 101L).isEmpty,
        "tombstoned rows must leave storage at compaction")
      assert(compacted.foldedBatch == retired.foldedBatch,
        "the replay fence must carry across compaction")

      // a crash INSIDE compactGrowing is repairable by re-running it:
      // the inputs (old roots) were never touched.
      val again = ContainmentIngest.compactGrowing(retired)
      assert(pairsOf(again) == postRetire,
        "re-running a compaction from the old state must answer identically")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("the SAME loop runs the audio CDC projection unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def sAmp(base: Long, i: Int): Int = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = md.digest(s"cgrowaudio:$base:$i".getBytes("UTF-8"))
        ((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096
      }
      def sWav(base: Long, off: Int, n: Int): Array[Byte] =
        Media.wavBytes(8000, Array.tabulate(n)(i => sAmp(base, i + off).toShort))
      def proj(df: org.apache.spark.sql.DataFrame, idCol: String, pCol: String) =
        AudioIngest.shingles(df, idCol, pCol, win = 4, hop = 4,
          rateNorm = None, cdc = Some((8, 32)))

      val state = new java.util.concurrent.atomic.AtomicReference(
        ContainmentIngest.buildGrowing(proj(
          Seq.empty[(Long, Array[Byte])].toDF("rec_id", "payload"),
          "rec_id", "payload")))

      // b1: one fresh recording; b2: its 37-sample arbitrary front trim —
      // flagged only because b1 folded.
      val b1 = Seq((1L, sWav(3L, 0, 520)))
      val b2 = Seq((700L, sWav(3L, 37, 483)))
      val schema = StructType(Seq(
        StructField("rec_id", LongType), StructField("payload", BinaryType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
      val q = ContainmentIngest.startGrowing(s, state,
        b => proj(b, "value.rec_id", "value.payload"), threshold = 0.8) {
        (pairs, _, _) =>
          got += pairs.select("da", "db").as[(Long, Long)].collect().toSet
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
      send(b1)
      send(b2)
      q.stop()
      assert(got.toSeq == Seq(Set.empty, Set((700L, 1L))),
        s"the trimmed re-upload must pair only after b1 folds: $got")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("the SAME loop runs the sentence-span projection (text plagiarism gate)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def proj(df: org.apache.spark.sql.DataFrame, idCol: String, tCol: String) =
        graft.operators.Sentences.spanShingles(df, idCol, tCol)

      val state = new java.util.concurrent.atomic.AtomicReference(
        ContainmentIngest.buildGrowing(proj(
          Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")))

      // b1: a six-sentence article. b2: a re-post quoting sentences 2..5
      // verbatim (every span of the quote is a span of the original —
      // containment 1.0) plus a genuinely fresh two-sentence doc (one
      // span of its own, never flagged).
      val sents = (0 to 5).map(i => s"original sentence number $i here")
      val b1 = Seq((1L, sents.map(_ + ".").mkString(" ")))
      val b2 = Seq(
        (700L, sents.slice(2, 6).map(_ + ".").mkString(" ")),
        (701L, "a fresh first sentence. then a second one. and a third."))
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
      val q = ContainmentIngest.startGrowing(s, state,
        b => proj(b, "value.doc_id", "value.text"), threshold = 0.8) {
        (pairs, _, _) =>
          got += pairs.select("da", "db").as[(Long, Long)].collect().toSet
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
      send(b2)
      q.stop()
      assert(got.toSeq == Seq(Set.empty, Set((700L, 1L))),
        s"only the quoting re-post pairs, and only after b1 folds: $got")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
