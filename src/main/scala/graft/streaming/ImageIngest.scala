package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ImageDedup

/** Streaming perceptual IMAGE dedup — the image modality of the [[Gate]]
  * family: an image stream finds its near-duplicate corpus images per
  * micro-batch against ONE persisted dHash band index, so
  * re-encoded/resized re-uploads are flagged at ingest time instead of by
  * a corpus re-self-join. Gate specifics on top of the family contract:
  * every corpus image is decoded ONCE at [[buildIndex]] time
  * ([[graft.operators.Media.dhash64]]) and only the banded 8-byte
  * fingerprints are staged — micro-batches decode their own images only
  * and never touch corpus payloads.
  */
object ImageIngest {

  /** One corpus version's staged dHash band index. `canonical` records
    * which hash family built it — probes MUST hash the same way, so the
    * flag rides the state, not the start call. */
  final case class CorpusImageIndex(banded: DataFrame, maxHamming: Int,
                                    version: Long,
                                    canonical: Boolean = false) extends Gate.Versioned

  /** Decode + hash the corpus once and stage its banded fingerprints.
    * `corpus` is an (id, payload) relation addressed by the two column
    * names. `canonical = true` builds the ROTATION/FLIP-robust gate: the
    * index holds [[ImageDedup.dhashCanonical]] D4-minimum hashes, so a
    * rotated or mirrored re-upload pairs at Hamming 0 where the plain
    * dHash gate provably misses it (`StreamingImageSpec`); images under
    * 9×9 px drop out instead of 9×8. */
  def buildIndex(corpus: DataFrame, idCol: String, payloadCol: String,
                 maxHamming: Int = 3, version: Long = 0L,
                 canonical: Boolean = false): CorpusImageIndex =
    CorpusImageIndex(
      graft.sources.Tables.stage(
        ImageDedup.bandedKeys(dhashes(corpus, idCol, payloadCol, canonical),
          maxHamming)),
      maxHamming, version, canonical)

  /** (id, h) hash relation for an (id, payload) relation — plain dHash,
    * or the canonical D4 minimum when `canonical`; undecodable or
    * sub-grid images drop out (no perceptual fingerprint). */
  def dhashes(df: DataFrame, idCol: String, payloadCol: String,
              canonical: Boolean = false): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .flatMap { case (id, payload) =>
        (if (canonical) ImageDedup.dhashCanonical(payload)
         else graft.operators.Media.dhash64(payload)).map(h => (id, h))
      }(Encoders.product[(Long, Long)])
      .toDF("id", "h")

  /** Start the per-batch dedup loop: each micro-batch's images are
    * decoded, hashed with the INDEX's hash family, and probed against the
    * persisted index ([[ImageDedup.dhashPairsAgainstIndex]] — batch side
    * broadcasts); `onBatch` receives the (da = batch id, db = corpus id,
    * hamming) pair relation plus (corpusVersion, batchId). */
  def start(stream: Stream, state: AtomicReference[CorpusImageIndex],
            idCol: String, payloadCol: String,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      ImageDedup.dhashPairsAgainstIndex(
        dhashes(batch, idCol, payloadCol, st.canonical), st.banded, st.maxHamming)
    }(onBatch)

  /** One corpus version's staged KEYPOINT index — the ARBITRARY-offset
    * crop/pad-robust image gate ([[ImageDedup.keypointHashes]] +
    * [[graft.operators.TextDedup.containmentPairsAgainstIndex]]), the
    * image twin of [[AudioIngest]]'s cdc mode: content-defined anchors
    * survive crops at ANY offset, where the whole-image dHash gate and
    * the hop-aligned tile-shingle grid provably lose them
    * (`StreamingImageSpec`). A separate state type rather than a flag on
    * [[CorpusImageIndex]]: the index SHAPE differs (a containment set
    * relation + exploded index, not a banded hash), and `divisor` rides
    * the state so probes always anchor the way the index was built. */
  final case class CorpusKeypointIndex(shingled: DataFrame, ex: DataFrame,
                                       divisor: Int, version: Long)
    extends Gate.Versioned

  /** Decode + keypoint the corpus once and stage the (id, sh) relation
    * and its exploded (id, s) index — payloads never shuffle and are
    * never touched again. */
  def buildKeypointIndex(corpus: DataFrame, idCol: String, payloadCol: String,
                         divisor: Int = 4,
                         version: Long = 0L): CorpusKeypointIndex = {
    val sh = graft.sources.Tables.stage(
      keypoints(corpus, idCol, payloadCol, divisor))
    CorpusKeypointIndex(sh,
      graft.sources.Tables.stage(
        sh.select(col("id"), explode(col("sh")).as("s"))),
      divisor, version)
  }

  /** (id, sh) keypoint-key relation for an (id, payload) relation;
    * undecodable or sub-5×5 images drop out. */
  def keypoints(df: DataFrame, idCol: String, payloadCol: String,
                divisor: Int): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .flatMap { case (id, payload) =>
        ImageDedup.keypointHashes(payload, divisor).map(k => (id, k))
      }(Encoders.product[(Long, Array[Long])])
      .toDF("id", "sh")

  /** Start the keypoint containment gate (family loop contract as
    * [[start]]): each micro-batch's images are decoded, anchored with the
    * INDEX's divisor, and probed by set containment; `onBatch` receives
    * (da = batch id, db = corpus id, c_ab, c_ba) pairs plus
    * (corpusVersion, batchId). */
  def startKeypointGate(stream: Stream,
                        state: AtomicReference[CorpusKeypointIndex],
                        idCol: String, payloadCol: String, threshold: Double,
                        checkpoint: Option[String] = None)(
                        onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      graft.operators.TextDedup.containmentPairsAgainstIndex(
        keypoints(batch, idCol, payloadCol, st.divisor),
        st.shingled, st.ex, threshold)
    }(onBatch)

  /** SELF-GROWING image index state: the staged banded-fingerprint
    * directory fold appends go to. Requires parquet staging mode
    * (`graft.stage.dir`) — same contract as the text and ANN growing
    * gates. */
  final case class GrowingImageIndex(banded: DataFrame, path: String,
                                     tombstonesPath: String,
                                     maxHamming: Int, version: Long,
                                     foldedBatch: Long = -1L,
                                     canonical: Boolean = false)
    extends Gate.Folded

  /** Decode + hash the initial corpus once, capturing the banded index's
    * directory for fold appends (plus an empty tombstone relation for
    * [[retire]]). `canonical` selects the rotation/flip-robust D4 hash
    * family (see [[buildIndex]]); folds hash with the same family. */
  def buildGrowingIndex(corpus: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 3, version: Long = 0L,
                        canonical: Boolean = false): GrowingImageIndex = {
    val spark = corpus.sparkSession
    val st = graft.sources.Tables.stageTracked(
      ImageDedup.bandedKeys(dhashes(corpus, idCol, payloadCol, canonical),
        maxHamming))
    val tb = graft.sources.Tables.stageTracked(
      spark.createDataset(Seq.empty[Long])(
        org.apache.spark.sql.Encoders.scalaLong).toDF("id"))
    require(st.path.isDefined && tb.path.isDefined,
      "buildGrowingIndex requires parquet staging mode (set graft.stage.dir): " +
        "the growing gate folds by appending to the persisted index directory")
    GrowingImageIndex(st.df, st.path.get, tb.path.get, maxHamming, version,
      canonical = canonical)
  }

  /** The probe-visible index: grown banding minus tombstoned ids (the
    * tiny retired-id relation broadcasts). */
  private def liveBanded(spark: org.apache.spark.sql.SparkSession,
                         st: GrowingImageIndex): DataFrame =
    Gate.readGrown(spark, st.path)
      .join(broadcast(Gate.readGrown(spark, st.tombstonesPath)),
        Seq("id"), "left_anti")

  /** Reconstruct a [[GrowingImageIndex]] from its persisted directories
    * after a restart (the durable half; see
    * [[DedupIngest.restoreGrowingState]] for the contract, including the
    * [[Gate.pruneGrown]] crash repair: without it a checkpoint-replayed
    * batch probes its own already-appended fingerprints and emits
    * spurious (id, id, hamming = 0) self pairs). */
  def restoreGrowingIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, tombstonesPath: String,
                          maxHamming: Int = 3,
                          version: Long = 0L, foldedBatch: Long = -1L,
                          canonical: Boolean = false): GrowingImageIndex = {
    Gate.pruneGrown(spark, path, foldedBatch)
    val skeleton = GrowingImageIndex(null, path, tombstonesPath,
      maxHamming, version, foldedBatch, canonical)
    skeleton.copy(banded = liveBanded(spark, skeleton))
  }

  /** RETIRE images (takedowns): tombstoned ids stop pairing immediately,
    * no index rewrite; a re-upload later folds as novel under its new
    * id. `tag` must be unique per retire on this state lineage. */
  def retire(st: GrowingImageIndex, ids: DataFrame, tag: Long): GrowingImageIndex = {
    val spark = ids.sparkSession
    Gate.growDir(ids.select(col(ids.columns.head).cast("long").as("id")),
      st.tombstonesPath, tag)
    st.copy(banded = liveBanded(spark, st), version = st.version + 1)
  }

  /** PROBE-THEN-GROW image dedup: each micro-batch's images are probed
    * against everything ingested so far, then their banded fingerprints
    * APPEND to the index (pre-append snapshot keeps the in-flight probe
    * consistent) — a re-upload of an earlier batch's image is flagged by
    * the next batch. Replay safety via [[Gate.Folded]]'s batch-id
    * fence. */
  def startGrowing(stream: Stream, state: AtomicReference[GrowingImageIndex],
                   idCol: String, payloadCol: String,
                   checkpoint: Option[String] = None)(
                   onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val h = dhashes(batch, idCol, payloadCol, st.canonical)
      val pairs = ImageDedup.dhashPairsAgainstIndex(h, st.banded, st.maxHamming)
      Gate.growDir(ImageDedup.bandedKeys(h, st.maxHamming), st.path, batchId)
      (pairs, st.copy(banded = liveBanded(batch.sparkSession, st),
        version = st.version + 1, foldedBatch = batchId))
    }(onBatch)
}
