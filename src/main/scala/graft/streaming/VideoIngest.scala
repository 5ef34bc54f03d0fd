package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Media, MediaRecord, TextDedup}

/** Streaming VIDEO dedup — the video modality of the [[Gate]] family:
  * an upload stream finds its re-containerized / trimmed near-duplicate
  * corpus videos per micro-batch against ONE persisted frame-digest
  * index ([[Media.videoFrameDigestSets]] +
  * [[TextDedup.containmentPairsAgainstIndex]]). The container never
  * matters — only the demuxed frame bytes do — so re-muxed copies (same
  * frames, different chunk layout/fps metadata) and cuts that keep
  * byte-identical frames are flagged at ingest. Gate specifics on top of
  * the family contract: every corpus video is demuxed ONCE at
  * [[buildIndex]] time and only the digest sets are staged; micro-batches
  * demux their own payloads only.
  */
object VideoIngest {
  // Frozen-corpus gate; for an arrive-and-grow corpus feed the frame
  // digest-set projection to [[ContainmentIngest.startGrowing]] — the
  // generic probe-then-grow containment loop.

  /** One corpus version's staged digest-set relation + exploded index.
    * `perceptual` records which digester built it, so probes are
    * guaranteed to land in the same key space (byte md5 tokens and
    * dHash hex tokens can never legitimately join). */
  final case class CorpusVideoIndex(digests: DataFrame, ex: DataFrame,
                                    perceptual: Boolean,
                                    version: Long) extends Gate.Versioned

  /** Demux + digest the corpus once and stage the (id, sh) relation and
    * its exploded (id, s) index. `corpus` is an (id, payload) relation
    * addressed by the two column names. `perceptual = true` switches
    * from byte digests ([[Media.videoFrameDigestSets]]) to decoded-frame
    * dHashes ([[Media.videoPerceptualDigestSets]]) — the re-encode-robust
    * variant: corpus videos that later arrive re-compressed at a
    * different quality still containment-match, which byte digests
    * provably cannot (MediaSpec). Decode cost is paid once per corpus
    * version, at build time. */
  def buildIndex(corpus: DataFrame, idCol: String, payloadCol: String,
                 version: Long = 0L,
                 perceptual: Boolean = false): CorpusVideoIndex = {
    val sets = graft.sources.Tables.stage(
      digestSets(corpus, idCol, payloadCol, perceptual).toDF())
    CorpusVideoIndex(sets,
      graft.sources.Tables.stage(
        sets.select(col("id"), explode(col("sh")).as("s"))),
      perceptual, version)
  }

  /** (id, sh) frame-digest relation for an (id, payload) relation;
    * unparseable payloads emit empty sets (never pair candidates). */
  def digestSets(df: DataFrame, idCol: String, payloadCol: String,
                 perceptual: Boolean = false): Dataset[Media.FrameDigests] = {
    val recs = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .map { case (id, p) => MediaRecord(id, "avi", p) }(
        Encoders.product[MediaRecord])
    if (perceptual) Media.videoPerceptualDigestSets(recs)
    else Media.videoFrameDigestSets(recs)
  }

  /** Start the per-batch dedup loop: each micro-batch's videos are
    * demuxed, digested (with the digester the index was built with), and
    * probed against the persisted index; `onBatch` receives the
    * (da = batch id, db = corpus id, c_ab, c_ba) containment pair
    * relation plus (corpusVersion, batchId). */
  def start(stream: Stream, state: AtomicReference[CorpusVideoIndex],
            idCol: String, payloadCol: String, threshold: Double,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      TextDedup.containmentPairsAgainstIndex(
        digestSets(batch, idCol, payloadCol, st.perceptual).toDF(),
        st.digests, st.ex, threshold)
    }(onBatch)
}
