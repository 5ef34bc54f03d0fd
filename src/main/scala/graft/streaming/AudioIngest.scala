package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Media, TextDedup}

/** Streaming perceptual AUDIO dedup — the audio modality of the [[Gate]]
  * family: a recording stream finds its trimmed/re-volumed near-duplicate
  * corpus recordings per micro-batch against ONE persisted contour-shingle
  * index ([[Media.audioShingles64]] +
  * [[TextDedup.containmentPairsAgainstIndex]]), so re-uploads of cut or
  * re-mastered audio are flagged at ingest time. Gate specifics on top of
  * the family contract: every corpus recording is parsed ONCE at
  * [[buildIndex]] time and only the 8-byte shingles are staged (the
  * shingle arrays plus their exploded index — both relations the probe
  * needs); micro-batches parse their own payloads only.
  */
object AudioIngest {
  // Frozen-corpus gate; for an arrive-and-grow corpus feed [[shingles]]
  // (any mode) to [[ContainmentIngest.startGrowing]] — the generic
  // probe-then-grow containment loop.

  /** One corpus version's staged shingle relation + exploded index, with
    * the window parameters probes must match. `rateNorm = Some((hopsPerSec,
    * winHops))` selects the RESAMPLE-robust time-normalized grid
    * ([[Media.audioShinglesRate]] — win/hop are then ignored): a re-upload
    * at a different sample rate pairs where the sample-sized grid provably
    * misses it. `cdc = Some((w, divisor))` selects CONTENT-DEFINED chunk
    * keys instead ([[Media.audioCdcChunks]]): re-uploads trimmed at
    * ARBITRARY (non-hop-aligned) offsets pair where any fixed grid
    * provably misses them. The mode flags ride the state so probes
    * always hash the way the index was built; at most one may be set
    * (each names a different invariance — composing them is a different
    * operator, refused rather than silently approximated). */
  final case class CorpusAudioIndex(shingled: DataFrame, ex: DataFrame,
                                    win: Int, hop: Int, version: Long,
                                    rateNorm: Option[(Int, Int)] = None,
                                    cdc: Option[(Int, Int)] = None)
    extends Gate.Versioned

  /** Parse + shingle the corpus once and stage the (id, sh) relation and
    * its exploded (id, s) index. `corpus` is an (id, payload) relation
    * addressed by the two column names. */
  def buildIndex(corpus: DataFrame, idCol: String, payloadCol: String,
                 win: Int = 1024, hop: Int = 256,
                 version: Long = 0L,
                 rateNorm: Option[(Int, Int)] = None,
                 cdc: Option[(Int, Int)] = None): CorpusAudioIndex = {
    require(rateNorm.isEmpty || cdc.isEmpty,
      "rateNorm and cdc are distinct invariances — pick one per index")
    val sh = graft.sources.Tables.stage(
      shingles(corpus, idCol, payloadCol, win, hop, rateNorm, cdc))
    CorpusAudioIndex(sh,
      graft.sources.Tables.stage(
        sh.select(col("id"), explode(col("sh")).as("s"))),
      win, hop, version, rateNorm, cdc)
  }

  /** (id, sh) shingle/chunk-key relation for an (id, payload) relation;
    * unparseable or too-short recordings drop out (as do, in rate mode,
    * recordings whose sample rate the hop grid cannot align to). */
  def shingles(df: DataFrame, idCol: String, payloadCol: String,
               win: Int, hop: Int,
               rateNorm: Option[(Int, Int)] = None,
               cdc: Option[(Int, Int)] = None): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .flatMap { case (id, payload) =>
        ((rateNorm, cdc) match {
          case (Some((hps, wh)), _) => Media.audioShinglesRate(payload, hps, wh)
          case (_, Some((w, dv)))   => Media.audioCdcChunks(payload, w, dv)
          case _                    => Media.audioShingles64(payload, win, hop)
        }).map(sh => (id, sh))
      }(Encoders.product[(Long, Array[Long])])
      .toDF("id", "sh")

  /** Start the per-batch dedup loop: each micro-batch's recordings are
    * parsed, shingled with the INDEX's grid, and probed against the
    * persisted index; `onBatch` receives the (da = batch id, db = corpus
    * id, c_ab, c_ba) containment pair relation plus (corpusVersion,
    * batchId). */
  def start(stream: Stream, state: AtomicReference[CorpusAudioIndex],
            idCol: String, payloadCol: String, threshold: Double,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      TextDedup.containmentPairsAgainstIndex(
        shingles(batch, idCol, payloadCol, st.win, st.hop, st.rateNorm, st.cdc),
        st.shingled, st.ex, threshold)
    }(onBatch)
}
