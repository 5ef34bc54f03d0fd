package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextDedup

/** Streaming ENTITY-RESOLUTION dedup — the short-field modality of the
  * [[Gate]] family: a stream of records with a short text field (titles,
  * names, addresses, product descriptions) finds its character-level
  * near-duplicate corpus records per micro-batch against ONE persisted
  * length-blocked index ([[TextDedup.editIndex]] +
  * [[TextDedup.editPairsAgainstIndex]]) — "is this listing already in the
  * catalog, modulo typos" answered at ingest time. Gate specifics on top
  * of the family contract: blocking is LOSSLESS for the configured
  * distance (levenshtein ≥ |Δlen|; the batch side explodes the adjacent
  * length buckets and broadcasts onto one corpus scan), and the
  * (maxDist, bucketWidth, blockCols) triple rides the state so probes
  * always block the way the index was built.
  */
object EntityIngest {

  /** One corpus version's staged edit index, with the blocking
    * parameters probes must match. */
  final case class CorpusEditIndex(index: DataFrame, maxDist: Int,
                                   blockCols: Seq[String], bucketWidth: Int,
                                   version: Long)
    extends Gate.Versioned

  /** Stage the corpus (id, txt, bk, block attrs) relation once. `corpus`
    * is addressed by the two column names; `blockCols` are exact-match
    * attributes (the ER convention). `cellCap` applies the hot-cell guard
    * at build time ([[TextDedup.editIndex]]'s contract: probes into a
    * capped (block attrs, length-bucket) cell find nothing). */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 maxDist: Int, blockCols: Seq[String] = Nil,
                 bucketWidth: Int = 16, version: Long = 0L,
                 cellCap: Option[Int] = None): CorpusEditIndex = {
    require(maxDist >= 0 && bucketWidth > maxDist,
      s"bucketWidth=$bucketWidth must exceed maxDist=$maxDist (lossless blocking)")
    CorpusEditIndex(
      graft.sources.Tables.stage(
        TextDedup.editIndex(corpus, idCol, textCol, blockCols, bucketWidth,
          cellCap)),
      maxDist, blockCols, bucketWidth, version)
  }

  /** Start the per-batch ER loop: each micro-batch's records probe the
    * persisted index with the INDEX's blocking parameters; `onBatch`
    * receives the (id_batch, id_corpus, dist) pair relation plus
    * (corpusVersion, batchId). `batchBlockCols` are the batch-side paths
    * of the index's block attributes (e.g. `value.lang` for a streamed
    * payload), aligned positionally with the state's `blockCols`. */
  def start(stream: Stream, state: AtomicReference[CorpusEditIndex],
            idCol: String, textCol: String,
            batchBlockCols: Option[Seq[String]] = None,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      TextDedup.editPairsAgainstIndex(batch, idCol, textCol, st.index,
        st.maxDist, st.blockCols, st.bucketWidth, batchBlockCols)
    }(onBatch)
}
