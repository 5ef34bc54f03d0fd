package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextDedup

/** Streaming incremental near-duplicate detection: the production ingest
  * shape that `TextDedup.minhashLshPairsAgainstIndex` exists for — a
  * document stream deduplicated per micro-batch against ONE persisted
  * corpus LSH index.
  *
  * Scale contract:
  *  - [[buildIndex]] runs once per corpus version: corpus shingles + band
  *    keys are staged (`Tables.stage`), so in `graft.stage.dir` mode they
  *    are parquet staging tables that EVERY subsequent micro-batch scans
  *    without recomputing a single corpus signature;
  *  - each micro-batch pays only its own (tiny) shingle/band projections —
  *    deliberately UNSTAGED (`shingleProjection`/`bandKeyProjection`): a
  *    staged batch side would write one parquet dir per micro-batch for
  *    zero reuse — plus one scan of the persisted index; the batch side
  *    broadcasts, the corpus never shuffles;
  *  - exactly-once: the batch id rides into `onBatch`, and the stream
  *    checkpoint replays unacknowledged batches — an idempotent sink
  *    (e.g. overwrite-by-batch-id) completes the guarantee.
  *
  * This is the streaming twin of the batch registry query
  * `x_dedup_incremental` (same operator, same semantics — the spec drives
  * both from the same corpus and asserts identical pairs).
  */
object DedupIngest {

  /** A corpus version's reusable dedup state: staged shingle relation +
    * staged LSH band index, with the parameters they were built under
    * (batch-side signatures must land in the same key space). */
  final case class CorpusIndex(shingled: DataFrame, bandKeys: DataFrame,
                               n: Int, k: Int, bands: Int)

  /** Stage the corpus shingles and band index ONCE (per corpus version).
    * With `graft.stage.dir` set, both land as persisted parquet staging
    * tables — the index survives the session and is scanned, not rebuilt,
    * by every micro-batch (and any other consumer). */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 12, bands: Int = 4): CorpusIndex = {
    val sh = TextDedup.shingleRelation(corpus, idCol, textCol, n)
    CorpusIndex(sh, TextDedup.minhashBandKeys(sh, k, bands), n, k, bands)
  }

  /** Start the per-batch dedup loop on a document stream: each micro-batch
    * is shingled (unstaged), joined against the persisted corpus index,
    * and its near-duplicate pairs (da = batch id, db = corpus id, jaccard)
    * are handed to `onBatch` with the micro-batch id.
    *
    * `idCol`/`textCol` address the stream's payload (e.g. `value.doc_id`,
    * `value.text` for a JSON Kafka stream). */
  def start(stream: Stream, index: CorpusIndex,
            idCol: String, textCol: String,
            threshold: Double = 0.5, bandCap: Option[Int] = None,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val sh = TextDedup.shingleProjection(batch, idCol, textCol, index.n)
      val pairs = TextDedup.minhashLshPairsAgainstIndex(
        sh, index.shingled, index.bandKeys,
        index.k, index.bands, threshold, bandCap)
      onBatch(pairs, batchId)
    }, checkpoint)
}
