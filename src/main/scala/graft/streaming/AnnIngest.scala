package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ann

/** Streaming ANN ingest — the vector twin of [[DedupIngest]]: an embedding
  * stream retrieves its per-batch top-k nearest corpus neighbors against
  * ONE persisted LSH signature index (e.g. to attach "most similar
  * existing documents" to every newly-ingested record, or to flag
  * embedding-level near-duplicates at ingest time).
  *
  * Scale contract (mirrors DedupIngest point for point):
  *  - [[buildIndex]] runs once per corpus version: the corpus banded
  *    signature relation ([[Ann.bandedRelation]]) is staged
  *    (`Tables.stage`), so in `graft.stage.dir` mode every micro-batch
  *    scans a persisted parquet index and recomputes zero corpus
  *    signatures;
  *  - each micro-batch pays only its own (tiny, unstaged) banding
  *    projection plus one scan of the index; the batch side BROADCASTS
  *    ([[Ann.lshTopKAgainstIndex]]), the corpus never shuffles;
  *  - the corpus ROTATES between batches via the [[AtomicReference]]:
  *    build the next version outside the stream, then `state.set(next)` —
  *    foreachBatch bodies run sequentially and read the reference once at
  *    batch start, so the swap is atomic at a batch boundary and rebuild
  *    cost is paid once per version, never per batch (spec-pinned:
  *    micro-batches create no staging dirs).
  */
object AnnIngest {

  /** One corpus version's staged LSH index + the parameters it was built
    * under (probe signatures must land in the same key space). */
  final case class CorpusAnnIndex(banded: DataFrame, bits: Int, bands: Int,
                                  dim: Int, version: Long)

  /** Stage the corpus banded signature relation ONCE (per corpus
    * version). `corpus` is an (id, embedding) relation. */
  def buildIndex(corpus: DataFrame, bits: Int = 64, bands: Int = 16,
                 dim: Int = 64, version: Long = 0L): CorpusAnnIndex =
    CorpusAnnIndex(
      graft.sources.Tables.stage(
        Ann.bandedRelation(corpus, "c_id", "ce", bits, bands, dim)),
      bits, bands, dim, version)

  /** Start the per-batch retrieval loop: each micro-batch's vectors probe
    * the persisted index and `onBatch` receives the (q_id, rank,
    * neighbor_id, cos) top-k relation plus (corpusVersion, batchId).
    *
    * `idCol`/`embCol` address the stream's payload (e.g. `value.vec_id`,
    * `value.embedding` for a JSON Kafka stream). */
  def start(stream: Stream, state: AtomicReference[CorpusAnnIndex],
            idCol: String, embCol: String, k: Int,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val st = state.get()
      val q = batch.select(col(idCol).cast("long").as("id"),
        col(embCol).as("embedding"))
      onBatch(Ann.lshTopKAgainstIndex(q, st.banded, k, st.bits, st.bands, st.dim),
        st.version, batchId)
    }, checkpoint)

  /** Materialize a (id, embedding) relation to a DRIVER-LOCAL relation
    * (LocalTableScan). Gate state holds centroid/codebook relations that
    * every micro-batch re-collects into a plan literal — left as a view
    * over the source, that collect re-runs the source scan per batch;
    * localized once at build time it reads driver memory. By-contract
    * tiny (centroids/codebook, not the corpus). */
  private def localized(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val rows = df.select(col("id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    import s.implicits._
    rows.toDF("id", "embedding")
  }

  /** One corpus version's staged SEMANTIC index: the
    * [[Ann.assignToCentroids]] output plus the (driver-small, LOCALIZED)
    * centroid relation and threshold it was built under. */
  final case class CorpusSemanticIndex(assigned: DataFrame, centroids: DataFrame,
                                       threshold: Double, version: Long)

  /** Stage the corpus cluster assignment ONCE (per corpus version) for
    * the semantic redundancy gate. `corpus`/`centroids` are
    * (id, embedding) relations; centroids come from an offline
    * [[Ann.trainCentroids]] in production. */
  def buildSemanticIndex(corpus: DataFrame, centroids: DataFrame,
                         threshold: Double, version: Long = 0L): CorpusSemanticIndex =
    CorpusSemanticIndex(
      graft.sources.Tables.stage(Ann.assignToCentroids(corpus, centroids)),
      localized(centroids), threshold, version)

  /** Per-batch SemDeDup-against-the-corpus gate ([[Ann.semanticFlagAgainst]]):
    * `onBatch` receives (vec_id, cent_id, n_similar, witness_id) for every
    * batch vector — n_similar = 0 ⇔ semantically novel. Same rotation
    * contract as [[start]]: rebuild outside the stream, `state.set(next)`
    * swaps atomically at a batch boundary, micro-batches stage nothing. */
  def startSemanticGate(stream: Stream, state: AtomicReference[CorpusSemanticIndex],
                        idCol: String, embCol: String,
                        checkpoint: Option[String] = None)(
                        onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val st = state.get()
      val q = batch.select(col(idCol).cast("long").as("id"),
        col(embCol).as("embedding"))
      onBatch(Ann.semanticFlagAgainst(q, st.assigned, st.centroids, st.threshold),
        st.version, batchId)
    }, checkpoint)

  /** One corpus version's staged PQ code relation plus the (driver-small)
    * codebook it was encoded under — [[Ann.pqCodes]] output. */
  final case class CorpusPqIndex(codes: DataFrame, codebook: DataFrame,
                                 m: Int, version: Long)

  /** Encode and stage the corpus PQ codes ONCE (per corpus version). */
  def buildPqIndex(corpus: DataFrame, codebook: DataFrame, m: Int = 8,
                   version: Long = 0L): CorpusPqIndex =
    CorpusPqIndex(
      graft.sources.Tables.stage(Ann.pqCodes(corpus, codebook, m)),
      localized(codebook), m, version)

  /** Per-batch PQ retrieval against the pre-encoded corpus
    * ([[Ann.pqTopKAgainstCodes]]): each micro-batch's vectors get their
    * ADC top-k over the staged code relation — the corpus embeddings are
    * never read at probe time, only m small ints per row. Same rotation
    * contract as [[start]]. */
  def startPqGate(stream: Stream, state: AtomicReference[CorpusPqIndex],
                  idCol: String, embCol: String, k: Int,
                  checkpoint: Option[String] = None)(
                  onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val st = state.get()
      val q = batch.select(col(idCol).cast("long").as("id"),
        col(embCol).as("embedding"))
      onBatch(Ann.pqTopKAgainstCodes(q, st.codes, st.codebook, k, st.m),
        st.version, batchId)
    }, checkpoint)
}
