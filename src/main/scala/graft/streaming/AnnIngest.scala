package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ann

/** Streaming ANN ingest — the vector members of the [[Gate]] family: an
  * embedding stream probes ONE persisted corpus index per micro-batch,
  * under the family's staged-index / broadcast-probe / atomic-rotation
  * contract (see [[Gate]]). Three gates live here:
  *
  *  - [[start]]: LSH top-k retrieval (attach "most similar existing
  *    documents" to every newly-ingested record, or flag embedding-level
  *    near-duplicates at ingest time);
  *  - [[startSemanticGate]]: SemDeDup-against-the-corpus redundancy flag;
  *  - [[startPqGate]]: ADC top-k over pre-encoded PQ codes — the corpus
  *    embeddings are never read at probe time, only m small ints per row.
  */
object AnnIngest {

  /** One corpus version's staged LSH index ([[Ann.bandedRelation]]).
    * `multiProbe` rides the state (the [[ImageIngest]] `canonical`
    * discipline: a probe-mode flag must rotate WITH the index it
    * addresses): when set, probes route through
    * [[Ann.lshTopKMultiProbeAgainstIndex]] — recall rises from the SAME
    * persisted index, the corpus banding is byte-identical either way. */
  final case class CorpusAnnIndex(banded: DataFrame, bits: Int, bands: Int,
                                  dim: Int, version: Long,
                                  multiProbe: Boolean = false) extends Gate.Versioned

  /** Stage the corpus banded signature relation ONCE (per corpus
    * version). `corpus` is an (id, embedding) relation. */
  def buildIndex(corpus: DataFrame, bits: Int = 64, bands: Int = 16,
                 dim: Int = 64, version: Long = 0L,
                 multiProbe: Boolean = false): CorpusAnnIndex =
    CorpusAnnIndex(
      graft.sources.Tables.stage(
        Ann.bandedRelation(corpus, "c_id", "ce", bits, bands, dim)),
      bits, bands, dim, version, multiProbe)

  /** The probe shared by both gate modes: the state's flag picks
    * single-probe or multi-probe against the SAME banded index. */
  private def probeTopK(q: DataFrame, banded: DataFrame, k: Int,
                        bits: Int, bands: Int, dim: Int,
                        multiProbe: Boolean): DataFrame =
    if (multiProbe) Ann.lshTopKMultiProbeAgainstIndex(q, banded, k, bits, bands, dim)
    else Ann.lshTopKAgainstIndex(q, banded, k, bits, bands, dim)

  /** Start the per-batch retrieval loop: each micro-batch's vectors probe
    * the persisted index ([[Ann.lshTopKAgainstIndex]], or the multi-probe
    * variant when the state says so — batch side broadcasts, corpus never
    * shuffles) and `onBatch` receives the (q_id, rank, neighbor_id, cos)
    * top-k relation plus (corpusVersion, batchId).
    *
    * `idCol`/`embCol` address the stream's payload (e.g. `value.vec_id`,
    * `value.embedding` for a JSON Kafka stream). */
  def start(stream: Stream, state: AtomicReference[CorpusAnnIndex],
            idCol: String, embCol: String, k: Int,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      probeTopK(vectors(batch, idCol, embCol),
        st.banded, k, st.bits, st.bands, st.dim, st.multiProbe)
    }(onBatch)

  /** The (id, embedding) probe projection shared by the gates here. */
  private def vectors(batch: DataFrame, idCol: String, embCol: String): DataFrame =
    batch.select(col(idCol).cast("long").as("id"), col(embCol).as("embedding"))

  /** SELF-GROWING ANN index state: the staged banded-signature directory
    * fold appends go to, plus the signature parameters every fold must
    * reuse. Requires parquet staging mode (`graft.stage.dir`) — the fold
    * is a batch-sized APPEND to the persisted index (the vector-database
    * ingest shape: every accepted vector is immediately searchable by
    * later batches). */
  final case class GrowingAnnIndex(banded: DataFrame, path: String,
                                   tombstonesPath: String,
                                   bits: Int, bands: Int, dim: Int,
                                   version: Long, foldedBatch: Long = -1L,
                                   multiProbe: Boolean = false)
    extends Gate.Folded

  /** Stage the initial corpus banding once, capturing its directory for
    * fold appends (plus an empty tombstone relation for [[retire]]).
    * `corpus` is an (id, embedding) relation. */
  def buildGrowingIndex(corpus: DataFrame, bits: Int = 64, bands: Int = 16,
                        dim: Int = 64, version: Long = 0L,
                        multiProbe: Boolean = false): GrowingAnnIndex = {
    val spark = corpus.sparkSession
    val st = graft.sources.Tables.stageTracked(
      Ann.bandedRelation(corpus, "c_id", "ce", bits, bands, dim))
    val tb = graft.sources.Tables.stageTracked(
      spark.createDataset(Seq.empty[Long])(
        org.apache.spark.sql.Encoders.scalaLong).toDF("c_id"))
    require(st.path.isDefined && tb.path.isDefined,
      "buildGrowingIndex requires parquet staging mode (set graft.stage.dir): " +
        "the growing gate folds by appending to the persisted index directory")
    GrowingAnnIndex(st.df, st.path.get, tb.path.get, bits, bands, dim, version,
      multiProbe = multiProbe)
  }

  /** The probe-visible index: the grown banding with the tombstone
    * anti-filter applied (the by-contract-tiny retired-id relation
    * broadcasts). */
  private def liveBanded(spark: org.apache.spark.sql.SparkSession,
                         st: GrowingAnnIndex): DataFrame =
    Gate.readGrown(spark, st.path)
      .join(broadcast(Gate.readGrown(spark, st.tombstonesPath)),
        Seq("c_id"), "left_anti")

  /** Reconstruct a [[GrowingAnnIndex]] from its persisted directories
    * after a restart (the durable half; see
    * [[DedupIngest.restoreGrowingState]] for the contract, including the
    * [[Gate.pruneGrown]] crash repair: without it a checkpoint-replayed
    * batch probes its own already-appended signatures and a rank-1
    * cos-1.0 self neighbor eats one of the k slots). */
  def restoreGrowingIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, tombstonesPath: String,
                          bits: Int = 64, bands: Int = 16, dim: Int = 64,
                          version: Long = 0L, foldedBatch: Long = -1L,
                          multiProbe: Boolean = false): GrowingAnnIndex = {
    Gate.pruneGrown(spark, path, foldedBatch)
    val skeleton = GrowingAnnIndex(null, path, tombstonesPath,
      bits, bands, dim, version, foldedBatch, multiProbe)
    skeleton.copy(banded = liveBanded(spark, skeleton))
  }

  /** RETIRE vectors (the delete half of a vector store): append the ids
    * to the tombstone relation — retired vectors stop being retrievable
    * immediately, with no index rewrite; re-ingesting an embedding later
    * folds as novel under its new id. `tag` must be unique per retire on
    * this state lineage. Swap the result in between batches. */
  def retire(st: GrowingAnnIndex, ids: DataFrame, tag: Long): GrowingAnnIndex = {
    val spark = ids.sparkSession
    Gate.growDir(ids.select(col(ids.columns.head).cast("long").as("c_id")),
      st.tombstonesPath, tag)
    st.copy(banded = liveBanded(spark, st), version = st.version + 1)
  }

  /** PROBE-THEN-GROW retrieval loop: each micro-batch's vectors first
    * retrieve their top-k against everything ingested so far, then the
    * batch's own banded signatures APPEND to the index (the in-flight
    * probe holds the pre-append file snapshot, so its results are
    * consistent) — batch N+1 can retrieve batch N's vectors. Replay
    * safety via [[Gate.Folded]]'s batch-id fence. Spec pins the grown
    * index content identical to a fresh build over all ingested vectors
    * and cross-batch retrievability. */
  def startGrowing(stream: Stream, state: AtomicReference[GrowingAnnIndex],
                   idCol: String, embCol: String, k: Int,
                   checkpoint: Option[String] = None)(
                   onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val q = vectors(batch, idCol, embCol)
      val topk = probeTopK(q, st.banded, k, st.bits, st.bands, st.dim, st.multiProbe)
      Gate.growDir(Ann.bandedRelation(q, "c_id", "ce", st.bits, st.bands, st.dim),
        st.path, batchId)
      (topk, st.copy(banded = liveBanded(batch.sparkSession, st),
        version = st.version + 1, foldedBatch = batchId))
    }(onBatch)

  /** One corpus version's staged SEMANTIC index: the
    * [[Ann.assignToCentroids]] output plus the (driver-small, LOCALIZED —
    * see [[Gate.localizedVectors]]) centroid relation and threshold it was
    * built under. */
  final case class CorpusSemanticIndex(assigned: DataFrame, centroids: DataFrame,
                                       threshold: Double, version: Long)
    extends Gate.Versioned

  /** Stage the corpus cluster assignment ONCE (per corpus version) for
    * the semantic redundancy gate. `corpus`/`centroids` are
    * (id, embedding) relations; centroids come from an offline
    * [[Ann.trainCentroids]] in production. */
  def buildSemanticIndex(corpus: DataFrame, centroids: DataFrame,
                         threshold: Double, version: Long = 0L): CorpusSemanticIndex =
    CorpusSemanticIndex(
      graft.sources.Tables.stage(Ann.assignToCentroids(corpus, centroids)),
      Gate.localizedVectors(centroids), threshold, version)

  /** Per-batch SemDeDup-against-the-corpus gate ([[Ann.semanticFlagAgainst]]):
    * `onBatch` receives (vec_id, cent_id, n_similar, witness_id) for every
    * batch vector — n_similar = 0 ⇔ semantically novel. */
  def startSemanticGate(stream: Stream, state: AtomicReference[CorpusSemanticIndex],
                        idCol: String, embCol: String,
                        checkpoint: Option[String] = None)(
                        onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      Ann.semanticFlagAgainst(vectors(batch, idCol, embCol),
        st.assigned, st.centroids, st.threshold)
    }(onBatch)

  /** One corpus version's staged PQ code relation plus the (driver-small,
    * LOCALIZED) codebook it was encoded under — [[Ann.pqCodes]] output. */
  final case class CorpusPqIndex(codes: DataFrame, codebook: DataFrame,
                                 m: Int, version: Long) extends Gate.Versioned

  /** Encode and stage the corpus PQ codes ONCE (per corpus version). */
  def buildPqIndex(corpus: DataFrame, codebook: DataFrame, m: Int = 8,
                   version: Long = 0L): CorpusPqIndex =
    CorpusPqIndex(
      graft.sources.Tables.stage(Ann.pqCodes(corpus, codebook, m)),
      Gate.localizedVectors(codebook), m, version)

  /** Per-batch PQ retrieval against the pre-encoded corpus
    * ([[Ann.pqTopKAgainstCodes]]): each micro-batch's vectors get their
    * ADC top-k over the staged code relation. */
  def startPqGate(stream: Stream, state: AtomicReference[CorpusPqIndex],
                  idCol: String, embCol: String, k: Int,
                  checkpoint: Option[String] = None)(
                  onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      Ann.pqTopKAgainstCodes(vectors(batch, idCol, embCol),
        st.codes, st.codebook, k, st.m)
    }(onBatch)
}
