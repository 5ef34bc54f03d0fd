package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{BloomDedup, TextDedup}

/** Streaming incremental near-duplicate detection — the text members of
  * the [[Gate]] family: a document stream deduplicated per micro-batch
  * against ONE persisted corpus LSH index (see [[Gate]] for the shared
  * staged-index / broadcast-probe / atomic-rotation contract).
  *
  * This is the streaming twin of the batch registry query
  * `x_dedup_incremental` (same operator, same semantics — the spec drives
  * both from the same corpus and asserts identical pairs).
  *
  * [[startGated]] is the COMPOSED production pipeline: a bloom exact-dedup
  * pre-gate ([[graft.operators.BloomDedup]]) in front of the LSH join,
  * with atomic corpus-version rotation between micro-batches.
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

  /** Adapter for the PINNED-corpus loop ([[start]] takes an index, not a
    * rotating reference — the caller has one frozen corpus version). */
  private final case class Pinned(index: CorpusIndex) extends Gate.Versioned {
    def version: Long = 0L
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
    Gate.start(stream, new AtomicReference(Pinned(index)), checkpoint) {
      (batch, st) =>
        val sh = TextDedup.shingleProjection(batch, idCol, textCol, st.index.n)
        TextDedup.minhashLshPairsAgainstIndex(
          sh, st.index.shingled, st.index.bandKeys,
          st.index.k, st.index.bands, threshold, bandCap)
    } { (pairs, _, batchId) => onBatch(pairs, batchId) }

  /** One corpus version's FULL dedup state for the combined gate: the LSH
    * near-dup index, the staged (db, __digest) exact-content relation, and
    * the bloom filter over those digests (a plan literal — zero per-batch
    * corpus work for the exact gate). `version` tags emitted batches so a
    * sink can attribute pairs to the corpus they were deduped against. */
  final case class CorpusState(index: CorpusIndex, digests: DataFrame,
                               exactFilter: Array[Byte], version: Long)
    extends Gate.Versioned

  /** Build a [[CorpusState]] (once per corpus version): stages the shingle
    * relation, the band index, and the md5 content-digest relation, then
    * folds the digests into a bloom filter ([[BloomDedup.buildFilter]]).
    * `expectedItems` ≤ 0 sizes the filter from an exact count of the
    * (tiny, staged) digest relation — one extra scan of 16-byte rows. */
  def buildState(corpus: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 12, bands: Int = 4,
                 fpp: Double = 0.01, expectedItems: Long = 0L,
                 version: Long = 0L): CorpusState = {
    val index = buildIndex(corpus, idCol, textCol, n, k, bands)
    val digests = graft.sources.Tables.stage(corpus.select(
      col(idCol).cast("long").as("db"), md5(col(textCol)).as("__digest")))
    val items = if (expectedItems > 0L) expectedItems else digests.count()
    CorpusState(index, digests,
      BloomDedup.buildFilter(digests, "__digest", items, fpp), version)
  }

  /** The COMPOSED per-batch production gate: exact dedup first (bloom
    * pre-gate + exact settle), then near-dup LSH on the survivors only.
    * Per micro-batch:
    *
    *   1. the bloom filter — a scan-fused literal Filter, no join, no
    *      corpus access — passes only rows whose md5 content digest MIGHT
    *      be in the corpus (all true exact dups + ~fpp false positives);
    *   2. those few candidates broadcast onto the staged corpus digest
    *      relation to settle EXACTLY → `exactPairs` (da = batch id,
    *      db = corpus id with identical content; no false drops — a bloom
    *      false positive simply fails the settle join). The settle join
    *      runs ONCE per micro-batch: its (tiny) result is materialized
    *      and feeds both the sink and the survivor anti-join as a local
    *      relation (see [[gateBatch]]);
    *   3. rows with an exact match skip shingling entirely (their LSH
    *      pairs are foregone conclusions); the SURVIVORS run
    *      [[TextDedup.minhashLshPairsAgainstIndex]] against the persisted
    *      band index → `nearPairs` (da, db, jaccard).
    *
    * Corpus rotation per the [[Gate]] contract. Within-batch duplicates
    * are out of scope here (two identical NEW documents emit no pair —
    * neither is in the corpus yet); run [[TextDedup.exactGroups]] on the
    * batch first if that matters.
    * `onBatch` receives (exactPairs, nearPairs, corpusVersion, batchId). */
  def startGated(stream: Stream, state: AtomicReference[CorpusState],
                 idCol: String, textCol: String,
                 threshold: Double = 0.5, bandCap: Option[Int] = None,
                 checkpoint: Option[String] = None)(
                 onBatch: (DataFrame, DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      gateBatch(batch, st, idCol, textCol, threshold, bandCap)
    } { case ((exactPairs, nearPairs), version, batchId) =>
      onBatch(exactPairs, nearPairs, version, batchId)
    }

  /** One micro-batch through the gate (see [[startGated]]) — exposed so
    * specs and the bench harness drive the exact per-batch plan the
    * stream runs. Single-pass settle: the exact-pair set is bounded by
    * |batch| × content-duplicate multiplicity (tiny by contract — the
    * corpus digest relation is near-unique), so the settle join is
    * materialized ONCE to the driver and re-enters BOTH consumers (the
    * caller's sink and the survivor anti-join) as a local relation —
    * previously the lazy `exactPairs` subplan re-ran the settle join in
    * each consumer, i.e. twice per micro-batch. */
  def gateBatch(batch: DataFrame, st: CorpusState, idCol: String, textCol: String,
                threshold: Double = 0.5, bandCap: Option[Int] = None)
      : (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val withDigest = batch.withColumn("__digest", md5(col(textCol)))
    val cand = BloomDedup.probe(withDigest, "__digest", st.exactFilter)
    val pairRows = broadcast(
        cand.select(col(idCol).cast("long").as("da"), col("__digest")))
      .join(st.digests, "__digest")
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exactPairs = spark.createDataset(pairRows)(
      org.apache.spark.sql.Encoders.product[(Long, Long)]).toDF("da", "db")
    val exactIds = spark.createDataset(pairRows.map(_._1).distinct)(
      org.apache.spark.sql.Encoders.scalaLong).toDF("da")
    val survivors = withDigest.join(broadcast(exactIds),
      col(idCol).cast("long") === col("da"), "left_anti")
    val nearPairs = TextDedup.minhashLshPairsAgainstIndex(
      TextDedup.shingleProjection(survivors, idCol, textCol, st.index.n),
      st.index.shingled, st.index.bandKeys,
      st.index.k, st.index.bands, threshold, bandCap)
    (exactPairs, nearPairs)
  }
}
