package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TypedAggregators

/** Streaming CROSS-SOURCE OVERLAP fold — the set-algebra sibling of
  * [[CardinalityIngest]]: the state is a map of k-minimum-values sketches
  * ([[TypedAggregators.KmvValues]]) keyed by source, and the per-batch
  * report is the batch-touched slice of the source-overlap matrix — the
  * signal a mixing pipeline watches as new data streams in ("is src_a
  * converging on src_b's content?"). Like HLL registers, a k-set is a
  * pure order/partitioning-independent IDEMPOTENT function of the input
  * SET (the k smallest distinct hashes), so the per-batch fold is
  * IDENTICAL to a full recompute over everything seen — bitwise — and
  * even a double-folded batch could not corrupt the state; the
  * [[Gate.Folded]] replay fence still applies so emission stays
  * exactly-once.
  *
  * What KMV buys over the HLL gate is the PAIR algebra: the union's
  * exact k-set computes from two k-sets alone ([[TypedAggregators
  * .kmvMerge]]), and merged-k-set membership in both sides estimates
  * Jaccard/intersection — per-pair, from driver-small state, no data
  * rescan. All reported values are exact integers over the sketch
  * states (the float (k−1)·2^60/v_k cardinality estimate stays
  * off-engine — the hllScaleSum discipline).
  *
  * Driver-small by contract: ≤ k longs per tracked source; the report is
  * one row per (touched source, other tracked source) pair.
  */
object OverlapIngest {

  /** One pair's overlap evidence: of the union's k smallest distinct
    * hashes (`kUnion` of them — < k only while the union itself is
    * smaller), `nShared` appear in BOTH sides' k-sets; nShared/kUnion
    * estimates the Jaccard. `kthUnion` is the union's k-th minimum —
    * the exact-integer monotone cardinality proxy (smaller = more
    * distinct values in the union). */
  final case class PairOverlap(keyA: String, keyB: String, nShared: Long,
                               kUnion: Long, kthUnion: Long)

  /** The folding state: per-key ascending k-sets. */
  final case class OverlapState(ksets: Map[String, Seq[Long]], k: Int,
                                version: Long, foldedBatch: Long = -1L)
      extends Gate.Folded {
    /** The state as persistable rows (one per tracked key). */
    def stateRows: Seq[(String, Seq[Long])] = ksets.toSeq.sortBy(_._1)

    /** Overlap evidence for one (unordered) pair of tracked keys. */
    def overlapOf(a: String, b: String): PairOverlap = {
      val (ka, kb) = (ksets.getOrElse(a, Nil), ksets.getOrElse(b, Nil))
      val merged = TypedAggregators.kmvMerge(ka, kb, k)
      val sa = ka.toSet
      val sb = kb.toSet
      PairOverlap(a, b, merged.count(v => sa(v) && sb(v)).toLong,
        merged.size.toLong, if (merged.isEmpty) 0L else merged.last)
    }

    /** The full overlap matrix over tracked keys (keyA < keyB). */
    def overlapMatrix: Seq[PairOverlap] = {
      val keys = ksets.keys.toSeq.sorted
      for {
        (a, i) <- keys.zipWithIndex
        b <- keys.drop(i + 1)
      } yield overlapOf(a, b)
    }
  }

  /** One distributed pass: per-key k-sets of `tokenCol` — the aggregator
    * runs map-side partial (≤ k-long buffers merge across the shuffle);
    * rows never shuffle. Collected — driver-small by contract. */
  def sketchOf(df: DataFrame, keyCol: String, tokenCol: String,
               k: Int): Map[String, Seq[Long]] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string"), col(tokenCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TypedAggregators.KmvValues(k).toColumn)
      .collect().toMap
  }

  /** Build the state once from the existing corpus. */
  def buildState(corpus: DataFrame, keyCol: String, tokenCol: String,
                 k: Int = 64, version: Long = 0L): OverlapState =
    OverlapState(sketchOf(corpus, keyCol, tokenCol, k), k, version)

  /** Reconstruct a persisted state ([[OverlapState.stateRows]] + the
    * replay fence are all there is to persist). */
  def restoreState(rows: Seq[(String, Seq[Long])], k: Int, version: Long,
                   foldedBatch: Long): OverlapState =
    OverlapState(rows.toMap, k, version, foldedBatch)

  /** One micro-batch: sketch the batch (one map-side aggregate), merge
    * k-sets ([[TypedAggregators.kmvMerge]] — set semantics, idempotent),
    * report the overlap rows for every pair with a batch-touched side
    * (keyA < keyB, post-fold state). */
  def foldBatch(batch: DataFrame, st: OverlapState, keyCol: String,
                tokenCol: String, batchId: Long): (Seq[PairOverlap], OverlapState) = {
    val bs = sketchOf(batch, keyCol, tokenCol, st.k)
    val merged = bs.foldLeft(st.ksets) { case (acc, (key, ks)) =>
      acc.updated(key, TypedAggregators.kmvMerge(
        acc.getOrElse(key, Nil), ks, st.k))
    }
    val next = st.copy(ksets = merged, version = st.version + 1,
      foldedBatch = batchId)
    val touched = bs.keySet
    val report = next.ksets.keys.toSeq.sorted.combinations(2).collect {
      case Seq(a, b) if touched(a) || touched(b) => next.overlapOf(a, b)
    }.toSeq
    (report, next)
  }

  /** The folding loop ([[Gate.startFolding]] — replay-fenced): `onBatch`
    * receives the batch-touched slice of the overlap matrix. */
  def startGate(stream: Stream, state: AtomicReference[OverlapState],
                keyCol: String, tokenCol: String,
                checkpoint: Option[String] = None)(
                onBatch: (Seq[PairOverlap], Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      foldBatch(batch, st, keyCol, tokenCol, batchId)
    }(onBatch)
}
