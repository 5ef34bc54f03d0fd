package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TypedAggregators

/** Streaming DISTINCT-CARDINALITY fold — per-key vocabulary tracking over
  * evolving corpora, the sketch sibling of [[QuantileIngest]]: the state
  * is a map of HyperLogLog register vectors
  * ([[TypedAggregators.HllRegisters]]), and because registers are a pure
  * order/partitioning-independent function of the input SET (per-register
  * max), the per-batch fold is IDENTICAL to a full recompute over
  * everything seen — bitwise, not approximately (the estimate is
  * approximate; the state is exact). That is a stronger exactness story
  * than any other folding gate needs: max is idempotent, so even a
  * DOUBLE-folded batch could not corrupt the state — the replay fence
  * ([[Gate.Folded]]) still applies so emission stays exactly-once.
  *
  * Batch result: one [[KeyNovelty]] row per key present in the batch.
  * The novelty signal is ONE-SIDED by construction: `postSum < preSum`
  * PROVES the batch carried hash-distinct content the state had never
  * seen for that key (some register rose); equality only says the
  * registers carry no evidence — a genuinely new token whose hash does
  * not raise any register is invisible (the usual sketch trade; exact
  * novelty is [[DedupIngest]]'s job). Driver-small by contract: one row
  * per (key in batch), registers 2^p longs per tracked key.
  */
object CardinalityIngest {

  /** Per-key novelty evidence for one batch: the exact-integer scale sums
    * (Σ 2^(maxRank − M_j), strictly DECREASING when any register rises)
    * before and after the fold. */
  final case class KeyNovelty(key: String, preSum: Long, postSum: Long) {
    /** True ⇔ the batch provably carried never-seen content for `key`. */
    def novel: Boolean = postSum < preSum
  }

  /** The folding state: per-key dense register vectors. */
  final case class CardinalityState(regs: Map[String, Seq[Long]], p: Int,
                                    version: Long, foldedBatch: Long = -1L)
      extends Gate.Folded {
    /** Exact-integer monotone cardinality proxy for one key (smaller =
      * more distincts); the all-zero sum for untracked keys. */
    def scaleSum(key: String): Long =
      TypedAggregators.hllScaleSum(
        regs.getOrElse(key, Seq.fill(1 << p)(0L)), p)
    /** The state as persistable rows (one per tracked key). */
    def stateRows: Seq[(String, Seq[Long])] = regs.toSeq.sortBy(_._1)
  }

  /** One distributed pass: per-key register vectors of `tokenCol` — the
    * aggregator runs map-side partial (2^p-entry buffers merge across
    * the shuffle); rows never shuffle. The result is collected — one
    * register vector per key, driver-small by the gate's contract. */
  def sketchOf(df: DataFrame, keyCol: String, tokenCol: String,
               p: Int): Map[String, Seq[Long]] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string"), col(tokenCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TypedAggregators.HllRegisters(p).toColumn)
      .collect().toMap
  }

  /** Build the state once from the existing corpus. */
  def buildState(corpus: DataFrame, keyCol: String, tokenCol: String,
                 p: Int = 6, version: Long = 0L): CardinalityState =
    CardinalityState(sketchOf(corpus, keyCol, tokenCol, p), p, version)

  /** Reconstruct a persisted state ([[CardinalityState.stateRows]] + the
    * replay fence are all there is to persist). */
  def restoreState(rows: Seq[(String, Seq[Long])], p: Int, version: Long,
                   foldedBatch: Long): CardinalityState =
    CardinalityState(rows.toMap, p, version, foldedBatch)

  /** One micro-batch: sketch the batch (one map-side aggregate), merge
    * per-register max into the state, report per-key novelty evidence. */
  def foldBatch(batch: DataFrame, st: CardinalityState, keyCol: String,
                tokenCol: String, batchId: Long): (Seq[KeyNovelty], CardinalityState) = {
    val bs = sketchOf(batch, keyCol, tokenCol, st.p)
    val merged = bs.foldLeft(st.regs) { case (acc, (k, r)) =>
      acc.get(k) match {
        case None       => acc.updated(k, r)
        case Some(prev) => acc.updated(k, prev.lazyZip(r).map(math.max))
      }
    }
    val next = st.copy(regs = merged, version = st.version + 1,
      foldedBatch = batchId)
    val report = bs.keys.toSeq.sorted.map(k =>
      KeyNovelty(k, st.scaleSum(k), next.scaleSum(k)))
    (report, next)
  }

  /** The folding loop ([[Gate.startFolding]] — replay-fenced): `onBatch`
    * receives the batch's [[KeyNovelty]] report. */
  def startGate(stream: Stream, state: AtomicReference[CardinalityState],
                keyCol: String, tokenCol: String,
                checkpoint: Option[String] = None)(
                onBatch: (Seq[KeyNovelty], Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      foldBatch(batch, st, keyCol, tokenCol, batchId)
    }(onBatch)
}
