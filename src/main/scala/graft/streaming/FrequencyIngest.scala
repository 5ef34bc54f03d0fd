package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TypedAggregators

/** Streaming FREQUENCY fold — heavy-hitter tracking over evolving corpora,
  * the count–min sibling of [[CardinalityIngest]]: the state is one
  * count–min cell vector ([[TypedAggregators.CmsCounts]]), and because the
  * cells are a pure order/partitioning-independent function of the input
  * MULTISET (cell-wise sums commute), the per-batch fold is IDENTICAL to a
  * full recompute over everything seen — bitwise. One deliberate contrast
  * with the cardinality gate: HLL's per-register max is idempotent, so
  * even a double-folded batch could not corrupt that state; CMS addition
  * is NOT idempotent — a double-folded batch double-counts — which makes
  * the [[Gate.Folded]] replay fence load-bearing here, not just an
  * emission-dedup nicety (pinned in StreamingFrequencySpec).
  *
  * Batch result: one [[TokenEvidence]] row per DISTINCT token in the
  * batch. The signal is ONE-SIDED in the opposite direction from HLL
  * novelty: count–min only over-estimates, so `est < threshold` PROVES
  * the token's true cumulative count is below the threshold
  * (`provedLight`); `est ≥ threshold` proves nothing — those are
  * CANDIDATES a consumer verifies with an exact count over just the
  * candidate set (the x_heavy_hitters two-phase shape). Driver-small by
  * the gate contract: one row per distinct batch token, state
  * depth·2^widthBits longs total.
  */
object FrequencyIngest {

  /** Per-token evidence for one batch: the batch's own weight for the
    * token and the post-fold count–min estimate of its cumulative count. */
  final case class TokenEvidence(token: String, batchWeight: Long,
                                 est: Long, threshold: Long) {
    /** True ⇔ the token's true cumulative count is PROVABLY below the
      * threshold (est upper-bounds the true count). */
    def provedLight: Boolean = est < threshold
    /** Possible heavy hitter — verify exactly before acting. */
    def candidate: Boolean = !provedLight
  }

  /** The folding state: one dense count–min cell vector. */
  final case class FrequencyState(cells: Seq[Long], depth: Int,
                                  widthBits: Int, threshold: Long,
                                  version: Long, foldedBatch: Long = -1L)
      extends Gate.Folded {
    /** Over-estimating point estimate of `token`'s cumulative count. */
    def estimate(token: String): Long =
      TypedAggregators.cmsEstimate(cells, depth, widthBits, token)
  }

  /** One distributed pass: the count–min cells of `(tokenCol, weightCol)`
    * — the aggregator runs map-side partial (depth·2^widthBits-entry
    * buffers merge across the shuffle); rows never shuffle. Empty input
    * yields the all-zero same-shape vector (finish of the zero buffer —
    * the all-duplicate-batch edge the bloom fold also has). */
  def sketchOf(df: DataFrame, tokenCol: String, weightCol: String,
               depth: Int, widthBits: Int): Seq[Long] = {
    import df.sparkSession.implicits._
    df.select(col(tokenCol).cast("string"), col(weightCol).cast("long"))
      .as[(String, Long)]
      .select(new TypedAggregators.CmsCounts(depth, widthBits).toColumn)
      .head()
  }

  /** Build the state once from the existing corpus. `weightCol` defaults
    * to a unit weight per row (plain occurrence counting). */
  def buildState(corpus: DataFrame, tokenCol: String, threshold: Long,
                 weightCol: Option[String] = None, depth: Int = 4,
                 widthBits: Int = 8, version: Long = 0L): FrequencyState = {
    val (df, w) = weighted(corpus, weightCol)
    FrequencyState(sketchOf(df, tokenCol, w, depth, widthBits),
      depth, widthBits, threshold, version)
  }

  /** Reconstruct a persisted state (the cell vector + the replay fence
    * are all there is to persist). */
  def restoreState(cells: Seq[Long], depth: Int, widthBits: Int,
                   threshold: Long, version: Long,
                   foldedBatch: Long): FrequencyState =
    FrequencyState(cells, depth, widthBits, threshold, version, foldedBatch)

  private def weighted(df: DataFrame,
                       weightCol: Option[String]): (DataFrame, String) =
    weightCol match {
      case Some(w) => (df, w)
      case None    => (df.withColumn("__w", lit(1L)), "__w")
    }

  /** One micro-batch: sketch the batch (one map-side aggregate), merge
    * cell-wise sums into the state, report per-token evidence for the
    * batch's distinct tokens (collected — driver-small by contract). */
  def foldBatch(batch: DataFrame, st: FrequencyState, tokenCol: String,
                batchId: Long, weightCol: Option[String] = None): (Seq[TokenEvidence], FrequencyState) = {
    import batch.sparkSession.implicits._
    val (df, w) = weighted(batch, weightCol)
    val bs = sketchOf(df, tokenCol, w, st.depth, st.widthBits)
    val next = st.copy(cells = TypedAggregators.cmsMerge(st.cells, bs),
      version = st.version + 1, foldedBatch = batchId)
    val batchWeights = df
      .groupBy(col(tokenCol).cast("string").as("__t"))
      .agg(sum(col(w).cast("long")).as("__bw"))
      .as[(String, Long)].collect().sortBy(_._1)
    val report = batchWeights.toSeq.map { case (t, bw) =>
      TokenEvidence(t, bw, next.estimate(t), st.threshold)
    }
    (report, next)
  }

  /** The folding loop ([[Gate.startFolding]] — replay-fenced): `onBatch`
    * receives the batch's [[TokenEvidence]] report. */
  def startGate(stream: Stream, state: AtomicReference[FrequencyState],
                tokenCol: String, weightCol: Option[String] = None,
                checkpoint: Option[String] = None)(
                onBatch: (Seq[TokenEvidence], Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      foldBatch(batch, st, tokenCol, batchId, weightCol)
    }(onBatch)
}
