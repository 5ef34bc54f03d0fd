package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TypedAggregators

/** Streaming QUANTILE-THRESHOLD ingest — the FOLDING gate the percentile
  * operators were missing: gates with evolving corpora could not maintain
  * a percentile threshold incrementally (operators.Quantiles is
  * batch-only). The state is an EXACT mergeable value histogram
  * ([[TypedAggregators.BoundedHistogram]] — per-batch histograms computed
  * map-side, merged counter-wise), so the per-batch threshold is
  * IDENTICAL to a full recompute over everything seen so far, not
  * approximate — the round-8 `FrequentItems` bounds discipline taken to
  * its exact endpoint (and the bound failure mode is a fail-fast on the
  * bounded-domain contract, never silent degradation).
  *
  * Gate semantics (one row per batch document): each batch is gated
  * against the threshold the state held BEFORE the batch (the corpus the
  * engine has actually seen — same convention as the dedup growing gate,
  * which probes before it folds), then the WHOLE batch folds into the
  * histogram regardless of keep/drop — the threshold tracks the observed
  * POPULATION, while the gate selects from it. Values must be
  * integer-exact (classifier scores, token/char counts, scaled ratios —
  * everything this engine scores with; see the no-floats invariant).
  *
  * State size: ≤ `maxBins` (value, count) pairs — driver-held, trivially
  * persisted ([[ThresholdState.histRows]]) and restored
  * ([[restoreState]]); [[Gate.Folded]]'s replay fence makes restarts
  * exactly-once like every other folding gate.
  */
object QuantileIngest {

  /** The folding state: exact histogram + the quantile it serves.
    * `keepAtOrAbove` — keep rows with value ≥ the p-quantile (quality
    * floors); false keeps value ≤ it (e.g. length ceilings). */
  final case class ThresholdState(hist: Map[Long, Long], p: Double,
                                  maxBins: Int, keepAtOrAbove: Boolean,
                                  version: Long, foldedBatch: Long = -1L)
      extends Gate.Folded {
    /** Total observations folded so far. */
    def n: Long = hist.valuesIterator.sum
    /** EXACT percentile_disc over the histogram: the smallest value whose
      * cumulative count reaches ceil(n·p) — precisely
      * Quantiles.groupPercentilesDisc's rule, read off merged counts.
      * Empty state keeps everything (no population, no evidence). */
    def threshold: Option[Long] = {
      val total = n
      if (total == 0L) None
      else {
        val rank = math.ceil(total * p).toLong
        var cum = 0L
        hist.toSeq.sortBy(_._1).collectFirst {
          case (v, c) if { cum += c; cum >= rank } => v
        }
      }
    }
    /** The histogram as persistable rows (≤ maxBins of them). */
    def histRows: Seq[(Long, Long)] = hist.toSeq.sortBy(_._1)
  }

  /** One distributed pass over a relation's `valueCol` → its exact
    * histogram (map-side partial maps, counter-wise merge). */
  def histogramOf(df: DataFrame, valueCol: String, maxBins: Int): Map[Long, Long] = {
    import df.sparkSession.implicits._
    // same NULL discipline as sketchOf: no rank evidence, and the Long
    // encoder would NPE on a null cell.
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long")).as[Long]
      .select(new TypedAggregators.BoundedHistogram(maxBins).toColumn)
      .head()
  }

  /** Build the state once from the existing corpus. */
  def buildState(corpus: DataFrame, valueCol: String, p: Double,
                 maxBins: Int = 65536, keepAtOrAbove: Boolean = true,
                 version: Long = 0L): ThresholdState = {
    require(p > 0.0 && p <= 1.0, s"p=$p")
    ThresholdState(histogramOf(corpus, valueCol, maxBins), p, maxBins,
      keepAtOrAbove, version)
  }

  /** Reconstruct a persisted state after a restart (the driver-small
    * histRows + the replay fence are all there is to persist). */
  def restoreState(rows: Seq[(Long, Long)], p: Double, maxBins: Int,
                   keepAtOrAbove: Boolean, version: Long,
                   foldedBatch: Long): ThresholdState =
    ThresholdState(rows.toMap, p, maxBins, keepAtOrAbove, version, foldedBatch)

  /** One micro-batch through gate-then-fold (exposed for specs and
    * composed loops, like DedupIngest.foldBatch): returns (kept rows,
    * advanced state). The batch histogram is one map-side aggregate; the
    * driver-side merge is O(maxBins). */
  def foldBatch(batch: DataFrame, st: ThresholdState, valueCol: String,
                batchId: Long): (DataFrame, ThresholdState) = {
    val kept = st.threshold match {
      case None => batch
      case Some(t) =>
        if (st.keepAtOrAbove) batch.filter(col(valueCol).cast("long") >= t)
        else batch.filter(col(valueCol).cast("long") <= t)
    }
    val bh = histogramOf(batch, valueCol, st.maxBins)
    val merged = bh.foldLeft(st.hist) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c) }
    if (merged.size > st.maxBins)
      throw new IllegalStateException(
        s"QuantileIngest: ${merged.size} distinct values exceed maxBins=${st.maxBins}")
    (kept, st.copy(hist = merged, version = st.version + 1, foldedBatch = batchId))
  }

  /** The folding loop: gate each batch on the pre-batch threshold, fold
    * its values, advance the state ([[Gate.startFolding]] — replay-fenced
    * like every folding gate). `onBatch` receives the KEPT rows. */
  def startGate(stream: Stream, state: AtomicReference[ThresholdState],
                valueCol: String, checkpoint: Option[String] = None)(
                onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      foldBatch(batch, st, valueCol, batchId)
    }(onBatch)

  // ------------------------- unbounded-domain (KLL sketch) gate mode ----
  // BoundedHistogram's contract requires a bounded INTEGER domain and
  // fails fast past maxBins; real curation thresholds sit on float
  // quality scores and heavy-tailed lengths where no bound exists. This
  // mode swaps the exact histogram for the deterministic KLL compactor
  // ([[TypedAggregators.QuantileSketch]]): memory is O(k·log(n/k))
  // regardless of the value domain, and the per-batch threshold is
  // within the sketch's PROVEN rank-error bound of the exact percentile
  // over everything seen (n·levels/k — TypedAggregatorSpec pins it under
  // any partitioning; the gate's state-merge is one more branch of the
  // same merge tree, so the bound covers it with the post-fold n).
  // Trade stated honestly: the bounded-histogram mode is EXACT and stays
  // the right choice when the domain is bounded; this mode is the escape
  // hatch, approximate within a stated bound, never silently degraded.

  /** Folding sketch state: the raw compactor hierarchy + the quantile it
    * serves. Driver-small (O(k·log(n/k)) doubles), persistable via its
    * plain fields ([[TypedAggregators.KllBuf]] is a product). */
  final case class SketchThresholdState(
      buf: TypedAggregators.KllBuf, p: Double, k: Int,
      keepAtOrAbove: Boolean, version: Long, foldedBatch: Long = -1L)
      extends Gate.Folded {
    def n: Long = buf.n
    /** The sketch's percentile_disc estimate: the smallest summarized
      * value whose cumulative weight reaches ceil(n·p). Empty state keeps
      * everything (no population, no evidence). */
    def threshold: Option[Double] =
      if (buf.n == 0L) None
      else Some(new TypedAggregators.QuantileSketch(k).finish(buf).quantile(p))
  }

  /** One distributed pass over a relation's `valueCol` → its KLL buffer
    * (map-side compactors, rank-bounded merge across the shuffle). */
  def sketchOf(df: DataFrame, valueCol: String, k: Int): TypedAggregators.KllBuf = {
    import df.sparkSession.implicits._
    // NULLs carry no rank evidence and would NPE the Double encoder —
    // drop them here so streamed batches with missing scores fold the
    // non-null population, mirroring what percentile_disc itself ranks.
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double")).as[Double]
      .select(new TypedAggregators.QuantileSketchBuf(k).toColumn)
      .head()
  }

  /** Build the sketch state once from the existing corpus. */
  def buildSketchState(corpus: DataFrame, valueCol: String, p: Double,
                       k: Int = 200, keepAtOrAbove: Boolean = true,
                       version: Long = 0L): SketchThresholdState = {
    require(p > 0.0 && p <= 1.0, s"p=$p")
    SketchThresholdState(sketchOf(corpus, valueCol, k), p, k,
      keepAtOrAbove, version)
  }

  /** Reconstruct a persisted sketch state after a restart. */
  def restoreSketchState(buf: TypedAggregators.KllBuf, p: Double, k: Int,
                         keepAtOrAbove: Boolean, version: Long,
                         foldedBatch: Long): SketchThresholdState =
    SketchThresholdState(buf, p, k, keepAtOrAbove, version, foldedBatch)

  /** Gate-then-fold for the sketch mode: the batch is gated on the
    * PRE-batch threshold (same convention as the exact mode), then the
    * whole batch's sketch merges into the state. */
  def foldSketchBatch(batch: DataFrame, st: SketchThresholdState,
                      valueCol: String, batchId: Long): (DataFrame, SketchThresholdState) = {
    val kept = st.threshold match {
      case None => batch
      case Some(t) =>
        if (st.keepAtOrAbove) batch.filter(col(valueCol).cast("double") >= t)
        else batch.filter(col(valueCol).cast("double") <= t)
    }
    val bb = sketchOf(batch, valueCol, st.k)
    val merged = new TypedAggregators.QuantileSketch(st.k).merge(st.buf, bb)
    (kept, st.copy(buf = merged, version = st.version + 1, foldedBatch = batchId))
  }

  /** The sketch-mode folding loop (gate family's unbounded-domain
    * quantile gate): replay-fenced like every folding gate. */
  def startSketchGate(stream: Stream, state: AtomicReference[SketchThresholdState],
                      valueCol: String, checkpoint: Option[String] = None)(
                      onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      foldSketchBatch(batch, st, valueCol, batchId)
    }(onBatch)
}
