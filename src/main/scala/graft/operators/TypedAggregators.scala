package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` examples — the scale-correct path for CUSTOM window
  * reduces (SURVEY.md §7): unlike `Stream.windowCollect` (collect_list +
  * closure, whole window in one task), an Aggregator declares zero/
  * reduce/merge, so Spark runs it as a map-side partial aggregate and
  * merges small buffers across the shuffle — same plan shape as built-in
  * aggregates, works in batch, windowed, and streaming aggregations
  * (via `org.apache.spark.sql.functions.udaf`). */
object TypedAggregators {

  final case class Moments(n: Long, sum: Double, sumSq: Double)

  /** Mean + population standard deviation in one pass. */
  object MeanStd extends Aggregator[Double, Moments, MeanStdResult] {
    override def zero: Moments = Moments(0L, 0.0, 0.0)
    override def reduce(b: Moments, a: Double): Moments =
      Moments(b.n + 1, b.sum + a, b.sumSq + a * a)
    override def merge(x: Moments, y: Moments): Moments =
      Moments(x.n + y.n, x.sum + y.sum, x.sumSq + y.sumSq)
    override def finish(m: Moments): MeanStdResult =
      if (m.n == 0) MeanStdResult(Double.NaN, Double.NaN)
      else {
        val mean = m.sum / m.n
        MeanStdResult(mean, math.sqrt(math.max(0.0, m.sumSq / m.n - mean * mean)))
      }
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[MeanStdResult] = Encoders.product[MeanStdResult]
  }

  final case class MgBuf(m: Map[String, Long])
  final case class FreqItem(item: String, est: Long)
  final case class FreqItems(items: Seq[FreqItem])

  /** Bounded-memory frequent items (Misra–Gries 1982), mergeable form
    * (Agarwal et al. 2013, "Mergeable Summaries"): at most `capacity`
    * counters per buffer no matter the stream, so the aggregation state is
    * CONSTANT-SIZE — the guard for hot-key detection when the key domain
    * itself is too large to count exactly (an exact groupBy-count of a
    * 100 TB token stream shuffles the whole distinct domain; this ships
    * `capacity` counters per partition).
    *
    * reduce: counted item → increment; room → insert at 1; full →
    * decrement every counter (the new item is discarded with them).
    * merge: counter-wise sum, then subtract the (capacity+1)-th largest
    * count from all and keep positives — at most `capacity` survive.
    *
    * Guarantees after ANY merge tree over a stream of n items:
    * est(x) ≤ true(x) ≤ est(x) + n/(capacity+1), and every item with
    * true(x) > n/(capacity+1) is present in the output. Counter VALUES
    * depend on partitioning (inherent to the sketch — pinned only as
    * bounds, see TypedAggregatorSpec); for exact hot-key counts over a
    * small survivor set, follow with an exact count of the reported items
    * (the same two-phase shape as the dedup df-cap). Output is sorted
    * (est DESC, item ASC). */
  final class FrequentItems(capacity: Int)
      extends Aggregator[String, MgBuf, FreqItems] {
    require(capacity > 0, s"capacity=$capacity")
    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, x: String): MgBuf = {
      val m = b.m
      m.get(x) match {
        case Some(c) => MgBuf(m.updated(x, c + 1))
        case None if m.size < capacity => MgBuf(m.updated(x, 1L))
        case None => MgBuf(m.transform((_, v) => v - 1).filter(_._2 > 0))
      }
    }
    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val s = y.m.foldLeft(x.m) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (s.size <= capacity) MgBuf(s)
      else {
        // (capacity+1)-th largest count; values > cut number ≤ capacity.
        val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        MgBuf(s.transform((_, v) => v - cut).filter(_._2 > 0))
      }
    }
    override def finish(b: MgBuf): FreqItems =
      FreqItems(b.m.toSeq.sortBy { case (k, v) => (-v, k) }
        .map { case (k, v) => FreqItem(k, v) })
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[FreqItems] = Encoders.product[FreqItems]
  }

  final case class HistBuf(m: Map[Long, Long])

  /** EXACT mergeable value histogram over a BOUNDED integer domain — the
    * quantile state folding gates maintain incrementally
    * ([[graft.streaming.QuantileIngest]]): per-batch histograms fold into
    * a running one by counter-wise addition, and any exact quantile reads
    * off the merged counts — so a per-batch threshold is IDENTICAL to a
    * full recompute over everything seen, not approximate (merge of exact
    * histograms is exact; the same domain contract as
    * Quantiles.groupPercentilesDisc's histogram path).
    *
    * The bound is a CONTRACT, not a collapse rule: exceeding `maxBins`
    * distinct values fails fast (the FrequentItems-style honesty — a
    * silently degraded exact structure would claim exactness it no longer
    * has). Integer-exact engine scores (classifier scores, token/char
    * counts, scaled ratios) satisfy it by construction; a genuinely
    * unbounded domain needs a sketch (KLL), which trades the exactness
    * this gate's spec pins. */
  final class BoundedHistogram(maxBins: Int)
      extends Aggregator[Long, HistBuf, Map[Long, Long]] {
    require(maxBins > 0, s"maxBins=$maxBins")
    private def checked(m: Map[Long, Long]): HistBuf = {
      if (m.size > maxBins)
        throw new IllegalStateException(
          s"BoundedHistogram: ${m.size} distinct values exceed maxBins=$maxBins " +
            "— the bounded-domain contract is violated (coarsen the value, " +
            "or use a sketch and give up exactness)")
      HistBuf(m)
    }
    override def zero: HistBuf = HistBuf(Map.empty)
    override def reduce(b: HistBuf, v: Long): HistBuf =
      checked(b.m.updated(v, b.m.getOrElse(v, 0L) + 1L))
    override def merge(x: HistBuf, y: HistBuf): HistBuf =
      checked(y.m.foldLeft(x.m) { case (acc, (v, c)) =>
        acc.updated(v, acc.getOrElse(v, 0L) + c) })
    override def finish(b: HistBuf): Map[Long, Long] = b.m
    override def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
    override def outputEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  }
}

final case class MeanStdResult(mean: Double, std: Double)
