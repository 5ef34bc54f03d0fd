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
}

final case class MeanStdResult(mean: Double, std: Double)
