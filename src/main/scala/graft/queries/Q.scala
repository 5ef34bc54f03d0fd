package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark plan builder + (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB on the same parquet tables.
  *
  * `oracle == None` ⇒ the op is not SQL-expressible (e.g. hash-seeded LSH);
  * the driver then records a weaker rows-only check.
  *
  * `headline` marks queries timed by [[graft.Bench]].
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared helpers enforcing cross-engine determinism.
  *
  * Floating-point aggregation order differs between Spark (parallel partial
  * aggregates) and DuckDB (single-threaded scan), so summing DOUBLE directly
  * is not reproducible at the last ulp. Every money/rate aggregate therefore
  * goes through exact DECIMAL arithmetic and is cast back to DOUBLE at the
  * end — bit-identical in both engines, and still fully codegen'd /
  * partial-aggregatable in Spark (DecimalType sums are Tungsten-native).
  */
object QueryDsl {
  import org.apache.spark.sql.functions._

  /** money/quantity amounts: < 10^8, 2-decimal data → exact at (12,4). */
  def decM(c: Column): Column = c.cast(DecimalType(12, 4))

  /** rates (discount/tax < 10) → exact at (6,4). */
  def decR(c: Column): Column = c.cast(DecimalType(6, 4))

  /** Exact decimal sum surfaced as a bit-deterministic double. */
  def dsum(c: Column): Column = sum(decM(c)).cast("double")

  /** Exact average: decimal sum / count, evaluated in double once. */
  def davg(c: Column): Column = sum(decM(c)).cast("double") / count(lit(1))
}
