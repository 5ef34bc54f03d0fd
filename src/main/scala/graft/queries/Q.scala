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

/** Shared helpers enforcing cross-engine determinism — cheaply.
  *
  * Floating-point aggregation order differs between Spark (parallel partial
  * aggregates) and DuckDB (single-threaded scan), so summing DOUBLE directly
  * is not reproducible at the last ulp. Every money/rate aggregate therefore
  * goes through EXACT arithmetic and is cast back to DOUBLE once at the end.
  *
  * Performance contract: Spark's `sum(Decimal(p,s))` allocates result
  * precision p+10, and anything over 18 digits falls off the long-backed
  * Tungsten fast path onto JVM BigDecimal (measured 2.5× slower on the q1
  * shape). So:
  *  - plain sums use Decimal(8,2) — the data is 2-decimal money < 10^6, and
  *    the (18,2) sum stays native up to ~10^16 dollars;
  *  - product sums (price·(1−disc)·(1+tax)) would need ≥(13,4) and go
  *    BigDecimal, so they instead use SPLIT SCALED-LONG accumulators: the
  *    product is an exact scaled integer (cents × percent units), summed as
  *    two longs (quotient/remainder by a modulus) so neither accumulator
  *    can overflow even at 100 TB row counts, then recombined into one
  *    exact Decimal(38) per GROUP at the end. This is the Spark-idiomatic
  *    stand-in for the i128 aggregation accumulators native engines use —
  *    everything stays in whole-stage-codegen'd long arithmetic.
  *
  * Cross-engine note: `round(x*100)` yields an exactly-integral double in
  * both engines (inputs are 2-decimal), so the long conversion is
  * bit-deterministic; integer sums are order-independent; the final
  * integer→double cast is correctly rounded in both engines.
  */
object QueryDsl {
  import org.apache.spark.sql.functions._

  /** money/quantity amounts: 2-decimal, < 10^6 → exact at (8,2); sums stay
    * Tungsten-native at (18,2). */
  def decM(c: Column): Column = c.cast(DecimalType(8, 2))

  /** rates (discount/tax ≤ 1): 2-decimal → exact at (3,2). */
  def decR(c: Column): Column = c.cast(DecimalType(3, 2))

  /** Exact decimal sum surfaced as a bit-deterministic double. */
  def dsum(c: Column): Column = sum(decM(c)).cast("double")

  /** Exact average: decimal sum / count, evaluated in double once. */
  def davg(c: Column): Column = sum(decM(c)).cast("double") / count(lit(1))

  /** SQL for a 2-decimal column as an exact scaled long (cents /
    * hundredths). */
  def centsSql(c: String): String = s"CAST(round($c * 100) AS BIGINT)"

  /** Split-accumulator partial sums of an exact scaled-long product
    * expression: Σ(p div mod) and Σ(p mod mod) — both long-typed,
    * overflow-safe, map-side-combinable. */
  def splitSumAggs(name: String, productSql: String, mod: Long): Seq[Column] =
    Seq(
      sum(expr(s"($productSql) div $mod")).as(s"${name}_hi"),
      sum(expr(s"($productSql) % $mod")).as(s"${name}_lo"))

  /** Recombine split partial sums into the exact total (scale = 10^`frac`
    * units per dollar) as a bit-deterministic double. */
  def splitSumValue(name: String, mod: Long, frac: Long): Column =
    expr(s"CAST(CAST(${name}_hi AS DECIMAL(38,0)) * $mod + ${name}_lo AS DOUBLE) / $frac.0")
}
