package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Random sampling (`rand()`, `TABLESAMPLE`) is non-reproducible across
  * runs/planners and can't be oracle-checked; curation pipelines instead
  * sample by content/id HASH so the same row set is selected on any engine,
  * any partitioning, any day — and a re-run after adding data keeps every
  * previously selected row (stable splits).
  *
  * Scale design: `hashSample` is a shuffle-free per-row gate fused into the
  * scan. `stratifiedSample` needs exact k per stratum, which is a top-k by
  * hash — the same two-phase shape as [[Ann.TopKNeighbors]]: map-side
  * k-buffers, only k·P rows shuffle, never a whole stratum to one reducer
  * (a rank-window would ship the largest stratum's every row to one task).
  */
object Sampling {

  /** Keep rows whose md5(id) prefix falls under `rate` — a deterministic
    * Bernoulli-style gate. The first 8 hex chars are compared as strings
    * against floor(rate·2^32) in fixed-width hex (same-length lowercase hex
    * compares like the number it encodes), so both engines agree exactly.
    * Selection probability is within 2^-32 of `rate`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate=$rate must be in (0, 1]")
    df.filter(expr(s"substring(md5(CAST($idCol AS STRING)), 1, 8) < '${hexThreshold(rate)}'"))
  }

  /** floor(rate·2^32) as 8 lowercase hex chars — shared with oracle SQL.
    * rate = 1.0 would need 9 hex digits (2^32), which string-compares
    * BELOW every 8-char prefix; "g" sorts above all hex, so `< "g"` keeps
    * everything. */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g" else f"${math.floor(rate * 4294967296.0).toLong}%08x"

  /** Deterministic GLOBAL SHUFFLE for training output: every row gets a
    * content-hash sort key and a shard id derived from it — the
    * reproducible replacement for `ORDER BY rand()` when a data loader
    * needs a fixed, resumable example order.
    *
    * Scale shape: this is a pure per-row projection (no shuffle, no
    * window — the ORDER itself is materialized by the writer, not here):
    * pipe the result into `Layout.writeSorted(path, shards, "shard",
    * "sort_key")` and each shard lands as one range-partitioned,
    * internally-sorted file set that a loader streams in deterministic
    * order. `shards` must divide 256 (the shard is the first hash BYTE
    * mod `shards`, so divisors of 256 give an exactly uniform bucket map;
    * md5 uniformity gives each shard n/shards ± noise rows).
    *
    * Output: (idCol, sort_key = md5(id), shard). */
  def deterministicShuffle(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0 && 256 % shards == 0,
      s"shards=$shards must divide 256 (first-hash-byte bucketing)")
    df.select(col(idCol),
        md5(col(idCol).cast("string")).as("sort_key"))
      .withColumn("shard",
        expr(s"CAST(conv(substring(sort_key, 1, 2), 16, 10) AS INT) % $shards"))
  }

  /** One (hash, id) pair flowing into the per-stratum min-k selection. */
  final case class HashedId(h: String, id: Long)
  final case class HashedIdList(items: List[HashedId])

  /** Keep the k smallest (h, id) — deterministic under any merge order
    * (md5 is injective over distinct ids here, and (h, id) totally orders
    * regardless). Mirror of [[Ann.TopKNeighbors]] with ascending order. */
  final class MinKByHash(k: Int)
      extends Aggregator[HashedId, HashedIdList, HashedIdList] {
    require(k > 0, s"k=$k must be positive")
    private def before(a: HashedId, b: HashedId): Boolean =
      a.h < b.h || (a.h == b.h && a.id < b.id)
    private def insert(items: List[HashedId], a: HashedId): List[HashedId] =
      if (items.lengthCompare(k) >= 0 && !before(a, items.last)) items
      else {
        val (pre, post) = items.span(before(_, a))
        (pre ::: (a :: post)).take(k)
      }
    override def zero: HashedIdList = HashedIdList(Nil)
    override def reduce(b: HashedIdList, a: HashedId): HashedIdList =
      HashedIdList(insert(b.items, a))
    override def merge(x: HashedIdList, y: HashedIdList): HashedIdList =
      HashedIdList(y.items.foldLeft(x.items)(insert))
    override def finish(b: HashedIdList): HashedIdList = b
    override def bufferEncoder = Encoders.product[HashedIdList]
    override def outputEncoder = Encoders.product[HashedIdList]
  }

  /** Exactly `k` rows per stratum (fewer if the stratum is smaller),
    * selected as the k smallest id-hashes — the deterministic equivalent of
    * per-group uniform sampling. Output: (strataCol, idCol), exploded back
    * to rows. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       k: Int): DataFrame = {
    val mink = udaf(new MinKByHash(k), Encoders.product[HashedId])
    df.select(col(strataCol).as("__strata"), col(idCol).cast("long").as("__id"))
      .withColumn("__h", md5(col("__id").cast("string")))
      .groupBy(col("__strata"))
      .agg(mink(col("__h"), col("__id")).as("__top"))
      .select(col("__strata").as(strataCol),
        explode(col("__top.items.id")).as(idCol))
  }
}
