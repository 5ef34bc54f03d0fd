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

  /** Per-row-RATE deterministic gate — weighted/importance sampling for
    * curation (e.g. keep long or high-quality documents with higher
    * probability): row kept iff md5(id) prefix < floor(num·2³²/den),
    * where `numCol`/`denCol` are INTEGER columns encoding the per-row
    * rate num/den exactly (never a double rate — exact integer threshold
    * arithmetic is what keeps the gate bit-identical across engines).
    * num ≥ den keeps the row always (the threshold renders as "g", which
    * sorts above all hex — [[hexThreshold]]'s trick); num ≤ 0 drops it.
    *
    * Deliberately UNSALTED, same ladder as [[hashSample]]: the gates are
    * coordinated (weightedSample ⊆ hashSample(r) wherever num/den ≤ r,
    * and raising a row's weight can only ADD it, never swap it) — the
    * property that makes re-curation with tweaked weights incremental.
    * Salt the id upstream if independence from other gates is wanted.
    *
    * Scale: pure per-row projection fused into the scan, zero shuffles.
    * `den` must stay < 2³¹ so num·2³² fits a long. */
  def weightedSample(df: DataFrame, idCol: String,
                     numCol: String, denCol: String): DataFrame =
    df.filter(expr(
      s"""substring(md5(CAST($idCol AS STRING)), 1, 8) <
         |CASE WHEN $numCol >= $denCol THEN 'g'
         |     ELSE lower(lpad(hex(CAST($numCol AS BIGINT) * 4294967296
         |                         div CAST($denCol AS BIGINT)), 8, '0'))
         |END""".stripMargin))

  /** Deterministic train/val/test (or arbitrary) split assignment: each
    * row's split is decided by where the md5 of `"split:" + id` falls in
    * the cumulative-fraction ladder, compared as fixed-width hex exactly
    * like [[hashSample]]. Stable splits: adding data never moves an
    * existing row's split, and the same row lands in the same split on
    * any engine or partitioning.
    *
    * The `"split:"` salt decorrelates this hash from [[hashSample]]'s
    * bare-id hash — without it, a 10 % `hashSample` would fall entirely
    * inside the first split (the two gates would share one hash ladder).
    *
    * Scale shape: a pure per-row projection (one md5 + a CASE ladder),
    * shuffle-free, fused into the scan; at 100 TB this is a zero-cost
    * column the writer partitions by.
    *
    * `splits` are (name, fraction) with fractions summing to ~1.0 (the
    * last split absorbs the hex-granularity remainder: it is the CASE
    * ladder's ELSE). Output: input columns + `split`. */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0.0), "fractions must be positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions sum to $total, not 1")
    val cums = splits.init.scanLeft(0.0)(_ + _._2).tail // cumulative, no last
    val whens = splits.init.zip(cums).map { case ((name, _), cum) =>
      s"WHEN __h < '${hexThreshold(cum)}' THEN '$name'"
    }
    df.withColumn("__h", expr(s"substring(md5(concat('split:', CAST($idCol AS STRING))), 1, 8)"))
      .withColumn("split",
        expr(s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"))
      .drop("__h")
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

  final case class HashedStr(h: String, s: String)
  final case class HashedStrList(items: List[HashedStr])

  /** [[MinKByHash]] for STRING payloads (urls, digests): keeps the k
    * smallest (hash, payload) pairs — map-side k-buffers, k·P-row
    * merge, never a rank window or a whole-group collect. The
    * frontier-quota selection rides it ((md5('fq:'||url), url) order —
    * the salted-hash sampling discipline). */
  final class MinKStrings(k: Int)
      extends Aggregator[HashedStr, HashedStrList, HashedStrList] {
    require(k > 0, s"k=$k must be positive")
    private def before(a: HashedStr, b: HashedStr): Boolean =
      a.h < b.h || (a.h == b.h && a.s < b.s)
    private def insert(items: List[HashedStr], a: HashedStr): List[HashedStr] =
      if (items.lengthCompare(k) >= 0 && !before(a, items.last)) items
      else {
        val (pre, post) = items.span(before(_, a))
        (pre ::: (a :: post)).take(k)
      }
    override def zero: HashedStrList = HashedStrList(Nil)
    override def reduce(b: HashedStrList, a: HashedStr): HashedStrList =
      HashedStrList(insert(b.items, a))
    override def merge(x: HashedStrList, y: HashedStrList): HashedStrList =
      HashedStrList(y.items.foldLeft(x.items)(insert))
    override def finish(b: HashedStrList): HashedStrList = b
    override def bufferEncoder = Encoders.product[HashedStrList]
    override def outputEncoder = Encoders.product[HashedStrList]
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
