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

  final case class KllBuf(levels: Seq[Seq[Double]], parity: Seq[Boolean], n: Long)
  final case class KllItem(v: Double, w: Long)
  final case class KllSummary(items: Seq[KllItem], n: Long) {
    /** Weighted percentile_disc over the summary: the smallest value
      * whose cumulative weight reaches ceil(n·q). */
    def quantile(q: Double): Double = {
      require(q > 0.0 && q <= 1.0 && items.nonEmpty, s"q=$q items=${items.size}")
      val rank = math.ceil(n * q).toLong
      var cum = 0L
      items.collectFirst { case KllItem(v, w) if { cum += w; cum >= rank } => v }.get
    }
  }

  /** Bounded-memory quantile SKETCH over an UNBOUNDED value domain — the
    * escape hatch [[BoundedHistogram]]'s contract points at when the
    * domain can't be bounded (continuous scores, raw measurements): a
    * KLL-style compactor hierarchy (Karnin–Lang–Liberty 2016) in its
    * DETERMINISTIC alternating-parity form (Manku et al.'s classical
    * collapse rule): level i holds items of weight 2^i, ≤ `k` each; a
    * full level sorts, keeps every second item (the kept offset
    * alternates per compaction instead of a coin flip), and promotes
    * them. Each compaction of level i displaces any fixed rank by at
    * most 2^i, so after any merge tree over n items the rank error is
    * bounded by Σ (compactions at level i)·2^i ≤ n·(levels)/k with
    * levels ≈ log2(n/k) — the O(log(n/k)/k)·n deterministic bound
    * (randomized KLL trades this for √log/k in expectation; the
    * deterministic form keeps replay/debugging sane and the spec pins
    * the bound empirically at the shipped parameters).
    *
    * Like [[FrequentItems]], the summary's exact contents are
    * partitioning-dependent — never oracle/hash-check them; the spec
    * pins rank-error and memory bounds only. Exactness-critical paths
    * keep using the exact structures ([[BoundedHistogram]],
    * Quantiles.groupPercentilesDisc). */
  final class QuantileSketch(k: Int) extends Aggregator[Double, KllBuf, KllSummary] {
    require(k >= 8, s"k=$k")
    override def zero: KllBuf = KllBuf(Seq(Vector.empty), Seq(false), 0L)

    private def compacted(levels0: Seq[Seq[Double]], parity0: Seq[Boolean]): (Seq[Seq[Double]], Seq[Boolean]) = {
      var levels = levels0.toVector
      var parity = parity0.toVector
      var i = 0
      while (i < levels.size) {
        if (levels(i).size >= k) {
          if (i + 1 >= levels.size) { levels = levels :+ Vector.empty; parity = parity :+ false }
          val sorted = levels(i).sorted
          // compact an EVEN count so total weight is conserved exactly
          // (Σ item-weights ≡ n, spec-pinned); an odd straggler stays.
          val (leftover, toCompact) =
            if (sorted.size % 2 == 0) (Vector.empty[Double], sorted)
            else (Vector(sorted.head), sorted.tail)
          val offset = if (parity(i)) 1 else 0
          val kept = toCompact.zipWithIndex.collect {
            case (v, j) if j % 2 == offset => v }
          levels = levels
            .updated(i, leftover)
            .updated(i + 1, levels(i + 1) ++ kept)
          parity = parity.updated(i, !parity(i))
        }
        i += 1
      }
      (levels, parity)
    }

    override def reduce(b: KllBuf, v: Double): KllBuf = {
      val withV = b.levels.updated(0, b.levels.head :+ v)
      val (ls, ps) = compacted(withV, b.parity)
      KllBuf(ls, ps, b.n + 1)
    }
    override def merge(x: KllBuf, y: KllBuf): KllBuf = {
      val depth = math.max(x.levels.size, y.levels.size)
      val ls0 = (0 until depth).map { i =>
        x.levels.applyOrElse(i, (_: Int) => Seq.empty[Double]) ++
          y.levels.applyOrElse(i, (_: Int) => Seq.empty[Double])
      }
      val ps0 = (0 until depth).map(i =>
        x.parity.applyOrElse(i, (_: Int) => false))
      val (ls, ps) = compacted(ls0, ps0)
      KllBuf(ls, ps, x.n + y.n)
    }
    override def finish(b: KllBuf): KllSummary =
      KllSummary(
        b.levels.zipWithIndex
          .flatMap { case (vs, i) => vs.map(v => KllItem(v, 1L << i)) }
          .sortBy(it => (it.v, it.w)),
        b.n)
    override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
    override def outputEncoder: Encoder[KllSummary] = Encoders.product[KllSummary]
  }

  /** [[QuantileSketch]] that FINISHES TO ITS BUFFER — the mergeable form a
    * folding gate needs: the per-batch distributed aggregate returns the
    * raw compactor hierarchy, which the driver-held state merges with
    * `QuantileSketch.merge` (the same rule the shuffle already uses, so
    * the gate's merge tree is just one more branch the proven rank-error
    * bound already covers). Summaries remain partitioning-dependent —
    * spec-pin bounds, never bitwise values. */
  final class QuantileSketchBuf(k: Int) extends Aggregator[Double, KllBuf, KllBuf] {
    private val inner = new QuantileSketch(k)
    override def zero: KllBuf = inner.zero
    override def reduce(b: KllBuf, v: Double): KllBuf = inner.reduce(b, v)
    override def merge(x: KllBuf, y: KllBuf): KllBuf = inner.merge(x, y)
    override def finish(b: KllBuf): KllBuf = b
    override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
    override def outputEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  }

  /** Single-partition, fixed-order insertion through [[QuantileSketch]] —
    * the DETERMINISTIC replay form: given an explicit insertion order the
    * alternating-parity compactor is a pure function of the value
    * sequence, which is what makes a frozen-input compaction trace
    * oracle-statable in closed form (x_quantile_sketch). */
  def kllSketchOrdered(values: Seq[Double], k: Int): KllSummary = {
    val a = new QuantileSketch(k)
    a.finish(values.foldLeft(a.zero)(a.reduce))
  }

  /** The md5-derived 60-bit hash every HLL register computation keys on:
    * the first 15 lowercase-hex characters of md5(UTF-8 bytes), parsed
    * base 16 — chosen over a faster hash because BOTH engines can state
    * it exactly (DuckDB `md5` + digit fold), which is what makes the
    * register state oracle-checkable. 60 bits keeps the parse inside a
    * positive BIGINT in both engines. */
  def hash60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    (h << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  final case class HllBuf(m: Map[Long, Long])

  /** Mergeable DISTINCT-COUNT sketch: classic HyperLogLog registers
    * (Flajolet et al. 2007) over the deterministic [[hash60]]. Register
    * j ∈ [0, 2^p) keeps the MAXIMUM rank (position of the highest set
    * bit from the top, + 1) seen among hashes routed to it — and unlike
    * most sketches here, the register STATE is a pure, order- and
    * partitioning-independent function of the input SET (max is
    * commutative/idempotent), so it can be oracle-checked bitwise and
    * folded per-batch with fold ≡ recompute EXACTLY (the property
    * streaming.CardinalityIngest builds on; contrast [[FrequentItems]]
    * and [[QuantileSketch]], whose buffers are partitioning-dependent).
    *
    * The float estimate α·m²/Σ2^(−M_j) never leaves the engine (no-libm
    * discipline): [[scaleSum]] emits Σ 2^(maxRank − M_j) as an exact
    * BIGINT — a strictly monotone proxy (smaller sum = more distincts)
    * the consumer can rank/threshold on, or feed to the float formula
    * off-engine. Bounded by m·2^maxRank = 2^61 < 2^63 for every p. */
  final class HllRegisters(p: Int)
      extends Aggregator[String, HllBuf, Seq[Long]] {
    require(p >= 2 && p <= 12, s"p=$p")
    private val m = 1 << p
    private val maxBits = 60 - p
    override def zero: HllBuf = HllBuf(Map.empty)
    override def reduce(b: HllBuf, s: String): HllBuf = {
      val h = hash60(s)
      val j = h % m
      val w = h / m
      val rho =
        if (w == 0L) (maxBits + 1).toLong
        else (maxBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toLong
      if (rho <= b.m.getOrElse(j, 0L)) b
      else HllBuf(b.m.updated(j, rho))
    }
    override def merge(x: HllBuf, y: HllBuf): HllBuf =
      HllBuf(y.m.foldLeft(x.m) { case (acc, (j, r)) =>
        if (r > acc.getOrElse(j, 0L)) acc.updated(j, r) else acc
      })
    override def finish(b: HllBuf): Seq[Long] =
      Seq.tabulate(m)(j => b.m.getOrElse(j.toLong, 0L))
    override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Σ 2^(maxRank − M_j) over a dense register vector — the exact-integer
    * monotone cardinality proxy (see [[HllRegisters]]). */
  def hllScaleSum(registers: Seq[Long], p: Int): Long = {
    val maxRank = 60 - p + 1
    registers.iterator.map(r => 1L << (maxRank - r)).sum
  }

  final case class CmsBuf(m: Map[Long, Long])

  /** Mergeable FREQUENCY sketch: count–min (Cormode & Muthukrishnan 2005)
    * over [[hash60]]. `depth` rows of 2^`widthBits` counters; item x with
    * weight w adds w to cell (j, h_j(x)) in every row j, where h_j(x) is
    * bit-slice j of the one md5-derived hash: (h >> j·widthBits) mod 2^
    * widthBits (depth·widthBits ≤ 60, so the slices are disjoint bits of
    * one uniform hash — and each slice is floor-div/mod arithmetic both
    * engines can state exactly). Like [[HllRegisters]] — and unlike
    * [[FrequentItems]] — the cell state is a pure order/partitioning-
    * independent function of the input MULTISET (sums commute), so the
    * sketch is oracle-checked BITWISE (x_sketch_cms) and per-batch folding
    * is cell-wise addition ≡ full recompute exactly. One contrast worth
    * stating: HLL's max is idempotent (a double-folded batch is harmless);
    * CMS addition is NOT — the [[graft.streaming.Gate.Folded]] replay
    * fence is load-bearing for the frequency gate.
    *
    * Estimates ([[cmsEstimate]]: min over rows of the item's cells) are
    * ONE-SIDED: est(x) ≥ true(x) always (cells only ever gain mass), with
    * the usual ε = e/width overestimate bound in expectation. So
    * `est(x) < T` PROVES x is not a heavy hitter — the pruning direction
    * x_heavy_hitters and the frequency gate build on: the sketch filter
    * can only pass false POSITIVES, which an exact count-then-HAVING pass
    * removes, leaving the final answer exact. */
  final class CmsCounts(depth: Int, widthBits: Int)
      extends Aggregator[(String, Long), CmsBuf, Seq[Long]] {
    require(depth >= 1 && depth <= 6, s"depth=$depth")
    require(widthBits >= 4 && widthBits <= 12, s"widthBits=$widthBits")
    require(depth * widthBits <= 60, s"depth*widthBits must fit hash60")
    private val width = 1 << widthBits
    private val mask = (width - 1).toLong
    override def zero: CmsBuf = CmsBuf(Map.empty)
    override def reduce(b: CmsBuf, a: (String, Long)): CmsBuf = {
      // the one-sided estimate guarantee (est ≥ true, so est < T proves
      // light) holds only while cells never lose mass — a negative
      // weight would silently break every provedLight verdict.
      require(a._2 >= 0L, s"negative CMS weight ${a._2} for '${a._1}'")
      val h = hash60(a._1)
      var m = b.m
      var j = 0
      while (j < depth) {
        val idx = j.toLong * width + ((h >>> (j * widthBits)) & mask)
        m = m.updated(idx, m.getOrElse(idx, 0L) + a._2)
        j += 1
      }
      CmsBuf(m)
    }
    override def merge(x: CmsBuf, y: CmsBuf): CmsBuf =
      CmsBuf(y.m.foldLeft(x.m) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      })
    override def finish(b: CmsBuf): Seq[Long] =
      Seq.tabulate(depth * width)(i => b.m.getOrElse(i.toLong, 0L))
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** min over rows of `item`'s cells — the (over-estimating) count–min
    * point estimate; see [[CmsCounts]]. */
  def cmsEstimate(cells: Seq[Long], depth: Int, widthBits: Int,
                  item: String): Long = {
    val width = 1 << widthBits
    val mask = (width - 1).toLong
    val h = hash60(item)
    (0 until depth).iterator
      .map(j => cells(j * width + ((h >>> (j * widthBits)) & mask).toInt))
      .min
  }

  /** Cell-wise sum of two same-shape sketches — the exact CMS merge. */
  def cmsMerge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    require(x.size == y.size, s"shape mismatch: ${x.size} vs ${y.size}")
    x.lazyZip(y).map(_ + _)
  }

  final case class KmvBuf(vs: List[Long])

  /** Mergeable DISTINCT-VALUE sketch with SET OPERATIONS: k minimum
    * values (Bar-Yossef et al. 2002; the theta-sketch ancestor) over
    * [[hash60]] — the state is the k smallest DISTINCT hash values of
    * the input set, so like [[HllRegisters]] (and unlike [[CmsCounts]])
    * it is a pure, order/partitioning-independent, IDEMPOTENT function
    * of the input SET: bitwise oracle-checkable, fold ≡ recompute
    * exactly, double-folds harmless.
    *
    * What KMV buys over HLL is the set algebra: the k smallest of A ∪ B
    * compute from the two k-sets alone ([[kmvMerge]]), and membership of
    * the merged k-set in both sides estimates the Jaccard/intersection
    * (shared/k · |union estimate| — the cross-SOURCE overlap matrix a
    * curation pipeline reads before mixing; x_sketch_kmv). All emitted
    * values stay exact integers: the k-th minimum itself is the
    * cardinality proxy (smaller k-th min = more distincts — the
    * [[hllScaleSum]] discipline; the float (k−1)·2^60/v_k estimate stays
    * off-engine). */
  final class KmvValues(k: Int)
      extends Aggregator[String, KmvBuf, Seq[Long]] {
    require(k >= 1 && k <= 4096, s"k=$k")
    private def insert(vs: List[Long], h: Long): List[Long] =
      if (vs.lengthCompare(k) >= 0 && h >= vs.last) vs
      else {
        val (pre, post) = vs.span(_ < h)
        if (post.nonEmpty && post.head == h) vs // set semantics: dedup
        else (pre ::: (h :: post)).take(k)
      }
    override def zero: KmvBuf = KmvBuf(Nil)
    override def reduce(b: KmvBuf, s: String): KmvBuf =
      KmvBuf(insert(b.vs, hash60(s)))
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
      KmvBuf(y.vs.foldLeft(x.vs)(insert))
    override def finish(b: KmvBuf): Seq[Long] = b.vs
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** k smallest of the UNION from the two k-sets alone — exact for the
    * union's k-set because any of the union's k smallest distinct values
    * is among its own side's k smallest. Inputs sorted ascending
    * (KmvValues emits them so); output likewise. */
  def kmvMerge(x: Seq[Long], y: Seq[Long], k: Int): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)
}

final case class MeanStdResult(mean: Double, std: Double)
