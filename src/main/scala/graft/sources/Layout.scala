package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Output data layout for scan efficiency at 100 TB — the write-side
  * companion to [[Bucketing]] (which co-locates JOINS, while this
  * accelerates predicate SCANS).
  *
  * `repartitionByRange` samples the key distribution and assigns each
  * output task a contiguous, non-overlapping key range;
  * `sortWithinPartitions` orders rows inside each file. Every parquet
  * file (and row group) then covers a narrow key band, so any downstream
  * scan with a range/equality predicate on the layout key skips whole
  * files via the parquet min/max zone maps — the scan cost becomes
  * proportional to the selected range, not the table size. This is the
  * standard layout for time-partitioned event tables and id-ranged
  * corpora; `LayoutSpec` asserts the written ranges are genuinely
  * disjoint (the property pruning depends on).
  */
object Layout {

  /** Write `df` as range-sorted parquet on `keys` into `shards` files.
    * `shards` is the output parallelism — set it to the cluster width ×
    * a small factor at scale (the oracle-free analogue of
    * Curation.packSequences' shard parameter). */
  def writeSorted(df: DataFrame, path: String, shards: Int,
                  keys: String*): Unit = {
    require(keys.nonEmpty, "at least one layout key")
    df.repartitionByRange(shards, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Read back a sorted layout. Plain parquet — the layout is a physical
    * property, not a format change; pushed filters prune files/row groups
    * via zone maps automatically. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Morton/Z-value of two bounded non-negative integer columns — the
    * TWO-dimensional layout key. [[writeSorted]] on one key gives each
    * file a narrow band on THAT column only; sorting by the z-value gives
    * every file a narrow bounding BOX on both columns (each extra z-prefix
    * bit halves one side, alternating), so parquet min/max zone maps prune
    * scans filtered on EITHER column — the standard lakehouse remedy when
    * a table serves two predicate families (e.g. customer-keyed AND
    * time-ranged) at 100 TB.
    *
    * Exact integer arithmetic only, identical in any engine: each input is
    * range-normalized to 16 bits as `x·65536 div bound` (caller supplies
    * the domain bound; values MUST lie in [0, bound) — values at ≥ bound
    * fold deterministically but destroy locality), then spread by four
    * shift/mask rounds and interleaved (x even bits, y odd). Pure
    * projection: no shuffle, no UDF, whole-stage-codegen arithmetic. */
  def zValue(xCol: String, xBound: Long, yCol: String, yBound: Long): org.apache.spark.sql.Column = {
    require(xBound > 0 && yBound > 0, "bounds must be positive")
    def norm(c: String, bound: Long) = s"((($c) * 65536) div $bound)"
    def spread(v0: String): String = {
      val s1 = s"(($v0 | shiftleft($v0, 8)) & 16711935)"    // 0x00FF00FF
      val s2 = s"(($s1 | shiftleft($s1, 4)) & 252645135)"   // 0x0F0F0F0F
      val s3 = s"(($s2 | shiftleft($s2, 2)) & 858993459)"   // 0x33333333
      s"(($s3 | shiftleft($s3, 1)) & 1431655765)"           // 0x55555555
    }
    org.apache.spark.sql.functions.expr(
      s"${spread(norm(xCol, xBound))} | shiftleft(${spread(norm(yCol, yBound))}, 1)")
  }

  /** The z-curve twin of [[writeSorted]]: range-partition and sort by the
    * interleaved key so every output file covers a quadrant-shaped box in
    * (x, y) space. Predicates on either column then prune files/row
    * groups by zone map; `LayoutSpec` asserts the per-file bounding-box
    * property the pruning depends on. */
  def writeZOrdered(df: DataFrame, path: String, shards: Int,
                    xCol: String, xBound: Long,
                    yCol: String, yBound: Long): Unit = {
    df.withColumn("__z", zValue(xCol, xBound, yCol, yBound))
      .repartitionByRange(shards, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write with PARQUET BLOOM FILTERS on `cols` — POINT-LOOKUP pruning
    * for columns the file order can't serve: the sort/Z/Hilbert layouts
    * above prune RANGE predicates via zone maps, but a table has one
    * physical order, and an equality probe on any other
    * high-cardinality column (doc_id lookup in a time-ordered corpus)
    * finds every row group's min/max spanning the whole domain — zone
    * maps prune nothing. A per-row-group bloom filter answers "id
    * definitely not here" regardless of order, so the reader skips all
    * but the containing group(s) (plus the documented false-positive
    * rate of groups). Dictionary-page pruning covers the same need only
    * while the column stays dictionary-encoded — exactly what a
    * high-NDV column stops being, which is why `ndv` must be stated
    * honestly (undersizing inflates false positives, silently — the
    * spec measures the pruning, not just the write flag).
    *
    * `cols` are (column, expected distinct count); `rowGroupBytes`
    * bounds the pruning granule (smaller groups = finer skipping = more
    * filter overhead — the standard trade). Scan-metric proof in
    * `LayoutSpec`: a point lookup on shuffled ids reads a small
    * fraction of what the same data without blooms reads. */
  def writeBloomIndexed(df: DataFrame, path: String,
                        cols: Seq[(String, Long)],
                        rowGroupBytes: Long = 1L << 20): Unit = {
    require(cols.nonEmpty, "writeBloomIndexed needs at least one column")
    cols.foldLeft(
      df.write.mode("overwrite")
        .option("parquet.block.size", rowGroupBytes.toString)) {
      case (w, (c, ndv)) =>
        require(ndv > 0, s"expected NDV for $c must be positive")
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }

  /** The d-DIMENSIONAL Morton interleave as engine-portable SQL text —
    * shared by [[zValueN]] and its DuckDB oracle twin (pass `divOp =
    * "//"` there; everything else is the identical literal arithmetic).
    *
    * Each input range-normalizes to `bitsPerDim = min(16, 62/d)` bits
    * (so the maximum result bit index `bitsPerDim·d − 1` stays inside a
    * signed 64-bit long: d=3 → 16 bits/dim, d=4 → 15, d=6 → 10), then
    * the interleave is stated per BIT as pure div/mod/multiply —
    * `((norm div 2^b) % 2) · 2^(b·d + j)` summed over all bits of all
    * dims (the bit positions are disjoint, so + is |). No shift
    * builtins, no UDF: one flat codegen-able integer expression any
    * engine evaluates bit-identically. */
  def zValueNSql(cols: Seq[(String, Long)], divOp: String = "div"): String = {
    val d = cols.size
    require(d >= 2, s"zValueN needs at least 2 dimensions, got $d")
    val bitsPerDim = math.min(16L, 62L / d)
    val terms = cols.zipWithIndex.flatMap { case ((c, bound), j) =>
      require(bound > 0, s"bound for $c must be positive")
      val norm = s"(CAST((($c) * ${1L << bitsPerDim}) $divOp $bound AS BIGINT))"
      (0L until bitsPerDim).map { b =>
        s"((($norm $divOp ${1L << b}) % 2) * ${1L << (b * d + j)})"
      }
    }
    terms.mkString("(", " + ", ")")
  }

  /** Morton/Z-value of d ≥ 2 bounded non-negative integer columns — the
    * d-dimensional generalization of [[zValue]] for tables that serve
    * three or four predicate families at once (e.g. customer-keyed AND
    * time-ranged AND region-filtered at 100 TB). Sorting by it gives
    * every file a narrow bounding BOX in all d dimensions, so parquet
    * zone maps prune scans filtered on ANY of the columns; the price of
    * each extra dimension is a coarser per-dimension resolution at the
    * same file count (d·bitsPerDim total bits split d ways — the
    * standard multi-dim layout trade, stated rather than hidden).
    * Values MUST lie in [0, bound) per column. Pure projection: no
    * shuffle, no UDF, whole-stage codegen. */
  def zValueN(cols: Seq[(String, Long)]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(zValueNSql(cols))

  /** The d-dimensional twin of [[writeZOrdered]]: range-partition and
    * sort by the [[zValueN]] key so every output file covers a
    * box-shaped region of the d-space. */
  def writeMortonOrdered(df: DataFrame, path: String, shards: Int,
                         cols: Seq[(String, Long)]): Unit = {
    df.withColumn("__z", zValueN(cols))
      .repartitionByRange(shards, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** HILBERT index of two bounded non-negative integer columns — the
    * space-filling sibling of [[zValue]] with strictly better locality:
    * consecutive Hilbert cells are always ADJACENT in (x, y) (the
    * z-curve jumps across quadrant seams at every scale), so equal-size
    * key ranges cover tighter, always-connected regions — measurably
    * smaller per-file bounding boxes at the same shard count
    * (`LayoutSpec` compares the two on identical data).
    *
    * Same exact-integer discipline as [[zValue]]: inputs range-normalize
    * to 16 bits (values MUST lie in [0, bound)), then the classic
    * 16-round xy→d walk — each round reads the two quadrant bits,
    * accumulates s² cells, and reflects/swaps the coordinates for the
    * next scale. The rounds are chained COLUMN definitions (Catalyst
    * folds them into one whole-stage-codegen projection; textual
    * nesting of the conditional rotation would blow up exponentially),
    * which is why this takes and returns a DataFrame rather than
    * returning a single Column. */
  def withHilbert(df: DataFrame, outCol: String,
                  xCol: String, xBound: Long,
                  yCol: String, yBound: Long): DataFrame = {
    require(xBound > 0 && yBound > 0, "bounds must be positive")
    import org.apache.spark.sql.functions.expr
    var cur = df
      .withColumn("__hx", expr(s"CAST((($xCol) * 65536) div $xBound AS BIGINT)"))
      .withColumn("__hy", expr(s"CAST((($yCol) * 65536) div $yBound AS BIGINT)"))
      .withColumn("__hd", expr("CAST(0 AS BIGINT)"))
    for (i <- 15 to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx", expr(s"IF((__hx & ${s}L) != 0, 1L, 0L)"))
        .withColumn("__ry", expr(s"IF((__hy & ${s}L) != 0, 1L, 0L)"))
        .withColumn("__hd", expr(s"__hd + ${s * s}L * ((3L * __rx) ^ __ry)"))
        // reflect-then-swap when ry = 0 (reads the PRE-round coordinates:
        // __nx lands first so the __hy redefinition still sees old __hx).
        .withColumn("__nx", expr(
          s"CASE WHEN __ry = 1 THEN __hx WHEN __rx = 1 THEN ${s - 1}L - __hy ELSE __hy END"))
        .withColumn("__hy", expr(
          s"CASE WHEN __ry = 1 THEN __hy WHEN __rx = 1 THEN ${s - 1}L - __hx ELSE __hx END"))
        .withColumn("__hx", col("__nx"))
    }
    cur.withColumn(outCol, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx")
  }

  /** The Hilbert twin of [[writeZOrdered]]. */
  def writeHilbertOrdered(df: DataFrame, path: String, shards: Int,
                          xCol: String, xBound: Long,
                          yCol: String, yBound: Long): Unit = {
    withHilbert(df, "__h", xCol, xBound, yCol, yBound)
      .repartitionByRange(shards, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Default bits/dimension for the d-dim curves: min(16, 62/d) keeps
    * the top index bit inside a signed 64-bit long. */
  def bitsPerDim(d: Int): Int = math.min(16L, 62L / d).toInt

  /** The d-DIMENSIONAL Hilbert walk (Skilling 2004, "Programming the
    * Hilbert curve") as an ENGINE-NEUTRAL sequential step list — the
    * shared source of [[withHilbertN]] (Spark chained columns) and
    * [[hilbertNCtes]] (DuckDB chained CTEs). Skilling's axes→index
    * transform is per-bit conditional exchange/invert arithmetic: bit
    * tests are `(h & q) != 0`, the low-mask AND is `% q`, and the only
    * non-arithmetic primitive is integer XOR — spelled per engine
    * (Spark `^`, DuckDB `xor()`), the same function on BIGINT in both.
    * Steps MUST apply sequentially (each reads columns as left by its
    * predecessors — exactly Spark's chained `withColumn` and a chained
    * CTE's `SELECT * REPLACE`); textual nesting would blow up
    * exponentially (the [[withHilbert]] lesson). */
  private def hilbertNSteps(cols: Seq[(String, Long)], bits: Int,
                            outCol: String, xor: (String, String) => String,
                            div: String): Seq[(String, String)] = {
    val d = cols.size
    require(d >= 2, s"hilbertN needs at least 2 dimensions, got $d")
    require(bits >= 2 && bits * d <= 62,
      s"bits=$bits out of range for d=$d (need 2 <= bits, bits*d <= 62)")
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // range-normalize each input to [0, 2^bits) — bound = 2^bits is the
    // identity (the zValueN convention).
    cols.zipWithIndex.foreach { case ((c, bound), j) =>
      require(bound > 0, s"bound for $c must be positive")
      steps += ((s"hn$j",
        s"(CAST((($c) * ${1L << bits}) $div $bound AS BIGINT))"))
    }
    // inverse undo: q = 2^(bits-1) .. 2; per dimension i ascending.
    for (e <- (bits - 1) to 1 by -1; i <- 0 until d) {
      val q = 1L << e
      val p = q - 1
      val bit = s"(hn$i $div $q) % 2 = 1"
      if (i == 0) {
        steps += (("hn0",
          s"(CASE WHEN $bit THEN ${xor("hn0", p.toString)} ELSE hn0 END)"))
      } else {
        val t = s"tq${e}i$i"
        steps += ((t,
          s"(CASE WHEN $bit THEN 0 ELSE ${xor("hn0", s"hn$i")} % $q END)"))
        steps += (("hn0",
          s"(CASE WHEN $bit THEN ${xor("hn0", p.toString)} ELSE ${xor("hn0", t)} END)"))
        steps += ((s"hn$i",
          s"(CASE WHEN $bit THEN hn$i ELSE ${xor(s"hn$i", t)} END)"))
      }
    }
    // Gray encode (ascending — each step reads its predecessor's result).
    for (i <- 1 until d)
      steps += ((s"hn$i", xor(s"hn$i", s"hn${i - 1}")))
    steps += (("tg", "CAST(0 AS BIGINT)"))
    for (e <- (bits - 1) to 1 by -1) {
      val q = 1L << e
      steps += (("tg",
        s"(CASE WHEN (hn${d - 1} $div $q) % 2 = 1 THEN ${xor("tg", (q - 1).toString)} ELSE tg END)"))
    }
    for (i <- 0 until d)
      steps += ((s"hn$i", xor(s"hn$i", "tg")))
    // interleave the transposed form: bit b of hn(j) → index bit
    // (b·d + (d−1−j)) — hn0 carries the most significant bit per group.
    val terms = for (b <- 0 until bits; j <- 0 until d)
      yield s"(((hn$j $div ${1L << b}) % 2) * ${1L << (b * d + (d - 1 - j))})"
    steps += ((outCol, terms.mkString("(", " + ", ")")))
    steps.toSeq
  }

  /** d-dimensional HILBERT index of `cols` — the space-filling layout
    * with strictly better locality than [[zValueN]] in any dimension
    * count: consecutive Hilbert cells are ADJACENT in exactly one axis
    * (unit step — spec-verified exhaustively on a 3-d cube), where the
    * Morton curve jumps across octant seams at every scale. Same
    * exact-integer discipline: values MUST lie in [0, bound); inputs
    * normalize to `bits` = [[bitsPerDim]](d) bits each (override via
    * `bitsOverride` — the oracle runs a narrower walk). Chained column
    * definitions, one codegen projection, no shuffle, no UDF; the
    * identical step list replays in DuckDB via [[hilbertNCtes]]. */
  def withHilbertN(df: DataFrame, outCol: String, cols: Seq[(String, Long)],
                   bitsOverride: Int = 0): DataFrame = {
    val bits = if (bitsOverride > 0) bitsOverride else bitsPerDim(cols.size)
    val steps = hilbertNSteps(cols, bits, outCol,
      (a, b) => s"($a ^ $b)", "div")
    val temps = steps.map(_._1).distinct.filterNot(_ == outCol)
    steps.foldLeft(df) { case (cur, (name, e)) =>
      cur.withColumn(name, org.apache.spark.sql.functions.expr(e))
    }.drop(temps: _*)
  }

  /** The DuckDB twin of [[withHilbertN]]: the identical step list as
    * chained CTEs `<prefix>0..<prefix>N` over `src` (which must expose
    * the input columns); the final CTE carries `outCol`. Splice into a
    * WITH and read from [[hilbertNLastCte]]. */
  def hilbertNCtes(src: String, prefix: String, cols: Seq[(String, Long)],
                   outCol: String, bitsOverride: Int = 0): String = {
    val bits = if (bitsOverride > 0) bitsOverride else bitsPerDim(cols.size)
    val steps = hilbertNSteps(cols, bits, outCol,
      (a, b) => s"xor($a, $b)", "//")
    val defined = scala.collection.mutable.Set.empty[String]
    steps.zipWithIndex.map { case ((name, e), k) =>
      val from = if (k == 0) src else s"$prefix${k - 1}"
      val sel =
        if (defined(name)) s"SELECT * REPLACE ($e AS $name) FROM $from"
        else { defined += name; s"SELECT *, $e AS $name FROM $from" }
      s"$prefix$k AS ($sel)"
    }.mkString(",\n")
  }

  /** Name of the last CTE emitted by [[hilbertNCtes]] for these inputs. */
  def hilbertNLastCte(prefix: String, cols: Seq[(String, Long)],
                      bitsOverride: Int = 0): String = {
    val bits = if (bitsOverride > 0) bitsOverride else bitsPerDim(cols.size)
    val d = cols.size
    // step count: d init + (bits-1)·(1 + 3(d-1)) rounds + (d-1) gray +
    // (1 + bits-1) tg + d apply + 1 out.
    val n = d + (bits - 1) * (1 + 3 * (d - 1)) + (d - 1) + bits + d + 1
    s"$prefix${n - 1}"
  }

  /** The d-dimensional Hilbert twin of [[writeMortonOrdered]]. */
  def writeHilbertNOrdered(df: DataFrame, path: String, shards: Int,
                           cols: Seq[(String, Long)]): Unit = {
    withHilbertN(df, "__h", cols)
      .repartitionByRange(shards, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
