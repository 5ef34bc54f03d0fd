package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Training-data curation operators beyond dedup/similarity: deterministic
  * sampling (whole-corpus and per-stratum), token-budget sequence packing,
  * and text cleaning / PII masking.
  *
  * Scale design:
  *  - hash sampling is a per-row gate fused into the scan (zero shuffles,
  *    reproducible on any engine — see graft.operators.Sampling);
  *  - stratified sampling is two-phase min-k by hash (map-side k-buffers),
  *    never a whole stratum through one reducer;
  *  - packing shuffles once on the shard key — exactly the parallelism of
  *    the output training files — and runs one cumulative-sum window per
  *    shard partition;
  *  - cleaning is a per-row regexp projection (codegen'd, no shuffle).
  */
object Curation {

  private val SampleRate = 0.10
  private val SampleThreshold = graft.operators.Sampling.hexThreshold(SampleRate)

  /** DuckDB twin of [[graft.operators.Web.withRegistrableDomain]]'s
    * pinned multi-suffix logic over a HOST expr (port stripped; the
    * label list is spelled out per reference — no CTE needed). */
  private def duckDomainOfHost(h: String): String = {
    val multi = graft.operators.Web.MultiSuffixes
      .map(s => s"'$s'").mkString("(", ", ", ")")
    val hp = s"split_part($h, ':', 1)"
    val ls = s"string_split($hp, '.')"
    s"""(CASE WHEN len($ls) <= 2 THEN $hp
       |      WHEN $ls[len($ls) - 1] || '.' || $ls[len($ls)] IN $multi
       |        THEN $ls[len($ls) - 2] || '.' ||
       |             $ls[len($ls) - 1] || '.' || $ls[len($ls)]
       |      ELSE $ls[len($ls) - 1] || '.' || $ls[len($ls)] END)""".stripMargin
  }

  /** DuckDB twin of [[graft.sources.Layout.zValue]]'s shift/mask rounds
    * (operators only — every step parenthesized, `//` for `div`). */
  private def duckSpread(v0: String): String = {
    val s1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }
  private def duckZ(x: String, xb: Long, y: String, yb: Long): String =
    s"(${duckSpread(s"((($x) * 65536) // $xb)")}" +
      s" | (${duckSpread(s"((($y) * 65536) // $yb)")} << 1))"

  /** DuckDB twin of [[graft.sources.Layout.withHilbert]]'s 16 xy→d
    * rounds, as chained CTEs h15..h0 over a `src` CTE (which must expose
    * the `carry` columns plus normalized BIGINT `hx`, `hy` and a zero
    * BIGINT `hd`). Chained CTEs mirror Spark's chained column
    * definitions — textually nesting the conditional rotation would
    * blow up exponentially. */
  private def duckHilbert(src: String, carry: Seq[String]): String = {
    val cols = carry.mkString(", ")
    (15 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == 15) src else s"h${i + 1}"
      s"""h$i AS (SELECT $cols,
         |  hd + CAST(${s * s} AS BIGINT) *
         |    xor(3 * (CASE WHEN (hx & $s) != 0 THEN 1 ELSE 0 END),
         |        (CASE WHEN (hy & $s) != 0 THEN 1 ELSE 0 END)) AS hd,
         |  CASE WHEN (hy & $s) != 0 THEN hx
         |       WHEN (hx & $s) != 0 THEN ${s - 1} - hy ELSE hy END AS hx,
         |  CASE WHEN (hy & $s) != 0 THEN hy
         |       WHEN (hx & $s) != 0 THEN ${s - 1} - hx ELSE hx END AS hy
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
  }

  /** Greedy sequential packing of documents into fixed-token-budget bins.
    *
    * `shards` IS the packing parallelism AND the output-file parallelism:
    * each shard packs independently after ONE shuffle on the shard key,
    * running one cumulative-sum window per shard partition. At 100 TB set
    * `shards` ≫ the cluster width (e.g. executors × cores × 4) — a small
    * constant funnels the whole corpus through that many reducers. The
    * cumulative sum is integer-only with a total per-shard order (doc_id),
    * so any engine packs identically.
    *
    * Output: one row per (shard, bin) with the doc count and token total.
    */
  def packSequences(docs: org.apache.spark.sql.DataFrame,
                    shards: Int, budgetTokens: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tok", expr("size(split(text, ' '))"))
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div $budgetTokens"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
  }

  /** Content-defined chunking — the dedup-stable chunker: a boundary falls
    * after token i wherever the md5 of the `w`-token window ENDING at i
    * string-compares under `thresholdHex` (2 fixed-width hex chars, so
    * P(boundary) = threshold/256 and expected chunk length ≈ 256/threshold
    * tokens past the w−1 warm-up). Because the test reads only the local
    * window, an edit reshapes at most the chunks overlapping it — unlike
    * fixed-stride chunking (x_chunk), where one inserted token shifts
    * every later chunk and defeats chunk-level dedup and embedding caches
    * (Muthitacharoen et al., LBFS SOSP'01, applied to token streams).
    *
    * Plan shape: one per-token explode, ONE shuffle on doc_id feeding both
    * the running boundary-count window and the per-(doc, chunk)
    * reassembly — the x_line_dedup cost envelope; the per-group collect is
    * bounded by document length (format contract). Output:
    * (doc_id, chunk, n_tokens, chunk_text). */
  def cdcChunks(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, w: Int,
                thresholdHex: String): org.apache.spark.sql.DataFrame = {
    require(w >= 2, s"w=$w must be >= 2")
    require(thresholdHex.matches("[0-9a-f]{2}"),
      s"thresholdHex='$thresholdHex' must be 2 lowercase hex chars")
    val w1 = w - 1
    val win = Window.partitionBy(col("doc_id")).orderBy(col("__p0"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .select(col(idCol).cast("long").as("doc_id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "tok")))
      .withColumn("__b", expr(
        s"""IF(__p0 >= $w1 AND substring(md5(concat_ws(' ',
           |  slice(__toks, __p0 - $w1 + 1, $w))), 1, 2) < '$thresholdHex',
           |  CAST(1 AS BIGINT), CAST(0 AS BIGINT))""".stripMargin))
      .withColumn("chunk", coalesce(sum(col("__b")).over(win), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(__p0, tok))), x -> x.tok), ' ')")
          .as("chunk_text"))
  }

  val all: Seq[Q] = Seq(
    // ------------------------------------------------ deterministic sample
    // Content-hash Bernoulli gate: md5(doc_id) prefix under floor(rate·2³²)
    // — same rows selected by any engine at any partitioning; re-runs after
    // appends keep every previously selected row (stable splits).
    Q("x_sample_hash", (s, d) => {
      graft.operators.Sampling.hashSample(documents(s, d), "doc_id", SampleRate)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$SampleThreshold'
      ORDER BY doc_id""")),

    // -------------------------------------------------- stratified sample
    // Exact k=50 per event_type, chosen as the k smallest id-hashes — the
    // deterministic equivalent of per-group uniform sampling. Two-phase
    // min-k aggregation (graft.operators.Sampling.MinKByHash): the oracle's
    // rank-window formulation is the semantic spec, NOT the plan — a rank
    // window would land each stratum's every row on one reducer.
    Q("x_sample_stratified", (s, d) => {
      graft.operators.Sampling
        .stratifiedSample(events(s, d), "event_type", "event_id", k = 50)
        .orderBy(col("event_type"), col("event_id"))
    }, Some("""
      SELECT event_type, event_id FROM (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        FROM events)
      WHERE rn <= 50
      ORDER BY event_type, event_id""")),

    // ------------------------------------------------- weighted sampling
    // Length-weighted keep gate: rate = n_chars/2000 capped at 1 — the
    // quality/importance-weighted selection step of a curation recipe,
    // exact integer threshold per row, shuffle-free, coordinated with the
    // unweighted hash gate (raising a weight only ever ADDS rows).
    Q("x_sample_weighted", (s, d) => {
      graft.operators.Sampling
        .weightedSample(documents(s, d), "doc_id", "n_chars", "2000")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, n_chars FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        CASE WHEN n_chars >= 2000 THEN 'g'
             ELSE lower(lpad(hex((n_chars * 4294967296) // 2000), 8, '0')) END
      ORDER BY doc_id""")),

    // ------------------------------------- DSIR importance scores (hashed)
    // Importance-resampling weights toward a target distribution (here:
    // the English subset) over 4096 hashed token buckets — the data-
    // selection step before weighted sampling. Exact fixed-point ratio
    // weights (no logs — not bit-portable); the (doc, bucket, tf)
    // projection computes map-side and stages ONCE, weights broadcast
    // back, one per-doc shuffle. The oracle recomputes the same buckets
    // per token occurrence.
    Q("x_importance_weights", (s, d) => {
      graft.operators.Ranking.importanceScores(fanOut(documents(s, d)),
        "doc_id", "text", isTarget = col("lang") === "en")
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
                        string_split(lower(text), ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      ex AS (SELECT doc_id, tgt, substr(md5(unnest(toks)), 1, 3) AS bk FROM t),
      w AS (SELECT bk,
                   (COALESCE(CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) AS w
            FROM ex GROUP BY bk),
      sc AS (SELECT e.doc_id,
                    CAST(SUM(w.w) AS BIGINT) AS raw,
                    CAST(COUNT(*) AS BIGINT) AS n_tokens
             FROM ex e JOIN w USING (bk)
             GROUP BY e.doc_id)
      SELECT doc_id, raw, n_tokens, raw // n_tokens AS avg_w
      FROM sc ORDER BY doc_id"""), headline = true),

    // --------------------------- importance scoring gate (ingest variant)
    // The streaming-gate shape (streaming.ScoreIngest drives it per
    // micro-batch): bucket weights learned from the EXISTING corpus are
    // the caller-owned staged index; the batch projects map-side and
    // joins the broadcast weights. Novel batch vocabulary scores 0 but
    // still length-normalizes (left join) — the oracle restates that.
    // Batch stand-in: doc_id % 10 = 0 scored against the rest.
    Q("x_importance_incremental", (s, d) => {
      val docs = documents(s, d)
      // UNSTAGED (r18): bucketWeights is a single-pass aggregate, so the
      // lazy weight chain executes the reference feature projection
      // exactly once, inside the final plan's broadcast build — the old
      // checkpoint was a whole staged execution for a ≤4096-row relation
      // with one consumer.
      val w = graft.operators.Ranking.bucketWeights(
        graft.operators.Ranking.importanceRelation(
          fanOut(docs.filter(col("doc_id") % 10 =!= 0)), "doc_id", "text",
          isTarget = col("lang") === "en"))
      graft.operators.Ranking.scoreAgainstWeights(
        graft.operators.Ranking.importanceRelation(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", lit(false)),
        w)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
                        string_split(lower(text), ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      ex AS (SELECT doc_id, tgt, substr(md5(unnest(toks)), 1, 3) AS bk FROM t),
      w AS (SELECT bk,
                   (COALESCE(CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) AS w
            FROM ex WHERE doc_id % 10 <> 0 GROUP BY bk),
      sc AS (SELECT e.doc_id,
                    CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS raw,
                    CAST(COUNT(*) AS BIGINT) AS n_tokens
             FROM (SELECT * FROM ex WHERE doc_id % 10 = 0) e
             LEFT JOIN w USING (bk)
             GROUP BY e.doc_id)
      SELECT doc_id, raw, n_tokens, raw // n_tokens AS avg_w
      FROM sc ORDER BY doc_id""")),

    // --------------------------------------- linear quality classifier
    // The fastText-style quality gate published pipelines (C4,
    // RefinedWeb) actually run: a linear model over hashed uni+bigram
    // features, trained on a curated-vs-rest label (here: sources
    // src0-src2 as the reference subset) and applied as a keep/drop
    // threshold — all in exact integer arithmetic (zero-centered
    // positive-ratio weights, score = Σ tf·w, keep ⇔ score ≥ 0). One
    // corpus scan: the staged feature projection feeds both training and
    // scoring; weights (≤4096 rows) broadcast back. The oracle recomputes
    // features per occurrence.
    Q("x_quality_classifier", (s, d) => {
      graft.operators.Ranking.qualityClassifier(fanOut(documents(s, d)),
        "doc_id", "text",
        isPositive = col("source").isin("src0", "src1", "src2"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos,
                        string_split(lower(text), ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, pos,
                   unnest(list_concat(toks,
                     list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' ')))) AS feat
            FROM t),
      ex AS (SELECT doc_id, pos, substr(md5(feat), 1, 3) AS bk FROM f),
      g AS (SELECT (COALESCE(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) AS prior FROM ex),
      w AS (SELECT bk,
                   (COALESCE(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) - (SELECT prior FROM g) AS w
            FROM ex GROUP BY bk),
      sc AS (SELECT e.doc_id,
                    CAST(SUM(w.w) AS BIGINT) AS score,
                    CAST(COUNT(*) AS BIGINT) AS n_feats
             FROM ex e JOIN w USING (bk)
             GROUP BY e.doc_id)
      SELECT doc_id, score, n_feats, score >= 0 AS keep
      FROM sc ORDER BY doc_id"""), headline = true),

    // ------------------------ classifier gate (streaming-ingest variant)
    // The streaming-gate shape (streaming.ScoreIngest.startClassifierGate
    // drives it per micro-batch): classifier weights trained on the
    // EXISTING corpus are the caller-owned staged index; the batch
    // projects its uni+bigram features map-side and joins the broadcast
    // weights. Novel batch vocabulary contributes 0 but still counts
    // toward n_feats (left join) — the oracle restates that. Batch
    // stand-in: doc_id % 10 = 0 classified against the rest.
    Q("x_classifier_incremental", (s, d) => {
      val docs = documents(s, d)
      // pre-aggregate to the bounded (bk, pos) space and SETTLE it
      // driver-side — one corpus-feature pass (the collect job) instead
      // of two, same integers (the qualityClassifier discipline). The
      // feature projection's only consumer is the settled counts, so it
      // stays UNSTAGED (executes once, inside the collect); the weight
      // builder's two passes read the LocalTableScan, so staging the
      // weights would checkpoint a trivial local-relation plan (r18 —
      // the old shape paid two checkpoint executions here).
      val w = graft.operators.Ranking.classifierWeights(
        graft.operators.Ranking.settleBounded(
          graft.operators.Ranking.classifierRelation(
            fanOut(docs.filter(col("doc_id") % 10 =!= 0)), "doc_id", "text",
            isPositive = col("source").isin("src0", "src1", "src2"))
            .groupBy(col("bk"), col("pos"))
            .agg(sum(col("tf")).cast("long").as("tf")),
          maxRows = 2 * (1 << (4 * 3)),
          what = "x_classifier_incremental")._1)
      graft.operators.Ranking.classifyAgainstWeights(
        graft.operators.Ranking.classifierRelation(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", lit(false)),
        w)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos,
                        string_split(lower(text), ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, pos,
                   unnest(list_concat(toks,
                     list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' ')))) AS feat
            FROM t),
      ex AS (SELECT doc_id, pos, substr(md5(feat), 1, 3) AS bk FROM f),
      g AS (SELECT (COALESCE(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) AS prior
            FROM ex WHERE doc_id % 10 <> 0),
      w AS (SELECT bk,
                   (COALESCE(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) - (SELECT prior FROM g) AS w
            FROM ex WHERE doc_id % 10 <> 0 GROUP BY bk),
      sc AS (SELECT e.doc_id,
                    CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score,
                    CAST(COUNT(*) AS BIGINT) AS n_feats
             FROM (SELECT * FROM ex WHERE doc_id % 10 = 0) e
             LEFT JOIN w USING (bk)
             GROUP BY e.doc_id)
      SELECT doc_id, score, n_feats, score >= 0 AS keep
      FROM sc ORDER BY doc_id""")),

    // ------------------------------------------ train/val/test assignment
    // Deterministic 90/5/5 split by salted id-hash ladder (stable under
    // appends, identical on any engine/partitioning); the report shape is
    // the per-(source, split) audit a curation run emits. The assignment
    // itself is a shuffle-free per-row projection — the one groupBy here
    // is the AUDIT, not the operator.
    Q("x_split_assign", (s, d) => {
      graft.operators.Sampling
        .assignSplits(documents(s, d), "doc_id",
          Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("source"), col("split"))
    }, Some(s"""
      WITH a AS (
        SELECT source, n_chars, doc_id,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < '${graft.operators.Sampling.hexThreshold(0.90)}' THEN 'train'
                    WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < '${graft.operators.Sampling.hexThreshold(0.95)}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      FROM a GROUP BY source, split ORDER BY source, split""")),

    // ------------------------------------------------- z-order layout key
    // Morton interleave of (o_custkey, order-day) — the two-dimensional
    // layout key writeZOrdered sorts by so parquet zone maps prune on
    // EITHER column. The audit groups by the top-4-bit z prefix: every
    // bucket must be a quadrant-shaped bounding box (min/max narrow in
    // BOTH dimensions at once — the property scan pruning depends on;
    // LayoutSpec asserts it per written file too). Exact shift/mask
    // integer arithmetic, bit-identical in any engine.
    Q("x_zorder", (s, d) => {
      orders(s, d)
        .withColumn("day",
          expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"))
        .withColumn("z",
          graft.sources.Layout.zValue("o_custkey", 16384, "day", 4096))
        .withColumn("bucket", expr("z div 268435456"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"))
        .orderBy(col("bucket"))
    }, Some(s"""
      WITH t AS (
        SELECT o_custkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day
        FROM orders),
      z AS (SELECT o_custkey, day,
                   ${duckZ("o_custkey", 16384, "day", 4096)} AS zv
            FROM t)
      SELECT (zv // 268435456) AS bucket, COUNT(*) AS n,
             MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
             MIN(day) AS min_day, MAX(day) AS max_day
      FROM z GROUP BY 1 ORDER BY bucket""")),

    // --------------------------------------------- Hilbert layout key
    // x_zorder's space-filling sibling (Layout.withHilbert): consecutive
    // Hilbert cells are always ADJACENT in (x, y) — no quadrant seams —
    // so equal key ranges cover tighter, always-connected boxes (the
    // locality LayoutSpec measures against z-order on identical data).
    // Same audit shape as x_zorder: group by the top-4-bit prefix, emit
    // each bucket's bounding box. The oracle replays the 16 reflect/
    // rotate rounds as chained CTEs with identical integer arithmetic.
    Q("x_hilbert", (s, d) => {
      graft.sources.Layout.withHilbert(
        orders(s, d).withColumn("day",
          expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)")),
        "h", "o_custkey", 16384, "day", 4096)
        .withColumn("bucket", expr("h div 268435456"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"))
        .orderBy(col("bucket"))
    }, Some(s"""
      WITH t AS (
        SELECT o_custkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day
        FROM orders),
      h16 AS (SELECT o_custkey, day,
                     CAST(0 AS BIGINT) AS hd,
                     CAST(((o_custkey) * 65536) // 16384 AS BIGINT) AS hx,
                     CAST(((day) * 65536) // 4096 AS BIGINT) AS hy
              FROM t),
      ${duckHilbert("h16", Seq("o_custkey", "day"))}
      SELECT (hd // 268435456) AS bucket, COUNT(*) AS n,
             MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
             MIN(day) AS min_day, MAX(day) AS max_day
      FROM h0 GROUP BY 1 ORDER BY bucket""")),

    // --------------------------------------- 3-dimensional Morton key
    // Layout.zValueN at d = 3: (customer, order-day, orderkey-residue)
    // interleaved bit-by-bit as pure div/mod arithmetic — the layout for
    // tables serving THREE predicate families (LayoutSpec proves scan
    // pruning on each axis with scan metrics). Audit twin of x_zorder:
    // group by the top-6-bit prefix (d=3 × 16 bits = 48-bit key), emit
    // each bucket's 3-d bounding box — every bucket must be narrow in
    // ALL THREE dims at once. The oracle restates the identical
    // sum-of-bits expression via Layout.zValueNSql(divOp = "//").
    Q("x_zorder3", (s, d) => {
      orders(s, d)
        .withColumn("day",
          expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"))
        .withColumn("okm", expr("o_orderkey % 4096"))
        .withColumn("z", graft.sources.Layout.zValueN(
          Seq(("o_custkey", 16384L), ("day", 4096L), ("okm", 4096L))))
        .withColumn("bucket", expr("z div 4398046511104"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          min(col("okm")).as("min_ok"), max(col("okm")).as("max_ok"))
        .orderBy(col("bucket"))
    }, Some(s"""
      WITH t AS (
        SELECT o_custkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day,
               o_orderkey % 4096 AS okm
        FROM orders),
      z AS (SELECT o_custkey, day, okm,
                   ${graft.sources.Layout.zValueNSql(
                     Seq(("o_custkey", 16384L), ("day", 4096L), ("okm", 4096L)),
                     divOp = "//")} AS zv
            FROM t)
      SELECT (zv // 4398046511104) AS bucket, COUNT(*) AS n,
             MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
             MIN(day) AS min_day, MAX(day) AS max_day,
             MIN(okm) AS min_ok, MAX(okm) AS max_ok
      FROM z GROUP BY 1 ORDER BY bucket""")),

    // --------------------------------------- 3-dimensional Hilbert key
    // Layout.withHilbertN at d = 3 (Skilling 2004): the space-filling
    // layout for three predicate families with strictly better locality
    // than x_zorder3's Morton key (consecutive cells are UNIT-STEP
    // adjacent — verified exhaustively in LayoutSpec; Morton jumps
    // octant seams). An 8-bit walk here keeps the oracle chain short
    // (LayoutSpec pins the full-width walk against the independent
    // Skilling reference); the audit shape mirrors x_zorder3: bucket by
    // the top 6 bits of the 24-bit key, emit per-bucket 3-d bounding
    // boxes. The oracle replays the IDENTICAL 66-step walk as chained
    // `SELECT * REPLACE` CTEs (Layout.hilbertNCtes — xor spelled per
    // engine, every other step literal-identical).
    Q("x_hilbert3", (s, d) => {
      val dims = Seq(("o_custkey", 16384L), ("day", 4096L), ("okm", 4096L))
      graft.sources.Layout.withHilbertN(
        orders(s, d)
          .withColumn("day",
            expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"))
          .withColumn("okm", expr("o_orderkey % 4096")),
        "hv", dims, bitsOverride = 8)
        .withColumn("bucket", expr("hv div 262144"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          min(col("okm")).as("min_ok"), max(col("okm")).as("max_ok"))
        .orderBy(col("bucket"))
    }, Some {
      val dims = Seq(("o_custkey", 16384L), ("day", 4096L), ("okm", 4096L))
      s"""
      WITH t AS (
        SELECT o_custkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day,
               o_orderkey % 4096 AS okm
        FROM orders),
      ${graft.sources.Layout.hilbertNCtes("t", "hc", dims, "hv", bitsOverride = 8)}
      SELECT (hv // 262144) AS bucket, COUNT(*) AS n,
             MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
             MIN(day) AS min_day, MAX(day) AS max_day,
             MIN(okm) AS min_ok, MAX(okm) AS max_ok
      FROM ${graft.sources.Layout.hilbertNLastCte("hc", dims, bitsOverride = 8)}
      GROUP BY 1 ORDER BY bucket"""
    }),

    // --------------------------------------------- token-budget packing
    // Greedy sequential packing of documents into fixed-token-budget bins
    // within a shard: bin = (running-token-count-before-me) div budget.
    // Shards (doc_id % 8) are the output-file parallelism: each packs
    // independently after ONE shuffle on the shard key; the cumulative sum
    // is integer-only (order fixed by doc_id), so engines agree exactly.
    Q("x_pack_sequences", (s, d) => {
      packSequences(documents(s, d), shards = 8, budgetTokens = 1024)
        .orderBy(col("shard"), col("bin"))
    }, Some("""
      WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok, doc_id % 8 AS shard
        FROM documents),
      c AS (
        SELECT shard, n_tok,
               -- BIGINT casts here and below: DuckDB SUM(INT) is HUGEINT
               -- (int128), which the driver comparator can't hash against
               -- Spark's int64. Token counts fit long trivially.
               CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t)
      SELECT shard, CAST((cum - n_tok) // 1024 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
      FROM c GROUP BY shard, bin ORDER BY shard, bin""")),

    // --------------------------------------------- text clean / PII mask
    // Masking + whitespace normalization as one codegen'd regexp
    // projection. The corpus is synthetic (no real PII), so the dirty
    // input is built deterministically from doc_id — the masking itself is
    // what's under test. Patterns are deliberately in the common subset of
    // Java regex (Spark) and RE2 (DuckDB); DuckDB needs the 'g' flag for
    // replace-all to match Spark's semantics.
    Q("x_text_clean", (s, d) => {
      documents(s, d)
        .withColumn("dirty", expr(
          """concat(text, '  contact  user', CAST(doc_id AS STRING),
            |'@mail.example.com  or  http://docs.example.com/d/',
            |CAST(doc_id AS STRING), ' ')""".stripMargin))
        .select(col("doc_id"),
          expr(
            """trim(regexp_replace(regexp_replace(regexp_replace(dirty,
              |  'https?://[^ ]+', '<URL>'),
              |  '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'),
              |  '  +', ' '))""".stripMargin).as("clean"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (
        SELECT doc_id,
               text || '  contact  user' || CAST(doc_id AS VARCHAR) ||
               '@mail.example.com  or  http://docs.example.com/d/' ||
               CAST(doc_id AS VARCHAR) || ' ' AS dirty
        FROM documents)
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(dirty,
               'https?://[^ ]+', '<URL>', 'g'),
               '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '  +', ' ', 'g')) AS clean
      FROM t ORDER BY doc_id""")),

    // --------------------------------------- typed PII redaction counts
    // operators.Pii: the Dolma/RefinedWeb-style scrub — emails, IPv4,
    // phones masked with TYPED placeholders in a pinned class order,
    // each class counted on the text as redacted by the earlier classes
    // (counts and replacements always agree). One codegen'd projection;
    // the oracle replays the identical pattern text (RE2 ∩ Java, no
    // backslash classes). The corpus is synthetic, so the PII is planted
    // deterministically from doc_id: emails on 2/3 of docs, IPv4 on
    // half, IPv6 on 1/3 (both the compressed `::` and the full 8-group
    // spelling), cards on 3/8 (bare / hyphenated / space-separated
    // 16-digit), three phone spellings (E.164 / parenthesized /
    // hyphenated NANP) on 3/4 — every (class, presence) combination
    // occurs, and the separated-card plants prove the cards-before-
    // phones order (their quads would otherwise be NANP bait).
    Q("x_pii_redact", (s, d) => {
      val dirty = fanOut(documents(s, d))
        .withColumn("dirty", expr(
          """concat(text,
            |  CASE CAST(doc_id % 3 AS INT) WHEN 2 THEN ''
            |    ELSE concat(' email u', CAST(doc_id AS STRING),
            |                '@mail-site', CAST(doc_id % 7 AS STRING),
            |                '.com') END,
            |  CASE CAST(doc_id % 2 AS INT) WHEN 0
            |    THEN concat(' ip 10.', CAST(doc_id % 256 AS STRING),
            |                '.0.', CAST(doc_id % 100 AS STRING))
            |    ELSE '' END,
            |  CASE CAST(doc_id % 6 AS INT)
            |    WHEN 1 THEN concat(' ip6 2001:db8:', CAST(doc_id % 10 AS STRING),
            |                       '::', CAST(doc_id % 16 AS STRING))
            |    WHEN 3 THEN concat(' ip6 fe80:1:2:3:4:5:6:',
            |                       CAST(doc_id % 10 AS STRING))
            |    ELSE '' END,
            |  CASE CAST(doc_id % 8 AS INT)
            |    WHEN 0 THEN ' card 4111111111111111'
            |    WHEN 1 THEN concat(' card 4111-1111-1111-',
            |                       CAST(1000 + doc_id % 1000 AS STRING))
            |    WHEN 2 THEN concat(' card 4111 1111 1111 ',
            |                       CAST(1000 + doc_id % 1000 AS STRING))
            |    ELSE '' END,
            |  CASE CAST(doc_id % 4 AS INT)
            |    WHEN 0 THEN concat(' call +1415555',
            |                       CAST(1000 + doc_id % 1000 AS STRING))
            |    WHEN 1 THEN concat(' call (415) 555-',
            |                       CAST(1000 + doc_id % 1000 AS STRING))
            |    WHEN 2 THEN concat(' call 415-555-',
            |                       CAST(1000 + doc_id % 1000 AS STRING))
            |    ELSE '' END,
            |  ' end')""".stripMargin))
      graft.operators.Pii.withRedacted(dirty, "dirty")
        .select(col("doc_id"), md5(col("redacted")).as("digest"),
          col("n_email"), col("n_ip"), col("n_ipv6"), col("n_card"),
          col("n_phone"))
        .orderBy(col("doc_id"))
    }, Some {
      val (red, cs) = graft.operators.Pii.itemsSql("dirty", duck = true)
      s"""
      WITH t AS (
        SELECT doc_id, text ||
          CASE CAST(doc_id % 3 AS INT) WHEN 2 THEN ''
            ELSE ' email u' || CAST(doc_id AS VARCHAR) ||
                 '@mail-site' || CAST(doc_id % 7 AS VARCHAR) || '.com' END ||
          CASE CAST(doc_id % 2 AS INT) WHEN 0
            THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) ||
                 '.0.' || CAST(doc_id % 100 AS VARCHAR)
            ELSE '' END ||
          CASE CAST(doc_id % 6 AS INT)
            WHEN 1 THEN ' ip6 2001:db8:' || CAST(doc_id % 10 AS VARCHAR) ||
                        '::' || CAST(doc_id % 16 AS VARCHAR)
            WHEN 3 THEN ' ip6 fe80:1:2:3:4:5:6:' ||
                        CAST(doc_id % 10 AS VARCHAR)
            ELSE '' END ||
          CASE CAST(doc_id % 8 AS INT)
            WHEN 0 THEN ' card 4111111111111111'
            WHEN 1 THEN ' card 4111-1111-1111-' ||
                        CAST(1000 + doc_id % 1000 AS VARCHAR)
            WHEN 2 THEN ' card 4111 1111 1111 ' ||
                        CAST(1000 + doc_id % 1000 AS VARCHAR)
            ELSE '' END ||
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN ' call +1415555' ||
                        CAST(1000 + doc_id % 1000 AS VARCHAR)
            WHEN 1 THEN ' call (415) 555-' ||
                        CAST(1000 + doc_id % 1000 AS VARCHAR)
            WHEN 2 THEN ' call 415-555-' ||
                        CAST(1000 + doc_id % 1000 AS VARCHAR)
            ELSE '' END ||
          ' end' AS dirty
        FROM documents)
      SELECT doc_id, md5($red) AS digest,
             ${cs(0)} AS n_email, ${cs(1)} AS n_ip, ${cs(2)} AS n_ipv6,
             ${cs(3)} AS n_card, ${cs(4)} AS n_phone
      FROM t ORDER BY doc_id"""
    }, headline = true),

    // ----------------------------------------- HTML → text extraction
    // The FIRST stage of every web-curation pipeline (operators.Html):
    // strip script/style/comments, split into blocks at closing
    // block-level tags, decode entities (&amp; LAST — the double-decode
    // trap), drop boilerplate blocks by the exact-integer LINK-DENSITY
    // gate (100·anchor_chars < pct·visible_chars) and a minimum length,
    // join survivors in order. One codegen'd projection chain; the
    // oracle replays the identical regex chain spelled per dialect
    // (patterns live in the RE2 ∩ Java subset: no backrefs, no
    // lookaheads, no backslash classes). Fixture per doc: title, style/
    // script junk (with a bare '<' inside the script), a comment, a
    // link-dense nav div, two real text blocks carrying entities, and a
    // link-only block — expected survivors: exactly the two text
    // blocks.
    Q("x_text_html", (s, d) => {
      val docs = fanOut(documents(s, d))
        .withColumn("__t", expr("split(text, ' ')"))
        .withColumn("__html", expr(
          """concat('<html><head><title>Doc ', CAST(doc_id AS STRING),
            |'</title><style>p { color: red }</style>',
            |'<script>var x = 1 < 2;</script>',
            |'</head><body><!-- crawler comment -->',
            |'<div id="nav"><a href="/">Home</a> ',
            |'<a href="/about">About &amp; more</a></div>',
            |'<p>', concat_ws(' ', slice(__t, 1, 5)),
            |' &amp; &lt;tag&gt; &quot;quoted&quot;</p>',
            |'<p>', concat_ws(' ', slice(__t, 6, 100000)), '</p>',
            |'<p>it&#8217;s caf&#233; &#x2019; quote &mdash; dash ',
            |'&#38;lt; lit &#55296; kept</p>',
            |'<p><a href="/next">next page</a></p>',
            |'</body></html>')""".stripMargin))
      graft.operators.Html.extractText(docs, "doc_id", "__html",
        minChars = 10, maxDensityPct = 34)
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents WHERE text IS NOT NULL),
      __html_src AS (
        SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</title><style>p { color: red }</style>' ||
          '<script>var x = 1 < 2;</script>' ||
          '</head><body><!-- crawler comment -->' ||
          '<div id="nav"><a href="/">Home</a> ' ||
          '<a href="/about">About &amp; more</a></div>' ||
          '<p>' || array_to_string(t[1:5], ' ') ||
          ' &amp; &lt;tag&gt; &quot;quoted&quot;</p>' ||
          '<p>' || array_to_string(t[6:len(t)], ' ') || '</p>' ||
          '<p>it&#8217;s caf&#233; &#x2019; quote &mdash; dash ' ||
          '&#38;lt; lit &#55296; kept</p>' ||
          '<p><a href="/next">next page</a></p>' ||
          '</body></html>' AS h
        FROM toks)
      SELECT doc_id, ${graft.operators.Html.duckExtractItems("h", 10, 34)}
      ORDER BY doc_id"""), headline = true),

    // ----------------------------------------- head-metadata extraction
    // Html.extractTitle: (doc_id, title, description) — titles feed
    // dedup keys and quality features, descriptions feed snippets.
    // Clean-FIRST is load-bearing (the fixture plants a fake <title>
    // inside a <script>); both fields run the full step-3 visibility
    // transform (the fixture title carries &amp;, a numeric ref, and a
    // named alias; the description a &hellip;); docs with
    // doc_id % 11 = 0 have NO meta tag → description = '' (the pinned
    // missing-field value, same as both engines' no-match
    // regexp_extract).
    Q("x_text_title", (s, d) => {
      val docs = fanOut(documents(s, d))
        .withColumn("__html", expr(
          """concat('<html><head>',
            |'<script>var t = "<title>fake</title>";</script>',
            |'<title>Doc ', CAST(doc_id AS STRING),
            |' &amp; more &#8212; site', CAST(doc_id % 7 AS STRING),
            |'</title>',
            |IF(doc_id % 11 = 0, '',
            |   concat('<meta name="description" content="summary of doc ',
            |          CAST(doc_id AS STRING), ' &hellip; done">')),
            |'</head><body><p>', substring(text, 1, 40), '</p></body></html>')""".stripMargin))
      graft.operators.Html.extractTitle(docs, "doc_id", "__html")
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH h AS (
        SELECT doc_id,
          '<html><head>' ||
          '<script>var t = "<title>fake</title>";</script>' ||
          '<title>Doc ' || CAST(doc_id AS VARCHAR) ||
          ' &amp; more &#8212; site' || CAST(doc_id % 7 AS VARCHAR) ||
          '</title>' ||
          CASE WHEN doc_id % 11 = 0 THEN ''
               ELSE '<meta name="description" content="summary of doc ' ||
                    CAST(doc_id AS VARCHAR) || ' &hellip; done">' END ||
          '</head><body><p>' || substr(text, 1, 40) || '</p></body></html>'
          AS h
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, ${graft.operators.Html.duckTitleItems("h")}
      FROM h ORDER BY doc_id""")),

    // ------------------------------------------------- hyperlink extraction
    // Html.extractLinks: (doc_id, pos, href) — the outlink feed of a
    // crawl frontier and the edge source of the hyperlink graph.
    // Clean-FIRST is load-bearing (the fixture plants a fake <a> inside
    // a <script>); hrefs decode entities (&amp; inside query strings is
    // the HTML-spec spelling — undecoded it would poison URL joins
    // downstream); docs with doc_id % 9 = 0 carry no links and emit
    // NOTHING (never an empty-href placeholder row). One codegen
    // projection + posexplode; the oracle zips DuckDB's parallel
    // unnests by position.
    Q("x_text_links", (s, d) => {
      val docs = fanOut(documents(s, d))
        .withColumn("__html", expr(
          """concat('<html><body>',
            |'<script>var a = "<a href=\"/fake\">x</a>";</script>',
            |IF(doc_id % 9 = 0, '<p>no links on this page at all</p>',
            |   concat('<p><a class="m" href="https://www.site',
            |          CAST(doc_id % 7 AS STRING), '.com/d/',
            |          CAST(doc_id AS STRING), '?ref=rss">self</a> and ',
            |          '<a href="/search?q=a&amp;id=',
            |          CAST(doc_id AS STRING), '">find</a></p>')),
            |'</body></html>')""".stripMargin))
      graft.operators.Html.extractLinks(docs, "doc_id", "__html")
        .orderBy(col("doc_id"), col("pos"))
    }, Some(s"""
      WITH __link_src AS (
        SELECT doc_id,
          '<html><body>' ||
          '<script>var a = "<a href="/fake">x</a>";</script>' ||
          CASE WHEN doc_id % 9 = 0 THEN '<p>no links on this page at all</p>'
               ELSE '<p><a class="m" href="https://www.site' ||
                    CAST(doc_id % 7 AS VARCHAR) || '.com/d/' ||
                    CAST(doc_id AS VARCHAR) || '?ref=rss">self</a> and ' ||
                    '<a href="/search?q=a&amp;id=' ||
                    CAST(doc_id AS VARCHAR) || '">find</a></p>' END ||
          '</body></html>' AS h
        FROM documents)
      SELECT doc_id, pos, href
      FROM (${graft.operators.Html.duckLinkItems("h")}) z
      ORDER BY doc_id, pos""")),

    // ----------------------------------------- hyperlink-graph PageRank
    // The Brin–Page composition end-to-end: extract outlinks from HTML
    // (Html.extractLinks, clean-first), canonicalize BOTH the hrefs and
    // the pages' own URLs (Web.withCanonicalUrl — the fixture spells
    // targets as 'https://WWW.Site….COM:443/…?utm_source=feed', so
    // resolution only works post-canonicalization), resolve edges by an
    // equi-join on the canonical URL (off-corpus links drop — the crawl
    // frontier's "not fetched yet" set), then DIRECTED PageRank
    // (Graph.pageRankDirected: dup edges collapse, self-links drop,
    // dangling mass leaks — all pinned). Every stage is the audited
    // operator; the only corpus-keyed shuffle is the canonical-URL
    // equi-join; iteration state is edge-subgraph-sized. Targets are
    // (3·id+1)%1024 and (7·id+2)%1024 (dangling beyond the corpus at
    // small sf), every 10th page links the hub page 1, and one external
    // link per page never resolves.
    Q("x_linkgraph_rank", (s, d) => {
      val pages = linkFixturePages(s, d)
      val links = graft.operators.Html.extractLinks(pages, "doc_id", "__html")
      linkRankFromLinks(s, d, pages, links)
    }, Some(linkRankOracle), headline = true),

    // ---------------------------------- webgraph from WAT alone
    // How CommonCrawl's webgraph releases are actually built: the
    // link structure comes from the WAT METADATA archives — page
    // bodies are never read. The same link fixture round-trips
    // through Warc.writeMeta (one JSON envelope of raw hrefs per
    // page, document order) and the graph rebuilds from readWat +
    // from_json + explode: src ids recover from each record's OWN
    // target_uri, hrefs canonicalize and resolve to pages by the
    // canonical equi-join, and the SAME directed exact-integer rank
    // runs — against the SAME oracle as x_linkgraph_rank (round trip
    // through the metadata archive = identity is the claim; a lost
    // link, a drifted envelope, or a broken uri recovery all
    // hash-mismatch). Bodies never shuffle — the envelope relation is
    // links-sized.
    Q("x_linkgraph_wat", (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_lgwat/${new java.io.File(d).getName}"
      val pages = linkFixturePages(s, d)
      val meta = pages.select(col("doc_id"), col("url"))
        .join(
          graft.operators.Html.extractLinks(pages, "doc_id", "__html")
            .groupBy(col("doc_id"))
            .agg(expr(
              """transform(array_sort(collect_list(named_struct('p', pos,
                |'h', href))), s9 -> s9.h)""".stripMargin).as("__ls")),
          Seq("doc_id"))
        .withColumn("__json", expr(
          """to_json(named_struct(
            |  'Envelope', named_struct(
            |    'Payload-Metadata', named_struct(
            |      'HTML-Metadata', named_struct(
            |        'Links', transform(__ls,
            |          l9 -> named_struct('url', l9)))))))""".stripMargin))
      graft.sources.Warc.writeMeta(meta, "url", "__json", tmp, files = 4)
      val watSchema = "Envelope STRUCT<`Payload-Metadata` STRUCT<" +
        "`HTML-Metadata` STRUCT<Links ARRAY<STRUCT<url STRING>>>>>"
      val links = graft.sources.Warc.readWat(s, tmp)
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/d/', 2) AS BIGINT)"))
        .withColumn("__e",
          expr(s"from_json(decode(body, 'UTF-8'), '$watSchema')"))
        .select(col("doc_id"), explode(expr(
          "__e.Envelope.`Payload-Metadata`.`HTML-Metadata`.Links"))
          .as("__l"))
        .select(col("doc_id"), col("__l.url").as("href"))
      linkRankFromLinks(s, d, linkFixturePages(s, d), links)
    }, Some(linkRankOracle)),


    // ---------------------------------------------- anchor-text profiles
    // The web-IR signal the original PageRank paper indexes on the
    // TARGET page: every <a href="…">text</a> is extracted with its
    // anchor text (Html.extractLinksWithText — clean-first, visibility
    // transform on BOTH fields), hrefs canonicalize and resolve to
    // corpus pages by the canonical-URL equi-join, and each target
    // aggregates its in-link anchor profile: n_links, n_pages (distinct
    // referrers), and the first 20 anchor texts by (referrer, pos).
    // The cap is a TYPED min-k aggregator over the packed key
    // src·2^20 + pos (Ranking.MinKTagged — map-side k-buffers, never a
    // mega-hub's whole in-link set in one collect_list buffer; packing
    // needs pos < 2^20, the per-page link-count contract). Anchor text
    // never joins a shuffle key; only canonical strings do.
    Q("x_anchor_text", (s, d) => {
      val pages = fanOut(documents(s, d))
        .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
        .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
        .withColumn("url", expr(
          """concat('https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
        .withColumn("__html", expr(
          """concat('<p><a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
            |'.COM:443/d/', CAST(__t1 AS STRING),
            |'?utm_source=feed">about page ', CAST(__t1 AS STRING), '</a> ',
            |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
            |'.com/d/', CAST(__t2 AS STRING), '">see &amp; visit ',
            |CAST(__t2 AS STRING), '</a>',
            |IF(doc_id % 10 = 0,
            |   '<a href="https://www.site1.com/d/1">the hub</a>', ''),
            |'</p>')""".stripMargin))
      val links = graft.operators.Html
        .extractLinksWithText(pages, "doc_id", "__html")
      val lc = graft.operators.Web.withCanonicalUrl(links, "href", "__c")
        .select(col("doc_id").as("src"), col("pos"), col("anchor"),
          col("__c").as("canon"))
      val pc = graft.operators.Web.withCanonicalUrl(
        pages.select(col("doc_id"), col("url")), "url", "__c")
        .select(col("doc_id").as("dst"), col("__c").as("canon"))
      val minkt = udaf(new graft.operators.Ranking.MinKTagged(20),
        org.apache.spark.sql.Encoders.product[graft.operators.Ranking.Tagged])
      lc.join(pc, "canon")
        .select(col("dst"), col("src"),
          (col("src") * 1048576L + col("pos")).as("pk"), col("anchor"))
        .groupBy(col("dst").as("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_links"),
          countDistinct(col("src")).as("n_pages"),
          minkt(col("pk"), col("anchor")).as("__mk"))
        .select(col("doc_id"), col("n_links"), col("n_pages"),
          expr("array_join(transform(__mk.items, e -> e.s), ' | ')")
            .as("anchors"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH pages AS MATERIALIZED (
        SELECT doc_id,
          (doc_id * 3 + 1) % 1024 AS t1, (doc_id * 7 + 2) % 1024 AS t2,
          'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.com/d/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      __link_src AS (
        SELECT doc_id,
          '<p><a href="https://WWW.Site' || CAST(t1 % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(t1 AS VARCHAR) ||
          '?utm_source=feed">about page ' || CAST(t1 AS VARCHAR) || '</a> ' ||
          '<a href="https://www.site' || CAST(t2 % 7 AS VARCHAR) ||
          '.com/d/' || CAST(t2 AS VARCHAR) || '">see &amp; visit ' ||
          CAST(t2 AS VARCHAR) || '</a>' ||
          CASE WHEN doc_id % 10 = 0
               THEN '<a href="https://www.site1.com/d/1">the hub</a>'
               ELSE '' END ||
          '</p>' AS h
        FROM pages),
      lk AS (SELECT doc_id AS src, pos, anchor, href AS url
             FROM (${graft.operators.Html.duckLinkTextItems("h")}) z),
      ${graft.operators.Web.duckCanonicalCtes("lk", Seq("src", "pos", "anchor"), "lc")},
      pu AS (SELECT doc_id AS dst, url FROM pages),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("dst"), "pc")},
      j AS (SELECT p.dst, l.src, l.pos, l.anchor
            FROM lcc l JOIN pcc p USING (canonical))
      SELECT dst AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_links,
             CAST(COUNT(DISTINCT src) AS BIGINT) AS n_pages,
             array_to_string(list_transform(
               list(struct_pack(src := src, pos := pos, anchor := anchor)
                    ORDER BY src, pos)[1:20],
               e -> e.anchor), ' | ') AS anchors
      FROM j GROUP BY dst ORDER BY doc_id"""), headline = true),

    // ------------------------------------------------ sitemap seeding
    // The crawl-SEEDING source beside link discovery
    // (Web.extractSitemapUrls — the sitemaps.org protocol, pinned
    // subset): one row per <url> entry with its <loc> (entity decode
    // load-bearing — the protocol REQUIRES & spelled &amp; in URLs)
    // and optional <lastmod> ('' when absent). The fixture's first
    // entry spells its url MESSY (host case, :443, a tracking param
    // behind the escaped &) so canonicalization is observable; docs
    // with doc_id % 13 = 0 carry a third cross-host entry. Extraction
    // + canonicalization are per-row codegen; the oracle replays both
    // generators verbatim.
    Q("x_web_sitemap", (s, d) => {
      val xml = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("__xml", expr(
          """concat('<?xml version="1.0" encoding="UTF-8"?>',
            |'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
            |'<url><loc>https://WWW.Site', CAST(doc_id % 7 AS STRING),
            |'.COM:443/d/', CAST(doc_id AS STRING), '?id=',
            |CAST(doc_id AS STRING), '&amp;utm_source=sitemap</loc>',
            |'<lastmod>2026-0', CAST(1 + doc_id % 9 AS STRING),
            |'-01</lastmod></url>',
            |'<url><loc>https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/about</loc></url>',
            |IF(doc_id % 13 = 0,
            |   concat('<url><loc>https://www.extra.org/e/',
            |          CAST(doc_id AS STRING), '</loc></url>'), ''),
            |'</urlset>')""".stripMargin))
      val ex = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapUrls(xml, "doc_id", "__xml"),
        "loc", "__c")
      ex.select(col("doc_id"), col("pos"), col("__c").as("url"),
        col("lastmod"))
        .orderBy(col("doc_id"), col("pos"))
    }, Some(s"""
      WITH __sitemap_src AS (
        SELECT doc_id,
          '<?xml version="1.0" encoding="UTF-8"?>' ||
          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
          '<url><loc>https://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(doc_id AS VARCHAR) || '?id=' ||
          CAST(doc_id AS VARCHAR) || '&amp;utm_source=sitemap</loc>' ||
          '<lastmod>2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
          '-01</lastmod></url>' ||
          '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.com/about</loc></url>' ||
          CASE WHEN doc_id % 13 = 0
               THEN '<url><loc>https://www.extra.org/e/' ||
                    CAST(doc_id AS VARCHAR) || '</loc></url>'
               ELSE '' END ||
          '</urlset>' AS x
        FROM documents),
      sm AS (SELECT doc_id, pos, loc AS url, lastmod
             FROM (${graft.operators.Web.duckSitemapItems("x")}) z),
      ${graft.operators.Web.duckCanonicalCtes("sm",
        Seq("doc_id", "pos", "lastmod"), "sc")}
      SELECT doc_id, pos, canonical AS url, lastmod
      FROM scc ORDER BY doc_id, pos""")),

    // ------------------------------------------ gzip'd sitemap seeding
    // The sitemaps.org protocol explicitly serves `sitemap.xml.gz`;
    // the decode layer's native expressions make the compressed
    // seeding path one projection: fetched BYTES → gunzip →
    // charset_decode → extractSitemapUrls → canonicalize. The fixture
    // compresses the exact x_web_sitemap xml engine-side
    // (gzip_bytes ∘ charset_encode — the "server" side), so the claim
    // is the round trip composed with extraction ≡ plain-xml
    // extraction — the oracle IS x_web_sitemap's, bit for bit. A
    // corrupt-gz row (doc_id % 31 = 0 gets its gz bytes truncated)
    // yields NULL xml and contributes NOTHING (the undecodable
    // sentinel filters, never a crash) — those docs are absent from
    // the oracle too.
    Q("x_web_sitemap_gz", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val xml = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("__xml", expr(
          """concat('<?xml version="1.0" encoding="UTF-8"?>',
            |'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
            |'<url><loc>https://WWW.Site', CAST(doc_id % 7 AS STRING),
            |'.COM:443/d/', CAST(doc_id AS STRING), '?id=',
            |CAST(doc_id AS STRING), '&amp;utm_source=sitemap</loc>',
            |'<lastmod>2026-0', CAST(1 + doc_id % 9 AS STRING),
            |'-01</lastmod></url>',
            |'<url><loc>https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/about</loc></url>',
            |IF(doc_id % 13 = 0,
            |   concat('<url><loc>https://www.extra.org/e/',
            |          CAST(doc_id AS STRING), '</loc></url>'), ''),
            |'</urlset>')""".stripMargin))
        .withColumn("__gz", expr(
          """CASE WHEN doc_id % 31 = 0
            |  THEN substring(gzip_bytes(charset_encode(__xml, 'utf-8')), 1, 10)
            |  ELSE gzip_bytes(charset_encode(__xml, 'utf-8')) END""".stripMargin))
        // charset_decode is null-intolerant: a corrupt member's NULL
        // gunzip propagates to NULL xml without a second gunzip call.
        .withColumn("__dec", expr("charset_decode(gunzip(__gz), 'utf-8')"))
      val ex = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapUrls(xml, "doc_id", "__dec"),
        "loc", "__c")
      ex.select(col("doc_id"), col("pos"), col("__c").as("url"),
        col("lastmod"))
        .orderBy(col("doc_id"), col("pos"))
    }, Some(s"""
      WITH __sitemap_src AS (
        SELECT doc_id,
          '<?xml version="1.0" encoding="UTF-8"?>' ||
          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
          '<url><loc>https://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(doc_id AS VARCHAR) || '?id=' ||
          CAST(doc_id AS VARCHAR) || '&amp;utm_source=sitemap</loc>' ||
          '<lastmod>2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
          '-01</lastmod></url>' ||
          '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.com/about</loc></url>' ||
          CASE WHEN doc_id % 13 = 0
               THEN '<url><loc>https://www.extra.org/e/' ||
                    CAST(doc_id AS VARCHAR) || '</loc></url>'
               ELSE '' END ||
          '</urlset>' AS x
        FROM documents WHERE doc_id % 31 != 0),
      sm AS (SELECT doc_id, pos, loc AS url, lastmod
             FROM (${graft.operators.Web.duckSitemapItems("x")}) z),
      ${graft.operators.Web.duckCanonicalCtes("sm",
        Seq("doc_id", "pos", "lastmod"), "sc")}
      SELECT doc_id, pos, canonical AS url, lastmod
      FROM scc ORDER BY doc_id, pos""")),

    // ------------------------------------------ recrawl scheduling
    // What sitemap lastmod exists FOR (sitemaps.org: "crawlers can use
    // lastmod to avoid recrawling unchanged documents"): the refetch
    // pick joins extracted sitemap entries against the crawl's fetch
    // log on the CANONICAL url and keeps entries that are NEW (never
    // fetched — left join miss) or STALE (lastmod after the recorded
    // fetch date; ISO dates compare lexically, identically in both
    // engines). Every doc's /d/<id> page advertises lastmod month
    // 1 + id % 9; the fetch log covers doc_id % 2 = 0 pages fetched in
    // month 1 + id % 3 (day 15) — so staleness flips with the month
    // arithmetic, never fetched /about pages emit as 'new', and
    // fresh-enough pages drop. One projection + ONE left join on
    // canonical strings; no window, no shuffle of page bodies.
    Q("x_recrawl_schedule", (s, d) => {
      val xml = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("__xml", expr(
          """concat('<urlset>',
            |'<url><loc>https://WWW.Site', CAST(doc_id % 7 AS STRING),
            |'.COM:443/d/', CAST(doc_id AS STRING), '</loc>',
            |'<lastmod>2026-0', CAST(1 + doc_id % 9 AS STRING),
            |'-01</lastmod></url>',
            |'<url><loc>https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/about/', CAST(doc_id AS STRING), '</loc>',
            |'<lastmod>2026-01-01</lastmod></url>',
            |'</urlset>')""".stripMargin))
      val entries = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapUrls(xml, "doc_id", "__xml"),
        "loc", "__c")
        .select(col("__c").as("url"), col("lastmod"))
      val fetchLog = documents(s, d).filter(expr("doc_id % 2 = 0"))
        .select(
          expr("""concat('https://www.site', CAST(doc_id % 7 AS STRING),
                 |'.com/d/', CAST(doc_id AS STRING))""".stripMargin).as("url"),
          expr("concat('2026-0', CAST(1 + doc_id % 3 AS STRING), '-15')")
            .as("fetched"))
      entries.join(fetchLog, Seq("url"), "left")
        .filter(col("fetched").isNull || col("lastmod") > col("fetched"))
        .select(col("url"), col("lastmod"),
          coalesce(col("fetched"), lit("")).as("fetched"),
          expr("IF(fetched IS NULL, 'new', 'stale')").as("reason"))
        .orderBy(col("url"), col("lastmod"))
    }, Some(s"""
      WITH xmls AS (
        SELECT doc_id,
          '<urlset>' ||
          '<url><loc>https://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(doc_id AS VARCHAR) || '</loc>' ||
          '<lastmod>2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
          '-01</lastmod></url>' ||
          '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.com/about/' || CAST(doc_id AS VARCHAR) || '</loc>' ||
          '<lastmod>2026-01-01</lastmod></url>' ||
          '</urlset>' AS x
        FROM documents),
      sm AS (SELECT doc_id, pos, loc AS url, lastmod
             FROM (${graft.operators.Web.duckSitemapItems("x")
                      .replace("__sitemap_src", "xmls")}) z),
      ${graft.operators.Web.duckCanonicalCtes("sm",
        Seq("doc_id", "pos", "lastmod"), "rc")},
      entries AS (SELECT canonical AS url, lastmod FROM rcc),
      flog AS (
        SELECT 'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
               '.com/d/' || CAST(doc_id AS VARCHAR) AS url,
               '2026-0' || CAST(1 + doc_id % 3 AS VARCHAR) || '-15' AS fetched
        FROM documents WHERE doc_id % 2 = 0)
      SELECT e.url, e.lastmod, COALESCE(f.fetched, '') AS fetched,
             CASE WHEN f.fetched IS NULL THEN 'new' ELSE 'stale' END AS reason
      FROM entries e LEFT JOIN flog f ON e.url = f.url
      WHERE f.fetched IS NULL OR e.lastmod > f.fetched
      ORDER BY e.url, e.lastmod""")),

    // ------------------------------------------ sitemap INDEX recursion
    // The sitemaps.org protocol caps one file at 50k URLs, so every
    // large site publishes a <sitemapindex> of child sitemaps — real
    // seeding hits the INDEX shape first. This composes the full
    // two-level walk: extractSitemapIndex over the per-site index →
    // canonicalize child locs (the index spells them MESSY — host
    // case, :443, a tracking param behind the protocol-required
    // &amp;) → equi-join the child-sitemap store on the CANONICAL url
    // (the fetch step; an unreferenced child — every site carries a
    // third child only when site % 7 = 0 — never joins) →
    // extractSitemapUrls over each child's urlset → canonicalize the
    // page urls. Recursion is by composition, one level per fetch
    // round (the protocol forbids index-of-index nesting — stated).
    // child_id packs (site, k) as site·4+k so the extraction's one
    // id column carries both through (k ≤ 3 — the fixture bound).
    // Everything is per-row codegen + ONE equi-join on canonical
    // strings; xml bodies never shuffle.
    Q("x_web_sitemap_index", (s, d) => {
      val idx = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("__xml", expr(
          """concat('<?xml version="1.0" encoding="UTF-8"?>',
            |'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
            |'<sitemap><loc>https://WWW.Map', CAST(doc_id % 5 AS STRING),
            |'.COM:443/sm/', CAST(doc_id AS STRING),
            |'/m1.xml?v=1&amp;utm_source=idx</loc>',
            |'<lastmod>2026-02-01</lastmod></sitemap>',
            |'<sitemap><loc>https://WWW.Map', CAST(doc_id % 5 AS STRING),
            |'.COM:443/sm/', CAST(doc_id AS STRING),
            |'/m2.xml?v=1&amp;utm_source=idx</loc></sitemap>',
            |IF(doc_id % 7 = 0, concat(
            |  '<sitemap><loc>https://WWW.Map', CAST(doc_id % 5 AS STRING),
            |  '.COM:443/sm/', CAST(doc_id AS STRING),
            |  '/m3.xml?v=1&amp;utm_source=idx</loc></sitemap>'), ''),
            |'</sitemapindex>')""".stripMargin))
      val store = fanOut(documents(s, d).select(col("doc_id")))
        .withColumn("k", explode(expr("array(1, 2, 3)")))
        .withColumn("child_id", expr("doc_id * 4 + k"))
        .withColumn("url", expr(
          """concat('https://www.map', CAST(doc_id % 5 AS STRING),
            |'.com/sm/', CAST(doc_id AS STRING), '/m', CAST(k AS STRING),
            |'.xml?v=1')""".stripMargin))
        .withColumn("__cxml", expr(
          """concat('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
            |'<url><loc>https://www.site', CAST(doc_id % 7 AS STRING),
            |'.co.uk/p/', CAST(doc_id * 8 + k * 2 AS STRING),
            |'?a=1&amp;b=2</loc>',
            |'<lastmod>2026-03-0', CAST(1 + k AS STRING), '</lastmod></url>',
            |'<url><loc>https://www.site', CAST(doc_id % 7 AS STRING),
            |'.co.uk/p/', CAST(doc_id * 8 + k * 2 + 1 AS STRING),
            |'</loc></url>',
            |'</urlset>')""".stripMargin))
      val locs = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapIndex(idx, "doc_id", "__xml"),
        "loc", "__c").select(col("__c"))
      val storec = graft.operators.Web.withCanonicalUrl(
        store.select(col("child_id"), col("url"), col("__cxml")),
        "url", "__c")
      val fetched = storec.join(locs, Seq("__c"))
        .select(col("child_id"), col("__cxml"))
      val urls = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapUrls(fetched, "child_id", "__cxml"),
        "loc", "__u")
      urls.select(expr("doc_id div 4").as("site"),
        expr("doc_id % 4").as("child"),
        col("pos").as("upos"), col("__u").as("url"), col("lastmod"))
        .orderBy(col("site"), col("child"), col("upos"))
    }, Some(s"""
      WITH idx AS (
        SELECT doc_id,
          '<?xml version="1.0" encoding="UTF-8"?>' ||
          '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
          '<sitemap><loc>https://WWW.Map' || CAST(doc_id % 5 AS VARCHAR) ||
          '.COM:443/sm/' || CAST(doc_id AS VARCHAR) ||
          '/m1.xml?v=1&amp;utm_source=idx</loc>' ||
          '<lastmod>2026-02-01</lastmod></sitemap>' ||
          '<sitemap><loc>https://WWW.Map' || CAST(doc_id % 5 AS VARCHAR) ||
          '.COM:443/sm/' || CAST(doc_id AS VARCHAR) ||
          '/m2.xml?v=1&amp;utm_source=idx</loc></sitemap>' ||
          CASE WHEN doc_id % 7 = 0 THEN
            '<sitemap><loc>https://WWW.Map' || CAST(doc_id % 5 AS VARCHAR) ||
            '.COM:443/sm/' || CAST(doc_id AS VARCHAR) ||
            '/m3.xml?v=1&amp;utm_source=idx</loc></sitemap>'
          ELSE '' END ||
          '</sitemapindex>' AS x
        FROM documents),
      ie AS (SELECT doc_id AS site, pos, loc AS url
             FROM (${graft.operators.Web.duckSitemapIndexItems("x", "idx")}) z),
      ${graft.operators.Web.duckCanonicalCtes("ie", Seq("site", "pos"), "ic")},
      store AS (
        SELECT doc_id, k, doc_id * 4 + k AS child_id,
          'https://www.map' || CAST(doc_id % 5 AS VARCHAR) ||
          '.com/sm/' || CAST(doc_id AS VARCHAR) || '/m' || CAST(k AS VARCHAR) ||
          '.xml?v=1' AS url,
          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
          '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.co.uk/p/' || CAST(doc_id * 8 + k * 2 AS VARCHAR) ||
          '?a=1&amp;b=2</loc>' ||
          '<lastmod>2026-03-0' || CAST(1 + k AS VARCHAR) || '</lastmod></url>' ||
          '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.co.uk/p/' || CAST(doc_id * 8 + k * 2 + 1 AS VARCHAR) ||
          '</loc></url>' ||
          '</urlset>' AS cxml
        FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
      ${graft.operators.Web.duckCanonicalCtes("store",
        Seq("child_id", "cxml"), "sc")},
      __sitemap_src AS (
        SELECT s9.child_id AS doc_id, s9.cxml AS x
        FROM scc s9 JOIN icc i9 ON s9.canonical = i9.canonical),
      ue AS (SELECT doc_id AS child_id, pos, loc AS url, lastmod
             FROM (${graft.operators.Web.duckSitemapItems("x")}) z),
      ${graft.operators.Web.duckCanonicalCtes("ue",
        Seq("child_id", "pos", "lastmod"), "uc")}
      SELECT child_id // 4 AS site, child_id % 4 AS child, pos AS upos,
             canonical AS url, lastmod
      FROM ucc ORDER BY site, child, upos""")),

    // ------------------------------------------- robots.txt BODY parsing
    // RFC 9309 §2 group resolution (Web.parseRobots) — the step that
    // turns raw fetched robots.txt bodies into the (host, pattern,
    // allow) relation the RFC gate consumes. The fixture exercises
    // every pinned rule: comment lines and INLINE comments strip; CRLF
    // and LF line endings mix; field names vary case and carry spaces
    // before the colon ('Disallow : /x'); sitemap:/crawl-delay: lines
    // are ignored WITHOUT breaking their group; a rule before any
    // user-agent line drops; two consecutive user-agent lines share
    // one group; agent selection is exact-token case-insensitive
    // ('GraftBot' finds 'graftbot' groups) and MERGES multiple exact
    // groups (doc_id % 3 = 0 adds a second graftbot group later in the
    // file); exact groups EXCLUDE the '*' group's rules; docs with NO
    // exact group (doc_id % 5 = 4) fall back to '*' — whose empty
    // 'Disallow:' surfaces faithfully as pattern '' (the consumer
    // drops it, the parser doesn't editorialize). Pure per-row
    // projection + posexplode; the oracle replays the identical chain.
    Q("x_web_robots_parse", (s, d) => {
      val bodies = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("host", expr(
          "concat('h', CAST(doc_id AS STRING), '.example.com')"))
        .withColumn("__body", expr(
          """concat(
            |  '# robots fixture', chr(13), chr(10),
            |  'Sitemap: https://example.com/sitemap.xml', chr(10),
            |  'Disallow: /orphan', chr(10),
            |  IF(doc_id % 5 != 4, concat(
            |    'User-Agent: GraftBot', chr(13), chr(10),
            |    'user-agent: otherbot', chr(10),
            |    'Disallow : /private/', CAST(doc_id AS STRING), chr(10),
            |    'Allow: /private/', CAST(doc_id % 10 AS STRING),
            |    '0   # inline', chr(10)), ''),
            |  chr(10),
            |  'User-agent: *', chr(10),
            |  'Disallow: /tmp', chr(10),
            |  'Disallow:', chr(10),
            |  'crawl-delay: 10', chr(10),
            |  IF(doc_id % 3 = 0 AND doc_id % 5 != 4, concat(
            |    'User-agent: graftbot', chr(10), 'Allow: /extra'), ''))""".stripMargin))
      graft.operators.Web.parseRobots(bodies, "host", "__body", "GraftBot")
        .orderBy(col("host"), col("pos"))
    }, Some(s"""
      WITH bodies AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
          '# robots fixture' || chr(13) || chr(10) ||
          'Sitemap: https://example.com/sitemap.xml' || chr(10) ||
          'Disallow: /orphan' || chr(10) ||
          CASE WHEN doc_id % 5 != 4 THEN
            'User-Agent: GraftBot' || chr(13) || chr(10) ||
            'user-agent: otherbot' || chr(10) ||
            'Disallow : /private/' || CAST(doc_id AS VARCHAR) || chr(10) ||
            'Allow: /private/' || CAST(doc_id % 10 AS VARCHAR) ||
            '0   # inline' || chr(10) ELSE '' END ||
          chr(10) ||
          'User-agent: *' || chr(10) ||
          'Disallow: /tmp' || chr(10) ||
          'Disallow:' || chr(10) ||
          'crawl-delay: 10' || chr(10) ||
          CASE WHEN doc_id % 3 = 0 AND doc_id % 5 != 4 THEN
            'User-agent: graftbot' || chr(10) || 'Allow: /extra'
          ELSE '' END AS body
        FROM documents),
      ${graft.operators.Web.duckRobotsParseCtes("bodies", "rb", "GraftBot")}
      SELECT host, pos, pattern, allow FROM rbr ORDER BY host, pos"""),
      headline = true),

    // --------------------------------------- robots Sitemap: directives
    // The third crawl-seeding source (RFC 9309 §2.3: `Sitemap:` lines
    // are GROUP-INDEPENDENT — they extract regardless of user-agent
    // groups): robots body → Web.extractRobotsSitemaps → canonicalize
    // the advertised loc (bodies spell it MESSY: host case, :443, a
    // utm_ param) → equi-join the fetched-sitemap store on the
    // CANONICAL url → extractSitemapUrls over each fetched child →
    // canonicalize the page urls. The fixture exercises the pinned
    // line rules: a lowercase space-before-colon 'sitemap :' line with
    // an inline comment (doc_id % 4 = 0 — its /extra.xml child is NOT
    // in the store, so it surfaces via the LEFT join as an unfetched
    // row with upos 0, never silently dropped); an empty-value
    // 'Sitemap:' line (doc_id % 5 = 0) drops at extraction (no URL to
    // fetch); group lines around the directives don't perturb it.
    // site recovers from the host string (h<id>.example.com). One
    // extraction + one LEFT equi-join on canonical strings + one
    // child extraction; xml bodies never shuffle.
    Q("x_robots_sitemaps", (s, d) => {
      val bodies = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("host", expr(
          "concat('h', CAST(doc_id AS STRING), '.example.com')"))
        .withColumn("__body", expr(
          """concat(
            |  '# seeding fixture', chr(13), chr(10),
            |  'User-agent: *', chr(10),
            |  'Disallow: /tmp', chr(10),
            |  'Sitemap: https://H', CAST(doc_id AS STRING),
            |  '.Example.COM:443/sm/', CAST(doc_id AS STRING),
            |  '.xml?utm_source=robots&v=1', chr(13), chr(10),
            |  IF(doc_id % 4 = 0, concat('sitemap : https://h',
            |    CAST(doc_id AS STRING),
            |    '.example.com/extra.xml   # tail', chr(10)), ''),
            |  IF(doc_id % 5 = 0, concat('Sitemap:', chr(10)), ''),
            |  'User-agent: GraftBot', chr(10),
            |  'Disallow: /private')""".stripMargin))
      val locs = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractRobotsSitemaps(bodies, "host", "__body"),
        "loc", "__c")
        .select(
          expr("CAST(split_part(substring(host, 2), '.', 1) AS BIGINT)")
            .as("site"),
          col("pos"), col("__c").as("sm_url"))
      val store = graft.operators.Web.withCanonicalUrl(
        documents(s, d).select(col("doc_id"))
          .withColumn("__u", expr(
            """concat('https://h', CAST(doc_id AS STRING),
              |'.example.com/sm/', CAST(doc_id AS STRING),
              |'.xml?v=1')""".stripMargin))
          .withColumn("__xml", expr(
            """concat('<urlset>',
              |'<url><loc>https://h', CAST(doc_id AS STRING),
              |'.example.com/p/', CAST(doc_id * 2 AS STRING), '</loc>',
              |'<lastmod>2026-02-0', CAST(1 + doc_id % 9 AS STRING),
              |'</lastmod></url>',
              |'<url><loc>https://h', CAST(doc_id AS STRING),
              |'.example.com/p/', CAST(doc_id * 2 + 1 AS STRING),
              |'</loc></url>',
              |'</urlset>')""".stripMargin)),
        "__u", "__su")
        .select(col("__su").as("sm_url"), col("__xml"))
      // STAGED: the fetched and unfetched output branches BOTH read
      // the joined relation — unstaged, the whole robots-extraction +
      // canonicalization + store chain would execute once per branch
      // (measured ~2× wall).
      val joined = stage(locs.join(store, Seq("sm_url"), "left"))
      // extractSitemapUrls re-keys on the packed __sid (site·4 + the
      // robots-line pos, pos ≤ 2) — its output's own `pos` is the
      // within-child entry position (upos).
      val fetchedOut = graft.operators.Web.withCanonicalUrl(
        graft.operators.Web.extractSitemapUrls(
          joined.filter(col("__xml").isNotNull)
            .withColumn("__sid", expr("site * 4 + pos")),
          "__sid", "__xml"),
        "loc", "__pc")
        .select(expr("doc_id div 4").as("site"),
          expr("doc_id % 4").as("spos"),
          col("pos").as("upos"), col("__pc").as("url"), col("lastmod"))
      val unfetched = joined.filter(col("__xml").isNull)
        .select(col("site"), col("pos").as("spos"),
          lit(0L).as("upos"), col("sm_url").as("url"), lit("").as("lastmod"))
      fetchedOut.unionAll(unfetched)
        .orderBy(col("site"), col("spos"), col("upos"), col("url"))
    }, Some(s"""
      WITH bodies AS (
        SELECT doc_id, 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
          '# seeding fixture' || chr(13) || chr(10) ||
          'User-agent: *' || chr(10) ||
          'Disallow: /tmp' || chr(10) ||
          'Sitemap: https://H' || CAST(doc_id AS VARCHAR) ||
          '.Example.COM:443/sm/' || CAST(doc_id AS VARCHAR) ||
          '.xml?utm_source=robots&v=1' || chr(13) || chr(10) ||
          CASE WHEN doc_id % 4 = 0 THEN 'sitemap : https://h' ||
            CAST(doc_id AS VARCHAR) ||
            '.example.com/extra.xml   # tail' || chr(10) ELSE '' END ||
          CASE WHEN doc_id % 5 = 0 THEN 'Sitemap:' || chr(10) ELSE '' END ||
          'User-agent: GraftBot' || chr(10) ||
          'Disallow: /private' AS body
        FROM documents),
      ${graft.operators.Web.duckRobotsSitemapsCtes("bodies", "rs")},
      le AS (SELECT CAST(split_part(substring(host, 2), '.', 1) AS BIGINT)
                      AS site,
                    pos, loc AS url
             FROM rsr),
      ${graft.operators.Web.duckCanonicalCtes("le", Seq("site", "pos"), "lc")},
      locs AS (SELECT site, pos, canonical AS sm_url FROM lcc),
      st AS (SELECT doc_id,
          'https://h' || CAST(doc_id AS VARCHAR) || '.example.com/sm/' ||
          CAST(doc_id AS VARCHAR) || '.xml?v=1' AS url,
          '<urlset>' ||
          '<url><loc>https://h' || CAST(doc_id AS VARCHAR) ||
          '.example.com/p/' || CAST(doc_id * 2 AS VARCHAR) || '</loc>' ||
          '<lastmod>2026-02-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
          '</lastmod></url>' ||
          '<url><loc>https://h' || CAST(doc_id AS VARCHAR) ||
          '.example.com/p/' || CAST(doc_id * 2 + 1 AS VARCHAR) ||
          '</loc></url>' ||
          '</urlset>' AS xml
        FROM documents),
      ${graft.operators.Web.duckCanonicalCtes("st", Seq("doc_id", "xml"), "sc")},
      store AS (SELECT canonical AS sm_url, xml FROM scc),
      joined AS (SELECT l.site, l.pos AS spos, l.sm_url, s.xml
                 FROM locs l LEFT JOIN store s ON l.sm_url = s.sm_url),
      fsrc AS (SELECT site * 4 + spos AS doc_id, xml AS x
               FROM joined WHERE xml IS NOT NULL),
      ue AS (SELECT doc_id AS sid, pos AS upos, loc AS url, lastmod
             FROM (${graft.operators.Web.duckSitemapItems("x")
                      .replace("__sitemap_src", "fsrc")}) z),
      ${graft.operators.Web.duckCanonicalCtes("ue",
        Seq("sid", "upos", "lastmod"), "uc")}
      SELECT sid // 4 AS site, sid % 4 AS spos, upos,
             canonical AS url, lastmod
      FROM ucc
      UNION ALL
      SELECT site, spos, CAST(0 AS BIGINT) AS upos, sm_url AS url,
             '' AS lastmod
      FROM joined WHERE xml IS NULL
      ORDER BY site, spos, upos, url"""), headline = true),

    // --------------------------------------- crawl-delay politeness
    // Crawl-delay extraction (Web.parseCrawlDelay — group-scoped like
    // allow/disallow, the Bing/Yandex de-facto convention) composed
    // into per-host fetch scheduling (Web.scheduleFetches): each
    // host's urls get dispatch slots rank·delay so the fetcher never
    // exceeds one request per delay_s per host. The fixture exercises
    // the pinned rules: an exact GraftBot group's delay (1 + id % 5)
    // OVERRIDES the '*' group's (doc_id % 3 = 0 hosts carry both);
    // unparseable values ('fast', '10.5') are ignored LINES — the '*'
    // group still yields its later integer 2 (doc_id % 3 = 1); hosts
    // with no crawl-delay anywhere (doc_id % 3 = 2) take the caller
    // default 3. Batch urls spell hosts messy (case, :443, utm_) and
    // carry a duplicate spelling that collapses at canonicalization.
    Q("x_crawl_politeness", (s, d) => {
      val bodies = fanOut(documents(s, d)).select(col("doc_id"))
        .withColumn("host", expr(
          "concat('h', CAST(doc_id AS STRING), '.example.com')"))
        .withColumn("__body", expr(
          """concat(
            |  IF(doc_id % 3 = 0, concat(
            |    'User-agent: GraftBot', chr(13), chr(10),
            |    'Crawl-delay: ', CAST(1 + doc_id % 5 AS STRING), chr(10),
            |    'Disallow: /x', chr(10), chr(10)), ''),
            |  'User-agent: *', chr(10),
            |  'Crawl-delay: fast   # unparseable', chr(10),
            |  'crawl-delay : 10.5', chr(10),
            |  IF(doc_id % 3 != 2, concat('Crawl-delay: 2', chr(10)), ''),
            |  'Disallow: /tmp')""".stripMargin))
      val delays = graft.operators.Web.parseCrawlDelay(
        bodies, "host", "__body", "GraftBot")
      val batch = fanOut(documents(s, d)).select(col("doc_id"))
        .select(col("doc_id"), explode(expr("array(0, 1, 2, 0)")).as("__j"))
        .withColumn("url", expr(
          """concat('https://H', CAST(doc_id AS STRING),
            |'.Example.COM:443/p/', CAST(__j AS STRING),
            |'?utm_source=x')""".stripMargin))
      graft.operators.Web.scheduleFetches(batch, "url", delays, 3L)
        .orderBy(col("host"), col("url"))
    }, Some(s"""
      WITH bodies AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
          CASE WHEN doc_id % 3 = 0 THEN
            'User-agent: GraftBot' || chr(13) || chr(10) ||
            'Crawl-delay: ' || CAST(1 + doc_id % 5 AS VARCHAR) || chr(10) ||
            'Disallow: /x' || chr(10) || chr(10) ELSE '' END ||
          'User-agent: *' || chr(10) ||
          'Crawl-delay: fast   # unparseable' || chr(10) ||
          'crawl-delay : 10.5' || chr(10) ||
          CASE WHEN doc_id % 3 != 2 THEN 'Crawl-delay: 2' || chr(10)
               ELSE '' END ||
          'Disallow: /tmp' AS body
        FROM documents),
      ${graft.operators.Web.duckCrawlDelayCtes("bodies", "cd", "GraftBot")},
      batch AS (SELECT doc_id, unnest([0, 1, 2, 0]) AS j FROM documents),
      bu AS (SELECT doc_id,
          'https://H' || CAST(doc_id AS VARCHAR) || '.Example.COM:443/p/' ||
          CAST(j AS VARCHAR) || '?utm_source=x' AS url
        FROM batch),
      ${graft.operators.Web.duckCanonicalCtes("bu", Seq(), "bc")},
      cu AS (SELECT DISTINCT host, canonical AS url FROM bcc),
      dl AS (SELECT cu.host, cu.url, COALESCE(cdd.delay_s, 3) AS delay_s
             FROM cu LEFT JOIN cdd ON cu.host = cdd.host)
      SELECT host, url, delay_s,
             (ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) - 1)
               * delay_s AS slot_s
      FROM dl ORDER BY host, url"""), headline = true),

    // --------------------------------------- crawl-trap detection
    // Per-host URL-space explosion (Web.trapScores): distinct
    // canonical urls per distinct content digest, ×100 exact. Three
    // host classes by site % 7: (0) a TRUE trap — every doc publishes
    // 4 urls with k IN THE PATH, spellings canonicalization cannot
    // and should not collapse → ratio 400; (1) a FALSE trap — the 4
    // spellings differ only by a utm_ tracking param, which
    // withCanonicalUrl collapses BEFORE counting → ratio 100 (the
    // division of labor the operator states); (else) healthy 1:1 →
    // 100. Two cascaded single-distinct aggregates — no Expand, text
    // leaves the plan at the first projection (digest immediately).
    Q("x_crawl_traps", (s, d) => {
      val pages = fanOut(documents(s, d))
        .withColumn("__s", expr("doc_id % 50"))
        .select(col("doc_id"), col("text"), col("__s"),
          explode(expr(
            "sequence(0, IF(__s % 7 IN (0, 1), 3, 0))")).as("__k"))
        .withColumn("url", expr(
          """CASE WHEN __s % 7 = 0 THEN
            |  concat('https://WWW.Site', CAST(__s AS STRING),
            |         '.COM:443/d/', CAST(doc_id AS STRING), '/',
            |         CAST(__k AS STRING))
            |WHEN __s % 7 = 1 THEN
            |  concat('https://www.site', CAST(__s AS STRING),
            |         '.com/d/', CAST(doc_id AS STRING),
            |         '?utm_source=', CAST(__k AS STRING))
            |ELSE
            |  concat('https://www.site', CAST(__s AS STRING),
            |         '.com/d/', CAST(doc_id AS STRING))
            |END""".stripMargin))
      graft.operators.Web.trapScores(pages, "url", "text")
        .orderBy(col("host"))
    }, Some(s"""
      WITH p0 AS (
        SELECT doc_id, text, doc_id % 50 AS s,
               unnest(CASE WHEN (doc_id % 50) % 7 IN (0, 1)
                           THEN [0, 1, 2, 3] ELSE [0] END) AS k
        FROM documents),
      pu AS (SELECT md5(text) AS dg,
               CASE WHEN s % 7 = 0 THEN
                 'https://WWW.Site' || CAST(s AS VARCHAR) ||
                 '.COM:443/d/' || CAST(doc_id AS VARCHAR) || '/' ||
                 CAST(k AS VARCHAR)
               WHEN s % 7 = 1 THEN
                 'https://www.site' || CAST(s AS VARCHAR) ||
                 '.com/d/' || CAST(doc_id AS VARCHAR) ||
                 '?utm_source=' || CAST(k AS VARCHAR)
               ELSE
                 'https://www.site' || CAST(s AS VARCHAR) ||
                 '.com/d/' || CAST(doc_id AS VARCHAR)
               END AS url
             FROM p0),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("dg"), "tc")},
      g1 AS (SELECT host, dg, COUNT(DISTINCT canonical) AS nu
             FROM tcc GROUP BY host, dg)
      SELECT host, CAST(SUM(nu) AS BIGINT) AS n_urls,
             CAST(COUNT(*) AS BIGINT) AS n_content,
             (CAST(SUM(nu) AS BIGINT) * 100) // CAST(COUNT(*) AS BIGINT)
               AS urls_per_content_x100
      FROM g1 GROUP BY host ORDER BY host""")),

    // ---------------------- incremental trap accounting (gate twin)
    // graft.streaming.TrapIngest's batch-expressible core: the corpus
    // (doc_id % 7 ≠ 0) stages the distinct (host, content-digest,
    // url-digest) triple set; the batch (doc_id % 7 = 0) is flagged
    // against the PRE-batch per-host scores (trapped at threshold
    // 300); the post-fold score ≡ a full recompute over corpus ∪
    // batch — the SET-union fold's guarantee (idempotent, unlike the
    // count-folding gates: re-fetching unchanged content must not
    // inflate a trap score). Host classes by (doc_id % 10) % 3 as in
    // x_crawl_traps: true trap (k in the path, ratio 400), false trap
    // (utm spellings collapse at canonicalization, 100), healthy
    // (100). The oracle states the CANONICAL urls directly from the
    // id — an independent expectation, not a replay.
    Q("x_trap_incremental", (s, d) => {
      import graft.streaming.TrapIngest
      val pages = fanOut(documents(s, d))
        .withColumn("__s", expr("doc_id % 10"))
        .select(col("doc_id"), col("text"), col("__s"),
          explode(expr(
            "sequence(0, IF(__s % 3 IN (0, 1), 3, 0))")).as("__k"))
        .withColumn("url", expr(
          """CASE WHEN __s % 3 = 0 THEN
            |  concat('https://WWW.Site', CAST(__s AS STRING),
            |         '.COM:443/d/', CAST(doc_id AS STRING), '/',
            |         CAST(__k AS STRING))
            |WHEN __s % 3 = 1 THEN
            |  concat('https://www.site', CAST(__s AS STRING),
            |         '.com/d/', CAST(doc_id AS STRING),
            |         '?utm_source=', CAST(__k AS STRING))
            |ELSE
            |  concat('https://www.site', CAST(__s AS STRING),
            |         '.com/d/', CAST(doc_id AS STRING))
            |END""".stripMargin))
      val pr = stage(TrapIngest.pairs(pages, "doc_id", "url", "text"))
      val pre = TrapIngest.scoresOf(pr.filter(col("id") % 7 =!= 0)
          .select(col("host"), col("dg"), col("uh")).distinct())
        .select(col("host"), col("urls_per_content_x100").as("__pre"))
      val post = TrapIngest.scoresOf(
          pr.select(col("host"), col("dg"), col("uh")).distinct())
        .select(col("host"), col("urls_per_content_x100").as("post_x100"))
      pr.filter(col("id") % 7 === 0)
        .select(col("id").as("doc_id"), col("host")).distinct()
        .join(broadcast(pre), Seq("host"), "left")
        .join(broadcast(post), Seq("host"))
        .select(col("doc_id"), col("host"),
          coalesce(col("__pre"), lit(100L)).as("prior_x100"),
          (coalesce(col("__pre"), lit(100L)) >= 300L).as("trapped"),
          col("post_x100"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH p0 AS (
        SELECT doc_id, text, doc_id % 10 AS s,
               unnest(CASE WHEN (doc_id % 10) % 3 IN (0, 1)
                           THEN [0, 1, 2, 3] ELSE [0] END) AS k
        FROM documents),
      cp AS (SELECT doc_id,
               'www.site' || CAST(s AS VARCHAR) || '.com' AS host,
               md5(text) AS dg,
               md5(CASE WHEN s % 3 = 0 THEN
                     'https://www.site' || CAST(s AS VARCHAR) ||
                     '.com/d/' || CAST(doc_id AS VARCHAR) || '/' ||
                     CAST(k AS VARCHAR)
                   ELSE
                     'https://www.site' || CAST(s AS VARCHAR) ||
                     '.com/d/' || CAST(doc_id AS VARCHAR)
                   END) AS uh
             FROM p0),
      pre1 AS (SELECT host, dg, COUNT(DISTINCT uh) AS nu FROM cp
               WHERE doc_id % 7 <> 0 GROUP BY host, dg),
      pre AS (SELECT host,
                (CAST(SUM(nu) AS BIGINT) * 100) // CAST(COUNT(*) AS BIGINT)
                  AS prior_x100
              FROM pre1 GROUP BY host),
      post1 AS (SELECT host, dg, COUNT(DISTINCT uh) AS nu FROM cp
                GROUP BY host, dg),
      post AS (SELECT host,
                 (CAST(SUM(nu) AS BIGINT) * 100) // CAST(COUNT(*) AS BIGINT)
                   AS post_x100
               FROM post1 GROUP BY host),
      b AS (SELECT DISTINCT doc_id,
                   'www.site' || CAST(doc_id % 10 AS VARCHAR) || '.com'
                     AS host
            FROM documents WHERE doc_id % 7 = 0)
      SELECT b.doc_id, b.host,
             COALESCE(pre.prior_x100, 100) AS prior_x100,
             COALESCE(pre.prior_x100, 100) >= 300 AS trapped,
             post.post_x100
      FROM b
      LEFT JOIN pre ON b.host = pre.host
      JOIN post ON b.host = post.host
      ORDER BY b.doc_id""")),

    // ------------------------------------------- crawl-frontier discovery
    // The batch twin of streaming.FrontierIngest (gate #31): pages with
    // doc_id % 3 ≠ 0 are the already-fetched corpus (their canonical
    // URLs = the seen set); the doc_id % 3 = 0 pages arrive as one
    // batch — outlinks extract (clean-first), resolve (Web.resolveRefSql:
    // absolute, protocol-relative, root-relative, AND path-relative
    // with dot-segment removal — '../d/N' from a /d/M page lands on
    // page N's own URL; mailto/fragment-only drop), canonicalize, and
    // the NOVEL frontier = candidates in neither the seen set nor
    // the batch's own fetched URLs, one row per canonical with
    // discoverer = min referring page and n_refs counting referring
    // PAGES. A loadable robots relation with FULL RFC 9309 matching
    // (Web.filterRobotsAllowedRfc — `*`/`$` wildcards, Allow
    // longest-match precedence, Allow wins ties) gates the candidates
    // BEFORE the novelty probe: every batch page links its host's
    // /private/N path and every site host disallows /private — BUT an
    // Allow '/private/3*' override (longer rule → wins) un-blocks ids
    // starting with '3', which therefore EMIT as discoveries (the
    // override is observable in the output, not just un-blocking);
    // site2.com adds a wildcard-anchored Disallow '/d/*4$' that kills
    // exactly its /d/<t> discoveries with t ending in 4; /about on the
    // same hosts passes, and the other.example.org '/ref' rule kills
    // the one cross-site link (host selectivity). Anti-joins on
    // canonical strings only — page bodies never shuffle.
    Q("x_frontier_incremental", (s, d) => {
      import s.implicits._
      val pages = fanOut(documents(s, d))
        .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
        .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
        .withColumn("url", expr(
          """concat('https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
      val batch = pages.filter(expr("doc_id % 3 = 0"))
        .withColumn("__t3", expr("(doc_id * 11 + 3) % 1024"))
        .withColumn("__html", expr(
          """concat('<p><a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
            |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=feed">a</a> ',
            |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
            |'.com/d/', CAST(__t2 AS STRING), '">b</a> ',
            |'<a href="/about">c</a> ',
            |'<a href="/private/', CAST(doc_id AS STRING), '">z</a> ',
            |'<a href="../d/', CAST(__t3 AS STRING), '">p</a> ',
            |'<a href="sub/./x/../page.html">q</a> ',
            |'<a href="mailto:x@y.example">m</a> ',
            |'<a href="https://other.example.org/ref">d</a></p>')""".stripMargin))
      val robots = ((0 to 6).map(k => (s"www.site$k.com", "/private", false)) ++
        (0 to 6).map(k => (s"www.site$k.com", "/private/3*", true)) ++
        Seq(("other.example.org", "/ref", false),
          ("www.site2.com", "/d/*4$", false)))
        .toDF("host", "pattern", "allow")
      val seen = graft.operators.Web.withCanonicalUrl(
        pages.filter(expr("doc_id % 3 != 0")).select(col("doc_id"), col("url")),
        "url", "__c")
        .select(col("__c").as("curl")).distinct()
      val fetched = graft.streaming.FrontierIngest
        .pageUrls(batch, "doc_id", "url")
        .select(col("curl")).distinct()
      val cand = graft.operators.Web.filterRobotsAllowedRfc(
        graft.streaming.FrontierIngest
          .outlinks(batch, "doc_id", "url", "__html"),
        "curl", robots)
        .groupBy(col("curl"))
        .agg(min(col("ref_id")).as("discoverer"),
          count(lit(1)).cast("long").as("n_refs"))
      cand.join(seen, Seq("curl"), "left_anti")
        .join(fetched, Seq("curl"), "left_anti")
        .select(col("curl").as("url"), col("discoverer"), col("n_refs"))
        .orderBy(col("url"))
    }, Some(s"""
      WITH pages AS MATERIALIZED (
        SELECT doc_id,
          (doc_id * 3 + 1) % 1024 AS t1, (doc_id * 7 + 2) % 1024 AS t2,
          'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.com/d/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      __link_src AS (
        SELECT doc_id,
          '<p><a href="https://WWW.Site' || CAST(t1 % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(t1 AS VARCHAR) || '?utm_source=feed">a</a> ' ||
          '<a href="https://www.site' || CAST(t2 % 7 AS VARCHAR) ||
          '.com/d/' || CAST(t2 AS VARCHAR) || '">b</a> ' ||
          '<a href="/about">c</a> ' ||
          '<a href="/private/' || CAST(doc_id AS VARCHAR) || '">z</a> ' ||
          '<a href="../d/' || CAST((doc_id * 11 + 3) % 1024 AS VARCHAR) ||
          '">p</a> ' ||
          '<a href="sub/./x/../page.html">q</a> ' ||
          '<a href="mailto:x@y.example">m</a> ' ||
          '<a href="https://other.example.org/ref">d</a></p>' AS h
        FROM pages WHERE doc_id % 3 = 0),
      pu AS (SELECT doc_id AS pid, url FROM pages),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("pid"), "pc")},
      seen AS MATERIALIZED (
        SELECT DISTINCT canonical FROM pcc WHERE pid % 3 <> 0),
      fetched AS MATERIALIZED (
        SELECT DISTINCT canonical FROM pcc WHERE pid % 3 = 0),
      lk0 AS (SELECT doc_id, href FROM (${graft.operators.Html.duckLinkItems("h")}) z),
      au AS (SELECT ref_id, aurl AS url FROM (
               SELECT l.doc_id AS ref_id,
                      ${graft.operators.Web.resolveRefSql("l.href",
                        "split_part(p.canonical, '://', 1)", "p.host",
                        "p.path", duck = true)} AS aurl
               FROM lk0 l JOIN pcc p ON p.pid = l.doc_id)
             WHERE aurl IS NOT NULL),
      ${graft.operators.Web.duckCanonicalCtes("au", Seq("ref_id"), "lc")},
      rob AS (SELECT 'www.site' || CAST(k AS VARCHAR) || '.com' AS host,
                     '/private' AS pattern, false AS allow
              FROM range(0, 7) t(k)
              UNION ALL
              SELECT 'www.site' || CAST(k AS VARCHAR) || '.com',
                     '/private/3*', true
              FROM range(0, 7) t(k)
              UNION ALL SELECT 'other.example.org', '/ref', false
              UNION ALL SELECT 'www.site2.com', '/d/*4$$', false),
      allowed AS (
        SELECT canonical, ref_id
        FROM (SELECT DISTINCT canonical, ref_id FROM lcc) l
        WHERE COALESCE((
          SELECT MAX(length(r.pattern) * 2 +
                     CASE WHEN r.allow THEN 1 ELSE 0 END) % 2
          FROM rob r
          WHERE r.host = ${graft.operators.Web.canonicalHostSql("l.canonical")}
            AND regexp_matches(
                  ${graft.operators.Web.canonicalPathSql("l.canonical")},
                  ${graft.operators.Web.robotsRegexSql("r.pattern")})
        ), 1) = 1),
      cand AS (SELECT canonical, CAST(MIN(ref_id) AS BIGINT) AS discoverer,
                      CAST(COUNT(*) AS BIGINT) AS n_refs
               FROM allowed
               GROUP BY canonical)
      SELECT canonical AS url, discoverer, n_refs
      FROM cand
      WHERE canonical NOT IN (SELECT canonical FROM seen)
        AND canonical NOT IN (SELECT canonical FROM fetched)
      ORDER BY url"""), headline = true),

    // --------------------------- frontier fetch prioritization (OPIC)
    // WHICH novel discoveries to fetch first — the crawl-ordering
    // question (Cho/Garcia-Molina 1998; Abiteboul's OPIC is this
    // cash-splitting form): every page distributes a fixed budget
    // 2^20 div outdeg to each outlink, a candidate's priority = Σ
    // contributions from its referring pages, and the batch fetch set
    // is the global top-K by (priority DESC, url ASC). Exact integers
    // end to end. A hub page referred by ~n/5 pages outranks every
    // 1-2-referrer candidate; pages with an extra 4th link (doc_id %
    // 3 = 0) contribute 2^20 div 4 — outdeg weighting is observable,
    // not just n_refs. Plan: the outlink relation stages once (feeds
    // the outdeg aggregate AND the contribution join); novel = LEFT
    // ANTI against the fetched urls; top-K is TakeOrderedAndProject
    // (map-side K-heaps + one driver merge — the distributed top-k,
    // never a global sort; K = the batch fetch budget).
    Q("x_frontier_priority", (s, d) => {
      val pages = fanOut(documents(s, d))
        .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
        .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
        .withColumn("url", expr(
          """concat('https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
        .withColumn("__html", expr(
          """concat('<p><a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
            |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=f">a</a> ',
            |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
            |'.com/d/', CAST(__t2 AS STRING), '">b</a> ',
            |'<a href="https://www.hub.org/h/', CAST(doc_id % 5 AS STRING),
            |'">h</a>',
            |IF(doc_id % 3 = 0,
            |   concat(' <a href="https://www.extra.org/e/',
            |          CAST(doc_id AS STRING), '">e</a>'), ''),
            |'</p>')""".stripMargin))
      val lk = stage(graft.streaming.FrontierIngest
        .outlinks(pages, "doc_id", "url", "__html"))
      val deg = lk.groupBy(col("ref_id"))
        .agg(count(lit(1)).cast("long").as("__deg"))
      val seen = graft.streaming.FrontierIngest
        .pageUrls(pages, "doc_id", "url")
        .select(col("curl")).distinct()
      lk.join(deg, Seq("ref_id"))
        .withColumn("__cash", expr("1048576 div __deg"))
        .groupBy(col("curl"))
        .agg(sum(col("__cash")).cast("long").as("priority"),
          count(lit(1)).cast("long").as("n_refs"))
        .join(seen, Seq("curl"), "left_anti")
        .orderBy(col("priority").desc, col("curl"))
        .limit(100)
        .select(col("curl").as("url"), col("priority"), col("n_refs"))
    }, Some("""
      WITH links AS (
        SELECT doc_id AS ref_id,
               'https://www.site' ||
               CAST(((doc_id * 3 + 1) % 1024) % 7 AS VARCHAR) ||
               '.com/d/' || CAST((doc_id * 3 + 1) % 1024 AS VARCHAR) AS curl
        FROM documents
        UNION ALL
        SELECT doc_id,
               'https://www.site' ||
               CAST(((doc_id * 7 + 2) % 1024) % 7 AS VARCHAR) ||
               '.com/d/' || CAST((doc_id * 7 + 2) % 1024 AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT doc_id,
               'https://www.hub.org/h/' || CAST(doc_id % 5 AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT doc_id,
               'https://www.extra.org/e/' || CAST(doc_id AS VARCHAR)
        FROM documents WHERE doc_id % 3 = 0),
      deg AS (SELECT ref_id, CAST(COUNT(*) AS BIGINT) AS deg
              FROM links GROUP BY ref_id),
      seen AS (SELECT 'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
                      '.com/d/' || CAST(doc_id AS VARCHAR) AS curl
               FROM documents),
      pri AS (SELECT l.curl,
                     CAST(SUM(1048576 // d.deg) AS BIGINT) AS priority,
                     CAST(COUNT(*) AS BIGINT) AS n_refs
              FROM links l JOIN deg d ON l.ref_id = d.ref_id
              WHERE l.curl NOT IN (SELECT curl FROM seen)
              GROUP BY l.curl)
      SELECT curl AS url, priority, n_refs
      FROM pri ORDER BY priority DESC, url LIMIT 100""")),

    // --------------------------- frontier discovery budget (politeness)
    // startFrontier's domainCap twin: the seen set is bounded to `cap`
    // urls per REGISTRABLE domain — novel discoveries fill only their
    // domain's remaining quota, smallest md5('fq:'||url) first (the
    // salted-hash sampling discipline; ROW_NUMBER in the oracle is the
    // spec, not the plan — the Spark side rides the bounded MinKStrings
    // aggregator, map-side k-buffers, never a whole-group collect).
    // Fixture: at sf0.01 the seed seen set holds ~47 urls per site
    // domain, cap = 50 leaves a 2-3 url quota that the ~80-candidate-
    // per-domain novel set overflows (the gate bites); the lone
    // example.org candidate rides a zero-prior domain (contrast). At
    // sf0.1 the site domains are fully SATURATED (prior ~476 ≥ cap) and
    // only the zero-prior row emits — the steady-state regime, equally
    // pinned.
    Q("x_frontier_quota", (s, d) => {
      import s.implicits._
      val cap = 50
      val pages = fanOut(documents(s, d))
        .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
        .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
        .withColumn("url", expr(
          """concat('https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
      val batch = pages.filter(expr("doc_id % 3 = 0"))
        .withColumn("__html", expr(
          """concat('<p><a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
            |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=feed">a</a> ',
            |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
            |'.com/d/', CAST(__t2 AS STRING), '">b</a> ',
            |'<a href="https://other.example.org/ref">d</a></p>')""".stripMargin))
      val seen = graft.sources.Tables.stage(graft.operators.Web
        .withCanonicalUrl(
          pages.filter(expr("doc_id % 3 != 0")).select(col("doc_id"), col("url")),
          "url", "__c")
        .select(col("__c").as("curl")).distinct())
      val fetched = graft.streaming.FrontierIngest
        .pageUrls(batch, "doc_id", "url")
        .select(col("curl")).distinct()
      val novel = graft.operators.Web.withRegistrableDomain(
        graft.streaming.FrontierIngest
          .outlinks(batch, "doc_id", "url", "__html")
          .groupBy(col("curl"))
          .agg(min(col("ref_id")).as("discoverer"),
            count(lit(1)).cast("long").as("n_refs"))
          .join(seen.select(col("curl")), Seq("curl"), "left_anti")
          .join(fetched, Seq("curl"), "left_anti")
          .withColumn("__h", expr(
            graft.operators.Web.canonicalHostSql("curl"))),
        "__h", "domain")
      val prior = graft.operators.Web.withRegistrableDomain(
        seen.withColumn("__h", expr(
          graft.operators.Web.canonicalHostSql("curl"))),
        "__h", "domain")
        .groupBy(col("domain")).agg(count(lit(1)).as("prior"))
      val mink = udaf(new graft.operators.Sampling.MinKStrings(cap),
        org.apache.spark.sql.Encoders.product[graft.operators.Sampling.HashedStr])
      val picked = novel
        .withColumn("__fh", md5(concat(lit("fq:"), col("curl"))))
        .groupBy(col("domain"))
        .agg(mink(col("__fh"), col("curl")).as("__top"))
        .join(broadcast(prior), Seq("domain"), "left")
        .select(col("domain"),
          coalesce(col("prior"), lit(0L)).as("prior"),
          posexplode(col("__top.items.s")).as(Seq("__pos", "curl")))
        .filter(col("__pos") < lit(cap.toLong) - col("prior"))
      picked
        .join(novel.select(col("curl"), col("discoverer"), col("n_refs")),
          Seq("curl"))
        .select(col("domain"), col("prior"), col("curl").as("url"),
          col("discoverer"), col("n_refs"))
        .orderBy(col("url"))
    }, Some(s"""
      WITH pages AS MATERIALIZED (
        SELECT doc_id,
          (doc_id * 3 + 1) % 1024 AS t1, (doc_id * 7 + 2) % 1024 AS t2,
          'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.com/d/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      __link_src AS (
        SELECT doc_id,
          '<p><a href="https://WWW.Site' || CAST(t1 % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(t1 AS VARCHAR) || '?utm_source=feed">a</a> ' ||
          '<a href="https://www.site' || CAST(t2 % 7 AS VARCHAR) ||
          '.com/d/' || CAST(t2 AS VARCHAR) || '">b</a> ' ||
          '<a href="https://other.example.org/ref">d</a></p>' AS h
        FROM pages WHERE doc_id % 3 = 0),
      pu AS (SELECT doc_id AS pid, url FROM pages),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("pid"), "pc")},
      seen AS MATERIALIZED (
        SELECT DISTINCT canonical FROM pcc WHERE pid % 3 <> 0),
      fetched AS MATERIALIZED (
        SELECT DISTINCT canonical FROM pcc WHERE pid % 3 = 0),
      lk0 AS (SELECT doc_id, href FROM (${graft.operators.Html.duckLinkItems("h")}) z),
      au AS (SELECT ref_id, aurl AS url FROM (
               SELECT l.doc_id AS ref_id,
                      ${graft.operators.Web.resolveRefSql("l.href",
                        "split_part(p.canonical, '://', 1)", "p.host",
                        "p.path", duck = true)} AS aurl
               FROM lk0 l JOIN pcc p ON p.pid = l.doc_id)
             WHERE aurl IS NOT NULL),
      ${graft.operators.Web.duckCanonicalCtes("au", Seq("ref_id"), "lc")},
      nov AS MATERIALIZED (
        SELECT canonical AS url,
               CAST(MIN(ref_id) AS BIGINT) AS discoverer,
               CAST(COUNT(*) AS BIGINT) AS n_refs,
               ${duckDomainOfHost(
                 "split_part(split_part(canonical, '://', 2), '/', 1)")}
                 AS domain
        FROM (SELECT DISTINCT canonical, ref_id FROM lcc)
        WHERE canonical NOT IN (SELECT canonical FROM seen)
          AND canonical NOT IN (SELECT canonical FROM fetched)
        GROUP BY canonical),
      sd AS (SELECT canonical,
                    ${duckDomainOfHost(
                      "split_part(split_part(canonical, '://', 2), '/', 1)")}
                      AS domain
             FROM seen),
      pri AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS prior
              FROM sd GROUP BY domain),
      rk AS (SELECT n.url, n.discoverer, n.n_refs, n.domain,
                    COALESCE(p.prior, CAST(0 AS BIGINT)) AS prior,
                    row_number() OVER (PARTITION BY n.domain
                      ORDER BY md5('fq:' || n.url), n.url) AS r
             FROM nov n LEFT JOIN pri p USING (domain))
      SELECT domain, prior, url, discoverer, n_refs
      FROM rk WHERE r <= 50 - prior
      ORDER BY url""")),

    // ------------------------------------------- link-graph maintenance
    // The batch twin of streaming.LinkGraphIngest (gate #32): the seed
    // corpus (doc_id % 3 ≠ 0) holds a URL→id map, its internally
    // resolvable edges, and its DANGLING outlinks as pending; the
    // doc_id % 3 = 0 pages arrive as one batch. Newly resolved edges =
    // (pending ∪ batch outlinks) joined against the map AS OF the batch
    // (seed ∪ batch pages, min id per URL), minus self-loops, minus
    // already-resolved seed edges — so fetch-then-link AND
    // link-then-fetch both produce the edge (retro-resolution), and
    // emission is exactly-once. Canonical URL strings are the only
    // join keys.
    Q("x_linkgraph_incremental", (s, d) => {
      val pages = fanOut(documents(s, d))
        .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
        .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
        .withColumn("url", expr(
          """concat('https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
        .withColumn("__html", expr(
          """concat('<p><a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
            |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=feed">a</a> ',
            |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
            |'.com/d/', CAST(__t2 AS STRING), '">b</a> ',
            |'<a href="/about">c</a></p>')""".stripMargin))
      val seed = pages.filter(expr("doc_id % 3 != 0"))
      val batch = pages.filter(expr("doc_id % 3 = 0"))
      val fi = graft.streaming.FrontierIngest
      // staged: the seed link relation feeds the resolved edges AND the
      // pending set; the seed map feeds resolution and the full map.
      val seedMap = graft.sources.Tables.stage(
        fi.pageUrls(seed, "doc_id", "url")
          .groupBy(col("curl").as("url")).agg(min(col("id")).as("id")))
      val seedLinks = graft.sources.Tables.stage(
        fi.outlinks(seed, "doc_id", "url", "__html")
          .select(col("curl").as("url"), col("ref_id")))
      val seedEdges = seedLinks.join(seedMap, Seq("url"))
        .filter(col("ref_id") =!= col("id"))
        .select(col("ref_id").as("s"), col("id").as("d")).distinct()
      val pending = seedLinks.join(seedMap.select(col("url")),
        Seq("url"), "left_anti")
      val bl = fi.outlinks(batch, "doc_id", "url", "__html")
        .select(col("curl").as("url"), col("ref_id"))
      val fullMap = seedMap
        .unionByName(fi.pageUrls(batch, "doc_id", "url")
          .select(col("curl").as("url"), col("id")))
        .groupBy(col("url")).agg(min(col("id")).as("id"))
      pending.unionByName(bl).distinct()
        .join(fullMap, Seq("url"))
        .filter(col("ref_id") =!= col("id"))
        .select(col("ref_id").as("s"), col("id").as("d"), col("url"))
        .join(seedEdges, Seq("s", "d"), "left_anti")
        .orderBy(col("s"), col("d"), col("url"))
    }, Some(s"""
      WITH pages AS MATERIALIZED (
        SELECT doc_id,
          (doc_id * 3 + 1) % 1024 AS t1, (doc_id * 7 + 2) % 1024 AS t2,
          'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.com/d/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      __link_src AS (
        SELECT doc_id,
          '<p><a href="https://WWW.Site' || CAST(t1 % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(t1 AS VARCHAR) || '?utm_source=feed">a</a> ' ||
          '<a href="https://www.site' || CAST(t2 % 7 AS VARCHAR) ||
          '.com/d/' || CAST(t2 AS VARCHAR) || '">b</a> ' ||
          '<a href="/about">c</a></p>' AS h
        FROM pages),
      pu AS (SELECT doc_id AS pid, url FROM pages),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("pid"), "pc")},
      lk0 AS (SELECT doc_id, href FROM (${graft.operators.Html.duckLinkItems("h")}) z),
      au AS (SELECT ref_id, aurl AS url FROM (
               SELECT l.doc_id AS ref_id,
                      ${graft.operators.Web.resolveRefSql("l.href",
                        "split_part(p.canonical, '://', 1)", "p.host",
                        "p.path", duck = true)} AS aurl
               FROM lk0 l JOIN pcc p ON p.pid = l.doc_id)
             WHERE aurl IS NOT NULL),
      ${graft.operators.Web.duckCanonicalCtes("au", Seq("ref_id"), "lc")},
      links AS MATERIALIZED (
        SELECT DISTINCT canonical AS url, ref_id FROM lcc),
      map_seed AS MATERIALIZED (
        SELECT canonical AS url, CAST(MIN(pid) AS BIGINT) AS id
        FROM pcc WHERE pid % 3 <> 0 GROUP BY canonical),
      seed_links AS (SELECT * FROM links WHERE ref_id % 3 <> 0),
      seed_edges AS MATERIALIZED (
        SELECT DISTINCT l.ref_id AS s, m.id AS d
        FROM seed_links l JOIN map_seed m USING (url)
        WHERE l.ref_id <> m.id),
      pending AS (SELECT url, ref_id FROM seed_links
                  WHERE url NOT IN (SELECT url FROM map_seed)),
      map_full AS MATERIALIZED (
        SELECT canonical AS url, CAST(MIN(pid) AS BIGINT) AS id
        FROM pcc GROUP BY canonical),
      cand AS (SELECT DISTINCT url, ref_id FROM (
                 SELECT url, ref_id FROM pending
                 UNION ALL
                 SELECT url, ref_id FROM links WHERE ref_id % 3 = 0)),
      resolved AS (SELECT c.ref_id AS s, m.id AS d, c.url
                   FROM cand c JOIN map_full m USING (url)
                   WHERE c.ref_id <> m.id)
      SELECT s, d, url FROM resolved r
      WHERE NOT EXISTS (SELECT 1 FROM seed_edges e
                        WHERE e.s = r.s AND e.d = r.d)
      ORDER BY s, d, url""")),

    // ------------------------------------------------------ data profile
    // Per-column profile (row/non-null/distinct counts + min/max) in ONE
    // scan: stack() unpivots the projected columns to (col_name, v) rows,
    // then a single grouped aggregation profiles all columns — the
    // dataset-health gate a curation pipeline runs before training.
    // Values go through strings (numerics via DECIMAL, which formats
    // identically on both engines — raw DOUBLE casts don't).
    Q("x_profile", (s, d) => {
      orders(s, d)
        .select(expr(
          """stack(3,
            |  'o_orderpriority', CAST(o_orderpriority AS STRING),
            |  'o_custkey',       CAST(o_custkey AS STRING),
            |  'o_totalprice',    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING)
            |) AS (col_name, v)""".stripMargin))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("v")).as("n_nonnull"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy(col("col_name"))
    }, Some("""
      WITH stacked AS (
        SELECT 'o_orderpriority' AS col_name, CAST(o_orderpriority AS VARCHAR) AS v FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) FROM orders)
      SELECT col_name, COUNT(*) AS n_rows, COUNT(v) AS n_nonnull,
             COUNT(DISTINCT v) AS n_distinct, MIN(v) AS min_v, MAX(v) AS max_v
      FROM stacked GROUP BY col_name ORDER BY col_name""")),

    // --------------------------------------------- boilerplate n-grams
    // Top-30 word bigrams by DOCUMENT frequency (distinct per doc, so one
    // spammy doc can't inflate a phrase) — the boilerplate detector that
    // feeds dedup's df-caps and cleaning's kill-lists. Plan: explode →
    // map-side partial count → one shuffle on the n-gram → global top-k
    // (TakeOrderedAndProject, never a full sort).
    Q("x_ngram_topk", (s, d) => {
      documents(s, d)
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .select(explode(expr(
          """array_distinct(transform(
            |  sequence(1, greatest(size(toks) - 1, 1)),
            |  i -> concat_ws(' ', slice(toks, i, 2))))""".stripMargin)).as("ng"))
        .groupBy(col("ng"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("ng"))
        .limit(30)
    }, Some("""
      WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      ng AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 1, 1) + 1),
                 i -> array_to_string(toks[i:i+1], ' ')))) AS ng
        FROM t)
      SELECT ng, COUNT(*) AS df FROM ng
      GROUP BY ng ORDER BY df DESC, ng LIMIT 30""")),

    // ------------------------------------------- text ⟂ embedding join
    // The multimodal-columns join: quality-gated documents enriched with
    // their embedding's L2 norm (doc_id ≡ vec_id). At scale this is THE
    // shape of joining a text table to a sidecar embedding/media table —
    // equi-join on the id, norm computed as a sequential fold identical on
    // both engines.
    Q("x_doc_embedding_join", (s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens", expr("size(split(text, ' '))"))
        .filter(col("n_tokens") >= 20)
        .select(col("doc_id"), col("n_tokens"))
      val embs = embeddings(s, d).select(col("vec_id"),
        expr(
          """sqrt(aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) ->
            |  acc + CAST(element_at(embedding, i) AS DOUBLE) * CAST(element_at(embedding, i) AS DOUBLE)))""".stripMargin)
          .as("nrm"))
      docs.join(embs, docs("doc_id") === embs("vec_id"))
        .select(col("doc_id"), col("n_tokens"), col("nrm"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH docs AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE len(string_split(text, ' ')) >= 20),
      embs AS (
        SELECT vec_id,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings)
      SELECT doc_id, n_tokens, nrm
      FROM docs JOIN embs ON doc_id = vec_id
      ORDER BY doc_id""")),

    // --------------------------------- chunk → document embedding pooling
    // The aggregation stage between chunk-level embeddings and a
    // document-level vector (RAG indexing, doc-level dedup/clustering):
    // element-wise MEAN over each doc's chunks. Determinism across
    // engines: chunks are collected per doc, SORTED by chunk id, and
    // folded sequentially (sort_array(collect_list(struct)) ≡ DuckDB
    // `list(e ORDER BY id)`), with ONE divide at the end — the same IEEE
    // op sequence both sides, so the pooled doubles match bitwise. The
    // per-group collect is bounded by chunks-per-document (a format
    // contract, ~doc_len/chunk_len — never corpus-scaled). Stand-in
    // grouping: vec_id // 4 = the "document", 4 chunks each. Output
    // pins the pooled vector's first/last components and its L2 norm.
    Q("x_embed_pool", (s, d) => {
      def pooled(i: Int) =
        s"""aggregate(chunks, CAST(0 AS DOUBLE),
           |  (acc, c) -> acc + CAST(element_at(c.embedding, $i) AS DOUBLE))
           |  / CAST(size(chunks) AS DOUBLE)""".stripMargin
      fanOut(embeddings(s, d))
        .select(expr("vec_id div 4").as("doc_id"),
          col("vec_id"), col("embedding"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("chunks"))
        .select(col("doc_id"),
          expr("CAST(size(chunks) AS INT)").as("n_chunks"),
          expr(pooled(1)).as("p_first"),
          expr(pooled(64)).as("p_last"),
          expr(
            s"""sqrt(aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) ->
               |  acc + (${"aggregate(chunks, CAST(0 AS DOUBLE), (a2, c) -> a2 + CAST(element_at(c.embedding, i) AS DOUBLE)) / CAST(size(chunks) AS DOUBLE)"})
               |      * (${"aggregate(chunks, CAST(0 AS DOUBLE), (a3, c) -> a3 + CAST(element_at(c.embedding, i) AS DOUBLE)) / CAST(size(chunks) AS DOUBLE)"})))""".stripMargin)
            .as("p_norm"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH c AS (SELECT vec_id // 4 AS doc_id, vec_id, embedding FROM embeddings),
      g AS (SELECT doc_id, list(embedding ORDER BY vec_id) AS chunks
            FROM c GROUP BY doc_id),
      p AS (SELECT doc_id, chunks, len(chunks) AS n,
              list_transform(range(1, 65), i ->
                list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(chunks, e -> CAST(e[i] AS DOUBLE))),
                  (acc, v) -> acc + v) / CAST(len(chunks) AS DOUBLE)) AS pooled
            FROM g)
      SELECT doc_id, CAST(n AS INT) AS n_chunks,
             pooled[1] AS p_first, pooled[64] AS p_last,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(pooled, v -> v * v)), (acc, v) -> acc + v)) AS p_norm
      FROM p ORDER BY doc_id""")),

    // ------------------------------------------------- decontamination
    // Train/test overlap removal: flag training docs sharing ≥3 distinct
    // word 3-grams with any benchmark document. The benchmark set (stand-in:
    // doc_id % 50 = 0) is tiny by nature, so its DISTINCT shingle set
    // broadcasts and the corpus is scanned once — shingle explode →
    // broadcast semi-overlap join → per-doc count. Left join keeps
    // zero-overlap docs with overlap_n = 0. The real pipeline swaps the
    // stand-in for the actual eval-suite shingle table; everything else is
    // unchanged.
    Q("x_decontaminate", (s, d) => {
      // The shingle relation feeds BOTH the benchmark side and the train
      // side; Spark has no subplan reuse across the two consumers, so stage
      // it (same discipline as TextDedup's signature relations) — tokenize +
      // shingle runs once instead of twice.
      val sh = stage(documents(s, d)
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(
            |  sequence(1, greatest(size(toks) - 2, 1)),
            |  i -> concat_ws(' ', slice(toks, i, 3))))""".stripMargin)).as("sg")))
      val benchSh = broadcast(
        sh.filter(col("doc_id") % 50 === 0).select(col("sg")).distinct())
      val overlaps = sh.filter(col("doc_id") % 50 =!= 0)
        .join(benchSh, "sg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("overlap_n"))
      documents(s, d).filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"))
        .join(overlaps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("overlap_n"), lit(0L)).as("overlap_n"),
          (coalesce(col("overlap_n"), lit(0L)) >= 3).as("contaminated"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1) + 1),
                 i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' ')))) AS sg
        FROM documents),
      bench AS (SELECT DISTINCT sg FROM sh WHERE doc_id % 50 = 0),
      ovl AS (
        SELECT s.doc_id, COUNT(*) AS overlap_n
        FROM sh s JOIN bench b ON s.sg = b.sg
        WHERE s.doc_id % 50 <> 0
        GROUP BY s.doc_id)
      SELECT d.doc_id,
             COALESCE(o.overlap_n, 0) AS overlap_n,
             COALESCE(o.overlap_n, 0) >= 3 AS contaminated
      FROM documents d LEFT JOIN ovl o ON d.doc_id = o.doc_id
      WHERE d.doc_id % 50 <> 0
      ORDER BY d.doc_id""")),

    // --------------------------------------------------- document chunking
    // Overlapping token windows (32-token chunks, stride 16) — the
    // sequence-windowing stage before tokenization/embedding. Pure per-row
    // flatMap (posexplode of an in-row transform): no shuffle, output keyed
    // (doc_id, chunk_idx) so chunks re-associate downstream. Every step is
    // integer/string — engine-exact.
    Q("x_chunk", (s, d) => {
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(1, size(toks), 16),
            |  st -> concat_ws(' ', slice(toks, st, 32)))""".stripMargin)))
        .select(col("doc_id"), col("pos").cast("bigint").as("chunk_idx"),
          expr("size(split(col, ' '))").cast("bigint").as("n_tok"),
          col("col").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }, Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) + 1, 16),
                 st -> array_to_string(toks[st:st+31], ' ')) AS chunks
        FROM t)
      SELECT doc_id,
             unnest(range(0, len(chunks))) AS chunk_idx,
             CAST(len(string_split(unnest(chunks), ' ')) AS BIGINT) AS n_tok,
             unnest(chunks) AS chunk
      FROM c ORDER BY doc_id, chunk_idx""")),

    // --------------------------------- content-defined chunking (rolling)
    // Rolling-hash boundaries (w = 4, threshold '20' → P = 1/8): chunk
    // edges move with CONTENT, so a prefix edit leaves every downstream
    // chunk byte-identical — the chunker to use when chunks feed dedup or
    // an embedding cache. Stability pinned in PropertySpec; fixed-stride
    // x_chunk above is the contrast case.
    Q("x_chunk_cdc", (s, d) => {
      cdcChunks(documents(s, d), "doc_id", "text", w = 4, thresholdHex = "20")
        .orderBy(col("doc_id"), col("chunk"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      e AS (SELECT doc_id, toks,
              unnest(range(0, len(toks))) AS p0,
              unnest(toks) AS tok
            FROM t),
      f AS (SELECT doc_id, p0, tok,
              CASE WHEN p0 >= 3 AND substr(md5(array_to_string(toks[p0-2:p0+1], ' ')), 1, 2) < '20'
                   THEN 1 ELSE 0 END AS b
            FROM e),
      c AS (SELECT doc_id, p0, tok,
              COALESCE(CAST(SUM(b) OVER (PARTITION BY doc_id ORDER BY p0
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS chunk
            FROM f)
      SELECT doc_id, chunk, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             string_agg(tok, ' ' ORDER BY p0) AS chunk_text
      FROM c GROUP BY doc_id, chunk ORDER BY doc_id, chunk""")),

    // ------------------------------------------- sentence segmentation
    // graft.operators.Sentences.sentenceRelation — the pinned
    // rule-based splitter C4-granularity cleaning runs at: boundaries
    // = [.!?]-runs followed by spaces, trailing terminator runs
    // stripped AFTER the split (so a text-final sentence behaves like
    // a medial one), empties drop. The fixture re-punctuates the
    // corpus text deterministically (every 7th token ends '.', every
    // 14th '!', every 21st '?' — CASE order pins the 42nd-token
    // collision); the oracle replays the same rebuild and split with
    // DuckDB's list functions (parallel unnests zip by position — the
    // x_chunk discipline).
    Q("x_text_sentences", (s, d) => {
      val docs = fanOut(documents(s, d))
        .withColumn("__toks", expr("split(text, ' ')"))
        .withColumn("__pt", expr(
          """concat_ws(' ', transform(__toks, (t, i) ->
            |  CASE WHEN (i + 1) % 21 = 0 THEN concat(t, '?')
            |       WHEN (i + 1) % 14 = 0 THEN concat(t, '!')
            |       WHEN (i + 1) % 7 = 0 THEN concat(t, '.')
            |       ELSE t END))""".stripMargin))
      graft.operators.Sentences.sentenceRelation(docs, "doc_id", "__pt")
        .orderBy(col("doc_id"), col("sent_idx"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      p AS (SELECT doc_id, array_to_string(list_transform(range(1, len(toks) + 1),
              i -> CASE WHEN i % 21 = 0 THEN toks[i] || '?'
                        WHEN i % 14 = 0 THEN toks[i] || '!'
                        WHEN i % 7 = 0 THEN toks[i] || '.'
                        ELSE toks[i] END), ' ') AS pt
            FROM t),
      sg AS (SELECT doc_id, ${graft.operators.Sentences.sentencesSql("pt", duck = true)} AS sl
             FROM p)
      SELECT doc_id, CAST(unnest(range(0, len(sl))) AS BIGINT) AS sent_idx,
             CAST(len(string_split(unnest(sl), ' ')) AS BIGINT) AS n_words,
             unnest(sl) AS sentence
      FROM sg ORDER BY doc_id, sent_idx""")),

    // ------------------------------- C4 three-sentence-span dedup
    // Raffel et al. 2020 §2.2 ("we discarded all but one of any
    // three-sentence span occurring more than once"), restated exactly
    // (graft.operators.Sentences.spanDedup): per doc, every 3
    // consecutive sentences key an md5; a cross-corpus duplicated span
    // keeps its CANONICAL occurrence only (min (doc_id, sent_idx) —
    // min-struct, never a window) and every sentence covered by a
    // non-canonical copy is removed; clean text = survivors rejoined
    // in order. Fixture: every doc is prefixed with the SAME
    // three-sentence boilerplate ("subscribe … follow … sign up …"),
    // so that span duplicates corpus-wide and survives only in the
    // smallest doc — the C4 newsletter/boilerplate case verbatim;
    // spans straddling boilerplate and content are unique and remove
    // nothing. Only (digest, doc_id, sent_idx) shuffles — never text.
    // Oracle canonical pick = MIN(doc_id·2^20 + idx) — needs
    // sent_idx < 2^20, an oracle-only bound (the LPA packing
    // precedent).
    Q("x_dedup_sentence", (s, d) => {
      val docs = fanOut(documents(s, d))
        .withColumn("__toks", expr("split(text, ' ')"))
        .withColumn("__pt", expr(
          """concat('subscribe to our newsletter today. follow us for more news. sign up now and stay informed. ',
            |  concat_ws(' ', transform(__toks, (t, i) ->
            |    CASE WHEN (i + 1) % 21 = 0 THEN concat(t, '?')
            |         WHEN (i + 1) % 14 = 0 THEN concat(t, '!')
            |         WHEN (i + 1) % 7 = 0 THEN concat(t, '.')
            |         ELSE t END)))""".stripMargin))
      graft.operators.Sentences.spanDedup(docs, "doc_id", "__pt")
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      p AS (SELECT doc_id,
              'subscribe to our newsletter today. follow us for more news. sign up now and stay informed. ' ||
              array_to_string(list_transform(range(1, len(toks) + 1),
                i -> CASE WHEN i % 21 = 0 THEN toks[i] || '?'
                          WHEN i % 14 = 0 THEN toks[i] || '!'
                          WHEN i % 7 = 0 THEN toks[i] || '.'
                          ELSE toks[i] END), ' ') AS pt
            FROM t),
      sg AS (SELECT doc_id, ${graft.operators.Sentences.sentencesSql("pt", duck = true)} AS sl
             FROM p),
      sent AS (SELECT doc_id, CAST(unnest(range(0, len(sl))) AS BIGINT) AS idx,
                      unnest(sl) AS s
               FROM sg),
      spans AS (SELECT doc_id,
                  CAST(unnest(range(0, greatest(len(sl) - 2, 0))) AS BIGINT) AS i,
                  unnest(list_transform(range(1, greatest(len(sl) - 2, 0) + 1),
                    k -> md5(sl[k] || ' | ' || sl[k+1] || ' | ' || sl[k+2]))) AS digest
                FROM sg),
      dup AS (SELECT digest, MIN(doc_id * 1048576 + i) AS canon
              FROM spans GROUP BY digest HAVING COUNT(*) > 1),
      removed AS (
        SELECT DISTINCT doc_id, idx FROM (
          SELECT s.doc_id, s.i AS idx FROM spans s JOIN dup d ON s.digest = d.digest
          WHERE s.doc_id * 1048576 + s.i <> d.canon
          UNION ALL
          SELECT s.doc_id, s.i + 1 FROM spans s JOIN dup d ON s.digest = d.digest
          WHERE s.doc_id * 1048576 + s.i <> d.canon
          UNION ALL
          SELECT s.doc_id, s.i + 2 FROM spans s JOIN dup d ON s.digest = d.digest
          WHERE s.doc_id * 1048576 + s.i <> d.canon))
      SELECT se.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_sents,
             CAST(SUM(CASE WHEN r.idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             COALESCE(string_agg(CASE WHEN r.idx IS NULL THEN se.s END,
                                 '. ' ORDER BY se.idx), '') AS clean_text
      FROM sent se
      LEFT JOIN removed r ON se.doc_id = r.doc_id AND se.idx = r.idx
      GROUP BY se.doc_id ORDER BY se.doc_id"""), headline = true),

    // --------------------------------------- deterministic global shuffle
    // Reproducible training-example order: content-hash sort key + shard
    // from the first hash byte (Sampling.deterministicShuffle). A pure
    // per-row projection — the physical ordering is the WRITER's job
    // (Layout.writeSorted on (shard, sort_key)), so no shuffle, window, or
    // rand() appears here and the same order comes out on any engine, any
    // partitioning, any re-run.
    Q("x_shuffle_shard", (s, d) => {
      graft.operators.Sampling
        .deterministicShuffle(documents(s, d), "doc_id", shards = 8)
        .orderBy(col("sort_key"), col("doc_id"))
    }, Some("""
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sort_key,
             CAST(((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 8
               AS INT) AS shard
      FROM documents ORDER BY sort_key, doc_id""")),

    // ------------------------------------------- URL canonicalization
    // graft.operators.Web.withCanonicalUrl/withRegistrableDomain — the
    // web-crawl curation staples: lowercase scheme+host, drop fragment
    // and default ports, strip one trailing slash, drop utm_*/tracking
    // params, SORT the rest, registrable domain via a pinned
    // multi-suffix set, percent-escapes of UNRESERVED chars decoded and
    // all other escapes hex-uppercased (RFC 3986 §6.2.2). Pure codegen
    // projection (split_part/substr/array ops, no UDF, no shuffle). The
    // fixture synthesizes four messy spellings per id family — v0
    // (shouting host, :443, trailing slash, utm_ param) canonicalizes
    // EQUAL to v1's percent-obfuscated form (%7e%69tem ≡ ~item — the
    // unreserved decode), v2 exercises :80 + fragment + param sorting +
    // the co.uk multi-label suffix, v3 keeps its NON-default port and
    // its RESERVED escape with uppercased hex (%2f → %2F, never '/').
    // The oracle replays every rule with DuckDB's string/list functions.
    Q("x_url_canonical", (s, d) => {
      val urls = fanOut(documents(s, d))
        .select(col("doc_id"), expr(sparkUrlFixture).as("url"))
      graft.operators.Web.withRegistrableDomain(
        graft.operators.Web.withCanonicalUrl(urls, "url", "canonical"),
        "canonical_host", "domain")
        .select(col("doc_id"), col("canonical"), col("domain"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH $duckUrlCtes
      SELECT doc_id, canonical, domain FROM dom ORDER BY doc_id""")),

    // ------------------------------------------- per-domain document cap
    // No single site may dominate a training mix: canonicalize → extract
    // the registrable domain → keep the `cap` smallest id-hashes per
    // domain (Web.capPerDomain = the deterministic window-free
    // stratifiedSample min-k; map-side k-heaps, one shuffle of k-row
    // buffers per domain). The oracle's ROW_NUMBER is the spec, not the
    // plan (the x_mix_manifest discipline).
    Q("x_domain_cap", (s, d) => {
      val urls = fanOut(documents(s, d))
        .select(col("doc_id"), expr(sparkUrlFixture).as("url"))
      graft.operators.Web.capPerDomain(urls, "url", "doc_id", cap = 10)
        .orderBy(col("domain"), col("doc_id"))
    }, Some(s"""
      WITH $duckUrlCtes,
      r AS (SELECT domain, doc_id,
                   row_number() OVER (PARTITION BY domain
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM dom)
      SELECT domain, doc_id FROM r WHERE rk <= 10
      ORDER BY domain, doc_id""")),

    // --------------------------------- per-domain cap with a LOADED PSL
    // The public-suffix list as a versioned deployment artifact
    // (Web.withRegistrableDomain's four-arg overload): a `suffix`
    // relation joins by BROADCAST once per candidate label count
    // (1..MaxSuffixLabels), LONGEST match wins, no match → the PSL '*'
    // default (last label is public). The fixture plants a 3-label
    // suffix (act.edu.au) absent from the pinned MultiSuffixes set, a
    // longest-match ladder (au < edu.au < act.edu.au), and a host under
    // an unknown TLD (.zz → default rule). The corpus never shuffles
    // for the domain; the cap is the window-free min-k.
    Q("x_domain_psl", (s, d) => {
      import s.implicits._
      val urls = fanOut(documents(s, d))
        .select(col("doc_id"), expr(
          """CASE CAST(doc_id % 5 AS INT)
            |  WHEN 0 THEN concat('https://shop.example',
            |    CAST((doc_id div 5) % 3 AS STRING), '.act.edu.au/p')
            |  WHEN 1 THEN concat('https://www.site',
            |    CAST((doc_id div 5) % 7 AS STRING), '.com/x')
            |  WHEN 2 THEN concat('http://news.example',
            |    CAST((doc_id div 5) % 7 AS STRING), '.co.uk/y')
            |  WHEN 3 THEN concat('https://a.b.campus',
            |    CAST((doc_id div 5) % 7 AS STRING), '.edu.au/z')
            |  ELSE concat('http://weird.host',
            |    CAST((doc_id div 5) % 7 AS STRING), '.zz/q')
            |END""".stripMargin).as("url"))
      val psl = Seq("com", "uk", "co.uk", "au", "edu.au", "act.edu.au")
        .toDF("suffix")
      graft.operators.Web.capPerDomain(urls, "url", "doc_id", cap = 10, psl)
        .orderBy(col("domain"), col("doc_id"))
    }, Some("""
      WITH psl AS (
        SELECT unnest(['com', 'uk', 'co.uk', 'au', 'edu.au', 'act.edu.au']) AS suffix),
      u AS (SELECT doc_id,
              CASE CAST(doc_id % 5 AS INT)
                WHEN 0 THEN 'https://shop.example' ||
                  CAST((doc_id // 5) % 3 AS VARCHAR) || '.act.edu.au/p'
                WHEN 1 THEN 'https://www.site' ||
                  CAST((doc_id // 5) % 7 AS VARCHAR) || '.com/x'
                WHEN 2 THEN 'http://news.example' ||
                  CAST((doc_id // 5) % 7 AS VARCHAR) || '.co.uk/y'
                WHEN 3 THEN 'https://a.b.campus' ||
                  CAST((doc_id // 5) % 7 AS VARCHAR) || '.edu.au/z'
                ELSE 'http://weird.host' ||
                  CAST((doc_id // 5) % 7 AS VARCHAR) || '.zz/q'
              END AS url FROM documents),
      h AS (SELECT doc_id,
              string_split(split_part(split_part(url, '://', 2), '/', 1), '.') AS l,
              split_part(split_part(url, '://', 2), '/', 1) AS host
            FROM u),
      k AS (SELECT doc_id, host, l, len(l) AS n,
              CASE WHEN len(l) >= 4 AND array_to_string(l[len(l)-3:len(l)], '.')
                        IN (SELECT suffix FROM psl) THEN 4
                   WHEN len(l) >= 3 AND array_to_string(l[len(l)-2:len(l)], '.')
                        IN (SELECT suffix FROM psl) THEN 3
                   WHEN len(l) >= 2 AND array_to_string(l[len(l)-1:len(l)], '.')
                        IN (SELECT suffix FROM psl) THEN 2
                   ELSE 1 END AS kk
            FROM h),
      dom AS (SELECT doc_id,
                CASE WHEN n <= kk + 1 THEN host
                     ELSE array_to_string(l[n-kk:n], '.') END AS domain
              FROM k),
      r AS (SELECT domain, doc_id,
                   row_number() OVER (PARTITION BY domain
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM dom)
      SELECT domain, doc_id FROM r WHERE rk <= 10
      ORDER BY domain, doc_id""")),

    // -------------------- incremental per-domain accounting (gate twin)
    // graft.streaming.DomainIngest's batch-expressible core, oracle-
    // pinned like the other *_incremental gate queries: the corpus
    // (doc_id % 10 <> 0) builds per-registrable-domain counts, the
    // batch (doc_id % 10 = 0) is flagged against those PRE-batch counts
    // (prior + saturated at cap = 12 — the ~37-domain fixture leaves
    // counts straddling the cap, so BOTH verdicts occur), and the
    // post-fold count ≡ a full recompute over corpus ∪ batch (exactly
    // what the folding gate's integer-sum merge guarantees — the oracle
    // restates it as the plain GROUP BY over everything). The (id,
    // domain) projection runs the full canonicalization chain (the
    // fixture host is spelled 'WWW.Site{k}.COM:443' + a utm_ param);
    // the oracle states the expected domain DIRECTLY from the id — an
    // independent expectation, not a replay. Set semantics within the
    // batch: every batch doc of one domain sees the same prior.
    Q("x_domain_cap_incremental", (s, d) => {
      import graft.streaming.DomainIngest
      val urls = fanOut(documents(s, d))
        .select(col("doc_id"), expr(
          """concat('https://WWW.Site', CAST(doc_id % 37 AS STRING),
            |       '.COM:443/d/', CAST(doc_id AS STRING),
            |       '?utm_source=z')""".stripMargin).as("url"))
      val dm = stage(DomainIngest.domains(urls, "doc_id", "url"))
      val pre = dm.filter(col("id") % 10 =!= 0)
        .groupBy(col("domain")).agg(count(lit(1)).cast("long").as("cnt"))
      val post = dm.groupBy(col("domain"))
        .agg(count(lit(1)).cast("long").as("post"))
      dm.filter(col("id") % 10 === 0)
        .join(broadcast(pre), Seq("domain"), "left")
        .join(broadcast(post), Seq("domain"))
        .select(col("id").as("doc_id"), col("domain"),
          coalesce(col("cnt"), lit(0L)).as("prior"),
          (coalesce(col("cnt"), lit(0L)) >= 12L).as("saturated"),
          col("post"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH u AS (SELECT doc_id,
                   'site' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS domain
                 FROM documents),
      pre AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS cnt FROM u
              WHERE doc_id % 10 <> 0 GROUP BY domain),
      allc AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS post FROM u
               GROUP BY domain)
      SELECT u.doc_id, u.domain, COALESCE(pre.cnt, 0) AS prior,
             COALESCE(pre.cnt, 0) >= 12 AS saturated, allc.post
      FROM u
      LEFT JOIN pre ON u.domain = pre.domain
      JOIN allc ON u.domain = allc.domain
      WHERE u.doc_id % 10 = 0 ORDER BY u.doc_id""")),

    // ----------------------------------------------- URL-level exact dedup
    // The crawl-frontier primitive: two spellings of one resource are ONE
    // fetch — group by the CANONICAL form (Web.withCanonicalUrl: the
    // whole round-14 rule set including percent-normalization, so
    // '%7e%69tem' ≡ '~item' collapses v0/v1 of the fixture while the
    // non-default-port v3 stays distinct), keep the smallest doc_id as
    // the canonical fetch, emit the variant count for frontier
    // re-weighting. Plan: one codegen projection + one shuffle of
    // (canonical, doc_id) — URLs only, never page bodies.
    Q("x_url_dedup", (s, d) => {
      val urls = fanOut(documents(s, d))
        .select(col("doc_id"), expr(sparkUrlFixture).as("url"))
      graft.operators.Web.withCanonicalUrl(urls, "url", "canonical")
        .groupBy(col("canonical"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).cast("long").as("n_variants"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH $duckUrlCtes
      SELECT canonical, MIN(doc_id) AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_variants
      FROM dom GROUP BY canonical ORDER BY doc_id"""))
  )

  /** The shared link fixture: messy-spelling outlinks over the corpus
    * pages (t1 with host case + :443 + utm, t2 with a fragment, a hub
    * link every 10th page, one never-resolving external link, and a
    * script-embedded fake href that clean-first extraction must
    * ignore). */
  private def linkFixturePages(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame =
    fanOut(documents(s, d))
      .withColumn("__t1", expr("(doc_id * 3 + 1) % 1024"))
      .withColumn("__t2", expr("(doc_id * 7 + 2) % 1024"))
      .withColumn("url", expr(
        """concat('https://www.site', CAST(doc_id % 7 AS STRING),
          |'.com/d/', CAST(doc_id AS STRING))""".stripMargin))
      .withColumn("__html", expr(
        """concat('<script>var a = "<a href=\"/fake\">x</a>";</script>',
          |'<p>read <a href="https://WWW.Site', CAST(__t1 % 7 AS STRING),
          |'.COM:443/d/', CAST(__t1 AS STRING), '?utm_source=feed">one</a> and ',
          |'<a href="https://www.site', CAST(__t2 % 7 AS STRING),
          |'.com/d/', CAST(__t2 AS STRING), '#sec">two</a>',
          |IF(doc_id % 10 = 0,
          |   '<a href="https://www.site1.com/d/1">hub</a>', ''),
          |' plus <a href="https://other.example.org/offsite">ext</a></p>')""".stripMargin))

  /** canonical-equi-join edge resolution + the exact-integer directed
    * rank — shared by the html-extracted (x_linkgraph_rank) and the
    * WAT-round-tripped (x_linkgraph_wat) link relations; `links`
    * exposes (doc_id, href). */
  private def linkRankFromLinks(s: org.apache.spark.sql.SparkSession,
                                d: String,
                                pages: org.apache.spark.sql.DataFrame,
                                links: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lc = graft.operators.Web.withCanonicalUrl(links, "href", "__c")
      .select(col("doc_id").as("src"), col("__c").as("canon"))
    val pc = graft.operators.Web.withCanonicalUrl(
      pages.select(col("doc_id"), col("url")), "url", "__c")
      .select(col("doc_id").as("dst"), col("__c").as("canon"))
    val edges = lc.join(pc, "canon").select(col("src"), col("dst"))
    graft.operators.Graph.pageRankDirected(documents(s, d), "doc_id",
      edges, "src", "dst", iterations = 3)
      .orderBy(col("node"))
  }

  /** DuckDB twin of the whole fixture + rank chain (both callers). */
  private def linkRankOracle: String = {
      val rounds = (1 to 3).map(i => s"""
        r$i AS (SELECT nd.node, nd.degree,
                       CAST(150000000 AS BIGINT) +
                       COALESCE(CAST(SUM((p.r * 17) // (20 * p.degree)) AS BIGINT),
                                CAST(0 AS BIGINT)) AS r
                FROM nd LEFT JOIN (SELECT e0.d AS dst, rr.r, rr.degree
                                   FROM e0 JOIN r${i - 1} rr ON e0.s = rr.node) p
                  ON p.dst = nd.node
                GROUP BY nd.node, nd.degree)""").mkString(",")
      s"""
      WITH pages AS MATERIALIZED (
        SELECT doc_id,
          (doc_id * 3 + 1) % 1024 AS t1, (doc_id * 7 + 2) % 1024 AS t2,
          'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.com/d/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      __link_src AS (
        SELECT doc_id,
          '<script>var a = "<a href="/fake">x</a>";</script>' ||
          '<p>read <a href="https://WWW.Site' || CAST(t1 % 7 AS VARCHAR) ||
          '.COM:443/d/' || CAST(t1 AS VARCHAR) || '?utm_source=feed">one</a> and ' ||
          '<a href="https://www.site' || CAST(t2 % 7 AS VARCHAR) ||
          '.com/d/' || CAST(t2 AS VARCHAR) || '#sec">two</a>' ||
          CASE WHEN doc_id % 10 = 0
               THEN '<a href="https://www.site1.com/d/1">hub</a>' ELSE '' END ||
          ' plus <a href="https://other.example.org/offsite">ext</a></p>' AS h
        FROM pages),
      lk AS (SELECT doc_id AS src_id, href AS url
             FROM (${graft.operators.Html.duckLinkItems("h")}) z),
      ${graft.operators.Web.duckCanonicalCtes("lk", Seq("src_id"), "lc")},
      pu AS (SELECT doc_id AS dst_id, url FROM pages),
      ${graft.operators.Web.duckCanonicalCtes("pu", Seq("dst_id"), "pc")},
      e0 AS MATERIALIZED (
        SELECT DISTINCT l.src_id AS s, p.dst_id AS d
        FROM lcc l JOIN pcc p ON l.canonical = p.canonical
        WHERE l.src_id <> p.dst_id),
      od AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS degree
             FROM e0 GROUP BY s),
      nd AS MATERIALIZED (
        SELECT n.node, COALESCE(od.degree, CAST(0 AS BIGINT)) AS degree
        FROM (SELECT s AS node FROM e0 UNION SELECT d FROM e0) n
        LEFT JOIN od ON od.node = n.node),
      r0 AS (SELECT node, degree, CAST(1000000000 AS BIGINT) AS r FROM nd),
      $rounds
      SELECT v.doc_id AS node, COALESCE(r3.r, CAST(150000000 AS BIGINT)) AS pr
      FROM documents v LEFT JOIN r3 ON r3.node = v.doc_id
      ORDER BY node"""
    }

  /** The messy-URL fixture: four spellings per id family (see
    * x_url_canonical's comment). Spark SQL expression over doc_id. */
  private def sparkUrlFixture: String =
    """CASE CAST(doc_id % 4 AS INT)
      |  WHEN 0 THEN concat('https://WWW.Site', CAST((doc_id div 4) % 7 AS STRING),
      |    '.COM:443/Articles/~item', CAST(doc_id div 4 AS STRING),
      |    '/?id=', CAST(doc_id div 4 AS STRING), '&utm_source=feed')
      |  WHEN 1 THEN concat('https://www.site', CAST((doc_id div 4) % 7 AS STRING),
      |    '.com/Articles/%7e%69tem', CAST(doc_id div 4 AS STRING),
      |    '?id=', CAST(doc_id div 4 AS STRING))
      |  WHEN 2 THEN concat('http://news.Example.CO.UK:80/x',
      |    CAST(doc_id div 4 AS STRING), '?b=2&a=1&fbclid=zz#frag')
      |  ELSE concat('http://site', CAST((doc_id div 4) % 7 AS STRING),
      |    '.com:8080/p%2fq?a=', CAST(doc_id div 4 AS STRING))
      |END""".stripMargin

  /** DuckDB twin of the fixture + the full canonicalization chain,
    * ending in `dom(doc_id, canonical, domain)`. Chained CTEs replay
    * each pinned rule of [[graft.operators.Web.withCanonicalUrl]] /
    * [[graft.operators.Web.withRegistrableDomain]] 1:1. */
  private def duckUrlCtes: String =
    s"""u AS (SELECT doc_id,
      |  CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 'https://WWW.Site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |      || '.COM:443/Articles/~item' || CAST(doc_id // 4 AS VARCHAR)
      |      || '/?id=' || CAST(doc_id // 4 AS VARCHAR) || '&utm_source=feed'
      |    WHEN 1 THEN 'https://www.site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |      || '.com/Articles/%7e%69tem' || CAST(doc_id // 4 AS VARCHAR)
      |      || '?id=' || CAST(doc_id // 4 AS VARCHAR)
      |    WHEN 2 THEN 'http://news.Example.CO.UK:80/x'
      |      || CAST(doc_id // 4 AS VARCHAR) || '?b=2&a=1&fbclid=zz#frag'
      |    ELSE 'http://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |      || '.com:8080/p%2fq?a=' || CAST(doc_id // 4 AS VARCHAR)
      |  END AS url FROM documents),
      |s1 AS (SELECT doc_id, url, lower(split_part(url, '://', 1)) AS scheme,
      |              substr(url, length(split_part(url, '://', 1)) + 4) AS rest
      |       FROM u),
      |s2 AS (SELECT *, split_part(rest, '#', 1) AS nofrag FROM s1),
      |s3 AS (SELECT *, split_part(split_part(nofrag, '?', 1), '/', 1) AS hostport
      |       FROM s2),
      |s4 AS (SELECT *,
      |         CASE WHEN scheme = 'http' AND lower(hostport) LIKE '%:80'
      |                THEN substr(lower(hostport), 1, length(hostport) - 3)
      |              WHEN scheme = 'https' AND lower(hostport) LIKE '%:443'
      |                THEN substr(lower(hostport), 1, length(hostport) - 4)
      |              ELSE lower(hostport) END AS host,
      |         substr(nofrag, length(hostport) + 1) AS pq
      |       FROM s3),
      |s4a AS (SELECT *, ${graft.operators.Web.pctNormSql("pq", duck = true)} AS pqn
      |        FROM s4),
      |s5 AS (SELECT *, split_part(pqn, '?', 1) AS path0,
      |         CASE WHEN strpos(pqn, '?') > 0 THEN split_part(pqn, '?', 2)
      |              ELSE '' END AS rawq
      |       FROM s4a),
      |s6 AS (SELECT *,
      |         CASE WHEN path0 LIKE '%/'
      |                THEN substr(path0, 1, length(path0) - 1)
      |              ELSE path0 END AS path,
      |         COALESCE(array_to_string(list_sort(list_filter(
      |           string_split(rawq, '&'),
      |           p -> p <> '' AND NOT starts_with(p, 'utm_')
      |                AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref'))),
      |           '&'), '') AS q
      |       FROM s5),
      |s7 AS (SELECT doc_id, host,
      |         scheme || '://' || host || path ||
      |           CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical
      |       FROM s6),
      |s8 AS (SELECT doc_id, canonical, split_part(host, ':', 1) AS hh,
      |              string_split(split_part(host, ':', 1), '.') AS ls
      |       FROM s7),
      |dom AS (SELECT doc_id, canonical,
      |          CASE WHEN len(ls) <= 2 THEN hh
      |               WHEN ls[len(ls) - 1] || '.' || ls[len(ls)]
      |                    IN ('co.uk', 'org.uk', 'ac.uk', 'co.jp', 'com.au', 'com.br')
      |                 THEN ls[len(ls) - 2] || '.' || ls[len(ls) - 1] || '.' || ls[len(ls)]
      |               ELSE ls[len(ls) - 1] || '.' || ls[len(ls)] END AS domain
      |        FROM s8)""".stripMargin
}
