package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Corpus-quality gating queries — the filter stage of a training-data
  * pipeline: per-language percentile gates, Gopher-style heuristic rules,
  * and deterministic source-mixing rates.
  *
  * Determinism: thresholds are actual data VALUES picked by integer rank
  * (no interpolation); ratios are single IEEE divisions of exact integers;
  * the mixing gate reuses the md5-prefix hash gate from
  * [[graft.operators.Sampling]] (floor(rate·2^32) in fixed-width lowercase
  * hex — both engines compute the identical double, floor, and hex
  * string).
  */
object Quality {

  private val duckToks = "string_split(lower(text), ' ')"
  private val stopEn = "'the','a','and','of','to','is'"

  val all: Seq[Q] = Seq(
    // ------------------------------------------- per-language quality gate
    // Keep documents at/above their language's 10th-percentile length.
    // The threshold comes from graft.operators.Quantiles — the (lang,
    // n_chars) HISTOGRAM path, NOT a rank window over the full table
    // partitioned by 5 languages (the low-cardinality-window shape
    // PlanSanitySpec bans). The 5-row threshold relation broadcasts back
    // onto the scan-fused filter. The oracle states the same semantics in
    // its natural rank-window form — same rows, scale-safe plan.
    Q("x_quality_gate", (s, d) => {
      val th = graft.operators.Quantiles.groupPercentilesDisc(
        documents(s, d), "lang", "n_chars", Seq("th" -> 0.1))
      documents(s, d)
        .join(broadcast(th), "lang")
        .filter(col("n_chars") >= col("th"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("th"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents),
      th AS (SELECT lang, MIN(n_chars) AS th FROM ranked
             WHERE rn = CAST(ceil(n * 0.1) AS BIGINT) GROUP BY lang)
      SELECT d.doc_id, d.lang, d.n_chars, t.th
      FROM documents d JOIN th t USING (lang)
      WHERE d.n_chars >= t.th
      ORDER BY d.doc_id""")),

    // ------------------------------------------------- Gopher-style rules
    // Heuristic quality rules (Rae et al., Gopher §A1.1 shape): token
    // count bounds, mean word length bounds, most-common-word fraction
    // cap, ≥1 stopword. Pure per-row projection — no shuffle, scales
    // linearly; `keep` emitted as 0/1 BIGINT (cross-engine bool hashing
    // is comparator-dependent).
    Q("x_gopher_rules", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("n_tokens", expr("size(toks)").cast("long"))
        .withColumn("mean_word_len", expr(
          "CAST(aggregate(transform(toks, x -> length(x)), 0, (a, v) -> a + v) AS DOUBLE) / size(toks)"))
        // max term frequency = longest run in the sorted token array —
        // O(len·log len) per document (the quadratic distinct×filter count
        // is PlanSanitySpec-linted; the oracle states the naive form).
        .withColumn("__sx", expr("array_sort(toks)"))
        .withColumn("__ex", expr(graft.operators.Ranking.runEndsSql("__sx")))
        .withColumn("max_tf", expr(
          s"CAST(array_max(${graft.operators.Ranking.runCountsSql("__ex")}) AS BIGINT)"))
        .withColumn("n_stop",
          expr(s"size(filter(toks, x -> x IN ($stopEn)))").cast("long"))
        .withColumn("top_word_frac", expr("CAST(max_tf AS DOUBLE) / n_tokens"))
        .select(
          col("doc_id"), col("n_tokens"), col("mean_word_len"), col("max_tf"),
          col("n_stop"), col("top_word_frac"),
          expr("""CAST(CASE WHEN n_tokens BETWEEN 20 AND 100000
                             AND mean_word_len >= 3 AND mean_word_len <= 10
                             AND top_word_frac <= 0.2
                             AND n_stop >= 1 THEN 1 ELSE 0 END AS BIGINT)""")
            .as("keep"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      m AS (SELECT doc_id, len(toks) AS n_tokens,
                   CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, v) -> a + v) AS DOUBLE)
                     / len(toks) AS mean_word_len,
                   CAST(list_max(list_transform(list_distinct(toks), u -> len(list_filter(toks, x -> x = u)))) AS BIGINT) AS max_tf,
                   len(list_filter(toks, x -> x IN ($stopEn))) AS n_stop
            FROM t)
      SELECT doc_id, n_tokens, mean_word_len, max_tf, n_stop,
             CAST(max_tf AS DOUBLE) / n_tokens AS top_word_frac,
             CAST(CASE WHEN n_tokens BETWEEN 20 AND 100000
                        AND mean_word_len >= 3 AND mean_word_len <= 10
                        AND CAST(max_tf AS DOUBLE) / n_tokens <= 0.2
                        AND n_stop >= 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM m ORDER BY doc_id""")),

    // ------------------------------------------- deterministic source mix
    // Rebalance the corpus toward uniform tokens-per-source: each source's
    // keep-rate is min_source_tokens / its_tokens, applied as the
    // deterministic md5-prefix gate (Sampling.hashSample's formula with a
    // per-source rate). Per-source stats are a tiny broadcast aggregate;
    // the gate stays fused into the corpus scan — no corpus shuffle.
    // Output: per-source audit (docs, tokens, rate, kept docs/tokens).
    Q("x_source_mix", (s, d) => {
      val tok = documents(s, d)
        .select(col("source"), col("doc_id"),
          expr("size(split(lower(text), ' '))").cast("long").as("n_tok"))
      // the per-source stats relation is TINY (one row per source) but
      // feeds rates twice and the gate once — staged, or every consumer
      // re-scans the corpus to rebuild it (measured: 5 corpus scans
      // without, 2 with — stats pass + gate pass, the two-pass minimum).
      val per = graft.sources.Tables.stage(tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")))
      val rates = per
        .join(broadcast(per.agg(min(col("n_tokens")).as("min_tokens"))))
        .withColumn("rate", expr("CAST(min_tokens AS DOUBLE) / n_tokens"))
        .withColumn("th", expr(
          """CASE WHEN n_tokens = min_tokens THEN 'g'
            |     ELSE lower(lpad(hex(CAST(floor(CAST(min_tokens AS DOUBLE) / n_tokens * 4294967296) AS BIGINT)), 8, '0')) END""".stripMargin))
      val kept = tok
        .join(broadcast(rates.select(col("source"), col("th"))), "source")
        .filter(expr("substring(md5(CAST(doc_id AS STRING)), 1, 8) < th"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"))
      // LEFT join: a source whose gate keeps zero documents must still
      // appear in the audit (with zeros) — that row is the one an audit
      // exists to surface.
      rates
        .join(broadcast(kept), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("rate"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH tok AS (SELECT source, doc_id, len($duckToks) AS n_tok FROM documents),
      per AS (SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM tok GROUP BY source),
      mn AS (SELECT MIN(n_tokens) AS min_tokens FROM per),
      rates AS (SELECT source, n_docs, n_tokens,
                       CAST(min_tokens AS DOUBLE) / n_tokens AS rate,
                       CASE WHEN n_tokens = min_tokens THEN 'g'
                            ELSE lower(lpad(hex(CAST(floor(CAST(min_tokens AS DOUBLE) / n_tokens * 4294967296) AS BIGINT)), 8, '0')) END AS th
                FROM per CROSS JOIN mn),
      kept AS (SELECT t.source, COUNT(*) AS n_kept,
                      CAST(SUM(t.n_tok) AS BIGINT) AS kept_tokens
               FROM tok t JOIN rates r USING (source)
               WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < r.th
               GROUP BY t.source)
      SELECT r.source, r.n_docs, r.n_tokens, r.rate,
             COALESCE(k.n_kept, 0) AS n_kept,
             COALESCE(k.kept_tokens, 0) AS kept_tokens
      FROM rates r LEFT JOIN kept k USING (source) ORDER BY r.source""")),

    // ------------------------------------ temperature (α) source sampling
    // The multilingual-LM mixing rule (Conneau & Lample 2019; the same
    // α-smoothed multinomial the LLaMA/XLM-R data recipes use): target
    // share ∝ n_s^α, 0 < α < 1 — flatten the source distribution PART of
    // the way to uniform instead of all the way (x_source_mix is the α=0
    // endpoint). Subsampling form: keep-rate r_s = (min_tokens/n_s)^(1−α),
    // so the smallest source keeps 100% and kept tokens scale as n_s^α.
    // α = 0.5 makes the exponent a sqrt — correctly-rounded IEEE in both
    // engines, so rates and the md5 gate are bit-deterministic. Same
    // two-pass plan as x_source_mix: tiny staged stats + broadcast gate
    // fused into the corpus scan.
    Q("x_source_temperature", (s, d) => {
      val tok = documents(s, d)
        .select(col("source"), col("doc_id"),
          expr("size(split(lower(text), ' '))").cast("long").as("n_tok"))
      val per = graft.sources.Tables.stage(tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")))
      val rates = per
        .join(broadcast(per.agg(min(col("n_tokens")).as("min_tokens"))))
        .withColumn("rate", expr("sqrt(CAST(min_tokens AS DOUBLE) / n_tokens)"))
        .withColumn("th", expr(
          """CASE WHEN n_tokens = min_tokens THEN 'g'
            |     ELSE lower(lpad(hex(CAST(floor(sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) * 4294967296) AS BIGINT)), 8, '0')) END""".stripMargin))
      val kept = tok
        .join(broadcast(rates.select(col("source"), col("th"))), "source")
        .filter(expr("substring(md5(CAST(doc_id AS STRING)), 1, 8) < th"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"))
      rates
        .join(broadcast(kept), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("rate"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH tok AS (SELECT source, doc_id, len($duckToks) AS n_tok FROM documents),
      per AS (SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM tok GROUP BY source),
      mn AS (SELECT MIN(n_tokens) AS min_tokens FROM per),
      rates AS (SELECT source, n_docs, n_tokens,
                       sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) AS rate,
                       CASE WHEN n_tokens = min_tokens THEN 'g'
                            ELSE lower(lpad(hex(CAST(floor(sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) * 4294967296) AS BIGINT)), 8, '0')) END AS th
                FROM per CROSS JOIN mn),
      kept AS (SELECT t.source, COUNT(*) AS n_kept,
                      CAST(SUM(t.n_tok) AS BIGINT) AS kept_tokens
               FROM tok t JOIN rates r USING (source)
               WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < r.th
               GROUP BY t.source)
      SELECT r.source, r.n_docs, r.n_tokens, r.rate,
             COALESCE(k.n_kept, 0) AS n_kept,
             COALESCE(k.kept_tokens, 0) AS kept_tokens
      FROM rates r LEFT JOIN kept k USING (source) ORDER BY r.source""")),

    // ------------------------------------------- training-mix manifest
    // The step that ASSEMBLES a mix: per-source quotas from the same
    // α = 0.5 temperature weights x_source_temperature rates with
    // (quota_s = floor(n_docs_s · sqrt(min_tokens / n_tokens_s)) — sqrt
    // is correctly-rounded in both engines), then the quota_s
    // smallest-md5 documents per source — an append-stable, engine-free
    // manifest a writer partitions by. Spark side selects via the typed
    // min-k aggregator (map-side k-buffers — no rank window over the
    // low-cardinality source key, the PlanSanitySpec lint); the max
    // quota bound for the buffers comes from the by-contract-tiny
    // per-source stats relation (one driver row per source). The oracle
    // is the window restatement.
    Q("x_mix_manifest", (s, d) => {
      val tok = documents(s, d)
        .select(col("source"), col("doc_id"),
          expr("size(split(lower(text), ' '))").cast("long").as("n_tok"))
      val per = graft.sources.Tables.stage(tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")))
      val quotas = per
        .join(broadcast(per.agg(min(col("n_tokens")).as("min_tokens"))))
        .select(col("source"), expr(
          "CAST(floor(n_docs * sqrt(CAST(min_tokens AS DOUBLE) / n_tokens)) AS BIGINT)")
          .as("quota"))
      val kMax = quotas.agg(max(col("quota"))).head().getLong(0).toInt
      val mink = org.apache.spark.sql.functions.udaf(
        new graft.operators.Sampling.MinKByHash(math.max(kMax, 1)),
        org.apache.spark.sql.Encoders.product[graft.operators.Sampling.HashedId])
      tok
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .groupBy(col("source"))
        .agg(mink(col("__h"), col("doc_id")).as("__top"))
        .select(col("source"), posexplode(col("__top.items.id")))
        .join(broadcast(quotas), "source")
        .filter(col("pos") < col("quota"))
        .select(col("source"), col("col").as("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }, Some(s"""
      WITH tok AS (SELECT source, doc_id FROM documents),
      per AS (SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(len($duckToks)) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source),
      mn AS (SELECT MIN(n_tokens) AS min_tokens FROM per),
      q AS (SELECT source,
                   CAST(floor(n_docs * sqrt(CAST(min_tokens AS DOUBLE) / n_tokens)) AS BIGINT) AS quota
            FROM per CROSS JOIN mn),
      r AS (SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
            FROM tok)
      SELECT r.source, r.doc_id FROM r JOIN q USING (source)
      WHERE r.rn <= q.quota ORDER BY r.source, r.doc_id""")),

    // --------------------------------------- Gopher repetition filters
    // The n-gram repetition signals Gopher/MassiveText gate on: fraction
    // of characters covered by the most frequent 2-gram and by ALL
    // duplicated (count ≥ 2) 3-grams. Entirely map-side per document —
    // overlapping n-grams, one array_sort + run-length pass per width
    // (the linted one-pass plan, same as max_tf in x_gopher_rules) — so
    // the corpus never shuffles; char counts are exact longs and each
    // fraction is ONE double division, bit-identical cross-engine.
    // "Most frequent" is made tie-proof by taking MAX over count·len
    // directly (the gated quantity), not argmax of count.
    Q("x_repetition", (s, d) => {
      def grams(n: Int) =
        if (n == 1) "toks"
        else s"""if(size(toks) < $n, array(),
                |  transform(sequence(1, size(toks) - ${n - 1}),
                |    i -> concat_ws(' ', slice(toks, i, $n))))""".stripMargin
      fanOut(documents(s, d))
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("total_chars", expr("length(lower(text))").cast("long"))
        .withColumn("__s2", expr(s"array_sort(${grams(2)})"))
        .withColumn("__e2", expr(graft.operators.Ranking.runEndsSql("__s2")))
        .withColumn("top2_chars", expr(
          s"""CAST(coalesce(array_max(transform(__e2, (e, j) ->
             |  CAST(e - if(j = 0, 0, element_at(__e2, j)) AS BIGINT)
             |    * length(element_at(__s2, e)))), 0L) AS BIGINT)""".stripMargin))
        .withColumn("__s3", expr(s"array_sort(${grams(3)})"))
        .withColumn("__e3", expr(graft.operators.Ranking.runEndsSql("__s3")))
        .withColumn("dup3_chars", expr(
          s"""CAST(aggregate(transform(__e3, (e, j) ->
             |    named_struct('c', e - if(j = 0, 0, element_at(__e3, j)),
             |                 'l', length(element_at(__s3, e)))),
             |    0L, (acc, r) -> acc + if(r.c >= 2, CAST(r.c AS BIGINT) * r.l, 0L))
             |  AS BIGINT)""".stripMargin))
        .select(col("doc_id"), col("total_chars"), col("top2_chars"),
          col("dup3_chars"),
          expr("CAST(top2_chars AS DOUBLE) / total_chars").as("frac_top2"),
          expr("CAST(dup3_chars AS DOUBLE) / total_chars").as("frac_dup3"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks,
                        CAST(length(lower(text)) AS BIGINT) AS total_chars
                 FROM documents),
      g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS g FROM t),
      c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, g),
      m2 AS (SELECT doc_id, CAST(MAX(cnt * length(g)) AS BIGINT) AS top2_chars
             FROM c2 GROUP BY doc_id),
      g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g FROM t),
      c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, g),
      m3 AS (SELECT doc_id,
                    COALESCE(CAST(SUM(CASE WHEN cnt >= 2
                                           THEN cnt * length(g) END) AS BIGINT), 0)
                      AS dup3_chars
             FROM c3 GROUP BY doc_id)
      SELECT t.doc_id, t.total_chars,
             COALESCE(m2.top2_chars, 0) AS top2_chars,
             COALESCE(m3.dup3_chars, 0) AS dup3_chars,
             CAST(COALESCE(m2.top2_chars, 0) AS DOUBLE) / t.total_chars AS frac_top2,
             CAST(COALESCE(m3.dup3_chars, 0) AS DOUBLE) / t.total_chars AS frac_dup3
      FROM t LEFT JOIN m2 ON t.doc_id = m2.doc_id
             LEFT JOIN m3 ON t.doc_id = m3.doc_id
      ORDER BY t.doc_id""")),

    // ------------------------------- n-gram LM quality scores (perplexity)
    // The CCNet/Gopher LM-perplexity filter restated in exact integers
    // (graft.operators.Ranking.lmQualityScores): a bigram LM trained on
    // the corpus itself, each document scored by its average per-bigram
    // surprisal surrogate bits(ctx(prev)) − bits(cnt(ng)) — the
    // integer-⌊log2⌋ of 1/p(cur|prev) (no ln/exp: libm is not
    // bit-portable; the ⌊log2⌋ is within 1 bit and monotone, which is
    // what a keep-threshold consumes). LOW bits_per_gram = fluent under
    // the corpus LM, HIGH = gibberish. Plan: the map-side bigram tf
    // projection stages ONCE and feeds the LM rollups (vocab-sized,
    // broadcast back) and the scoring join — one corpus scan, one
    // per-doc shuffle. Docs with < 2 tokens drop (nothing to score).
    Q("x_quality_lm", (s, d) => {
      graft.operators.Ranking.lmQualityScores(fanOut(documents(s, d)),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    }, headline = true, oracle = Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents
                 WHERE text IS NOT NULL),
      bo AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2),
      tf AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
             FROM bo GROUP BY doc_id, ng),
      lm AS (SELECT ng, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY ng),
      cx AS (SELECT string_split(ng, ' ')[1] AS prev,
                    CAST(SUM(cnt) AS BIGINT) AS ctx
             FROM lm GROUP BY string_split(ng, ' ')[1]),
      sc AS (SELECT tf.doc_id,
                    CAST(SUM(tf.tf * (length(bin(cx.ctx)) - length(bin(lm.cnt))))
                         AS BIGINT) AS cost_bits,
                    CAST(SUM(tf.tf) AS BIGINT) AS n_grams
             FROM tf
             JOIN lm ON tf.ng = lm.ng
             JOIN cx ON string_split(tf.ng, ' ')[1] = cx.prev
             GROUP BY tf.doc_id)
      SELECT doc_id, cost_bits, n_grams,
             CAST(cost_bits AS DOUBLE) / n_grams AS bits_per_gram
      FROM sc ORDER BY doc_id""")),

    // ------------------------------------ 5-gram LM quality scores (CCNet n)
    // The SAME integer-surprisal LM filter at CCNet's published order
    // (5-gram KenLM): Ranking.lmQualityScores(n = 5) — the generalized
    // ngramFrequencies/ngramLm/scoreAgainstLm path where the context is
    // the (n−1)-gram PREFIX (engine: concat_ws over slice; oracle:
    // array_to_string over the 1:4 list slice — identical strings).
    // Plan identical to x_quality_lm: one staged gram projection feeds
    // the LM rollups and the scoring join; docs with < 5 tokens drop.
    // At order 5 most grams are singletons in their context, so scores
    // compress toward 0 bits on a self-trained corpus — the stated
    // singleton-context caveat, WHY the discriminative deployment
    // (x_quality_lm_incremental) is the shape that matters; this query
    // pins the order-n machinery end to end.
    Q("x_quality_lm5", (s, d) => {
      graft.operators.Ranking.lmQualityScores(fanOut(documents(s, d)),
        "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents
                 WHERE text IS NOT NULL),
      bo AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i:i+4], ' '))) AS ng
             FROM t WHERE len(toks) >= 5),
      tf AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
             FROM bo GROUP BY doc_id, ng),
      lm AS (SELECT ng, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY ng),
      cx AS (SELECT array_to_string(string_split(ng, ' ')[1:4], ' ') AS prev,
                    CAST(SUM(cnt) AS BIGINT) AS ctx
             FROM lm GROUP BY array_to_string(string_split(ng, ' ')[1:4], ' ')),
      sc AS (SELECT tf.doc_id,
                    CAST(SUM(tf.tf * (length(bin(cx.ctx)) - length(bin(lm.cnt))))
                         AS BIGINT) AS cost_bits,
                    CAST(SUM(tf.tf) AS BIGINT) AS n_grams
             FROM tf
             JOIN lm ON tf.ng = lm.ng
             JOIN cx ON array_to_string(string_split(tf.ng, ' ')[1:4], ' ') = cx.prev
             GROUP BY tf.doc_id)
      SELECT doc_id, cost_bits, n_grams,
             CAST(cost_bits AS DOUBLE) / n_grams AS bits_per_gram
      FROM sc ORDER BY doc_id""")),

    // -------------------------- CCNet head/middle/tail perplexity buckets
    // The published CCNet split (Wenzek et al. 2020 §3.3): per language,
    // documents partition into head (best third by LM score), middle,
    // and tail at the 1/3 and 2/3 PERCENTILES of the per-doc score —
    // downstream mixes train on head+middle and drop (or down-weight)
    // the tail. Composition of audited pieces: integer LM surprisal
    // (Ranking.lmQualityScores; score100 = (100·cost_bits) div n_grams
    // — one integer per doc, bounded domain) → per-lang exact discrete
    // percentiles over the (lang, score100) HISTOGRAM
    // (Quantiles.groupPercentilesDisc — the window sees one row per
    // distinct score, never the corpus) → broadcast threshold attach +
    // one CASE projection. Percentile positions use the same double
    // literals in both engines (ceil of one IEEE product — bitwise).
    // Docs with < 2 tokens never score (the LM contract) and drop here.
    Q("x_quality_ccnet", (s, d) => {
      val sc = graft.operators.Ranking.lmQualityScores(
        fanOut(documents(s, d)), "doc_id", "text")
        .select(col("doc_id"), expr("(100L * cost_bits) div n_grams").as("score100"))
      // staged: the LM-scoring subtree feeds BOTH the threshold
      // computation and the output join — unstaged, Spark re-executes
      // it per reference (the x_pipeline_modern lesson; measured here
      // as a doubled plan, 15 exchanges → 8).
      val scored = graft.sources.Tables.stage(
        documents(s, d).select(col("doc_id"), col("lang")).join(sc, "doc_id"))
      val th = graft.operators.Quantiles.groupPercentilesDisc(
        scored, "lang", "score100",
        Seq("p33" -> (1.0 / 3.0), "p66" -> (2.0 / 3.0)))
      scored.join(broadcast(th), "lang")
        .withColumn("bucket", expr(
          """CASE WHEN score100 <= p33 THEN 'head'
            |     WHEN score100 <= p66 THEN 'middle'
            |     ELSE 'tail' END""".stripMargin))
        .select(col("doc_id"), col("lang"), col("score100"), col("bucket"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents
                 WHERE text IS NOT NULL),
      bo AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2),
      tf AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
             FROM bo GROUP BY doc_id, ng),
      lm AS (SELECT ng, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY ng),
      cx AS (SELECT string_split(ng, ' ')[1] AS prev,
                    CAST(SUM(cnt) AS BIGINT) AS ctx
             FROM lm GROUP BY string_split(ng, ' ')[1]),
      sc AS (SELECT tf.doc_id,
                    CAST(SUM(tf.tf * (length(bin(cx.ctx)) - length(bin(lm.cnt))))
                         AS BIGINT) AS cost_bits,
                    CAST(SUM(tf.tf) AS BIGINT) AS n_grams
             FROM tf
             JOIN lm ON tf.ng = lm.ng
             JOIN cx ON string_split(tf.ng, ' ')[1] = cx.prev
             GROUP BY tf.doc_id),
      s100 AS (SELECT sc.doc_id, d.lang,
                      (100 * cost_bits) // n_grams AS score100
               FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
      ranked AS (SELECT lang, score100,
                        row_number() OVER (PARTITION BY lang
                          ORDER BY score100) AS rn,
                        COUNT(*) OVER (PARTITION BY lang) AS n
                 FROM s100),
      th AS (SELECT lang,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.3333333333333333) AS BIGINT)
                             THEN score100 END) AS p33,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.6666666666666666) AS BIGINT)
                             THEN score100 END) AS p66
             FROM ranked GROUP BY lang)
      SELECT s.doc_id, s.lang, s.score100,
             CASE WHEN s.score100 <= th.p33 THEN 'head'
                  WHEN s.score100 <= th.p66 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM s100 s JOIN th USING (lang)
      ORDER BY s.doc_id"""), headline = true),

    // ------------------- CCNet buckets on the DERIVED language (composed)
    // The full CCNet §3 deployment: a real pipeline never reads a lang
    // column — it DERIVES one. Composition: trained char-trigram lang-id
    // (Ranking.langId over the rotated-alphabet fixture — the
    // x_lang_id_trained machinery, seed-labeled 2/7) → integer LM
    // surprisal over the SAME transformed text → per-DERIVED-lang exact
    // head/middle/tail percentile buckets (the x_quality_ccnet
    // machinery keyed on lang_pred instead of the fixture column). The
    // scored relation stages once (thresholds + bucket join — the
    // ccnet lesson); the lang-id feature relation stages inside langId.
    Q("x_quality_ccnet_derived", (s, d) => {
      import graft.operators.{Quantiles, Ranking}
      val base = fanOut(documents(s, d)).filter(col("text").isNotNull)
        .withColumn("__lt", expr(TextAnalysis.langXformSql))
        .withColumn("__lbl", expr(TextAnalysis.langSeedSql))
      val pred = Ranking.langId(base, "doc_id", "__lt", col("__lbl"))
        .select(col("doc_id"), col("lang_pred"))
      val sc = Ranking.lmQualityScores(base, "doc_id", "__lt")
        .select(col("doc_id"),
          expr("(100L * cost_bits) div n_grams").as("score100"))
      val scored = graft.sources.Tables.stage(pred.join(sc, "doc_id"))
      val th = Quantiles.groupPercentilesDisc(
        scored, "lang_pred", "score100",
        Seq("p33" -> (1.0 / 3.0), "p66" -> (2.0 / 3.0)))
      scored.join(broadcast(th), "lang_pred")
        .withColumn("bucket", expr(
          """CASE WHEN score100 <= p33 THEN 'head'
            |     WHEN score100 <= p66 THEN 'middle'
            |     ELSE 'tail' END""".stripMargin))
        .select(col("doc_id"), col("lang_pred"), col("score100"),
          col("bucket"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH lsrc AS MATERIALIZED (
        SELECT doc_id, ${TextAnalysis.langXformSql} AS lt,
               ${TextAnalysis.langSeedSql} AS lang
        FROM documents WHERE text IS NOT NULL),
      ${graft.operators.Ranking.duckLangCtes("lsrc")},
      t AS (SELECT doc_id, string_split(lt, ' ') AS toks FROM lsrc),
      bo AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2),
      tf AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
             FROM bo GROUP BY doc_id, ng),
      lm AS (SELECT ng, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY ng),
      cx AS (SELECT string_split(ng, ' ')[1] AS prev,
                    CAST(SUM(cnt) AS BIGINT) AS ctx
             FROM lm GROUP BY string_split(ng, ' ')[1]),
      sc AS (SELECT tf.doc_id,
                    CAST(SUM(tf.tf * (length(bin(cx.ctx)) - length(bin(lm.cnt))))
                         AS BIGINT) AS cost_bits,
                    CAST(SUM(tf.tf) AS BIGINT) AS n_grams
             FROM tf
             JOIN lm ON tf.ng = lm.ng
             JOIN cx ON string_split(tf.ng, ' ')[1] = cx.prev
             GROUP BY tf.doc_id),
      s100 AS (SELECT sc.doc_id, p.lang_pred,
                      (100 * cost_bits) // n_grams AS score100
               FROM sc JOIN lpick p ON p.doc_id = sc.doc_id),
      ranked AS (SELECT lang_pred, score100,
                        row_number() OVER (PARTITION BY lang_pred
                          ORDER BY score100) AS rn,
                        COUNT(*) OVER (PARTITION BY lang_pred) AS n
                 FROM s100),
      th AS (SELECT lang_pred,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.3333333333333333) AS BIGINT)
                             THEN score100 END) AS p33,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.6666666666666666) AS BIGINT)
                             THEN score100 END) AS p66
             FROM ranked GROUP BY lang_pred)
      SELECT s.doc_id, s.lang_pred, s.score100,
             CASE WHEN s.score100 <= th.p33 THEN 'head'
                  WHEN s.score100 <= th.p66 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM s100 s JOIN th USING (lang_pred)
      ORDER BY s.doc_id"""), headline = true),

    // ---------------- CCNet proper: PER-LANGUAGE reference LMs (composed)
    // Wenzek 2020 §3 trains ONE LM PER LANGUAGE on the curated
    // reference and scores candidates against THEIR OWN language's
    // model — the per-key generalization of x_quality_lm_incremental
    // composed with the derived lang: trained lang-id over the whole
    // corpus (seed 2/7) → per-DERIVED-lang LMs from the reference
    // subset (doc_id % 10 ≠ 0) → candidates (doc_id % 10 = 0) score
    // against their lang's LM (Ranking.scoreAgainstLmByKey — each doc
    // pays its own model's surprisal AND its own model's OOV floor
    // bits(total_lang)+1) → per-lang head/middle/tail buckets over the
    // candidate scores. Staged: the lang predictions (two tf attaches),
    // the keyed vocab rollup (inside ngramLmByKey — cx/tot re-derive
    // from it), the scored relation (thresholds + bucket join).
    Q("x_quality_ccnet_perlang", (s, d) => {
      import graft.operators.{Quantiles, Ranking}
      val base = fanOut(documents(s, d)).filter(col("text").isNotNull)
        .withColumn("__lt", expr(TextAnalysis.langXformSql))
        .withColumn("__lbl", expr(TextAnalysis.langSeedSql))
      val pred = graft.sources.Tables.stage(
        Ranking.langId(base, "doc_id", "__lt", col("__lbl"))
          .select(col("doc_id"), col("lang_pred")))
      // UNSTAGED (r18): since r17 moved cx/tot onto the staged keyed
      // vocab rollup inside ngramLmByKey, the reference tf has exactly
      // ONE consumer (the lm staging) — its own checkpoint bought
      // nothing and cost a full staged execution (ProbeMetrics: 0.63 s
      // wall for the redundant materialization).
      val rtf = Ranking.bigramFrequencies(
        base.filter(col("doc_id") % 10 =!= 0), "doc_id", "__lt")
        .join(pred, "doc_id")
      val (lm, cx, tot) = Ranking.ngramLmByKey(rtf, "lang_pred")
      val ctf = Ranking.bigramFrequencies(
        base.filter(col("doc_id") % 10 === 0), "doc_id", "__lt")
        .join(pred, "doc_id")
      val scored = graft.sources.Tables.stage(
        Ranking.scoreAgainstLmByKey(ctf, "lang_pred", lm, cx, tot)
          .select(col("doc_id"), col("lang_pred"),
            expr("(100L * cost_bits) div n_grams").as("score100")))
      val th = Quantiles.groupPercentilesDisc(
        scored, "lang_pred", "score100",
        Seq("p33" -> (1.0 / 3.0), "p66" -> (2.0 / 3.0)))
      scored.join(broadcast(th), "lang_pred")
        .withColumn("bucket", expr(
          """CASE WHEN score100 <= p33 THEN 'head'
            |     WHEN score100 <= p66 THEN 'middle'
            |     ELSE 'tail' END""".stripMargin))
        .select(col("doc_id"), col("lang_pred"), col("score100"),
          col("bucket"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH lsrc AS MATERIALIZED (
        SELECT doc_id, ${TextAnalysis.langXformSql} AS lt,
               ${TextAnalysis.langSeedSql} AS lang
        FROM documents WHERE text IS NOT NULL),
      ${graft.operators.Ranking.duckLangCtes("lsrc")},
      t AS (SELECT doc_id, string_split(lt, ' ') AS toks FROM lsrc),
      bo AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2),
      tfx AS MATERIALIZED (
        SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
        FROM bo GROUP BY doc_id, ng),
      rtf AS MATERIALIZED (
        SELECT p.lang_pred, f.doc_id, f.ng, f.tf
        FROM tfx f JOIN lpick p USING (doc_id)
        WHERE f.doc_id % 10 <> 0),
      lmk AS MATERIALIZED (
        SELECT lang_pred, ng, CAST(SUM(tf) AS BIGINT) AS cnt
        FROM rtf GROUP BY lang_pred, ng),
      cxk AS (SELECT lang_pred, string_split(ng, ' ')[1] AS prev,
                     CAST(SUM(cnt) AS BIGINT) AS ctx
              FROM lmk GROUP BY lang_pred, string_split(ng, ' ')[1]),
      totk AS (SELECT lang_pred, CAST(SUM(cnt) AS BIGINT) AS total
               FROM lmk GROUP BY lang_pred),
      sc AS (SELECT c.doc_id, c.lang_pred,
                    CAST(SUM(c.tf * (CASE WHEN l.cnt IS NULL
                           THEN length(bin(t2.total)) + 1
                           ELSE length(bin(x.ctx)) - length(bin(l.cnt))
                           END)) AS BIGINT) AS cost_bits,
                    CAST(SUM(c.tf) AS BIGINT) AS n_grams
             FROM (SELECT p.lang_pred, f.doc_id, f.ng, f.tf
                   FROM tfx f JOIN lpick p USING (doc_id)
                   WHERE f.doc_id % 10 = 0) c
             LEFT JOIN lmk l
               ON l.lang_pred = c.lang_pred AND l.ng = c.ng
             LEFT JOIN cxk x
               ON x.lang_pred = c.lang_pred
              AND x.prev = string_split(c.ng, ' ')[1]
             JOIN totk t2 ON t2.lang_pred = c.lang_pred
             GROUP BY c.doc_id, c.lang_pred),
      s100 AS (SELECT doc_id, lang_pred,
                      (100 * cost_bits) // n_grams AS score100
               FROM sc),
      ranked AS (SELECT lang_pred, score100,
                        row_number() OVER (PARTITION BY lang_pred
                          ORDER BY score100) AS rn,
                        COUNT(*) OVER (PARTITION BY lang_pred) AS n
                 FROM s100),
      th AS (SELECT lang_pred,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.3333333333333333) AS BIGINT)
                             THEN score100 END) AS p33,
                    MIN(CASE WHEN rn = CAST(ceil(n * 0.6666666666666666) AS BIGINT)
                             THEN score100 END) AS p66
             FROM ranked GROUP BY lang_pred)
      SELECT s.doc_id, s.lang_pred, s.score100,
             CASE WHEN s.score100 <= th.p33 THEN 'head'
                  WHEN s.score100 <= th.p66 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM s100 s JOIN th USING (lang_pred)
      ORDER BY s.doc_id"""), headline = true),

    // ----------------------- LM scoring, reference → candidates (gate twin)
    // The DISCRIMINATIVE deployment (CCNet's): the LM trains on a curated
    // reference (doc_id % 10 <> 0), candidates (doc_id % 10 = 0) score
    // against the FROZEN model — a bigram the reference never saw pays
    // the OOV floor bits(total) + 1, so novel/gibberish text scores HIGH
    // where the self-trained form's singleton-context caveat would let
    // it through. Candidate bigrams project UNSTAGED (the streaming
    // contract — micro-batches must score without a staging write);
    // streamed batches through a future LM gate would emit exactly these
    // rows.
    Q("x_quality_lm_incremental", (s, d) => {
      import graft.operators.Ranking
      val docs = fanOut(documents(s, d))
      // UNSTAGED (r18): since r17 moved cx/tot onto ngramLm's staged
      // vocab rollup, the reference tf has exactly ONE consumer (the lm
      // staging) — its checkpoint bought nothing (candidates score via
      // their own unstaged projection below).
      val tf = Ranking.bigramFrequencies(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      val (lm, cx, tot) = Ranking.ngramLm(tf)
      Ranking.scoreAgainstLm(
        Ranking.bigramFrequencies(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text"),
        lm, cx, tot)
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents
                 WHERE text IS NOT NULL),
      rb AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2 AND doc_id % 10 <> 0),
      tfr AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
              FROM rb GROUP BY doc_id, ng),
      lm AS (SELECT ng, CAST(SUM(tf) AS BIGINT) AS cnt FROM tfr GROUP BY ng),
      cx AS (SELECT string_split(ng, ' ')[1] AS prev,
                    CAST(SUM(cnt) AS BIGINT) AS ctx
             FROM lm GROUP BY string_split(ng, ' ')[1]),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM lm),
      cb AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS ng
             FROM t WHERE len(toks) >= 2 AND doc_id % 10 = 0),
      tfc AS (SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS tf
              FROM cb GROUP BY doc_id, ng),
      sc AS (SELECT tfc.doc_id,
                    CAST(SUM(tfc.tf *
                      (CASE WHEN lm.cnt IS NULL THEN length(bin(tot.total)) + 1
                            ELSE length(bin(cx.ctx)) - length(bin(lm.cnt))
                       END)) AS BIGINT) AS cost_bits,
                    CAST(SUM(tfc.tf) AS BIGINT) AS n_grams
             FROM tfc
             LEFT JOIN lm ON tfc.ng = lm.ng
             LEFT JOIN cx ON string_split(tfc.ng, ' ')[1] = cx.prev
             CROSS JOIN tot
             GROUP BY tfc.doc_id)
      SELECT doc_id, cost_bits, n_grams,
             CAST(cost_bits AS DOUBLE) / n_grams AS bits_per_gram
      FROM sc ORDER BY doc_id""")),

    // -------------------------- incremental quantile threshold (gate twin)
    // graft.streaming.QuantileIngest's batch-expressible core, oracle-
    // pinned like the other *_incremental gate queries: the corpus
    // (doc_id % 10 <> 0) builds an EXACT mergeable length histogram
    // (TypedAggregators.BoundedHistogram), the batch (doc_id % 10 = 0)
    // is gated on that PRE-batch percentile_disc threshold and then
    // FOLDS in — the post-fold threshold must be IDENTICAL to a full
    // recompute over corpus ∪ batch, which is exactly what the oracle
    // restates (the merged-histogram read-off vs DuckDB's cumulative
    // count over everything). Integer-exact end to end: values are
    // n_chars, the rank is ceil(n·p) with p = 0.5 (exact in both
    // engines' doubles), thresholds are actual data values.
    Q("x_quantile_incremental", (s, d) => {
      import graft.streaming.QuantileIngest
      val docs = documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("score"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val st = QuantileIngest.buildState(corpus, "score", p = 0.5)
      val thrPre = st.threshold.get
      val (_, next) = QuantileIngest.foldBatch(batch, st, "score", batchId = 0L)
      batch
        .withColumn("kept",
          expr(s"CAST(CASE WHEN score >= ${thrPre}L THEN 1 ELSE 0 END AS BIGINT)"))
        .withColumn("thr_pre", lit(thrPre))
        .withColumn("thr_post", lit(next.threshold.get))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH sc AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS score FROM documents),
      corp AS (SELECT score FROM sc WHERE doc_id % 10 <> 0),
      tpre AS (SELECT MIN(score) AS t FROM (
        SELECT score,
               CAST(SUM(COUNT(*)) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               (SELECT COUNT(*) FROM corp) AS n
        FROM corp GROUP BY score)
        WHERE cum >= CAST(ceil(n * 0.5) AS BIGINT)),
      tpost AS (SELECT MIN(score) AS t FROM (
        SELECT score,
               CAST(SUM(COUNT(*)) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               (SELECT COUNT(*) FROM sc) AS n
        FROM sc GROUP BY score)
        WHERE cum >= CAST(ceil(n * 0.5) AS BIGINT))
      SELECT doc_id, score,
             CAST(CASE WHEN score >= (SELECT t FROM tpre) THEN 1 ELSE 0 END AS BIGINT) AS kept,
             (SELECT t FROM tpre) AS thr_pre,
             (SELECT t FROM tpost) AS thr_post
      FROM sc WHERE doc_id % 10 = 0 ORDER BY doc_id""")),

    // --------------------- KLL quantile sketch: deterministic replay form
    // The UNBOUNDED-domain quantile sketch (TypedAggregators.QuantileSketch
    // — the escape hatch when BoundedHistogram's integer-domain contract
    // can't hold; streaming.QuantileIngest folds it per batch). The
    // summary is partitioning-dependent in general, so what the oracle
    // pins is the sketch's DETERMINISTIC REPLAY FORM: single partition,
    // insertion in doc_id order (kllSketchOrdered) over a frozen 24-value
    // input with k = 8, where the alternating-parity compactor's full
    // trace is statable in closed form — compactions at inserts 8
    // (offset 0), 16 (offset 1, cascading level 1 → 2 at offset 0) and 24
    // (offset 0): the final summary is 4 level-1 survivors at weight 2
    // plus 4 level-2 survivors at weight 4 (TypedAggregatorSpec pins the
    // same trace in Scala). Values n_chars·100 + doc_id are globally
    // distinct, so stable-sort ties never arise in either engine.
    // quantile(q) = smallest summarized value whose cumulative weight
    // reaches ceil(n·q) — integer-exact. The 24-row fixture is the
    // CONTRACT (a closed-form trace needs a frozen insertion sequence);
    // scale behavior is owned by the distributed aggregator's bound spec.
    Q("x_quantile_sketch", (s, d) => {
      import s.implicits._
      val vals = documents(s, d).filter(col("doc_id") < 24)
        .select(col("doc_id"),
          (col("n_chars") * 100 + col("doc_id")).cast("double").as("v"))
        .as[(Long, Double)]
      vals.repartition(1).mapPartitions { it =>
        val ordered = it.toSeq.sortBy(_._1).map(_._2)
        val sm = graft.operators.TypedAggregators.kllSketchOrdered(ordered, 8)
        Iterator((
          sm.items.map(x => s"${x.v.toLong}:${x.w}").mkString(","),
          sm.n, sm.quantile(0.25).toLong, sm.quantile(0.5).toLong,
          sm.quantile(0.9).toLong))
      }.toDF("summary", "n", "q25", "q50", "q90")
    }, Some("""
      WITH src AS (
        SELECT doc_id, CAST(n_chars * 100 + doc_id AS BIGINT) AS v,
               row_number() OVER (ORDER BY doc_id) AS ins
        FROM documents WHERE doc_id < 24),
      g1 AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
             FROM src WHERE ins BETWEEN 1 AND 8),
      c1 AS (SELECT v FROM g1 WHERE r % 2 = 0),
      g2 AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
             FROM src WHERE ins BETWEEN 9 AND 16),
      c2 AS (SELECT v FROM g2 WHERE r % 2 = 1),
      l2g AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
              FROM (SELECT v FROM c1 UNION ALL SELECT v FROM c2)),
      l2 AS (SELECT v, CAST(4 AS BIGINT) AS w FROM l2g WHERE r % 2 = 0),
      g3 AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
             FROM src WHERE ins BETWEEN 17 AND 24),
      l1 AS (SELECT v, CAST(2 AS BIGINT) AS w FROM g3 WHERE r % 2 = 0),
      items AS (SELECT v, w FROM l1 UNION ALL SELECT v, w FROM l2),
      ordered AS (SELECT v, w,
                         CAST(SUM(w) OVER (ORDER BY v, w
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                  FROM items),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM src)
      SELECT (SELECT string_agg(v || ':' || w, ',' ORDER BY v, w) FROM ordered) AS summary,
             (SELECT n FROM tot) AS n,
             (SELECT MIN(v) FROM ordered
              WHERE cum >= CAST(ceil((SELECT n FROM tot) * 0.25) AS BIGINT)) AS q25,
             (SELECT MIN(v) FROM ordered
              WHERE cum >= CAST(ceil((SELECT n FROM tot) * 0.5) AS BIGINT)) AS q50,
             (SELECT MIN(v) FROM ordered
              WHERE cum >= CAST(ceil((SELECT n FROM tot) * 0.9) AS BIGINT)) AS q90"""))
  )
}
