package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** End-to-end training-data curation pipeline — the composition every
  * individual operator in this engine exists for, as ONE oracle-checked
  * query:
  *
  *   1. language gate (stopword lang-ID = 'en')          — per-row, no shuffle
  *   2. quality gate (length + lexical-diversity floors)  — per-row, no shuffle
  *   3. exact dedup (keep smallest doc_id per digest)     — 1 shuffle (digest)
  *   4. near-dup removal (MinHash+LSH pairs → drop the
  *      larger id of every verified pair)                 — band join on survivors
  *   5. emit curated ids + quality features               — final order only
  *
  * Plan shape at 100 TB: stages 1–2 fuse into the scan projection
  * (whole-stage codegen, linear); stage 3 shuffles 16-byte digests, never
  * text; stage 4 runs on the post-gate survivor set (already a fraction of
  * the corpus) through the staged signature relation and short-key band
  * join; nothing ever pairs the full corpus quadratically.
  */
object Pipeline {

  /** Same sequential-fold dot product as Similarity.duckDot (64-dim) —
    * the FP op sequence both engines share bitwise. */
  private def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** DuckDB-side (redacted, per-class counts) exprs over k1's `text`
    * for the crawl pipeline's PII stage. */
  private val crawlPii = graft.operators.Pii.itemsSql("text", duck = true)

  /** The crawl pipeline's synthetic page relation (doc_id, url, __html)
    * — shared by x_pipeline_crawl (parquet-built pages) and
    * x_pipeline_warc (the same pages round-tripped through WARC).
    * doc_id % 5 = 4 pages republish the previous doc's body on a
    * DIFFERENT domain (cap×dedup interaction); doc_id % 10 = 0 pages
    * live on the one messy-spelled seo-farm domain. UNSTAGED — each
    * caller stages (or writes) it once. */
  private def crawlPages(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val prev = base.select((col("doc_id") + 1).as("doc_id"),
      col("text").as("__ptext"))
    fanOut(base.join(prev, Seq("doc_id"), "left")
      .withColumn("__page", expr(
        "IF(doc_id % 5 = 4 AND __ptext IS NOT NULL, __ptext, text)")))
      .withColumn("url", expr(
        """IF(doc_id % 10 = 0,
          |   concat('https://Seo.Farm.COM:443/p', CAST(doc_id AS STRING),
          |          '/?utm_source=x&id=', CAST(doc_id AS STRING)),
          |   concat('https://www.site', CAST(doc_id % 97 AS STRING),
          |          '.co.uk/d/', CAST(doc_id AS STRING)))""".stripMargin))
      .withColumn("__t", expr("split(__page, ' ')"))
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
          |'<p>contact admin', CAST(doc_id AS STRING), '@site',
          |CAST(doc_id % 97 AS STRING), '.co.uk from 10.',
          |CAST(doc_id % 256 AS STRING), '.0.', CAST(doc_id % 100 AS STRING),
          |IF(length(__page) % 2 = 0, ' and ops@example.org', ''),
          |' for info</p>',
          |'<p><a href="/next">next page</a></p>',
          |'</body></html>')""".stripMargin))
      .select(col("doc_id"), col("url"), col("__html"))
  }

  /** The crawl chain downstream of the page relation: canonicalize →
    * per-domain cap 25 → extract on survivors → structure gate → PII
    * redaction → self-trained LM gate → exact dedup on redacted text.
    * `pages` must be STAGED by the caller (it feeds the cap AND the
    * extract join). Plan notes on x_pipeline_crawl's Q entry. */
  private def crawlChain(pages: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.operators.{Html, Ranking, Web}
    // the cap output feeds the extract join AND the final domain
    // attach — stage it or the min-k aggregation re-runs per consumer.
    val kept = stage(Web.capPerDomain(
      pages.select(col("doc_id"), col("url")), "url", "doc_id", cap = 25))
    // extraction UNSTAGED (r18): its only consumer is the redaction
    // staging (through the structure gate), so the extract chain
    // executes exactly once inside red's checkpoint — its own staging
    // was a whole extra execution buying no reuse (contrast
    // x_pipeline_web, where k1 feeds TWO consumers and ext stays
    // staged).
    val ext = Html.extractText(
      pages.join(kept.select(col("doc_id")), Seq("doc_id")),
      "doc_id", "__html", minChars = 10, maxDensityPct = 34)
    val k1 = ext.filter(col("n_kept") >= 2)
    // redact BEFORE the LM and the digest — staged once (it feeds
    // the LM tf relation AND the dedup digest; unstaged, the regex
    // scrub re-runs per consumer).
    val red = stage(graft.operators.Pii.withRedacted(k1, "text",
      out = "rtext")
      .select(col("doc_id"), col("rtext"),
        graft.operators.Pii.Classes.map(c => col(c._3))
          .reduce(_ + _).as("n_pii")))
    val tf = stage(Ranking.bigramFrequencies(red, "doc_id", "rtext"))
    val (lm, cx, tot) = Ranking.ngramLm(tf)
    val k2 = red.join(
      Ranking.scoreAgainstLm(tf, lm, cx, tot)
        .filter(expr("cost_bits * 100 <= n_grams * 400"))
        .select(col("doc_id"), col("cost_bits"), col("n_grams")),
      "doc_id")
    val dg = stage(k2.withColumn("digest", md5(col("rtext")))
      .select(col("doc_id"), col("digest"), col("cost_bits"),
        col("n_grams"), col("n_pii")))
    val canon = dg.groupBy(col("digest")).agg(
      min(col("doc_id")).as("doc_id"),
      count(lit(1)).cast("long").as("n_copies"))
    dg.join(canon, Seq("digest", "doc_id"))
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("domain"), col("cost_bits"),
        col("n_grams"), col("n_pii"), col("digest"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** One oracle for both crawl-pipeline queries — x_pipeline_warc's
    * claim is exactly that the WARC round trip is the identity. */
  private lazy val crawlOracle = s"""
      WITH src AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 5 = 4 AND p.text IS NOT NULL
                    THEN p.text ELSE d.text END AS ptext
        FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
      toks AS (SELECT doc_id, string_split(ptext, ' ') AS t,
                      length(ptext) AS plen
               FROM src WHERE ptext IS NOT NULL),
      urls AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN 'farm.com'
                    ELSE 'site' || CAST(doc_id % 97 AS VARCHAR) || '.co.uk'
               END AS domain
        FROM toks),
      r AS (SELECT domain, doc_id,
                   row_number() OVER (PARTITION BY domain
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM urls),
      kept AS (SELECT domain, doc_id FROM r WHERE rk <= 25),
      pages AS (
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
          '<p>contact admin' || CAST(doc_id AS VARCHAR) || '@site' ||
          CAST(doc_id % 97 AS VARCHAR) || '.co.uk from 10.' ||
          CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
          CAST(doc_id % 100 AS VARCHAR) ||
          CASE WHEN plen % 2 = 0 THEN ' and ops@example.org' ELSE '' END ||
          ' for info</p>' ||
          '<p><a href="/next">next page</a></p>' ||
          '</body></html>' AS h
        FROM toks),
      __html_src AS (
        SELECT p.doc_id, p.h FROM pages p JOIN kept k ON p.doc_id = k.doc_id),
      ext AS (
        SELECT doc_id, ${graft.operators.Html.duckExtractItems("h", 10, 34)}),
      k1 AS (SELECT doc_id, text FROM ext WHERE n_kept >= 2),
      rd AS MATERIALIZED (
        SELECT doc_id, ${crawlPii._1} AS rtext,
               ${crawlPii._2.mkString(" + ")} AS n_pii
        FROM k1),
      bo AS (SELECT doc_id, unnest(list_transform(
               range(1, len(string_split(lower(rtext), ' '))),
               i -> string_split(lower(rtext), ' ')[i] || ' ' ||
                    string_split(lower(rtext), ' ')[i + 1])) AS ng
             FROM rd WHERE len(string_split(lower(rtext), ' ')) >= 2),
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
      k2 AS (SELECT rd.doc_id, rd.rtext, rd.n_pii, sc.cost_bits, sc.n_grams
             FROM rd JOIN sc ON rd.doc_id = sc.doc_id
             WHERE sc.cost_bits * 100 <= sc.n_grams * 400),
      dgst AS (SELECT doc_id, md5(rtext) AS digest, cost_bits, n_grams, n_pii
               FROM k2),
      canon AS (SELECT digest, MIN(doc_id) AS doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_copies
                FROM dgst GROUP BY digest)
      SELECT g.doc_id, k.domain, g.cost_bits, g.n_grams, g.n_pii,
             g.digest, c.n_copies
      FROM dgst g
      JOIN canon c ON g.digest = c.digest AND g.doc_id = c.doc_id
      JOIN kept k ON g.doc_id = k.doc_id
      ORDER BY g.doc_id"""

  private val stopEn = "'the','a','and','of','to','is'"
  private val stopEs = "'el','la','de','los','y','en'"
  private val stopFr = "'le','les','des','et','un','une'"
  private val stopDe = "'der','die','das','und','ein','zu'"

  val all: Seq[Q] = Seq(
    Q("x_pipeline_curate", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      // stages 1+2: per-row gates, fused into the scan projection.
      val scored = fanOut(documents(s, d))
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("s_en", expr(s"size(filter(toks, t -> t IN ($stopEn)))"))
        .withColumn("s_es", expr(s"size(filter(toks, t -> t IN ($stopEs)))"))
        .withColumn("s_fr", expr(s"size(filter(toks, t -> t IN ($stopFr)))"))
        .withColumn("s_de", expr(s"size(filter(toks, t -> t IN ($stopDe)))"))
        .withColumn("n_tokens", expr("size(toks)"))
        .withColumn("ttr",
          expr("CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)"))
        .filter(expr("s_en >= greatest(s_es, s_fr, s_de)")) // lang gate
        .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3) // quality gate
      // stage 3: exact dedup — only the digest shuffles.
      val canon = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"), col("n_tokens"), col("ttr"))
      // stage 4: near-dup removal among survivors (keep the smaller id of
      // every verified pair — anti-join against the db side).
      val sh = graft.operators.TextDedup
        .shingleRelation(canon.select(col("doc_id"), col("text")), "doc_id", "text", n = 3)
      val dupIds = graft.operators.TextDedup
        .minhashLshPairs(sh, k = 12, bands = 4, threshold = 0.5)
        .select(col("db")).distinct()
      // near-dup ids are by-contract sparse (≪ survivors): broadcast the
      // anti-join's tiny side or the planner SMJs two stats-less staged
      // relations and shuffles every survivor.
      canon.join(broadcast(dupIds), canon("doc_id") === dupIds("db"), "left_anti")
        .select(col("doc_id"), col("n_tokens"), col("ttr"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (
        SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
      sc AS (
        SELECT doc_id, text, toks,
               len(list_filter(toks, x -> x IN ($stopEn))) AS s_en,
               len(list_filter(toks, x -> x IN ($stopEs))) AS s_es,
               len(list_filter(toks, x -> x IN ($stopFr))) AS s_fr,
               len(list_filter(toks, x -> x IN ($stopDe))) AS s_de,
               len(toks) AS n_tokens,
               CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        FROM t),
      gated AS (
        SELECT * FROM sc
        WHERE s_en >= greatest(s_es, s_fr, s_de)
          AND n_tokens >= 20 AND ttr >= 0.3),
      canon AS (
        SELECT doc_id, text, toks, n_tokens, ttr FROM gated
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> array_to_string(toks[i:i+2], ' '))) AS sh
        FROM canon),
      sg AS (SELECT doc_id, sh,
               list_transform(range(0, 12),
                 i -> list_min(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || '|' || s)))) AS sig
             FROM d),
      bd AS (SELECT doc_id,
               unnest(list_transform(range(0, 4),
                 b -> md5(CAST(b AS VARCHAR) || '|' || sig[3*b+1] || sig[3*b+2] || sig[3*b+3]))) AS band_key
             FROM sg),
      cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
               FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      v AS (SELECT da, db,
              len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS inter,
              len(sa.sh) AS na, len(sb.sh) AS nb
            FROM cand JOIN d sa ON da = sa.doc_id JOIN d sb ON db = sb.doc_id),
      dup AS (SELECT DISTINCT db FROM v
              WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5)
      SELECT doc_id, n_tokens, ttr FROM canon
      WHERE doc_id NOT IN (SELECT db FROM dup)
      ORDER BY doc_id""")),

    // --------------------------- MODERN end-to-end curation recipe
    // x_pipeline_curate predates the round-5..10 operator additions; this
    // is the current best-practice chain, composed so the STAGE
    // INTERACTIONS are oracle-pinned (span removal changes classifier
    // features and shingles; canonical selection changes the semantic and
    // mix populations; the mix changes the pack bins):
    //
    //   A. repeated-substring-span REMOVAL (k=8 windows, Lee et al.) —
    //      cleaned text = tokens outside every duplicated span; documents
    //      whose entire content is duplicated spans exit here.
    //   B. fastText-style quality classifier trained AND applied on the
    //      CLEANED text (srcs 0-2 as the curated label) — keep score ≥ 0.
    //   C. MinHash+LSH near-dup clusters on survivors + quality-aware
    //      canonical keep (longest cleaned doc, doc_id tie-break).
    //   D. SemDeDup on the canonical survivors' embeddings (fixed
    //      centroid stand-in vec_id < 8, cosine ≥ 0.45, smaller-id wins).
    //   E. temperature (α=0.5) source mix over the SURVIVOR token mass.
    //   F. BPE-budget pack (budget 512, 8 shards) → per-doc manifest.
    //
    // Plan shape at 100 TB: the cleaned relation stages ONCE (one corpus
    // scan through the span machinery) and every stage reads it or a
    // staged derivative; candidate generation is banded/clustered
    // (never all-pairs); per-stage survivor filters are broadcast
    // semi/anti-joins (pair- and cluster-bounded relations); the output
    // is integer-only, so the oracle compare is exact end-to-end.
    Q("x_pipeline_modern", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = fanOut(documents(s, d))
      // A: span removal. Span relation is duplicated-volume-bounded →
      // broadcast back onto the one corpus scan.
      val spans = graft.operators.TextDedup
        .repeatedSpans(docs, "doc_id", "text", k = 8)
      val spanSets = spans.groupBy(col("doc_id"))
        .agg(collect_list(struct(col("span_start").as("s"),
          col("span_end").as("e"))).as("sp"))
      val clean = stage(docs
        .join(broadcast(spanSets), Seq("doc_id"), "left")
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("ctoks", expr(
          """IF(sp IS NULL, toks,
            |   filter(toks, (t, i) -> NOT exists(sp, z -> i >= z.s AND i <= z.e)))""".stripMargin))
        .filter(size(col("ctoks")) > 0)
        .select(col("doc_id"), col("source"),
          concat_ws(" ", col("ctoks")).as("text_clean"),
          size(col("ctoks")).cast("long").as("n_tokens_clean")))
      // B: classifier on the cleaned text (staged features feed weights
      // AND scoring inside qualityClassifier). Every kept_i survivor
      // relation below STAGES: each is referenced from 2-3 later join
      // sides, and Spark re-executes a lazy subplan per reference (no
      // automatic subplan reuse) — measured at sf0.1, staging the reuse
      // points cut the end-to-end wall 9.1 → 6.4 s (README). `scored`
      // itself is NOT staged (r18): its only consumer is kept1's join —
      // the score column RIDES the kept_i chain to the final output
      // (8 bytes/row through already-staged relations), so the old
      // second consumer (the final score attach) reads staged kept3
      // instead of re-executing the scoring subtree, and the separate
      // scored checkpoint (measured 0.60 s wall for ms-level work —
      // ProbeMetrics r18) disappears.
      val scored = graft.operators.Ranking.qualityClassifier(clean,
        "doc_id", "text_clean",
        isPositive = col("source").isin("src0", "src1", "src2"))
        .select(col("doc_id"), col("score"), col("keep"))
      val kept1 = stage(clean.join(
        scored.filter(col("keep")).select(col("doc_id"), col("score")),
        Seq("doc_id")))
      // C: near-dup clusters + canonical keep.
      val sh = graft.operators.TextDedup.shingleRelation(
        kept1.select(col("doc_id"), col("text_clean")), "doc_id", "text_clean", n = 3)
      val pairs = graft.operators.TextDedup
        .minhashLshPairs(sh, k = 12, bands = 4, threshold = 0.5)
      val cc = graft.operators.Graph.connectedComponents(pairs, "da", "db")
      val members = kept1.select(col("doc_id"), col("n_tokens_clean"))
        .join(broadcast(cc), col("doc_id") === col("node"))
      val nonCanon = members
        .groupBy(col("component"))
        .agg(max(struct(col("n_tokens_clean"), (-col("doc_id")).as("nd"))).as("__m"),
          collect_list(col("doc_id")).as("ids"))
        .select(explode(expr("filter(ids, x -> x != -__m.nd)")).as("doc_id"))
      val kept2 = stage(kept1.join(broadcast(nonCanon), Seq("doc_id"), "left_anti"))
      // D: SemDeDup over survivor embeddings (1:1 doc_id = vec_id).
      val e = embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      val eSurv = e.join(kept2.select(col("doc_id")),
        col("id") === col("doc_id"), "left_semi")
      val sem = graft.operators.Ann.semanticDedup(
        corpus = eSurv, centroids = e.filter(col("id") < 8), threshold = 0.45)
      val kept3 = stage(kept2.join(
        sem.filter(col("kept") === 1L).select(col("vec_id")),
        col("doc_id") === col("vec_id"), "left_semi"))
      // E: temperature mix (α = 0.5) over the survivor token mass.
      val per = stage(kept3.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens_clean")).as("n_tokens")))
      val rates = per
        .join(broadcast(per.agg(min(col("n_tokens")).as("min_tokens"))))
        .withColumn("th", expr(
          """CASE WHEN n_tokens = min_tokens THEN 'g'
            |     ELSE lower(lpad(hex(CAST(floor(sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) * 4294967296) AS BIGINT)), 8, '0')) END""".stripMargin))
      val kept4 = kept3
        .join(broadcast(rates.select(col("source"), col("th"))), "source")
        .filter(expr("substring(md5(CAST(doc_id AS STRING)), 1, 8) < th"))
      // F: BPE-budget pack → per-doc manifest rows.
      val counts = graft.operators.Subword.docBpeCounts(
        kept4.select(col("doc_id"), col("text_clean")), "doc_id", "text_clean",
        TextAnalysis.demoMerges)
      val w9 = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      counts
        .withColumn("shard", col("doc_id") % 8)
        .withColumn("cum", sum(col("n_bpe_tokens")).over(w9))
        .withColumn("bin", expr("(cum - n_bpe_tokens) div 512"))
        // score attach reads the STAGED kept3 (counts' doc_ids are all
        // ⊆ kept4 ⊆ kept3, and kept3 carries the score column kept1
        // introduced — same rows, same values as the old scored join).
        .join(kept3.select(col("doc_id"), col("score")), Seq("doc_id"))
        .select(col("doc_id"), col("score"), col("n_words"),
          col("n_bpe_tokens"), col("shard"), col("bin"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH RECURSIVE
      -- A: repeated spans (x_dedup_substring CTEs) + token-drop cleaning
      t AS MATERIALIZED (SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents),
      w AS MATERIALIZED (SELECT doc_id, unnest(range(0, len(toks) - 7)) AS pos,
                   unnest(list_transform(range(0, len(toks) - 7),
                     i -> md5(array_to_string(toks[i+1 : i+8], ' ')))) AS h
            FROM t),
      dupw AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
      mk AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dupw)),
      fl AS (SELECT doc_id, pos,
                    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                         THEN 1 ELSE 0 END AS ns
             FROM mk),
      spw AS (SELECT doc_id, pos,
                     CAST(SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span
              FROM fl),
      spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
                FROM spw GROUP BY doc_id, span),
      toku AS (SELECT doc_id, unnest(toks) AS tok,
                      unnest(range(0, len(toks))) AS p
               FROM t),
      keptt AS (SELECT k.doc_id, k.tok, k.p FROM toku k
                WHERE NOT EXISTS (SELECT 1 FROM spans z
                                  WHERE z.doc_id = k.doc_id
                                    AND k.p BETWEEN z.s AND z.e)),
      clean AS MATERIALIZED (SELECT c0.doc_id, d0.source, c0.text_clean, c0.ntc FROM (
                  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean,
                         CAST(COUNT(*) AS BIGINT) AS ntc
                  FROM keptt GROUP BY doc_id) c0
                JOIN documents d0 ON c0.doc_id = d0.doc_id),
      -- B: quality classifier on the CLEANED text (x_quality_classifier CTEs)
      ctk AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos2,
                     string_split(text_clean, ' ') AS ctoks
              FROM clean),
      fx AS (SELECT doc_id, pos2,
                    unnest(list_concat(ctoks,
                      list_transform(range(1, len(ctoks)),
                        i -> array_to_string(ctoks[i:i+1], ' ')))) AS feat
             FROM ctk),
      ex AS MATERIALIZED (SELECT doc_id, pos2, substr(md5(feat), 1, 3) AS bk FROM fx),
      g AS (SELECT (COALESCE(CAST(SUM(CASE WHEN pos2 THEN 1 ELSE 0 END) AS BIGINT),
                             CAST(0 AS BIGINT)) * 1000000)
                     // CAST(COUNT(*) AS BIGINT) AS prior FROM ex),
      wc AS (SELECT bk,
                    (COALESCE(CAST(SUM(CASE WHEN pos2 THEN 1 ELSE 0 END) AS BIGINT),
                              CAST(0 AS BIGINT)) * 1000000)
                      // CAST(COUNT(*) AS BIGINT) - (SELECT prior FROM g) AS wt
             FROM ex GROUP BY bk),
      sc AS (SELECT e2.doc_id, CAST(SUM(w2.wt) AS BIGINT) AS score
             FROM ex e2 JOIN wc w2 USING (bk) GROUP BY e2.doc_id),
      k1 AS MATERIALIZED (SELECT c1.doc_id, c1.source, c1.text_clean, c1.ntc, s1.score
             FROM clean c1 JOIN sc s1 ON c1.doc_id = s1.doc_id
             WHERE s1.score >= 0),
      -- C: MinHash+LSH pairs (x_pipeline_curate CTEs) + CC + canonical keep
      d3 AS MATERIALIZED (SELECT doc_id,
                    list_distinct(list_transform(
                      range(1, greatest(len(ctoks3) - 2, 1) + 1),
                      i -> array_to_string(ctoks3[i:i+2], ' '))) AS sh3
             FROM (SELECT doc_id, string_split(text_clean, ' ') AS ctoks3 FROM k1)),
      sg AS MATERIALIZED (SELECT doc_id, sh3,
                    list_transform(range(0, 12),
                      i -> list_min(list_transform(sh3,
                        s2 -> md5(CAST(i AS VARCHAR) || '|' || s2)))) AS sig
             FROM d3),
      bd AS MATERIALIZED (SELECT doc_id,
                    unnest(list_transform(range(0, 4),
                      b -> md5(CAST(b AS VARCHAR) || '|' || sig[3*b+1] || sig[3*b+2] || sig[3*b+3]))) AS band_key
             FROM sg),
      cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
               FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      vp AS MATERIALIZED (SELECT da, db FROM (
               SELECT da, db,
                      len(list_filter(sa.sh3, x -> list_contains(sb.sh3, x))) AS inter,
                      len(sa.sh3) AS na, len(sb.sh3) AS nb
               FROM cand JOIN d3 sa ON da = sa.doc_id JOIN d3 sb ON db = sb.doc_id)
             WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
      edges AS (SELECT da AS s3, db AS d4 FROM vp UNION SELECT db, da FROM vp),
      reach(n, m2) AS (
        SELECT s3, s3 FROM edges
        UNION
        SELECT r.n, e3.d4 FROM reach r JOIN edges e3 ON r.m2 = e3.s3),
      comp AS (SELECT n AS doc_id, MIN(m2) AS component FROM reach GROUP BY n),
      rk AS (SELECT c2.doc_id,
                    ROW_NUMBER() OVER (PARTITION BY c2.component
                                       ORDER BY k.ntc DESC, c2.doc_id ASC) AS rn
             FROM comp c2 JOIN k1 k ON c2.doc_id = k.doc_id),
      k2 AS MATERIALIZED (SELECT * FROM k1
             WHERE doc_id NOT IN (SELECT doc_id FROM rk WHERE rn > 1)),
      -- D: SemDeDup on survivor embeddings (x_dedup_semantic CTEs)
      e4 AS MATERIALIZED (SELECT vec_id, embedding, sqrt(${dot("embedding", "embedding")}) AS nrm
             FROM embeddings),
      cents AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cnrm
                FROM e4 WHERE vec_id < 8),
      surv AS MATERIALIZED (SELECT e4.* FROM e4 JOIN k2 ON e4.vec_id = k2.doc_id),
      assigned AS MATERIALIZED (
        SELECT vec_id, embedding, nrm, cent_id FROM (
          SELECT v.vec_id, v.embedding, v.nrm, c.cent_id,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY ${dot("v.embedding", "c.ce")} / (v.nrm * c.cnrm) DESC,
                            c.cent_id ASC) AS crn
          FROM surv v CROSS JOIN cents c)
        WHERE crn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
          ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        WHERE ${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45),
      k3 AS MATERIALIZED (SELECT k2.* FROM k2
             WHERE k2.doc_id IN (SELECT vec_id FROM assigned)
               AND k2.doc_id NOT IN (SELECT vec_id FROM dropped)),
      -- E: temperature mix (x_source_temperature CTEs over survivors)
      per AS (SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(ntc) AS BIGINT) AS n_tokens
              FROM k3 GROUP BY source),
      mn AS (SELECT MIN(n_tokens) AS min_tokens FROM per),
      rates AS (SELECT source,
                       CASE WHEN n_tokens = min_tokens THEN 'g'
                            ELSE lower(lpad(hex(CAST(floor(sqrt(CAST(min_tokens AS DOUBLE) / n_tokens) * 4294967296) AS BIGINT)), 8, '0')) END AS th
                FROM per CROSS JOIN mn),
      k4 AS MATERIALIZED (SELECT k3.* FROM k3 JOIN rates r USING (source)
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < r.th),
      -- F: BPE-budget pack (x_token_bpe CTEs; dictionary from the full
      -- corpus, a superset of any cleaned text's vocabulary)
      ${TextAnalysis.duckBpeCtes},
      np AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens FROM fin),
      occ AS (SELECT doc_id, unnest(string_split(text_clean, ' ')) AS word FROM k4),
      cnt AS (SELECT occ.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(SUM(np.n_tokens) AS BIGINT) AS n_bpe_tokens
              FROM occ JOIN np ON occ.word = np.word
              GROUP BY occ.doc_id),
      c9 AS (SELECT doc_id, n_words, n_bpe_tokens, doc_id % 8 AS shard,
                    CAST(SUM(n_bpe_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             FROM cnt)
      SELECT c9.doc_id, k1.score, c9.n_words, c9.n_bpe_tokens, c9.shard,
             CAST((c9.cum - c9.n_bpe_tokens) // 512 AS BIGINT) AS bin
      FROM c9 JOIN k1 ON c9.doc_id = k1.doc_id
      ORDER BY c9.doc_id"""), headline = true),

    // --------------------------------- WEB pipeline (HTML → curated text)
    // The crawl-entry composition: raw HTML pages → Html.extractText
    // (script/style/entity/boilerplate handling) → structure gate
    // (n_kept ≥ 2 blocks) → self-trained bigram-LM quality gate (keep
    // bits_per_gram ≤ 4.58, stated as the exact integers
    // cost_bits·100 ≤ n_grams·458) → EXACT dedup on the EXTRACTED
    // text. The dedup stage is the point: every doc_id % 5 = 4 page
    // REPUBLISHES the previous doc's content under its own chrome
    // (title differs → raw-byte digests differ), and extraction strips
    // the chrome, so the copies collapse only because dedup runs AFTER
    // extraction. Canonical = min doc_id per digest; n_copies emitted
    // for re-weighting. The oracle replays the identical chain: the
    // Html regex pipeline, the bigram-LM rollups, the integer gate, the
    // digest group.
    Q("x_pipeline_web", (s, d) => {
      import graft.operators.{Html, Ranking}
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val prev = base.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("__ptext"))
      val pages = fanOut(base.join(prev, Seq("doc_id"), "left")
        .withColumn("__page", expr(
          "IF(doc_id % 5 = 4 AND __ptext IS NOT NULL, __ptext, text)")))
        .withColumn("__t", expr("split(__page, ' ')"))
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
      val ext = stage(Html.extractText(pages, "doc_id", "__html",
        minChars = 10, maxDensityPct = 34))
      val k1 = ext.filter(col("n_kept") >= 2)
      val tf = stage(Ranking.bigramFrequencies(k1, "doc_id", "text"))
      val (lm, cx, tot) = Ranking.ngramLm(tf)
      val k2 = k1.join(
        Ranking.scoreAgainstLm(tf, lm, cx, tot)
          .filter(expr("cost_bits * 100 <= n_grams * 415"))
          .select(col("doc_id"), col("cost_bits"), col("n_grams")),
        "doc_id")
      // dg feeds BOTH the canonical aggregate and the final join — stage
      // it or the whole LM-scoring subtree re-executes per reference
      // (the x_pipeline_modern lesson; the r13 plan audit caught the
      // doubled subtree).
      val dg = stage(k2.withColumn("digest", md5(col("text"))))
      val canon = dg.groupBy(col("digest")).agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).cast("long").as("n_copies"))
      dg.join(canon, Seq("digest", "doc_id"))
        .select(col("doc_id"), col("cost_bits"), col("n_grams"),
          col("digest"), col("n_copies"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH src AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 5 = 4 AND p.text IS NOT NULL
                    THEN p.text ELSE d.text END AS ptext
        FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
      toks AS (SELECT doc_id, string_split(ptext, ' ') AS t FROM src
               WHERE ptext IS NOT NULL),
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
        FROM toks),
      ext AS (
        SELECT doc_id, ${graft.operators.Html.duckExtractItems("h", 10, 34)}),
      k1 AS (SELECT doc_id, text FROM ext WHERE n_kept >= 2),
      bo AS (SELECT doc_id, unnest(list_transform(
               range(1, len(string_split(lower(text), ' '))),
               i -> string_split(lower(text), ' ')[i] || ' ' ||
                    string_split(lower(text), ' ')[i + 1])) AS ng
             FROM k1 WHERE len(string_split(lower(text), ' ')) >= 2),
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
      k2 AS (SELECT k1.doc_id, k1.text, sc.cost_bits, sc.n_grams
             FROM k1 JOIN sc ON k1.doc_id = sc.doc_id
             WHERE sc.cost_bits * 100 <= sc.n_grams * 415),
      dgst AS (SELECT doc_id, md5(text) AS digest, cost_bits, n_grams
               FROM k2),
      canon AS (SELECT digest, MIN(doc_id) AS doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_copies
                FROM dgst GROUP BY digest)
      SELECT g.doc_id, g.cost_bits, g.n_grams, g.digest, c.n_copies
      FROM dgst g JOIN canon c ON g.digest = c.digest AND g.doc_id = c.doc_id
      ORDER BY g.doc_id"""), headline = true),

    // ------------------------- CRAWL pipeline (URL curation → web chain)
    // The full crawl-entry composition the URL operators exist for:
    //
    //   1. canonicalize URLs (Web.withCanonicalUrl — the hot domain is
    //      spelled 'https://Seo.Farm.COM:443/…?utm_source=x', so the cap
    //      only groups it if canonicalization runs first)
    //   2. per-registrable-domain cap (cap = 25, window-free min-k) —
    //      every doc_id % 10 = 0 page lives on the one seo-farm domain,
    //      which the cap cuts to 25; organic sites spread over ~97
    //      co.uk domains
    //   3. Html.extractText on the SURVIVORS only (cap-before-extract:
    //      never pay decode/extraction for pages the mix won't take)
    //   4. structure gate (n_kept ≥ 2) → PII redaction (operators.Pii:
    //      the fixture plants a doc_id-derived email + IP block in
    //      every page, so the LM and the dedup both run on REDACTED
    //      text) → self-trained bigram-LM gate (cost_bits·100 ≤
    //      n_grams·400 — ~the 80th percentile of the POST-redaction
    //      distribution: the masked tokens are predictable and lower
    //      every cost, so the pre-redaction 420 went degenerate;
    //      re-tuned so the gate keeps biting — 385/475 at sf0.01)
    //   5. exact dedup on the REDACTED text — doc_id % 5 = 4 pages
    //      republish the previous doc's body on a DIFFERENT domain, so
    //      the cap and the dedup interact: a replica collapses iff its
    //      original also survived the cap, and becomes the canonical
    //      copy (n_copies = 1) iff the cap cut the original. The
    //      redaction is LOAD-BEARING here: the planted email/IP derive
    //      from each page's OWN doc_id, so a replica's raw extracted
    //      text differs from its original and collapses only after
    //      masking (skip the scrub and every n_copies reads 1). The
    //      second planted email keys on length(page-text) parity —
    //      shared by replica and original — so n_pii varies across
    //      docs without splitting clusters.
    //
    // Plan at 100 TB: the page relation stages once (the prev-join that
    // plants replicas is a corpus self-join — never re-run per
    // consumer); the cap output stages (it feeds the extract join AND
    // the final domain attach); the keep-set joins the corpus on
    // doc_id — ONE shuffle of the page relation, the honest cost of a
    // global per-domain quota; every later stage reads staged
    // survivor-sized relations.
    Q("x_pipeline_crawl", (s, d) =>
      crawlChain(stage(crawlPages(s, d))), Some(crawlOracle),
      headline = true),

    // ----------------------- CRAWL pipeline fed from WARC (the REAL
    // input layer): the SAME pages, round-tripped through the pinned
    // WARC/1.0 subset (sources/Warc — one gzip member per response
    // record, the CommonCrawl shape), re-parsed, and run through the
    // identical chain. doc_id re-derives from each page's OWN url (a
    // real WARC ingest has no side-channel ids), the html consumed
    // downstream is the PARSED payload body through the PINNED DECODE
    // LAYER (Warc.withDecodedText — the writer stamps charset=utf-8,
    // so the Content-Type-param path resolves every record) — so a
    // lossy header/body escape OR a charset mis-resolution surfaces
    // as a hash mismatch against the same oracle as x_pipeline_crawl
    // (round trip = identity is the claim).
    // Plan: the parsed relation stages once (it feeds the cap AND the
    // extract join); parse parallelism = WARC file count (8 here; at
    // 100 TB CommonCrawl's ~100k files give the same effect).
    Q("x_pipeline_warc", (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_crawl/${new java.io.File(d).getName}"
      graft.sources.Warc.write(crawlPages(s, d), "url", "__html", tmp,
        files = 8)
      val pages = stage(graft.sources.Warc
        .withDecodedText(graft.sources.Warc.read(s, tmp), outCol = "__dt")
        .select(
          expr("""CAST(CASE WHEN startswith(target_uri, 'https://Seo.Farm.COM')
                 |  THEN split_part(split_part(target_uri, '/p', 2), '/', 1)
                 |  ELSE split_part(target_uri, '/d/', 2)
                 |END AS BIGINT)""".stripMargin).as("doc_id"),
          col("target_uri").as("url"),
          col("__dt").as("__html")))
      crawlChain(pages)
    }, Some(crawlOracle), headline = true),

    // ------------------------------------------- JSONL interchange source
    // The corpus round-trips through gzip JSONL (the format LLM corpora
    // ship in; also the reference's gzip-JSON wire format) and every field
    // is verified against the parquet original via a null-safe equi-join —
    // a lossy escape/decode anywhere emits 0s and hash-mismatches. The
    // digest column ties the check to actual content. Four output files =
    // four scan tasks on re-ingest (gzip is non-splittable; the file count
    // IS the ingest parallelism — sources/Jsonl.scala contract).
    Q("x_source_jsonl", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Jsonl.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("j"), col("o.doc_id") === col("j.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> j.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> j.lang AND o.source <=> j.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> j.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(j.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------- WARC archive source
    // The corpus round-trips through the pinned WARC/1.0 response-record
    // subset (sources/Warc — per-record gzip members, the CommonCrawl
    // shape every real 100 TB web corpus ships in) and every field is
    // verified against the parquet original: body bytes (UTF-8 decode
    // <=> text), record type, HTTP status, and the payload content type
    // all flag; the digest column ties the hash to actual content. Four
    // files = four parse tasks on re-ingest (gzip members are not
    // seekable; the file count IS the parallelism — the Jsonl contract).
    Q("x_source_warc", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_stage/${new java.io.File(d).getName}"
      val pages = docs.withColumn("url",
        expr("concat('https://corpus.example.com/doc/', CAST(doc_id AS STRING))"))
      val back = graft.sources.Warc.roundTrip(pages, "url", "text", tmp,
        files = 4)
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      docs.alias("o").join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN decode(w.body, 'UTF-8') <=> o.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN w.warc_type = 'response' AND w.http_status = 200 THEN 1 ELSE 0 END AS BIGINT)").as("rec_ok"),
          expr("CAST(CASE WHEN w.http_content_type = 'text/html; charset=utf-8' THEN 1 ELSE 0 END AS BIGINT)").as("mime_ok"),
          expr("md5(decode(w.body, 'UTF-8'))").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS rec_ok,
             CAST(1 AS BIGINT) AS mime_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // --------------------------------- WARC payload DECODE layer
    // Real CommonCrawl records carry gzip'd payload bodies and a long
    // tail of legacy charsets — decoding everything as UTF-8 silently
    // poisons digests, LM scores, and dedup with mojibake. This pins
    // the full resolution (Warc.withDecodedText): the corpus pages
    // round-trip through writeHttp under FOUR archive shapes by
    // doc_id % 4 — (0) plain UTF-8 with a charset param, (1)
    // windows-1252 with a charset param, (2) windows-1252 with NO
    // param and a <meta http-equiv> tag (the sniff path is
    // load-bearing: latin-1-decoding those bytes as UTF-8 would mangle
    // every é/—), (3) UTF-8 under Content-Encoding: gzip (the
    // transfer-decode path). Every page carries a non-ASCII suffix
    // (é, em dash — both cp1252-mappable) so a charset mix-up is
    // VISIBLE in the digest, and the corpus text is ASCII-sanitized
    // first so the cp1252 encode is lossless by construction (the
    // round-trip claim needs an invertible fixture — stated). Flags
    // verify decoded text ≡ the engine-built page, the parsed
    // Content-Encoding, and the Content-Type; the digest ties the
    // hash to post-decode content. The oracle restates the page from
    // the parquet original alone — the whole archive round trip plus
    // decode must be the identity.
    Q("x_warc_charset", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_cs/${new java.io.File(d).getName}"
      val metaTag = "<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1252\"><p>"
      val pagesSrc = docs
        .withColumn("url",
          expr("concat('https://cs.example.com/doc/', CAST(doc_id AS STRING))"))
        .withColumn("__v", expr("doc_id % 4"))
        .withColumn("__html", expr(
          s"""concat(IF(__v = 2, '$metaTag', '<p>'),
             |  regexp_replace(text, '[^ -~]', ''),
             |  decode(unhex('2063616666C3A920E280942066696E'), 'UTF-8'))""".stripMargin))
        .withColumn("__ct", expr(
          """CASE WHEN __v = 1 THEN 'text/html; charset=windows-1252'
            |     WHEN __v = 2 THEN 'text/html'
            |     ELSE 'text/html; charset=utf-8' END""".stripMargin))
        .withColumn("__ce", expr("IF(__v = 3, 'gzip', '')"))
        .withColumn("__body", expr(
          """CASE WHEN __v IN (1, 2)
            |       THEN charset_encode(__html, 'windows-1252')
            |     WHEN __v = 3 THEN gzip_bytes(charset_encode(__html, 'utf-8'))
            |     ELSE charset_encode(__html, 'utf-8') END""".stripMargin))
      graft.sources.Warc.writeHttp(pagesSrc, "url", "__body", "__ct", "__ce",
        tmp, files = 4)
      val back = graft.sources.Warc
        .withDecodedText(graft.sources.Warc.read(s, tmp), outCol = "__dec")
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      pagesSrc.alias("o").join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN w.__dec <=> o.__html THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN w.http_content_encoding <=> o.__ce THEN 1 ELSE 0 END AS BIGINT)").as("enc_ok"),
          expr("CAST(CASE WHEN w.http_content_type <=> o.__ct THEN 1 ELSE 0 END AS BIGINT)").as("mime_ok"),
          expr("md5(w.__dec)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS enc_ok,
             CAST(1 AS BIGINT) AS mime_ok,
             md5(CASE WHEN doc_id % 4 = 2
                      THEN '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252"><p>'
                      ELSE '<p>' END ||
                 regexp_replace(text, '[^ -~]', '', 'g') ||
                 decode(unhex('2063616666C3A920E280942066696E'))) AS digest
      FROM documents ORDER BY doc_id"""), headline = true),

    // --------------------------------- chunked transfer decoding
    // CommonCrawl strips transfer codings, but raw heritrix-style
    // archives keep them: a `Transfer-Encoding: chunked` payload that
    // isn't dechunked leaks hex size lines and CRLFs into every
    // downstream digest/LM/dedup. This pins the parser's transparent
    // dechunk (RFC 9112 §7.1, empty-trailer subset) across the
    // composition matrix by doc_id % 4: (0) chunked plain text, (1)
    // gzip Content-Encoding unchunked, (2) chunked AND gzip'd — the
    // layering order is load-bearing: dechunk FIRST (transfer
    // coding), THEN gunzip (content coding, via withDecodedText) —
    // (3) plain. chunkBytes = 7 forces many chunks plus a short final
    // one (multi-digit hex sizes and the partial-tail path both
    // exercise). The oracle restates the page from the parquet
    // original alone — chunk framing must vanish without a trace.
    Q("x_warc_chunked", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_ch/${new java.io.File(d).getName}"
      val pagesSrc = docs
        .withColumn("url",
          expr("concat('https://ch.example.com/doc/', CAST(doc_id AS STRING))"))
        .withColumn("__html", expr("concat('<p>', text, ' tail')"))
        .withColumn("__ck", expr("doc_id % 2 = 0"))
        .withColumn("__ce", expr("IF(doc_id % 4 IN (1, 2), 'gzip', '')"))
        .withColumn("__body", expr(
          """CASE WHEN doc_id % 4 IN (1, 2)
            |       THEN gzip_bytes(charset_encode(__html, 'utf-8'))
            |     ELSE charset_encode(__html, 'utf-8') END""".stripMargin))
        .withColumn("__ct", lit("text/html; charset=utf-8"))
      graft.sources.Warc.writeHttp(pagesSrc, "url", "__body", "__ct", "__ce",
        tmp, files = 4, chunkedCol = Some("__ck"), chunkBytes = 7)
      val back = graft.sources.Warc
        .withDecodedText(graft.sources.Warc.read(s, tmp), outCol = "__dec")
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      pagesSrc.alias("o").join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN w.__dec <=> o.__html THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN w.http_content_encoding <=> o.__ce THEN 1 ELSE 0 END AS BIGINT)").as("enc_ok"),
          expr("md5(w.__dec)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS enc_ok,
             md5('<p>' || text || ' tail') AS digest
      FROM documents ORDER BY doc_id""")),

    // --------------------------------- WARC redirect aliases (3xx)
    // Real crawls fetch through redirects: a 301 response carries the
    // alias edge (target_uri → Location) that lets a page fetched via
    // a redirected spelling collapse with its canonical twin — the
    // pinned WARC projection used to DROP 3xx rows wholesale, losing
    // those edges. Every doc_id % 3 = 0 page also has an OLD spelling
    // archived as a 301 whose Location is RELATIVE ('/d/<id>' — RFC
    // 9110 allows it; resolution against the record's own uri is the
    // same RFC 3986 subset hrefs use, FrontierIngest.aliasLinks).
    // The query parses the archive, splits pages from redirects,
    // resolves each alias's target against the fetched pages' canonical
    // urls, and emits (resolved doc_id, canonical old spelling) — the
    // oracle restates both from the parquet original alone, so a lost
    // Location header, a broken relative resolution, or a
    // canonicalization slip all hash-mismatch.
    Q("x_warc_redirects", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_rd/${new java.io.File(d).getName}"
      val pages = docs.select(col("doc_id"),
        expr("""concat('https://www.r', CAST(doc_id % 7 AS STRING),
               |'.com/d/', CAST(doc_id AS STRING))""".stripMargin).as("url"),
        expr("CAST(concat('<html><body><p>', text, '</p></body></html>') AS BINARY)")
          .as("__b"),
        lit("text/html; charset=utf-8").as("__ct"), lit("").as("__ce"),
        lit("200 OK").as("__st"), lit("").as("__loc"))
      val redirs = docs.filter(expr("doc_id % 3 = 0")).select(col("doc_id"),
        expr("""concat('https://www.R', CAST(doc_id % 7 AS STRING),
               |'.COM:443/old/', CAST(doc_id AS STRING))""".stripMargin).as("url"),
        expr("CAST('' AS BINARY)").as("__b"),
        lit("text/html").as("__ct"), lit("").as("__ce"),
        lit("301 Moved Permanently").as("__st"),
        expr("concat('/d/', CAST(doc_id AS STRING))").as("__loc"))
      graft.sources.Warc.writeHttp(pages.unionByName(redirs), "url", "__b",
        "__ct", "__ce", tmp, files = 4,
        statusCol = Some("__st"), locationCol = Some("__loc"))
      val parsed = stage(graft.sources.Warc.read(s, tmp)
        .select(col("target_uri"), col("http_status"), col("http_location")))
      val aliases = graft.streaming.FrontierIngest.aliasLinks(
        parsed.filter(col("http_status").between(300, 399)),
        "target_uri", "http_location")
      val pmap = graft.operators.Web.withCanonicalUrl(
        parsed.filter(col("http_status") === 200)
          .select(col("target_uri").as("url")), "url", "__c")
        .select(col("__c").as("to_url"),
          expr("CAST(split_part(__c, '/d/', 2) AS BIGINT)").as("doc_id"))
      aliases.join(pmap, Seq("to_url"))
        .select(col("doc_id"), col("from_url"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             'https://www.r' || CAST(doc_id % 7 AS VARCHAR) ||
             '.com/old/' || CAST(doc_id AS VARCHAR) AS from_url
      FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""")),

    // ----------------------------------- WARC CDX single-record audit
    // Takedown/audit workflows re-fetch INDIVIDUAL records from 100k
    // archives; gzip members are unseekable, so without an index each
    // fetch pays a whole-file parse. The writers emit a CDX-style
    // sidecar at write time (record_id, uri, file, offset, length —
    // offsets are free as members are written, the CommonCrawl
    // convention); this query drives the audit path end-to-end: pick
    // the doc_id % 101 = 0 records, derive their record ids (md5 of
    // the url — the writer's id discipline), join the index
    // (broadcast — the wanted set is k-bounded by the audit
    // contract), ranged-read exactly those members
    // (Warc.readRanged: one seek + one member inflate per record),
    // and verify the payload against the parquet original. Bytes
    // read = Σ selected member lengths, not Σ archive sizes —
    // WarcCdxSpec pins the bound; the oracle pins the content.
    Q("x_warc_cdx", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_cdx/${new java.io.File(d).getName}"
      val pages = docs.withColumn("url",
        expr("concat('https://cdx.example.com/doc/', CAST(doc_id AS STRING))"))
      graft.sources.Warc.write(pages, "url", "text", tmp, files = 4)
      val wanted = docs.filter(expr("doc_id % 101 = 0"))
        .select(expr("""concat('<urn:graft:',
               |md5(concat('https://cdx.example.com/doc/',
               |           CAST(doc_id AS STRING))), '>')""".stripMargin)
          .as("record_id"))
      val sel = graft.sources.Warc.readCdx(s, tmp)
        .join(broadcast(wanted), Seq("record_id"))
      val recs = graft.sources.Warc.readRanged(s, tmp,
        sel.select(col("file"), col("offset"), col("length")))
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      docs.alias("o").join(recs.alias("w"), Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN decode(w.body, 'UTF-8') <=> o.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("md5(decode(w.body, 'UTF-8'))").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, md5(text) AS digest
      FROM documents WHERE doc_id % 101 = 0 ORDER BY doc_id""")),

    // --------------------------------- WARC revisit dedup (§6.7.2)
    // Write-time payload dedup, the storage half real archives run:
    // within a shard, repeats of a payload digest write bodyless
    // `revisit` records naming the original (identical-payload-digest
    // profile); resolveRevisits is the read-side join that restores
    // them. The fixture groups pages in threes sharing one payload
    // (body = '<base>:' || base text — the base-id prefix keeps digest
    // groups ≡ id groups even if two corpus texts collide); the dedup
    // scope is PINNED deterministic — shard = hash60(url) % files,
    // original = MIN url per (shard, digest) — so the oracle replays
    // the whole assignment: which row is the response, which are
    // revisits, and each revisit's WARC-Refers-To id (md5 of the
    // original's url, the writer discipline). After resolution every
    // row carries the shared body — text_ok and the digest tie the
    // hash to restored content. The parsed relation stages once
    // (resolveRevisits reads it three ways: pass-through, originals,
    // revisits).
    Q("x_warc_revisit", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_rv/${new java.io.File(d).getName}"
      val pages = docs.select(col("doc_id"),
          expr("doc_id - doc_id % 3").as("__b"))
        .join(docs.select(col("doc_id").as("__b"), col("text")), Seq("__b"))
        .select(col("doc_id"),
          expr("concat('https://rv.example.com/doc/', CAST(doc_id AS STRING))")
            .as("url"),
          expr("concat(CAST(__b AS STRING), ':', text)").as("__t"))
      graft.sources.Warc.writeDedup(pages, "url", "__t", tmp, files = 3)
      val resolved = graft.sources.Warc.resolveRevisits(
          stage(graft.sources.Warc.read(s, tmp)))
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      pages.alias("o").join(resolved.alias("w"), Seq("doc_id"))
        .select(col("doc_id"), col("w.warc_type").as("warc_type"),
          col("w.warc_refers_to").as("refers_to"),
          expr("CAST(CASE WHEN decode(w.body, 'UTF-8') <=> o.__t THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("md5(decode(w.body, 'UTF-8'))").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH grp AS (
        SELECT d.doc_id,
               'https://rv.example.com/doc/' || CAST(d.doc_id AS VARCHAR)
                 AS url,
               CAST(d.doc_id - d.doc_id % 3 AS VARCHAR) || ':' || b.text
                 AS t,
               CAST(concat('0x', substr(md5(
                 'https://rv.example.com/doc/' || CAST(d.doc_id AS VARCHAR)),
                 1, 15)) AS BIGINT) % 3 AS shard
        FROM documents d
        JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 3),
      m AS (SELECT doc_id, url, t,
                   MIN(url) OVER (PARTITION BY shard, md5(t)) AS ourl
            FROM grp)
      SELECT doc_id,
             CASE WHEN url = ourl THEN 'response' ELSE 'revisit' END
               AS warc_type,
             CASE WHEN url = ourl THEN ''
                  ELSE '<urn:graft:' || md5(ourl) || '>' END AS refers_to,
             CAST(1 AS BIGINT) AS text_ok,
             md5(t) AS digest
      FROM m ORDER BY doc_id""")),

    // --------------------------------- conditional recrawl (RFC 9110 §13)
    // Refetching 100k archives without validators re-downloads every
    // unchanged byte; real crawlers revalidate — If-None-Match from the
    // archived ETag, If-Modified-Since from the archived Last-Modified
    // (a 304 then costs headers, not bodies). The parser surfaces both
    // headers from the archived HTTP head; the fetch PLAN joins the
    // recrawl candidate list against the parsed archive on canonical
    // urls: mode 'etag' when an ETag was archived (preferred validator
    // — RFC 9110 §13.1.1; the Last-Modified still rides along),
    // 'modified' when only Last-Modified, 'unconditional' for archived
    // pages without validators, 'full' for novel urls (left-join
    // miss). Validators by doc_id % 3: both / Last-Modified only /
    // neither; doc_id % 5 = 0 adds a never-archived /new/ candidate.
    // One projection + ONE left join on canonical strings; the oracle
    // restates the whole plan from the parquet original.
    Q("x_recrawl_conditional", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_cond/${new java.io.File(d).getName}"
      val pages = docs
        .withColumn("url",
          expr("concat('https://cond.example.com/doc/', CAST(doc_id AS STRING))"))
        .withColumn("__b", expr("CAST(concat('<p>', text) AS BINARY)"))
        .withColumn("__ct", lit("text/html; charset=utf-8"))
        .withColumn("__ce", lit(""))
        .withColumn("__et", expr(
          """IF(doc_id % 3 = 0,
            |   concat('"e', CAST(doc_id AS STRING), '"'), '')""".stripMargin))
        .withColumn("__lm", expr(
          """IF(doc_id % 3 IN (0, 1),
            |   concat('Mon, 0', CAST(1 + doc_id % 9 AS STRING),
            |          ' Jun 2026 00:00:00 GMT'), '')""".stripMargin))
      graft.sources.Warc.writeHttp(pages, "url", "__b", "__ct", "__ce",
        tmp, files = 4, etagCol = Some("__et"), lastModifiedCol = Some("__lm"))
      val archived = graft.sources.Warc.read(s, tmp)
        .select(col("target_uri").as("url"),
          col("http_etag"), col("http_last_modified"))
      val candidates = docs
        .select(expr("concat('https://cond.example.com/doc/', CAST(doc_id AS STRING))")
          .as("url"))
        .unionAll(docs.filter(expr("doc_id % 5 = 0"))
          .select(expr("concat('https://cond.example.com/new/', CAST(doc_id AS STRING))")
            .as("url")))
      candidates.join(archived, Seq("url"), "left")
        .select(col("url"),
          expr("""CASE WHEN http_etag IS NULL THEN 'full'
                 |     WHEN http_etag != '' THEN 'etag'
                 |     WHEN http_last_modified != '' THEN 'modified'
                 |     ELSE 'unconditional' END""".stripMargin).as("mode"),
          coalesce(col("http_etag"), lit("")).as("if_none_match"),
          coalesce(col("http_last_modified"), lit("")).as("if_modified_since"))
        .orderBy(col("url"))
    }, Some("""
      WITH cand AS (
        SELECT doc_id,
               'https://cond.example.com/doc/' || CAST(doc_id AS VARCHAR)
                 AS url,
               TRUE AS known
        FROM documents
        UNION ALL
        SELECT doc_id,
               'https://cond.example.com/new/' || CAST(doc_id AS VARCHAR),
               FALSE
        FROM documents WHERE doc_id % 5 = 0)
      SELECT url,
             CASE WHEN NOT known THEN 'full'
                  WHEN doc_id % 3 = 0 THEN 'etag'
                  WHEN doc_id % 3 = 1 THEN 'modified'
                  ELSE 'unconditional' END AS mode,
             CASE WHEN known AND doc_id % 3 = 0
                  THEN '"e' || CAST(doc_id AS VARCHAR) || '"'
                  ELSE '' END AS if_none_match,
             CASE WHEN known AND doc_id % 3 IN (0, 1)
                  THEN 'Mon, 0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
                       ' Jun 2026 00:00:00 GMT'
                  ELSE '' END AS if_modified_since
      FROM cand ORDER BY url""")),

    // --------------------------------- magic-byte MIME sniffing
    // Content-Type headers mislabel constantly — CommonCrawl publishes
    // a DETECTED type beside the served one for exactly this reason;
    // routing payloads (html → extraction, image → dHash, gzip →
    // decode) off the header alone mis-feeds every downstream stage.
    // Media.mimeSniffSql classifies archived payloads by pinned magic
    // signatures (PNG/JPEG/GIF/PDF/gzip/zip/RIFF) + an HTML prefix
    // sniff (first 64 bytes as latin-1, left-trimmed, lowercased —
    // total, never fails), else application/octet-stream (never a
    // guess). The fixture serves six payload shapes with deliberately
    // wrong headers on half of them (a PNG served as text/html, a
    // gzip served as text/html, an html doc served as text/plain) —
    // the mismatch flag is the signal a real pipeline routes on. One
    // codegen projection over the parsed archive; the oracle restates
    // everything closed-form from doc_id.
    Q("x_mime_sniff", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_mime/${new java.io.File(d).getName}"
      val pages = docs
        .withColumn("url",
          expr("concat('https://mime.example.com/doc/', CAST(doc_id AS STRING))"))
        .withColumn("__v", expr("doc_id % 6"))
        .withColumn("__b", expr(
          """CASE CAST(__v AS INT)
            |  WHEN 0 THEN concat(unhex('89504E470D0A1A0A'),
            |                     charset_encode(text, 'utf-8'))
            |  WHEN 1 THEN concat(unhex('FFD8FFE000104A464946'),
            |                     charset_encode(text, 'utf-8'))
            |  WHEN 2 THEN charset_encode(
            |                concat('  <!DOCTYPE html><p>', text), 'utf-8')
            |  WHEN 3 THEN charset_encode(
            |                concat('%PDF-1.4 ', text), 'utf-8')
            |  WHEN 4 THEN gzip_bytes(charset_encode(text, 'utf-8'))
            |  ELSE charset_encode(concat('plain ', text), 'utf-8')
            |END""".stripMargin))
        .withColumn("__ct", expr(
          """CASE CAST(__v AS INT)
            |  WHEN 0 THEN 'image/png'
            |  WHEN 1 THEN 'text/html'
            |  WHEN 2 THEN 'text/plain'
            |  WHEN 3 THEN 'application/pdf'
            |  WHEN 4 THEN 'text/html'
            |  ELSE 'text/plain'
            |END""".stripMargin))
        .withColumn("__ce", lit(""))
      graft.sources.Warc.writeHttp(pages, "url", "__b", "__ct", "__ce",
        tmp, files = 4)
      val back = graft.sources.Warc.read(s, tmp)
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
        .select(col("doc_id"), col("http_content_type").as("served"),
          expr(graft.operators.Media.mimeSniffSql("body")).as("detected"))
        .withColumn("mismatch", expr(
          """NOT (detected = served
            |  OR (detected = 'application/octet-stream'
            |      AND served LIKE 'text/plain%'))""".stripMargin))
      // the join back to the source pages pins the header round trip
      // (and is the query's parquet anchor — the archive scan itself
      // is the binaryFile read).
      pages.alias("o").join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"), col("w.served").as("served"),
          col("w.detected").as("detected"),
          col("w.mismatch").as("mismatch"),
          expr("CAST(CASE WHEN w.served <=> o.__ct THEN 1 ELSE 0 END AS BIGINT)")
            .as("hdr_ok"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             CASE CAST(doc_id % 6 AS INT)
               WHEN 0 THEN 'image/png'
               WHEN 1 THEN 'text/html'
               WHEN 2 THEN 'text/plain'
               WHEN 3 THEN 'application/pdf'
               WHEN 4 THEN 'text/html'
               ELSE 'text/plain'
             END AS served,
             CASE CAST(doc_id % 6 AS INT)
               WHEN 0 THEN 'image/png'
               WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'text/html'
               WHEN 3 THEN 'application/pdf'
               WHEN 4 THEN 'application/gzip'
               ELSE 'application/octet-stream'
             END AS detected,
             CAST(doc_id % 6 AS INT) IN (1, 2, 4) AS mismatch,
             CAST(1 AS BIGINT) AS hdr_ok
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------- WET extracted-text egress
    // CommonCrawl delivers extracted text as WET files (`conversion`
    // records — no HTTP envelope, payload = UTF-8 text, WARC-Refers-To
    // back-links the originating response record); writing them makes
    // a graft-curated corpus consumable by every WET reader. The
    // corpus round-trips through Warc.writeText/readWet and every
    // field verifies: text bytes, the conversion-record shape
    // (status 0, text/plain), and the refers-to BACK-LINK — restated
    // engine-side from the url via the writer's md5 id discipline, so
    // a broken link formula hash-mismatches. `.warc.wet.gz` segments
    // never match the `*.warc.gz` response glob (suffix separation,
    // spec'd in SourceFormatsSpec).
    Q("x_source_wet", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_wet_stage/${new java.io.File(d).getName}"
      val pages = docs.withColumn("url",
        expr("concat('https://wet.example.com/doc/', CAST(doc_id AS STRING))"))
      graft.sources.Warc.writeText(pages, "url", "text", tmp, files = 4)
      val back = graft.sources.Warc.readWet(s, tmp)
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
      docs.alias("o").join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN decode(w.body, 'UTF-8') <=> o.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN w.warc_type = 'conversion' AND w.http_status = 0 AND w.http_content_type = 'text/plain' THEN 1 ELSE 0 END AS BIGINT)").as("rec_ok"),
          expr("""CAST(CASE WHEN w.warc_refers_to =
                 |  concat('<urn:graft:', md5(concat('https://wet.example.com/doc/',
                 |    CAST(doc_id AS STRING))), '>') THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("ref_ok"),
          expr("md5(decode(w.body, 'UTF-8'))").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS rec_ok,
             CAST(1 AS BIGINT) AS ref_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------- WAT metadata egress
    // CommonCrawl's third delivery format: WAT `metadata` records —
    // JSON envelopes of per-page metadata (title, links) beside the
    // WARC responses and WET text; writing them completes the
    // WARC/WAT/WET triple, so a graft crawl inter-operates with every
    // WAT consumer. The envelope assembles ENGINE-SIDE (extractTitle +
    // extractLinks → one to_json projection — raw hrefs in document
    // order, true to the format); Warc.writeMeta frames it
    // (`.warc.wat.gz`, refers-to back-link, shared CDX sidecar);
    // readWat + from_json re-extract every field. The oracle restates
    // the ENTIRE envelope byte-for-byte closed-form from doc_id
    // (Spark's to_json layout is deterministic: struct order, compact
    // separators) — a drifted field order, a lost link, or a broken
    // back-link all hash-mismatch. Body text is [<>]-sanitized so the
    // link/title extraction is closed-form by construction (stated).
    Q("x_source_wat", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_wat/${new java.io.File(d).getName}"
      val pages = docs.select(col("doc_id"), col("text"))
        .withColumn("url",
          expr("concat('https://wat.example.com/doc/', CAST(doc_id AS STRING))"))
        .withColumn("__html", expr(
          """concat('<html><head><title>Doc ', CAST(doc_id AS STRING),
            |'</title></head><body><p>',
            |regexp_replace(text, '[<>]', ''),
            |'</p><a href="https://www.site', CAST(doc_id % 7 AS STRING),
            |'.com/d/', CAST(doc_id AS STRING), '">a</a> ',
            |'<a href="/next/', CAST(doc_id + 1 AS STRING),
            |'">b</a></body></html>')""".stripMargin))
      val titles = graft.operators.Html.extractTitle(pages, "doc_id", "__html")
        .select(col("doc_id"), col("title"))
      val links = graft.operators.Html.extractLinks(pages, "doc_id", "__html")
        .groupBy(col("doc_id"))
        .agg(expr(
          """transform(array_sort(collect_list(named_struct('p', pos,
            |'h', href))), s9 -> s9.h)""".stripMargin).as("__ls"))
      val meta = pages.select(col("doc_id"), col("url"))
        .join(titles, Seq("doc_id")).join(links, Seq("doc_id"))
        .withColumn("__json", expr(
          """to_json(named_struct(
            |  'Envelope', named_struct(
            |    'WARC-Header-Metadata', named_struct('WARC-Target-URI', url),
            |    'Payload-Metadata', named_struct(
            |      'HTML-Metadata', named_struct(
            |        'Title', title,
            |        'Links', transform(__ls,
            |          l9 -> named_struct('url', l9)))))))""".stripMargin))
      graft.sources.Warc.writeMeta(meta, "url", "__json", tmp, files = 4)
      val watSchema = "Envelope STRUCT<`WARC-Header-Metadata` STRUCT<" +
        "`WARC-Target-URI` STRING>, `Payload-Metadata` STRUCT<" +
        "`HTML-Metadata` STRUCT<Title STRING, " +
        "Links ARRAY<STRUCT<url STRING>>>>>"
      val back = graft.sources.Warc.readWat(s, tmp)
        .withColumn("doc_id",
          expr("CAST(split_part(target_uri, '/doc/', 2) AS BIGINT)"))
        .withColumn("__j", expr("decode(body, 'UTF-8')"))
        .withColumn("__e", expr(s"from_json(__j, '$watSchema')"))
        .select(col("doc_id"),
          expr("__e.Envelope.`Payload-Metadata`.`HTML-Metadata`.Title")
            .as("title"),
          expr("""CAST(size(__e.Envelope.`Payload-Metadata`
                 |.`HTML-Metadata`.Links) AS BIGINT)""".stripMargin)
            .as("n_links"),
          expr("""array_join(transform(__e.Envelope.`Payload-Metadata`
                 |.`HTML-Metadata`.Links, l9 -> l9.url), '|')""".stripMargin)
            .as("links"),
          expr("""CAST(CASE WHEN warc_refers_to =
                 |  concat('<urn:graft:', md5(target_uri), '>')
                 |  AND warc_type = 'metadata'
                 |  AND http_content_type = 'application/json'
                 |THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("ref_ok"),
          expr("md5(__j)").as("digest"), col("target_uri"))
      // parquet anchor + url round trip: join back to the source pages.
      pages.select(col("doc_id"), col("url")).alias("o")
        .join(back.alias("w"), Seq("doc_id"))
        .select(col("doc_id"), col("w.title").as("title"),
          col("w.n_links").as("n_links"), col("w.links").as("links"),
          expr("""CAST(CASE WHEN w.ref_ok = 1 AND w.target_uri <=> o.url
                 |THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("ref_ok"),
          col("w.digest").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             CAST(2 AS BIGINT) AS n_links,
             'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
             '.com/d/' || CAST(doc_id AS VARCHAR) ||
             '|/next/' || CAST(doc_id + 1 AS VARCHAR) AS links,
             CAST(1 AS BIGINT) AS ref_ok,
             md5('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"' ||
                 'https://wat.example.com/doc/' || CAST(doc_id AS VARCHAR) ||
                 '"},"Payload-Metadata":{"HTML-Metadata":{"Title":"Doc ' ||
                 CAST(doc_id AS VARCHAR) ||
                 '","Links":[{"url":"https://www.site' ||
                 CAST(doc_id % 7 AS VARCHAR) || '.com/d/' ||
                 CAST(doc_id AS VARCHAR) || '"},{"url":"/next/' ||
                 CAST(doc_id + 1 AS VARCHAR) || '"}]}}}}') AS digest
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------- CSV interchange (egress)
    // RFC-4180 CSV round trip over the HARD case — free text with commas,
    // quotes, and (potentially) newlines — same losslessness design as
    // x_source_jsonl: the round-tripped copy JOINS back to the parquet
    // original, per-column <=> flags make any write/read loss a hash
    // mismatch, and the oracle states flags = 1 from the original alone.
    // The query keeps its parquet scan via the original side of the join.
    Q("x_source_csv", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Csv.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("c"), col("o.doc_id") === col("c.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> c.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> c.lang AND o.source <=> c.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> c.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(c.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // --------------------------------------- ORC interchange (columnar)
    // The columnar egress for Hive/Trino-stack neighbors: typed,
    // splittable, pushdown-preserving (sources/Orc contract;
    // SourceFormatsSpec pins the pushed filter on re-ingest). Same
    // losslessness design as the text formats — the round-tripped copy
    // joins back to the parquet original with null-safe flags.
    Q("x_source_orc", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Orc.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("c"), col("o.doc_id") === col("c.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> c.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> c.lang AND o.source <=> c.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> c.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(c.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id"""))
  )
}
