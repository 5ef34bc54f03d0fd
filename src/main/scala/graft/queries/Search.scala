package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Lexical search / ranking extension queries over `documents`
  * (operators in [[graft.operators.Ranking]]) plus C4-style cross-document
  * line dedup ([[graft.operators.TextDedup.stripCommonLines]]) — the
  * retrieval-and-boilerplate side of a training-data pipeline.
  *
  * Determinism: every double is a single IEEE division of exact longs (or
  * one product of two such divisions); no logs (ln is not bit-portable
  * across libm implementations — rankings by N/df are identical because ln
  * is monotone). Hashes are md5 hex strings.
  */
object Search {

  private val duckToks = "string_split(lower(text), ' ')"

  val all: Seq[Q] = Seq(
    // ------------------------------------------------- TF-IDF keyword top-k
    // Map-side term frequencies (no per-occurrence explode shuffle),
    // broadcast vocabulary df, rank window on the max-cardinality doc_id
    // key. Score = tf·N/df — one exact-long division per row.
    Q("x_tfidf_topk", (s, d) => {
      graft.operators.Ranking.tfidfTopK(fanOut(documents(s, d)), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("score").desc, col("token"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      ex AS (SELECT doc_id, unnest(toks) AS token FROM t),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY doc_id, token),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
            WHERE text IS NOT NULL)
      SELECT doc_id, token, tf, df,
             CAST(tf * n_docs AS DOUBLE) / df AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
      QUALIFY row_number() OVER (PARTITION BY doc_id
        ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, token) <= 3
      ORDER BY doc_id, score DESC, token"""), headline = true),

    // ---------------------------------------------- PMI collocation mining
    // Top-30 bigrams by PMI odds c(ab)·N / (c(a)·c(b)) with a min-count
    // floor — phrase mining for tokenizer vocab induction. Both gram
    // orders count map-side (run-length over the sorted gram array, no
    // per-occurrence explode shuffle); exact DECIMAL/HUGEINT products,
    // one double division; global top-k is TakeOrderedAndProject.
    Q("x_collocations", (s, d) => {
      graft.operators.Ranking.collocations(fanOut(documents(s, d)),
        "doc_id", "text", minCount = 5, k = 30)
    }, Some(s"""
      WITH t AS (SELECT $duckToks AS toks FROM documents WHERE text IS NOT NULL),
      uo AS (SELECT unnest(toks) AS token FROM t),
      u AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM uo GROUP BY token),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM uo),
      bo AS (SELECT unnest(list_transform(range(1, len(toks)),
               i -> array_to_string(toks[i:i+1], ' '))) AS ng
             FROM t WHERE len(toks) >= 2),
      b AS (SELECT ng, CAST(COUNT(*) AS BIGINT) AS c12 FROM bo
            GROUP BY ng HAVING COUNT(*) >= 5)
      SELECT b.ng, b.c12, ua.c AS ca, ub.c AS cb,
             CAST(CAST(b.c12 AS HUGEINT) * n.n_tok AS DOUBLE)
               / CAST(CAST(ua.c AS HUGEINT) * ub.c AS DOUBLE) AS score
      FROM b
      JOIN u ua ON string_split(b.ng, ' ')[1] = ua.token
      JOIN u ub ON string_split(b.ng, ' ')[2] = ub.token
      CROSS JOIN n
      ORDER BY score DESC, b.ng LIMIT 30"""), headline = true),

    // ------------------------------------------------ capped inverted index
    // (token, exact df, first-10 postings). The posting cap is a typed
    // min-k Aggregator (map-side k-buffers) — never collect_list of a
    // stopword's whole-corpus posting list. Postings serialize to a csv
    // string for the driver comparator.
    Q("x_inverted_index", (s, d) => {
      graft.operators.Ranking.invertedIndex(fanOut(documents(s, d)), "doc_id", "text",
        maxPostings = 10)
        .orderBy(col("token"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      ex AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t)
      SELECT token, COUNT(*) AS df,
             array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      FROM ex GROUP BY token ORDER BY token""")),

    // ----------------------------------------------------- BM25 term scores
    // Log-free BM25 (k1=1.2, b=0.75): tf_norm and the idf odds-ratio are
    // each ONE double division of exact longs, the score their product —
    // bit-portable, rank-identical to the ln form. Corpus stats and df are
    // tiny broadcast aggregates; the corpus itself never shuffles.
    Q("x_bm25_terms", (s, d) => {
      graft.operators.Ranking.bm25TermScores(fanOut(documents(s, d)), "doc_id", "text",
        terms = Seq("data", "query", "stream"))
        .orderBy(col("doc_id"), col("term"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      q AS (SELECT unnest(['data','query','stream']) AS term),
      tf AS (SELECT doc_id, term, len(toks) AS dl,
                    len(list_filter(toks, x -> x = term)) AS tf
             FROM t CROSS JOIN q),
      df AS (SELECT term, COUNT(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
      st AS (SELECT COUNT(*) AS n_docs,
                    CAST(SUM(len($duckToks)) AS BIGINT) AS total_len
             FROM documents)
      SELECT doc_id, term, tf, df, dl,
             CAST(CAST(22 AS HUGEINT) * tf * total_len AS DOUBLE)
               / CAST(CAST(10 AS HUGEINT) * total_len * tf + CAST(3 AS HUGEINT) * total_len
                      + CAST(9 AS HUGEINT) * dl * n_docs AS DOUBLE) AS tf_norm,
             CAST(2 * n_docs - 2 * df + 1 AS DOUBLE) / (2 * df + 1) AS idf_odds,
             (CAST(CAST(22 AS HUGEINT) * tf * total_len AS DOUBLE)
               / CAST(CAST(10 AS HUGEINT) * total_len * tf + CAST(3 AS HUGEINT) * total_len
                      + CAST(9 AS HUGEINT) * dl * n_docs AS DOUBLE))
              * (CAST(2 * n_docs - 2 * df + 1 AS DOUBLE) / (2 * df + 1)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN st
      WHERE tf > 0
      ORDER BY doc_id, term""")),

    // ------------------------------------- hybrid retrieval (RRF fusion)
    // The standard two-retriever stack fused by reciprocal-rank fusion
    // (Ranking.rrfFuse, Cormack 2009): per query, an EMBEDDING list
    // (exact cosine top-20, Ann.bruteTopK — the whitelisted brute
    // baseline; a production stack swaps in the banded LSH probe, same
    // (q_id, rank, neighbor_id) shape) and a LEXICAL list (BM25 term
    // scores ranked by the same two-phase top-k — never a rank window).
    // Fusion is exact-integer: 2^20 div (60 + rank) summed per
    // candidate, one shuffle of (queries × k × 2) rows. Queries are
    // vec_id 0..2 ≡ the terms data/query/stream (doc_id ≡ vec_id);
    // the two lists cover different candidate universes (embedding
    // corpus starts at vec_id 10, lexical sees every doc) — RRF fuses
    // them without score calibration, which is its whole point.
    Q("x_search_rrf", (s, d) => {
      val e = embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      val sem = graft.operators.Ann
        .bruteTopK(e.filter(col("id") < 3), fanOut(e.filter(col("id") >= 10)),
          k = 20)
        .select(col("q_id"), col("rank"), col("neighbor_id"))
      val lexScored = graft.operators.Ranking
        .bm25TermScores(fanOut(documents(s, d)), "doc_id", "text",
          terms = Seq("data", "query", "stream"))
        .select(
          expr("CASE term WHEN 'data' THEN 0L WHEN 'query' THEN 1L ELSE 2L END")
            .as("q_id"),
          col("doc_id").as("c_id"), col("score").as("cos"))
      val lex = graft.operators.Ann.rankTopK(lexScored, 20)
        .select(col("q_id"), col("rank"), col("neighbor_id"))
      graft.operators.Ranking.rrfFuse(Seq(sem, lex), kRrf = 60,
        scale = 1048576L)
        .orderBy(col("q_id"), col("rrf_score").desc, col("doc_id"))
    }, Some(s"""
      WITH e AS (
        SELECT vec_id, embedding,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, 65),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings),
      sem_scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS nid,
               (list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, 65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
                 (acc, v) -> acc + v)) / (q.nrm * c.nrm) AS sc
        FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id >= 10),
      sem AS (
        SELECT q_id, nid,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY sc DESC, nid ASC) AS rank
        FROM sem_scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY sc DESC, nid ASC) <= 20),
      t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      qt AS (SELECT * FROM (VALUES (0, 'data'), (1, 'query'), (2, 'stream'))
             AS qt(q_id, term)),
      ltf AS (SELECT doc_id, q_id, term, len(toks) AS dl,
                     len(list_filter(toks, x -> x = term)) AS tf
              FROM t CROSS JOIN qt),
      ldf AS (SELECT term, COUNT(*) AS df FROM ltf WHERE tf > 0 GROUP BY term),
      lst AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(len($duckToks)) AS BIGINT) AS total_len
              FROM documents),
      lex_scored AS (
        SELECT q_id, doc_id AS nid,
               (CAST(CAST(22 AS HUGEINT) * tf * total_len AS DOUBLE)
                 / CAST(CAST(10 AS HUGEINT) * total_len * tf
                        + CAST(3 AS HUGEINT) * total_len
                        + CAST(9 AS HUGEINT) * dl * n_docs AS DOUBLE))
                * (CAST(2 * n_docs - 2 * df + 1 AS DOUBLE) / (2 * df + 1)) AS sc
        FROM ltf JOIN ldf USING (term) CROSS JOIN lst
        WHERE tf > 0),
      lex AS (
        SELECT q_id, nid,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY sc DESC, nid ASC) AS rank
        FROM lex_scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY sc DESC, nid ASC) <= 20),
      u AS (SELECT q_id, nid, rank FROM sem
            UNION ALL SELECT q_id, nid, rank FROM lex)
      SELECT CAST(q_id AS BIGINT) AS q_id, nid AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lists,
             COALESCE(CAST(SUM(1048576 // (60 + rank)) AS BIGINT),
                      CAST(0 AS BIGINT)) AS rrf_score
      FROM u GROUP BY q_id, nid
      ORDER BY q_id, rrf_score DESC, doc_id"""), headline = true),

    // --------------------------------------- C4-style cross-doc line dedup
    // Remove every 4-token "line" occurring in ≥2 distinct documents;
    // reassemble survivors in order. Banned lines aggregate by 16-byte
    // digest and broadcast back as an anti-join — the corpus-sized line
    // relation never shuffles to filter; reassembly is the only full
    // shuffle (on doc_id).
    Q("x_line_dedup", (s, d) => {
      graft.operators.TextDedup.stripCommonLines(fanOut(documents(s, d)),
        "doc_id", "text", width = 4, minDocs = 2)
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      l AS (SELECT doc_id,
                   unnest(range(0, (len(toks) + 3) // 4)) AS pos,
                   unnest(list_transform(range(0, (len(toks) + 3) // 4),
                     i -> array_to_string(toks[4*i+1 : 4*i+4], ' '))) AS line
            FROM t),
      banned AS (SELECT md5(line) AS h FROM l
                 GROUP BY md5(line) HAVING COUNT(DISTINCT doc_id) >= 2),
      clean AS (SELECT doc_id, COUNT(*) AS n_lines_kept,
                       string_agg(line, ' ' ORDER BY pos) AS text_clean
                FROM l WHERE md5(line) NOT IN (SELECT h FROM banned)
                GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(c.n_lines_kept, 0) AS n_lines_kept,
             COALESCE(c.text_clean, '') AS text_clean
      FROM documents d LEFT JOIN clean c ON d.doc_id = c.doc_id
      ORDER BY d.doc_id"""), headline = true)
  )
}
