package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table: quality stats, language-ID heuristic, tokenizer-style
  * token counting, and shingle fingerprinting.
  *
  * All are pure per-row projections (no shuffle at all — they scale
  * linearly to any data size and stay inside whole-stage codegen). The only
  * shuffle in this file is the final ORDER BY, which exists solely for the
  * deterministic oracle compare.
  *
  * Determinism: ratios are single IEEE double divisions of exact integers —
  * bit-identical in any engine. Hashes are md5 hex strings (identical in
  * Spark and DuckDB).
  */
object TextAnalysis {

  // Spark-side token array (lowercased, whitespace split).
  private val toks = "split(lower(text), ' ')"

  private val stopEn = "'the','a','and','of','to','is'"
  private val stopEs = "'el','la','de','los','y','en'"
  private val stopFr = "'le','les','des','et','un','une'"
  private val stopDe = "'der','die','das','und','ein','zu'"

  /** Alphabet rotated by `k` — the lang-id fixture's "language". */
  private[queries] def rotAlpha(k: Int): String =
    (0 until 26).map(i => ('a' + ((i + k) % 26)).toChar).mkString

  /** Per-lang alphabet rotation for the TRAINED lang-id fixtures: the
    * corpus text carries the same vocabulary under every lang label
    * (the label is synthetic metadata), so the fixture SYNTHESIZES
    * genuinely lang-distinct text by rotating the alphabet per label —
    * five disjoint char-trigram distributions a classifier can actually
    * learn. `translate` has identical 3-arg semantics in both engines;
    * the emitted SQL text is identical too. */
  private[queries] val langXformSql: String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    s"""CASE lang WHEN 'de' THEN translate(lower(text), '$a', '${rotAlpha(1)}')
       |          WHEN 'es' THEN translate(lower(text), '$a', '${rotAlpha(5)}')
       |          WHEN 'fr' THEN translate(lower(text), '$a', '${rotAlpha(9)}')
       |          WHEN 'zh' THEN translate(lower(text), '$a', '${rotAlpha(13)}')
       |          ELSE lower(text) END""".stripMargin
  }

  /** The training-seed label: ~2/7 of docs keep their true lang, the
    * rest classify unlabeled. Identical text in both engines. */
  private[queries] val langSeedSql: String =
    "CASE WHEN doc_id % 7 < 2 THEN lang ELSE NULL END"

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------ quality stats
    Q("x_text_stats", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("toks", expr(toks))
        .select(
          col("doc_id"),
          expr("size(toks)").as("n_tokens"),
          expr("length(text)").as("len_chars"),
          // avg token length: exact int sum / int count, one double divide.
          expr("CAST(aggregate(transform(toks, t -> length(t)), 0, (a, v) -> a + v) AS DOUBLE) / size(toks)")
            .as("avg_token_len"),
          // type-token ratio (lexical diversity quality signal).
          expr("CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)")
            .as("ttr"),
          // stopword ratio (junk/quality signal).
          expr(s"CAST(size(filter(toks, t -> t IN ($stopEn))) AS DOUBLE) / size(toks)")
            .as("stopword_ratio"),
          // non [a-z0-9 space] chars per char (punctuation density).
          expr("CAST(length(regexp_replace(text, '[a-z0-9 ]', '')) AS DOUBLE) / length(text)")
            .as("punct_ratio"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             length(text) AS len_chars,
             CAST(list_reduce(list_prepend(0, list_transform(string_split(lower(text), ' '), t -> length(t))), (a, v) -> a + v) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS avg_token_len,
             CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS ttr,
             CAST(len(list_filter(string_split(lower(text), ' '), t -> t IN ($stopEn))) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS stopword_ratio,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio
      FROM documents ORDER BY doc_id"""), headline = true),

    // ------------------------------------------- language-ID (n-gram/stopword)
    // Classic fast lang-ID: per-language stopword hit counts, argmax with a
    // fixed priority tie-break. Per-row only; the language lists would be
    // broadcast literals at any scale.
    Q("x_lang_id", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("toks", expr(toks))
        .withColumn("s_en", expr(s"size(filter(toks, t -> t IN ($stopEn)))"))
        .withColumn("s_es", expr(s"size(filter(toks, t -> t IN ($stopEs)))"))
        .withColumn("s_fr", expr(s"size(filter(toks, t -> t IN ($stopFr)))"))
        .withColumn("s_de", expr(s"size(filter(toks, t -> t IN ($stopDe)))"))
        .select(
          col("doc_id"), col("s_en"), col("s_es"), col("s_fr"), col("s_de"),
          expr("""CASE WHEN s_en >= greatest(s_es, s_fr, s_de) THEN 'en'
                       WHEN s_es >= greatest(s_fr, s_de) THEN 'es'
                       WHEN s_fr >= s_de THEN 'fr'
                       ELSE 'de' END""").as("lang_pred"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sc AS (
        SELECT doc_id,
               len(list_filter(toks, t -> t IN ($stopEn))) AS s_en,
               len(list_filter(toks, t -> t IN ($stopEs))) AS s_es,
               len(list_filter(toks, t -> t IN ($stopFr))) AS s_fr,
               len(list_filter(toks, t -> t IN ($stopDe))) AS s_de
        FROM t)
      SELECT doc_id, s_en, s_es, s_fr, s_de,
             CASE WHEN s_en >= greatest(s_es, s_fr, s_de) THEN 'en'
                  WHEN s_es >= greatest(s_fr, s_de) THEN 'es'
                  WHEN s_fr >= s_de THEN 'fr'
                  ELSE 'de' END AS lang_pred
      FROM sc ORDER BY doc_id""")),

    // -------------------------------------- language-ID (TRAINED, fastText)
    // The deployable form (CCNet pairs its LM with exactly this): a
    // multi-class linear classifier over hashed CHAR-trigram features,
    // trained on a ~2/7 labeled seed in exact integers
    // (Ranking.langId — per-(lang, bucket) ratio weights centered at
    // each class prior, argmax by min-struct, never a rank window) and
    // applied to the WHOLE corpus. The fixture rotates the alphabet per
    // true lang (langXformSql) so the five classes carry genuinely
    // distinct trigram distributions; `hit` audits accuracy per row.
    // One corpus scan feeds the staged feature relation (weights +
    // scoring); the weight table is ≤ |langs|·4096 rows, broadcast.
    Q("x_lang_id_trained", (s, d) => {
      val docs = fanOut(documents(s, d)).filter(col("text").isNotNull)
        .withColumn("__lt", expr(langXformSql))
        .withColumn("__lbl", expr(langSeedSql))
      val pred = graft.operators.Ranking.langId(
        docs, "doc_id", "__lt", col("__lbl"))
      docs.select(col("doc_id"), col("lang").as("lang_true"))
        .join(pred, "doc_id")
        .select(col("doc_id"), col("lang_true"), col("lang_pred"),
          col("score"),
          expr("CAST(CASE WHEN lang_pred = lang_true THEN 1 ELSE 0 END AS BIGINT)")
            .as("hit"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH lsrc AS (
        SELECT doc_id, lang AS lang_true, $langXformSql AS lt,
               $langSeedSql AS lang
        FROM documents WHERE text IS NOT NULL),
      ${graft.operators.Ranking.duckLangCtes("lsrc")}
      SELECT s.doc_id, s.lang_true, p.lang_pred, p.score,
             CAST(CASE WHEN p.lang_pred = s.lang_true THEN 1 ELSE 0 END
                  AS BIGINT) AS hit
      FROM lpick p JOIN lsrc s ON s.doc_id = p.doc_id
      ORDER BY s.doc_id"""), headline = true),

    // ------------------------- lang-ID, reference → candidates (gate twin)
    // The streaming deployment (streaming.ScoreIngest.startLangGate,
    // gate family #33): weights train on the LABELED reference subset
    // (doc_id % 10 ≠ 0) and the candidate batch (doc_id % 10 = 0)
    // classifies against the FROZEN weights — candidate features
    // project UNSTAGED (micro-batches must classify without a staging
    // write); streamed batches through the gate emit exactly these
    // rows. Candidate grams outside the trained bucket set contribute
    // to no class; a candidate sharing no trained bucket would emit
    // nothing (none here — the rotated alphabets share the hash space).
    Q("x_lang_id_incremental", (s, d) => {
      import graft.operators.Ranking
      val docs = fanOut(documents(s, d)).filter(col("text").isNotNull)
        .withColumn("__lt", expr(langXformSql))
      // the training features feed ONLY the settled counts, so they stay
      // UNSTAGED — the projection executes once, inside the collect job
      // (r18; the old shape staged them, then classifyLangs' class-list
      // collect re-executed the four lazy weight rollups and the final
      // plan executed them AGAIN — the repeated-subplan pattern r17
      // eliminated elsewhere, flagged by its advice file here).
      val (w, langs) = Ranking.settledLangWeights(
        Ranking.langFeatureRelation(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "__lt",
          col("lang")))
      val cand = docs.filter(col("doc_id") % 10 === 0)
      Ranking.classifyLangs(
        Ranking.langFeatureRelation(cand, "doc_id", "__lt",
          lit(null).cast("string"))
          .select(col("doc_id"), col("bk"), col("tf")),
        w, Some(langs))
        .join(cand.select(col("doc_id"), col("lang").as("lang_true")),
          "doc_id")
        .select(col("doc_id"), col("lang_true"), col("lang_pred"),
          col("score"),
          expr("CAST(CASE WHEN lang_pred = lang_true THEN 1 ELSE 0 END AS BIGINT)")
            .as("hit"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH lsrc AS (
        SELECT doc_id, lang AS lang_true, $langXformSql AS lt,
               CASE WHEN doc_id % 10 <> 0 THEN lang ELSE NULL END AS lang
        FROM documents WHERE text IS NOT NULL),
      ${graft.operators.Ranking.duckLangCtes("lsrc")}
      SELECT s.doc_id, s.lang_true, p.lang_pred, p.score,
             CAST(CASE WHEN p.lang_pred = s.lang_true THEN 1 ELSE 0 END
                  AS BIGINT) AS hit
      FROM lpick p JOIN lsrc s ON s.doc_id = p.doc_id
      WHERE s.doc_id % 10 = 0
      ORDER BY s.doc_id""")),

    // ----------------------------------------------- tokenizer-style counts
    // BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
    // (the GPT-2 pre-tokenizer shape, regex kept RE2/Java-compatible).
    Q("x_token_count", (s, d) => {
      fanOut(documents(s, d))
        .select(
          col("doc_id"),
          expr("size(split(text, ' '))").as("n_ws_tokens"),
          expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
            .as("n_bpe_tokens"),
          // ~chars-per-token, a compression-quality signal.
          expr("CAST(length(text) AS DOUBLE) / size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
            .as("chars_per_token"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
             CAST(length(text) AS DOUBLE)
               / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS chars_per_token
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------ winnowing (SIGMOD'03)
    // Winnowing (Schleimer/Wilkerson/Aiken): hash every 4-word shingle,
    // slide a window of 5 consecutive hashes, keep each window's MIN —
    // guaranteed-coverage fingerprints at ~2/(w+1) density. The MOSS-style
    // scale path for substring-level overlap detection: downstream,
    // fingerprints join on equality (the same inverted-index shape as the
    // shingle/band joins). Per-row projection, no shuffle.
    Q("x_winnow", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("toks", expr(toks))
        .withColumn("hs",
          expr("transform(sequence(1, greatest(size(toks) - 3, 1)), i -> md5(concat_ws(' ', slice(toks, i, 4))))"))
        .withColumn("fps",
          expr("array_sort(array_distinct(transform(sequence(1, greatest(size(hs) - 4, 1)), j -> array_min(slice(hs, j, 5)))))"))
        .select(col("doc_id"), expr("size(fps)").as("n_fps"),
          expr("array_join(fps, ',')").as("fingerprints"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      h AS (SELECT doc_id,
                   list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
                     i -> md5(array_to_string(toks[i:i+3], ' '))) AS hs
            FROM t),
      w AS (SELECT doc_id,
                   list_sort(list_distinct(list_transform(
                     range(1, greatest(len(hs) - 4, 1) + 1),
                     j -> list_min(hs[j:j+4])))) AS fps
            FROM h)
      SELECT doc_id, len(fps) AS n_fps, array_to_string(fps, ',') AS fingerprints
      FROM w ORDER BY doc_id""")),

    // --------------------------------------------- document fingerprinting
    // Min/max shingle digests as a 2-value document fingerprint (min-hash
    // of a rolling shingle window). Identical/near-identical docs collide
    // on fp_min; x_winnow above is the full-coverage variant.
    Q("x_fingerprint", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("toks", expr(toks))
        .withColumn("shingles",
          expr("transform(sequence(1, greatest(size(toks) - 3, 1)), i -> md5(concat_ws(' ', slice(toks, i, 4))))"))
        .select(
          col("doc_id"),
          expr("array_min(shingles)").as("fp_min"),
          expr("array_max(shingles)").as("fp_max"),
          expr("size(shingles)").as("n_shingles"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sh AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
                              i -> md5(array_to_string(toks[i:i+3], ' '))) AS shingles
        FROM t)
      SELECT doc_id, list_min(shingles) AS fp_min, list_max(shingles) AS fp_max,
             len(shingles) AS n_shingles
      FROM sh ORDER BY doc_id"""))
  ,

    // ------------------------------------- Unicode NFC canonicalization
    // graft.functions.NfcNormalize (native codegen'd expression; DuckDB
    // twin = its built-in nfc_normalize, both implementing UAX #15):
    // decomposed codepoint sequences hash apart from their precomposed
    // equivalents through EVERY digest-keyed operator, so canonicalization
    // is the mandatory first pass of a multilingual pipeline. The oracle
    // is load-bearing: each document gets a DECOMPOSED "café" suffix
    // (e + U+0301 built from raw UTF-8 bytes), and both engines must
    // (a) change the digest by normalizing, (b) produce byte-identical
    // normalized digests, (c) land exactly on the precomposed form.
    Q("x_text_normalize", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      fanOut(documents(s, d))
        .withColumn("dec", expr("concat(text, ' caf', decode(unhex('65CC81'), 'UTF-8'))"))
        .withColumn("pre", expr("concat(text, ' caf', decode(unhex('C3A9'), 'UTF-8'))"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN md5(dec) <> md5(nfc_normalize(dec)) THEN 1 ELSE 0 END AS BIGINT)")
            .as("changed"),
          expr("md5(nfc_normalize(dec))").as("digest_norm"),
          expr("CAST(CASE WHEN nfc_normalize(dec) = pre THEN 1 ELSE 0 END AS BIGINT)")
            .as("composed"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (
        SELECT doc_id,
               text || ' caf' || decode(unhex('65CC81')) AS dec,
               text || ' caf' || decode(unhex('C3A9')) AS pre
        FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN md5(dec) <> md5(nfc_normalize(dec)) THEN 1 ELSE 0 END AS BIGINT) AS changed,
             md5(nfc_normalize(dec)) AS digest_norm,
             CAST(CASE WHEN nfc_normalize(dec) = pre THEN 1 ELSE 0 END AS BIGINT) AS composed
      FROM t ORDER BY doc_id""")),

    // -------------------------------------- subword (wordpiece) tokenize
    // graft.operators.Subword: greedy longest-match wordpiece over a
    // FROZEN vocab (the Wu et al. 2016 convention) — whole-word pieces
    // win over prefixes, `##` continuation pieces match past position 1,
    // no-match words collapse to [UNK]. The fixture vocab is chosen so
    // the corpus exercises every branch: whole-word hits (table/value/
    // scan/a/the), a multi-piece split through a prefix + continuation
    // (window → wind ##ow, agg → a ##gg), char-level fallback over a
    // PARTIAL alphabet, and [UNK] for words touching uncovered letters
    // (fast/hash/key/merge/query/…). The oracle replays the identical
    // fold in DuckDB (list_reduce over a prepended-state list), so every
    // piece sequence is string-compared exactly. The fold runs on the
    // DISTINCT word relation — the scale contract: tokenize the
    // dictionary, broadcast it, never re-tokenize per occurrence.
    Q("x_token_subword", (s, d) => {
      val words = fanOut(documents(s, d))
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "").distinct()
      graft.operators.Subword.wordpieceTable(words, demoVocab)
        .orderBy(col("word"))
    }, Some(s"""
      ${duckWordpiecePrefix}
      SELECT word,
             CASE WHEN unk THEN '[UNK]'
                  ELSE array_to_string(pieces, ' ') END AS pieces,
             CAST(CASE WHEN unk THEN 1 ELSE len(pieces) END AS BIGINT) AS n_pieces,
             unk AS is_unk
      FROM fin ORDER BY word""")),

    // ------------------------------------- pack by SUBWORD budget
    // The x_pack_sequences twin with the budget in model-tokenizer
    // subwords instead of whitespace words — what a real training mix
    // must budget by ([UNK] charges 1, multi-piece words charge their
    // pieces, so whitespace-packed bins can silently blow a model
    // context). Same greedy sequential bin rule; per-doc subword counts
    // ride the staged map-side tf projection joined against the
    // broadcast wordpiece table — one corpus scan, no per-occurrence
    // re-tokenization.
    Q("x_pack_subword", (s, d) => {
      graft.operators.Subword
        .packBySubwords(documents(s, d), shards = 8, budgetSubwords = 1024,
          vocab = demoVocab)
        .orderBy(col("shard"), col("bin"))
    }, Some(s"""
      ${duckWordpiecePrefix},
      np AS (
        SELECT word,
               CAST(CASE WHEN unk THEN 1 ELSE len(pieces) END AS BIGINT) AS n_pieces
        FROM fin),
      occ AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents),
      cnt AS (
        SELECT occ.doc_id, CAST(SUM(np.n_pieces) AS BIGINT) AS n_subwords
        FROM occ JOIN np ON occ.word = np.word
        GROUP BY occ.doc_id),
      c AS (
        SELECT doc_id % 8 AS shard, n_subwords,
               CAST(SUM(n_subwords) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM cnt)
      SELECT shard, CAST((cum - n_subwords) // 1024 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_subwords) AS BIGINT) AS subwords
      FROM c GROUP BY shard, bin ORDER BY shard, bin""")),

    // ------------------------------------- BPE merge-rank tokenize
    // graft.operators.Subword.bpeTable: the OTHER tokenizer family —
    // byte-pair-encoding merge-rank application (Sennrich et al. 2016,
    // the GPT/Llama convention): a frozen ORDERED merge list; each step
    // merges the leftmost occurrence of the minimum-RANK adjacent pair
    // until no pair is in the table; unmerged chars stay as tokens (no
    // [UNK]). The fixture exercises rank-beats-position ('ther': t+h
    // first, then e+r beats the later-created th+e), full-chain merges
    // ('the' → one token), merged-symbol merges (t+er, or+t), and
    // untouched words. The oracle replays the identical one-step-per-
    // recursion loop in DuckDB (list_reduce's struct-accumulator
    // corruption rules out a lambda fold — same recursive-CTE discipline
    // as the wordpiece twin). Fold runs on the DISTINCT word relation.
    Q("x_token_bpe", (s, d) => {
      val words = fanOut(documents(s, d))
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "").distinct()
      graft.operators.Subword.bpeTable(words, demoMerges)
        .orderBy(col("word"))
    }, Some(s"""
      ${duckBpePrefix}
      SELECT word, array_to_string(syms, ' ') AS tokens,
             CAST(len(syms) AS BIGINT) AS n_tokens
      FROM fin ORDER BY word""")),

    // ------------------------------------- pack by BPE-token budget
    // x_pack_subword's GPT/Llama twin: the bin budget counted in
    // merge-rank BPE tokens. Same staged-tf + broadcast-token-table
    // single-corpus-scan shape; same greedy sequential bin rule.
    Q("x_pack_bpe", (s, d) => {
      graft.operators.Subword
        .packByBpe(documents(s, d), shards = 8, budgetTokens = 1024,
          merges = demoMerges)
        .orderBy(col("shard"), col("bin"))
    }, Some(s"""
      ${duckBpePrefix},
      np AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens FROM fin),
      occ AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents),
      cnt AS (
        SELECT occ.doc_id, CAST(SUM(np.n_tokens) AS BIGINT) AS n_bpe
        FROM occ JOIN np ON occ.word = np.word
        GROUP BY occ.doc_id),
      c AS (
        SELECT doc_id % 8 AS shard, n_bpe,
               CAST(SUM(n_bpe) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM cnt)
      SELECT shard, CAST((cum - n_bpe) // 1024 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens
      FROM c GROUP BY shard, bin ORDER BY shard, bin""")),

    // ------------------------------------------ BPE merge TRAINING
    // graft.operators.Subword.trainBpe: the TRAINING half of the BPE
    // family — x_token_bpe/x_pack_bpe APPLY a frozen merge list; this
    // LEARNS one from the corpus (Sennrich et al. 2016): k rounds of
    // "count adjacent piece pairs weighted by word frequency, merge the
    // most frequent everywhere" over the distinct-word dictionary, ties
    // pinned lexicographically-smallest in both engines. The learned
    // artifact feeds bpeTable directly (train → apply composes). Merge
    // application is replace('|a||b|', '|ab|') on double-delimited
    // segmentations — both engines' replace is leftmost-non-overlapping,
    // which IS the BPE convention (aaa merges once per round); the audit
    // relation (iter, a, b, cnt, tokens_after) is recomputed in-plan
    // from the staged per-round dictionaries (stagedQueries whitelist).
    // The oracle replays the identical k rounds as chained MATERIALIZED
    // CTEs (each round is referenced by the argmax, the next round, and
    // the final row — inlining would re-execute subtrees exponentially,
    // the x_pipeline_modern DuckDB lesson). tokens_after is the
    // independent check on the replace semantics: it counts ACTUAL
    // non-overlapping replacements, not raw (overlapping) pair counts.
    Q("x_token_bpe_train", (s, d) => {
      graft.operators.Subword.trainBpe(
        fanOut(documents(s, d)), "text", k = 4)._2
    }, Some(s"""
      WITH ${duckTrainBpeCtes(4)}
      ${(1 to 4).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS iter, m$i.a, m$i.b, m$i.cnt,
           |  (SELECT CAST(SUM(freq * len(string_split(substr(seg, 2, length(seg) - 2), '||'))) AS BIGINT)
           |   FROM s$i) AS tokens_after
           |FROM m$i""".stripMargin).mkString("\nUNION ALL\n")}
      ORDER BY iter"""), headline = true),

    // ----------------------- mergeable distinct-count sketch (HLL registers)
    // Per-language distinct-token cardinality via HyperLogLog registers
    // (TypedAggregators.HllRegisters, p = 6 → 64 registers): register j
    // keeps the max rank among md5-derived 60-bit hashes routed to it.
    // Unlike Misra–Gries or KLL, the register STATE is a pure function of
    // the input SET (max is commutative + idempotent, partitioning can't
    // move it) — so the sketch itself is oracle-checked BITWISE here, and
    // per-batch folding is exactly ≡ recompute (the property
    // streaming.CardinalityIngest's gate builds on). scale_sum =
    // Σ 2^(55 − M_j) is the exact-BIGINT monotone cardinality proxy (the
    // float α·m²/sum estimate stays off-engine — no-libm discipline).
    // Scale shape: the aggregator runs as a map-side partial (64-entry
    // buffers merge across the shuffle); the corpus never shuffles rows.
    // The register vector is emitted COMMA-JOINED (a bijection of the
    // array — the bitwise check is unchanged): the driver's row-sorting
    // comparator cannot hash array cells (the q_array_agg discipline,
    // Relational2's array_join pattern; RegistrySpec lints it now).
    Q("x_distinct_sketch", (s, d) => {
      import s.implicits._
      val toks = fanOut(documents(s, d))
        .select(col("lang"), explode(expr("split(text, ' ')")).as("t"))
        .as[(String, String)]
      toks.groupByKey(_._1).mapValues(_._2)
        .agg(new graft.operators.TypedAggregators.HllRegisters(6)
          .toColumn.name("registers"))
        .toDF("lang", "registers")
        .select(col("lang"),
          expr("array_join(transform(registers, x -> CAST(x AS STRING)), ',')")
            .as("registers"),
          expr("""aggregate(registers, CAST(0 AS BIGINT),
                   (acc, r) -> acc + shiftleft(CAST(1 AS BIGINT),
                                               CAST(55 - r AS INT)))""")
            .as("scale_sum"))
        .orderBy(col("lang"))
    }, Some("""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
                   FROM documents),
      h AS (SELECT lang,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, 16), k ->
                       CAST(strpos('0123456789abcdef',
                         substr(md5(t), k, 1)) - 1 AS BIGINT))),
                     (acc, hv) -> acc * 16 + hv) AS h
            FROM tok),
      r AS (SELECT lang, h % 64 AS j,
                   CASE WHEN h // 64 = 0 THEN 55
                        ELSE 55 - length(bin(h // 64)) END AS rho
            FROM h),
      regs AS (SELECT lang, j, MAX(rho) AS m FROM r GROUP BY lang, j),
      langs AS (SELECT DISTINCT lang FROM documents),
      idx AS (SELECT lang, unnest(range(0, 64)) AS j FROM langs),
      dense AS (SELECT idx.lang, idx.j, COALESCE(regs.m, CAST(0 AS BIGINT)) AS m
                FROM idx LEFT JOIN regs
                  ON idx.lang = regs.lang AND idx.j = regs.j)
      SELECT lang, array_to_string(list(m ORDER BY j), ',') AS registers,
             CAST(SUM(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT) AS scale_sum
      FROM dense GROUP BY lang ORDER BY lang""")),

    // ----------------------- mergeable frequency sketch (count–min cells)
    // Per-language count–min sketch (TypedAggregators.CmsCounts, depth 4 ×
    // width 256) over token occurrences. Like the HLL registers — and
    // unlike Misra–Gries — the cell state is a pure order/partitioning-
    // independent function of the input MULTISET (cell-wise sums commute),
    // so the sketch itself is oracle-checked BITWISE. Row j's hash is bit
    // slice j of ONE md5-derived 60-bit hash (floor-div/mod arithmetic
    // both engines state exactly); the point estimate (min over rows of
    // the probed cells) is one-sided: est ≥ true count always — est_join
    // upper-bounds a common token, est_absent shows the absent-token
    // floor. Scale shape: map-side partial 1024-cell buffers merge across
    // the shuffle; token rows never shuffle.
    Q("x_sketch_cms", (s, d) => {
      import s.implicits._
      val toks = fanOut(documents(s, d))
        .select(col("lang"), explode(expr("split(text, ' ')")).as("t"))
        .as[(String, String)]
      toks.groupByKey(_._1).mapValues(p => (p._2, 1L))
        .agg(new graft.operators.TypedAggregators.CmsCounts(4, 8)
          .toColumn.name("cells"))
        .toDF("lang", "cells")
        .select(col("lang"),
          // comma-joined bijection of the cell vector — driver-comparator
          // rows must be scalar (RegistrySpec no-array-output lint)
          expr("array_join(transform(cells, x -> CAST(x AS STRING)), ',')")
            .as("cells"),
          expr("CAST(aggregate(cells, CAST(0 AS BIGINT), (acc, c) -> acc + c) div 4 AS BIGINT)")
            .as("total_weight"),
          expr(sparkCmsEst("cells", "'join'")).as("est_join"),
          expr(sparkCmsEst("cells", "'zzz-absent'")).as("est_absent"))
        .orderBy(col("lang"))
    }, Some(s"""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
                   FROM documents),
      hh AS (SELECT lang, ${duckHash60("t")} AS h FROM tok),
      js AS (SELECT unnest(range(0, 4)) AS j),
      cidx AS (SELECT lang,
                      CAST(j * 256 + (h // (CASE j WHEN 0 THEN 1
                                                   WHEN 1 THEN 256
                                                   WHEN 2 THEN 65536
                                                   ELSE 16777216 END)) % 256
                           AS BIGINT) AS idx
               FROM hh CROSS JOIN js),
      sums AS (SELECT lang, idx, COUNT(*) AS cnt FROM cidx GROUP BY lang, idx),
      langs AS (SELECT DISTINCT lang FROM documents),
      grid AS (SELECT lang, unnest(range(0, 1024)) AS idx FROM langs),
      dense AS (SELECT grid.lang, grid.idx,
                       COALESCE(sums.cnt, CAST(0 AS BIGINT)) AS cnt
                FROM grid LEFT JOIN sums
                  ON grid.lang = sums.lang AND grid.idx = sums.idx),
      cl AS (SELECT lang, list(cnt ORDER BY idx) AS cells_arr,
                    CAST(SUM(cnt) // 4 AS BIGINT) AS total_weight
             FROM dense GROUP BY lang),
      ph AS (SELECT ${duckHash60("'join'")} AS hj,
                    ${duckHash60("'zzz-absent'")} AS ha)
      SELECT lang, array_to_string(cells_arr, ',') AS cells, total_weight,
             ${duckCmsEst("cells_arr", "hj")} AS est_join,
             ${duckCmsEst("cells_arr", "ha")} AS est_absent
      FROM cl CROSS JOIN ph ORDER BY lang""")),

    // ----------------- KMV distinct-value sketch with SET OPERATIONS
    // Per-source k-minimum-values sketch (TypedAggregators.KmvValues,
    // k = 64) over token hash60s, then the CROSS-SOURCE OVERLAP matrix
    // from the sketch states alone: merged k-set of (a, b) = the union's
    // exact k smallest (computable from the two k-sets — any of the
    // union's k smallest is among its own side's k smallest), and the
    // fraction of the merged k-set present in BOTH sides estimates the
    // Jaccard — what a curation pipeline reads before source mixing
    // ("how much does src_a overlap src_b"), and what HLL registers
    // cannot answer (no set algebra beyond union). Like HLL the k-set
    // state is a pure order/partitioning/idempotent function of the
    // input SET, so sketch AND merged states are oracle-checked BITWISE.
    // Emitted values stay exact integers: n_shared counts merged-k-set
    // members in both sides; the k-th minimum is the monotone
    // cardinality proxy (the hllScaleSum discipline — the float
    // (k−1)·2^60/v_k estimate stays off-engine). Scale shape: the
    // aggregator runs as a map-side partial (≤ 64-long buffers merge
    // across the shuffle; token rows never shuffle); the staged 20-row
    // sketch relation feeds both sides of the pair join (stagedQueries
    // whitelist), so one corpus scan total; the pair algebra runs over
    // |sources|² sketch rows, never data.
    Q("x_sketch_kmv", (s, d) => {
      import s.implicits._
      val toks = fanOut(documents(s, d))
        .select(col("source"), explode(expr("split(text, ' ')")).as("t"))
        .as[(String, String)]
      val ks = graft.sources.Tables.stage(
        toks.groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.TypedAggregators.KmvValues(64)
            .toColumn.name("kset"))
          .toDF("source", "kset"))
      val a = ks.select(col("source").as("source_a"), col("kset").as("__ka"))
      val b = ks.select(col("source").as("source_b"), col("kset").as("__kb"))
      a.join(broadcast(b), col("source_a") < col("source_b"))
        .withColumn("__mg",
          expr("slice(array_sort(array_union(__ka, __kb)), 1, 64)"))
        .select(col("source_a"), col("source_b"),
          expr("""CAST(size(filter(__mg,
                 |  v -> array_contains(__ka, v) AND array_contains(__kb, v)))
                 |AS BIGINT)""".stripMargin).as("n_shared"),
          expr("element_at(__ka, size(__ka))").as("kth_a"),
          expr("element_at(__kb, size(__kb))").as("kth_b"),
          // comma-joined bijection (RegistrySpec no-array-output lint)
          expr("array_join(transform(__mg, x -> CAST(x AS STRING)), ',')")
            .as("kset_union"))
        .orderBy(col("source_a"), col("source_b"))
    }, Some(s"""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                   FROM documents),
      dh AS (SELECT DISTINCT source, ${duckHash60("t")} AS h FROM tok),
      rk AS (SELECT source, h,
                    row_number() OVER (PARTITION BY source ORDER BY h) AS r
             FROM dh),
      ks AS (SELECT source, list(h ORDER BY h) AS kset
             FROM rk WHERE r <= 64 GROUP BY source),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
                   a.kset AS ka, b.kset AS kb
            FROM ks a JOIN ks b ON a.source < b.source),
      m AS (SELECT *, list_sort(list_distinct(ka || kb))[1:64] AS mg FROM p)
      SELECT source_a, source_b,
             CAST(len(list_filter(mg,
               v -> list_contains(ka, v) AND list_contains(kb, v)))
               AS BIGINT) AS n_shared,
             ka[len(ka)] AS kth_a, kb[len(kb)] AS kth_b,
             array_to_string(mg, ',') AS kset_union
      FROM m ORDER BY source_a, source_b"""), headline = true),

    // ----------------- KMV set DIFFERENCE (a-not-b) from the same k-sets
    // The corpus-governance question corpusDiff answers exactly ("what is
    // in source A that source B lacks"), at sketch cost for cross-org
    // sharing: answered from the two 64-long k-sets alone, no data moves.
    // Validity discipline (Beyer et al. SIGMOD'07 K*-style): below
    // cut = least(kth_a, kth_b), membership is EXACT — v ≤ cut ∧ v ∈ A ⟹
    // v ∈ ka (ka holds ALL of A's hashes ≤ its k-th minimum) — so the
    // probe set is the merged k-set truncated to ≤ cut, and a_only/
    // b_only/shared within it are true set-membership counts of the
    // sampled hashes, not heuristics. |A\B|/|A∪B| ≈ n_a_only/n_valid;
    // the ratio stays off-engine (exact integers only, the hllScaleSum
    // discipline). Same bitwise-oracle status as x_sketch_kmv: every
    // emitted value is a pure order/partitioning-independent set
    // function of the inputs. Same scale shape too: map-side ≤64-long
    // partial buffers, staged 20-row sketch relation feeds both join
    // sides, pair algebra over |sources|² sketch rows, never data.
    Q("x_sketch_kmv_diff", (s, d) => {
      import s.implicits._
      val toks = fanOut(documents(s, d))
        .select(col("source"), explode(expr("split(text, ' ')")).as("t"))
        .as[(String, String)]
      val ks = graft.sources.Tables.stage(
        toks.groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.TypedAggregators.KmvValues(64)
            .toColumn.name("kset"))
          .toDF("source", "kset"))
      val a = ks.select(col("source").as("source_a"), col("kset").as("__ka"))
      val b = ks.select(col("source").as("source_b"), col("kset").as("__kb"))
      a.join(broadcast(b), col("source_a") < col("source_b"))
        .withColumn("__cut",
          expr("least(element_at(__ka, size(__ka)), element_at(__kb, size(__kb)))"))
        .withColumn("__mgv",
          expr("filter(slice(array_sort(array_union(__ka, __kb)), 1, 64), v -> v <= __cut)"))
        .select(col("source_a"), col("source_b"),
          expr("""CAST(size(filter(__mgv,
                 |  v -> array_contains(__ka, v) AND NOT array_contains(__kb, v)))
                 |AS BIGINT)""".stripMargin).as("n_a_only"),
          expr("""CAST(size(filter(__mgv,
                 |  v -> array_contains(__kb, v) AND NOT array_contains(__ka, v)))
                 |AS BIGINT)""".stripMargin).as("n_b_only"),
          expr("""CAST(size(filter(__mgv,
                 |  v -> array_contains(__ka, v) AND array_contains(__kb, v)))
                 |AS BIGINT)""".stripMargin).as("n_shared"),
          expr("CAST(size(__mgv) AS BIGINT)").as("n_valid"),
          col("__cut").as("cut"))
        .orderBy(col("source_a"), col("source_b"))
    }, Some(s"""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                   FROM documents),
      dh AS (SELECT DISTINCT source, ${duckHash60("t")} AS h FROM tok),
      rk AS (SELECT source, h,
                    row_number() OVER (PARTITION BY source ORDER BY h) AS r
             FROM dh),
      ks AS (SELECT source, list(h ORDER BY h) AS kset
             FROM rk WHERE r <= 64 GROUP BY source),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
                   a.kset AS ka, b.kset AS kb
            FROM ks a JOIN ks b ON a.source < b.source),
      m0 AS (SELECT *, least(ka[len(ka)], kb[len(kb)]) AS cut FROM p),
      m AS (SELECT *, list_filter(list_sort(list_distinct(ka || kb))[1:64],
                                  v -> v <= cut) AS mgv
            FROM m0)
      SELECT source_a, source_b,
             CAST(len(list_filter(mgv,
               v -> list_contains(ka, v) AND NOT list_contains(kb, v)))
               AS BIGINT) AS n_a_only,
             CAST(len(list_filter(mgv,
               v -> list_contains(kb, v) AND NOT list_contains(ka, v)))
               AS BIGINT) AS n_b_only,
             CAST(len(list_filter(mgv,
               v -> list_contains(ka, v) AND list_contains(kb, v)))
               AS BIGINT) AS n_shared,
             CAST(len(mgv) AS BIGINT) AS n_valid, cut
      FROM m ORDER BY source_a, source_b""")),

    // ------------------------ exact heavy hitters with a count–min prune
    // Global tokens with count ≥ 900, answered EXACTLY: the count–min
    // sketch (collected once — 1024 longs, by-contract driver-tiny) is a
    // map-side PRE-FILTER, and because CMS only over-estimates, the filter
    // admits a superset of the true heavy hitters; the exact
    // count-then-HAVING pass removes the false positives, so the sketch
    // never changes the answer — only what shuffles. Scale story: the
    // groupBy shuffle carries ONLY candidate tokens' partial counts
    // instead of the whole distinct token domain (the two-phase shape the
    // Misra–Gries doc points at, made exact). The staged tf relation
    // feeds both the sketch build and the candidate scan — one corpus
    // scan + tokenization total.
    Q("x_heavy_hitters", (s, d) => {
      val tf = graft.sources.Tables.stage(
        graft.operators.Ranking.termFrequencies(
          fanOut(documents(s, d)), "doc_id", "text"))
      graft.operators.Ranking.heavyHitters(tf, threshold = 900L)
    }, Some("""
      WITH occ AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                   FROM documents)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n
      FROM occ GROUP BY token HAVING COUNT(*) >= 900
      ORDER BY n DESC, token"""), headline = true),

    // ------------------------------------- unigram-LM (Viterbi) tokenize
    // graft.operators.Subword.unigramTable: the THIRD deployed subword
    // family — unigram-language-model segmentation (Kudo 2018, the
    // SentencePiece convention of T5/ALBERT/mBART): a frozen vocabulary
    // of pieces with integer costs; a word tokenizes to the MINIMUM-cost
    // segmentation (Viterbi DP), ties toward the longest final piece,
    // characters outside the vocab consumed one-at-a-time at the UNK
    // cost. The fixture exercises whole-word-beats-split ('the' 9 <
    // th+e 18), multi-piece optima ('customer' → cust+omer), the pinned
    // tie-break ('ba' = 'b'+'a' = 24 → 'ba' wins), and the UNK fallback
    // ('query' — 'q' is deliberately outside the vocab). The oracle
    // replays the identical DP as a recursive CTE carrying the best[0..i]
    // history per level, with the same combo = cost·32 + (32 − L)
    // argmin encoding (a scalar MIN — correlated arg_min(struct) trips a
    // DuckDB 1.0 binder bug). Fold runs on the DISTINCT word relation.
    Q("x_token_unigram", (s, d) => {
      val words = fanOut(documents(s, d))
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "").distinct()
      graft.operators.Subword.unigramTable(words, demoUnigramPieces)
        .orderBy(col("word"))
    }, Some(s"""
      ${duckUnigramPrefix}
      SELECT word, array_to_string(b.ts, ' ') AS tokens,
             CAST(len(b.ts) AS BIGINT) AS n_tokens, b.c AS cost
      FROM ufin ORDER BY word""")),

    // ------------------------------------- pack by unigram-token budget
    // The SentencePiece twin of x_pack_subword / x_pack_bpe: bin budgets
    // counted in Viterbi-optimal unigram tokens. Same staged-tf +
    // broadcast-token-table single-corpus-scan shape; same greedy
    // sequential bin rule.
    Q("x_pack_unigram", (s, d) => {
      graft.operators.Subword
        .packByUnigram(documents(s, d), shards = 8, budgetTokens = 1024,
          pieces = demoUnigramPieces)
        .orderBy(col("shard"), col("bin"))
    }, Some(s"""
      ${duckUnigramPrefix},
      unp AS (SELECT word, CAST(len(b.ts) AS BIGINT) AS n_tokens FROM ufin),
      uocc AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents),
      ucnt AS (
        SELECT uocc.doc_id, CAST(SUM(unp.n_tokens) AS BIGINT) AS n_uni
        FROM uocc JOIN unp ON uocc.word = unp.word
        GROUP BY uocc.doc_id),
      uc AS (
        SELECT doc_id % 8 AS shard, n_uni,
               CAST(SUM(n_uni) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM ucnt)
      SELECT shard, CAST((cum - n_uni) // 1024 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_uni) AS BIGINT) AS uni_tokens
      FROM uc GROUP BY shard, bin ORDER BY shard, bin""")),

    // ------------------------------- tokenizer compression comparison
    // The tokenizer-SELECTION metric: exact corpus chars-per-token under
    // each deployed family's frozen fixture vocab (wordpiece greedy
    // longest-match, BPE merge ranks, unigram Viterbi) — the number a
    // pipeline owner compares when choosing which learned artifact to
    // ship (more chars per token = the same corpus in fewer model
    // tokens). All three reuse the dictionary discipline: ONE staged
    // (word, occ) relation; each family tokenizes the DISTINCT words and
    // the occurrence-weighted totals come from a broadcast join — the
    // corpus text is scanned once, never re-tokenized per occurrence.
    // The oracle replays each family's proven recursive twin inside its
    // own parenthesized WITH (names collide across families — fin vs
    // fin — so each lives in a subquery scope).
    Q("x_token_compression", (s, d) => {
      import graft.operators.Subword
      val occ = stage(fanOut(documents(s, d))
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("occ")))
      def total(tbl: org.apache.spark.sql.DataFrame, nCol: String,
                name: String) =
        occ.join(broadcast(tbl.select(col("word"), col(nCol).as("__n"))), "word")
          .agg(
            sum(expr("occ * length(word)")).cast("long").as("total_chars"),
            sum(expr("occ * __n")).cast("long").as("total_tokens"))
          .select(lit(name).as("tokenizer"),
            col("total_chars"), col("total_tokens"),
            expr("CAST(total_chars AS DOUBLE) / total_tokens")
              .as("chars_per_token"))
      total(Subword.wordpieceTable(occ.select("word"), demoVocab),
          "n_pieces", "wordpiece")
        .unionByName(total(Subword.bpeTable(occ.select("word"), demoMerges),
          "n_tokens", "bpe"))
        .unionByName(total(
          Subword.unigramTable(occ.select("word"), demoUnigramPieces),
          "n_tokens", "unigram"))
        .orderBy(col("tokenizer"))
    }, Some(s"""
      SELECT tokenizer, total_chars, total_tokens,
             CAST(total_chars AS DOUBLE) / total_tokens AS chars_per_token
      FROM (
        SELECT * FROM (
          ${duckWordpiecePrefix},
          occ AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS occ
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  WHERE word <> '' GROUP BY word)
          SELECT 'wordpiece' AS tokenizer,
                 CAST(SUM(occ * length(f.word)) AS BIGINT) AS total_chars,
                 CAST(SUM(occ * (CASE WHEN f.unk THEN 1
                                      ELSE len(f.pieces) END)) AS BIGINT)
                   AS total_tokens
          FROM fin f JOIN occ ON f.word = occ.word)
        UNION ALL
        SELECT * FROM (
          ${duckBpePrefix},
          occ AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS occ
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  WHERE word <> '' GROUP BY word)
          SELECT 'bpe' AS tokenizer,
                 CAST(SUM(occ * length(f.word)) AS BIGINT) AS total_chars,
                 CAST(SUM(occ * len(f.syms)) AS BIGINT) AS total_tokens
          FROM fin f JOIN occ ON f.word = occ.word)
        UNION ALL
        SELECT * FROM (
          ${duckUnigramPrefix},
          occ AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS occ
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  WHERE word <> '' GROUP BY word)
          SELECT 'unigram' AS tokenizer,
                 CAST(SUM(occ * length(u.word)) AS BIGINT) AS total_chars,
                 CAST(SUM(occ * len(u.b.ts)) AS BIGINT) AS total_tokens
          FROM ufin u JOIN occ ON u.word = occ.word))
      ORDER BY tokenizer""")),

    // ------------------------------------- unigram-LM vocab TRAINING
    // graft.operators.Subword.trainUnigram: the learning half of the
    // unigram family — x_token_unigram applies a frozen scored vocab;
    // this LEARNS one by Viterbi-EM (the hard-EM variant of Kudo 2018's
    // SentencePiece recipe), restated in exact integers (cost =
    // length(bin(total)) − length(bin(cnt)) + 1, the HLL-rho integer
    // ⌊log2⌋ — no libm). Seed = all ≤4-char substrings counted at every
    // position; vocab = full char alphabet (UNK never fires) + top-24
    // multi-char pieces by (cnt DESC, piece ASC); each round re-segments
    // the dictionary with the SHARED Viterbi fold (train → apply
    // composes by construction), re-counts, re-costs, re-prunes. The
    // emitted trajectory (round, piece, cost) is the full training
    // history, recomputed in-plan from the staged per-round vocab
    // relations. Oracle = seed CTEs + one recursive DP per round against
    // the previous round's MATERIALIZED vocab CTE (the trainBpe
    // chained-round pattern; inlined vocab CTEs would re-execute whole
    // rounds per DP level).
    Q("x_token_unigram_train", (s, d) => {
      graft.operators.Subword.trainUnigram(
        fanOut(documents(s, d)), "text", budget = 24, rounds = 2)._2
        .orderBy(col("round"), col("piece"))
    }, Some(s"""
      WITH RECURSIVE ${duckTrainUnigramCtes(24, 2, 4, 100L)}
      ${(0 to 2).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, piece, cost FROM uvt$r")
        .mkString("\nUNION ALL\n")}
      ORDER BY round, piece"""), headline = true),

    // ------------------------------------- wordpiece vocab TRAINING
    // graft.operators.Subword.trainWordpiece: the learning half of the
    // wordpiece family (Schuster & Nakajima 2012, the BERT trainer) —
    // completes the trained-artifact story for all three deployed
    // tokenizer families. Same merge loop as x_token_bpe_train,
    // different objective: the merged pair maximizes the likelihood
    // score cnt(ab)/(cnt(a)·cnt(b)), stated exactly as (cnt·2^30) div
    // (cnt_a·cnt_b) (floor div both engines; overflow impossible under
    // the guarded Σ freq·len < 2^31 contract), ties lex-smallest.
    // Symbols ride the ##-continuation convention, so initial and
    // continuation units count separately and the learned vocab feeds
    // wordpieceTable's greedy longest-match directly. tokens_after pins
    // the replace semantics independently, as in the BPE audit.
    Q("x_token_wordpiece_train", (s, d) => {
      graft.operators.Subword.trainWordpiece(
        fanOut(documents(s, d)), "text", k = 4)._2
    }, Some(s"""
      WITH ${duckTrainWordpieceCtes(4)}
      ${(1 to 4).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS iter, wm$i.a, wm$i.b, wm$i.cnt,
           |  wm$i.cnt_a, wm$i.cnt_b, wm$i.score,
           |  (SELECT CAST(SUM(freq * len(string_split(substr(seg, 2, length(seg) - 2), '||'))) AS BIGINT)
           |   FROM t$i) AS tokens_after
           |FROM wm$i""".stripMargin).mkString("\nUNION ALL\n")}
      ORDER BY iter"""))
  )

  /** Spark-side count–min point estimate over array column `cellsCol`
    * (depth 4 × width 256) for a literal probe token: least over rows of
    * element_at at bit-slice indexes of the md5-derived 60-bit hash (≡
    * [[graft.operators.TypedAggregators.hash60]]: the md5 hex prefix of
    * 15 digits parsed base 16 — `conv` states it in one call, and
    * constant-folds for a literal probe; DuckDB's twin is the digit fold
    * in [[duckHash60]]). The per-ROW variant lives in
    * [[graft.operators.Ranking.heavyHitters]]. */
  private def sparkCmsEst(cellsCol: String, probe: String): String = {
    val h = s"CAST(conv(substr(md5($probe), 1, 15), 16, 10) AS BIGINT)"
    s"""least(
       |  element_at($cellsCol, CAST(1 + ($h % 256) AS INT)),
       |  element_at($cellsCol, CAST(257 + (($h div 256) % 256) AS INT)),
       |  element_at($cellsCol, CAST(513 + (($h div 65536) % 256) AS INT)),
       |  element_at($cellsCol, CAST(769 + (($h div 16777216) % 256) AS INT)))""".stripMargin
  }

  /** The chained-CTE replay of [[graft.operators.Subword.trainBpe]]'s k
    * training rounds (s0 = char segmentation of the word dictionary;
    * per round: pc_i pair counts → m_i argmax → s_i merged). Rounds are
    * MATERIALIZED — each is multi-referenced and DuckDB inlines CTEs per
    * reference (the x_pipeline_modern exponential-re-execution lesson). */
  private def duckTrainBpeCtes(k: Int): String = {
    val s0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w),
        |s0 AS MATERIALIZED (
        |  SELECT freq, '|' || array_to_string(list_transform(
        |    range(1, length(w) + 1), i -> substr(w, i, 1)), '||') || '|' AS seg
        |  FROM w0)""".stripMargin
    val rounds = (1 to k).map { i =>
      val p = i - 1
      s"""pc$i AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(p[1:len(p)-1]) AS a, unnest(p[2:len(p)]) AS b
         |    FROM (SELECT freq, string_split(substr(seg, 2, length(seg) - 2), '||') AS p
         |          FROM s$p)
         |    WHERE len(p) > 1)
         |  GROUP BY a, b),
         |m$i AS MATERIALIZED (
         |  SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT freq, replace(seg, '|' || m.a || '||' || m.b || '|',
         |                            '|' || m.a || m.b || '|') AS seg
         |  FROM s$p CROSS JOIN m$i m)""".stripMargin
    }
    (s0 +: rounds).mkString(",\n")
  }

  /** The chained-CTE replay of
    * [[graft.operators.Subword.trainWordpiece]]'s k rounds — the
    * [[duckTrainBpeCtes]] skeleton with the wordpiece differences: t0
    * segments under the ##-continuation convention, each round adds a
    * symbol-count CTE, and the argmax ranks by the scaled-integer
    * likelihood score (cnt·2^30) // (cnt_a·cnt_b) with the (a, b) lex
    * tie-break. MATERIALIZED throughout (multi-referenced rounds). */
  private def duckTrainWordpieceCtes(k: Int, scaleBits: Int = 30): String = {
    val scale = 1L << scaleBits
    val s0 =
      """ww0 AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w),
        |t0 AS MATERIALIZED (
        |  SELECT freq, '|' || array_to_string(list_transform(
        |    range(1, length(w) + 1),
        |    i -> CASE WHEN i = 1 THEN substr(w, CAST(i AS INT), 1)
        |              ELSE '##' || substr(w, CAST(i AS INT), 1) END), '||') || '|' AS seg
        |  FROM ww0)""".stripMargin
    val rounds = (1 to k).map { i =>
      val p = i - 1
      s"""wpc$i AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(p[1:len(p)-1]) AS a, unnest(p[2:len(p)]) AS b
         |    FROM (SELECT freq, string_split(substr(seg, 2, length(seg) - 2), '||') AS p
         |          FROM t$p)
         |    WHERE len(p) > 1)
         |  GROUP BY a, b),
         |wsc$i AS MATERIALIZED (
         |  SELECT sym, CAST(SUM(freq) AS BIGINT) AS scnt FROM (
         |    SELECT freq, unnest(string_split(substr(seg, 2, length(seg) - 2), '||')) AS sym
         |    FROM t$p)
         |  GROUP BY sym),
         |wm$i AS MATERIALIZED (
         |  SELECT pc.a, pc.b, pc.cnt, sa.scnt AS cnt_a, sb.scnt AS cnt_b,
         |         CAST((pc.cnt * $scale) // (sa.scnt * sb.scnt) AS BIGINT) AS score
         |  FROM wpc$i pc
         |  JOIN wsc$i sa ON pc.a = sa.sym
         |  JOIN wsc$i sb ON pc.b = sb.sym
         |  ORDER BY score DESC, pc.a ASC, pc.b ASC LIMIT 1),
         |t$i AS MATERIALIZED (
         |  SELECT freq, replace(seg, '|' || m.a || '||' || m.b || '|',
         |                            '|' || m.a || substr(m.b, 3) || '|') AS seg
         |  FROM t$p CROSS JOIN wm$i m)""".stripMargin
    }
    (s0 +: rounds).mkString(",\n")
  }

  /** DuckDB md5-derived 60-bit hash of expression `e` — the digit-fold
    * twin of hash60 (same form as the x_distinct_sketch oracle). */
  private def duckHash60(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, 16), k ->
       |    CAST(strpos('0123456789abcdef', substr(md5($e), k, 1)) - 1 AS BIGINT))),
       |  (acc, hv) -> acc * 16 + hv)""".stripMargin

  /** DuckDB twin of [[sparkCmsEst]] over list column `cellsCol` (1-based
    * list indexing) and a precomputed hash column `hCol`. */
  private def duckCmsEst(cellsCol: String, hCol: String): String =
    s"""least($cellsCol[CAST(1 + ($hCol % 256) AS BIGINT)],
       |      $cellsCol[CAST(257 + (($hCol // 256) % 256) AS BIGINT)],
       |      $cellsCol[CAST(513 + (($hCol // 65536) % 256) AS BIGINT)],
       |      $cellsCol[CAST(769 + (($hCol // 16777216) % 256) AS BIGINT)])""".stripMargin

  /** The frozen fixture piece vocabulary (piece → integer cost) for the
    * unigram-LM queries, maxLen 4. Single characters at cost 12 — all of
    * the corpus alphabet EXCEPT 'q', so 'query' deterministically hits
    * the UNK fallback — plus multi-char pieces priced so the corpus
    * exercises whole-word optima ('the' 9 < 't'+'h'+'e' 36), multi-piece
    * optima ('cust'+'omer'), and one exact cost tie ('ba' 24 =
    * 'b'+'a' 24) pinning the longest-final-piece tie-break. A production
    * vocabulary is a trained artifact (scores ∝ −log p, pre-scaled to
    * integers) loaded the same way. */
  private[queries] def demoUnigramPieces: Seq[(String, Long)] =
    "abcdefghijklmnoprstuvwy".map(c => c.toString -> 12L) ++ Seq(
      "th" -> 6L, "the" -> 9L, "in" -> 8L, "jo" -> 15L, "join" -> 20L,
      "sc" -> 11L, "scan" -> 17L, "er" -> 7L, "ro" -> 10L, "row" -> 13L,
      "cust" -> 18L, "omer" -> 25L, "ta" -> 10L, "ble" -> 12L,
      "ba" -> 24L, "tch" -> 14L, "an" -> 7L, "or" -> 8L,
      "val" -> 16L, "ue" -> 9L, "wind" -> 21L, "ow" -> 9L,
      "str" -> 14L, "eam" -> 13L)

  private def duckUniPieces: String =
    demoUnigramPieces.map(p => s"'${p._1}'").mkString("[", ", ", "]")
  private def duckUniCosts: String =
    demoUnigramPieces.map(_._2).mkString("[", ", ", "]")

  /** DuckDB twin of [[graft.operators.Subword.unigramFoldSql]] as a
    * RECURSIVE-CTE prefix ending in `ufin(word, b)` with
    * b = struct(c: total cost, ts: tokens): the identical Viterbi DP,
    * one position per recursion level, the row carrying the best[0..i]
    * HISTORY as a list of structs (a recursive CTE only sees the
    * previous level, and best[i] needs best[i−maxLen..i−1]). The argmin
    * is the same combo = cost·32 + (32 − L) scalar MIN the Spark fold
    * uses — a correlated arg_min(struct) trips a DuckDB 1.0 binder bug
    * ("Need named argument for struct pack") under decorrelation, a
    * scalar MIN decorrelates fine; the winner decodes arithmetically. */
  private def duckUnigramPrefix: String =
    s"""WITH RECURSIVE uv AS (
       |  SELECT unnest($duckUniPieces) AS piece, unnest($duckUniCosts) AS cost),
       |uw3 AS (
       |  SELECT DISTINCT word FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
       |  WHERE word <> ''),
       |${duckUnigramDpCtes("", "uv", "uw3", 4, 100L)}""".stripMargin

  /** The Viterbi DP recursion of [[duckUnigramPrefix]], parameterized so
    * the TRAINING oracle can run one DP per EM round against that
    * round's learned vocab CTE: defines `usteps$suffix` (recursive) and
    * `ufin$suffix(word, b)`. `vocabCte` must expose (piece, cost);
    * `wordsCte` must expose `word`.
    *
    * SHAPE (a DuckDB 1.0 bug forces it): the recursive leg must NOT
    * reference the vocab CTE — a correlated MIN subquery joining a
    * COMPUTED CTE inside a recursive CTE silently returns NULL on the
    * FIRST iteration (measured: 'row' lost its position-1 candidates
    * and fell to the UNK branch; the same subquery is correct in
    * isolation, on later iterations, and when the vocab is a literal
    * VALUES/unnest). So the per-(word, position) candidate (L, cost)
    * lists are precomputed into `twords$suffix` BEFORE the recursion,
    * and the recursive leg is fully self-contained: the argmin is a
    * list_min over list_transform of the row's own candidate list —
    * same combo = (c + cost)·32 + (32 − L) encoding, same decode.
    * list_min([]) is NULL, which feeds the UNK branch exactly like the
    * old no-candidate case. `ufin` is MATERIALIZED (training rounds
    * read it repeatedly; DuckDB inlines per reference). */
  private[queries] def duckUnigramDpCtes(suffix: String, vocabCte: String,
                                         wordsCte: String, maxLen: Int,
                                         unkCost: Long): String =
    s"""tpos$suffix AS (
       |  SELECT word, unnest(range(1, length(word) + 1)) AS p FROM $wordsCte),
       |twords$suffix AS MATERIALIZED (
       |  SELECT ps.word, list(COALESCE(c.cl, CAST([] AS STRUCT(L BIGINT, cost BIGINT)[]))
       |                       ORDER BY ps.p) AS cls
       |  FROM tpos$suffix ps
       |  LEFT JOIN (
       |    SELECT p2.word, p2.p,
       |           list(struct_pack(L := lr.L, cost := CAST(v.cost AS BIGINT))) AS cl
       |    FROM tpos$suffix p2
       |    CROSS JOIN (SELECT unnest(range(1, ${maxLen + 1})) AS L) lr
       |    JOIN $vocabCte v
       |      ON lr.L <= p2.p
       |     AND v.piece = substr(p2.word, CAST(p2.p - lr.L + 1 AS INT), CAST(lr.L AS INT))
       |    GROUP BY p2.word, p2.p) c
       |    ON c.word = ps.word AND c.p = ps.p
       |  GROUP BY ps.word),
       |usteps$suffix AS (
       |  SELECT word, cls, 0 AS i,
       |         [struct_pack(c := CAST(0 AS BIGINT), ts := CAST([] AS VARCHAR[]))] AS hist
       |  FROM twords$suffix
       |  UNION ALL
       |  SELECT t.word, t.cls, t.p AS i,
       |         list_append(t.hist,
       |           CASE WHEN t.bk IS NULL THEN
       |             struct_pack(c := t.hist[t.p].c + $unkCost,
       |                         ts := list_append(t.hist[t.p].ts, substr(t.word, t.p, 1)))
       |           ELSE
       |             struct_pack(c := t.bk // 32,
       |                         ts := list_append(t.hist[t.p - (32 - t.bk % 32) + 1].ts,
       |                                 substr(t.word, CAST(t.p - (32 - t.bk % 32) + 1 AS INT),
       |                                        CAST(32 - t.bk % 32 AS INT))))
       |           END)
       |  FROM (
       |    SELECT s.word, s.cls, s.i + 1 AS p, s.hist,
       |           list_min(list_transform(s.cls[s.i + 1],
       |             x2 -> (s.hist[s.i + 2 - x2.L].c + x2.cost) * 32 + 32 - x2.L)) AS bk
       |    FROM usteps$suffix s WHERE s.i < length(s.word)) t),
       |ufin$suffix AS MATERIALIZED (
       |  SELECT word, hist[length(word) + 1] AS b FROM usteps$suffix
       |  WHERE i = length(word))""".stripMargin

  /** DuckDB twin of [[graft.operators.Subword.trainUnigram]] as a CTE
    * chunk (no WITH keyword): the seed substring count, the seed vocab
    * `uvt0`, then per EM round one Viterbi DP (via
    * [[duckUnigramDpCtes]]) + piece re-count + re-cost/prune `uvt$r`.
    * Every reused level is MATERIALIZED (vocab CTEs are read by the DP
    * recursion per level — inlined they re-execute the whole previous
    * round per DP step). The cost model is the same integer-log2
    * surrogate: length(bin(total)) − length(bin(cnt)) + 1. */
  private[queries] def duckTrainUnigramCtes(budget: Int, rounds: Int,
                                            maxLen: Int, unkCost: Long): String = {
    val costSel =
      "CAST(length(bin(t.total)) - length(bin(u.cnt)) + 1 AS BIGINT) AS cost"
    val seed =
      s"""tdict AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
         |  WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')
         |  GROUP BY word),
         |tpos AS (
         |  SELECT word, freq, unnest(range(1, length(word) + 1)) AS i FROM tdict),
         |tcand AS MATERIALIZED (
         |  SELECT substr(word, CAST(i AS INT), CAST(L AS INT)) AS piece,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM tpos CROSS JOIN (SELECT unnest(range(1, ${maxLen + 1})) AS L) ln
         |  WHERE i + L - 1 <= length(word)
         |  GROUP BY piece),
         |tchars AS MATERIALIZED (
         |  SELECT piece, cnt FROM tcand WHERE length(piece) = 1),
         |ttot0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tchars),
         |uvt0 AS MATERIALIZED (
         |  SELECT u.piece, $costSel
         |  FROM (SELECT piece, cnt FROM tchars
         |        UNION ALL
         |        SELECT piece, cnt FROM (
         |          SELECT piece, cnt FROM tcand WHERE length(piece) > 1
         |          ORDER BY cnt DESC, piece LIMIT $budget)) u
         |  CROSS JOIN ttot0 t)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""${duckUnigramDpCtes(s"_t$r", s"uvt${r - 1}", "tdict", maxLen, unkCost)},
         |usedt$r AS MATERIALIZED (
         |  SELECT t AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT d.freq, unnest(f.b.ts) AS t
         |        FROM ufin_t$r f JOIN tdict d ON f.word = d.word)
         |  GROUP BY t),
         |ttot$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM usedt$r),
         |uvt$r AS MATERIALIZED (
         |  SELECT u.piece, $costSel
         |  FROM (SELECT c.piece, COALESCE(x.cnt, CAST(1 AS BIGINT)) AS cnt
         |        FROM tchars c LEFT JOIN usedt$r x ON c.piece = x.piece
         |        UNION ALL
         |        SELECT piece, cnt FROM (
         |          SELECT piece, cnt FROM usedt$r WHERE length(piece) > 1
         |          ORDER BY cnt DESC, piece LIMIT $budget)) u
         |  CROSS JOIN ttot$r t)""".stripMargin
    }
    (seed +: steps).mkString(",\n")
  }

  /** The frozen fixture vocab for the subword queries: five whole words,
    * one initial prefix (`wind`), two multi-char continuations (`##ow`,
    * `##gg`), and a PARTIAL character alphabet (both forms) — partial so
    * the corpus deterministically produces [UNK] words. A production
    * vocab is a trained artifact loaded the same way. */
  // defs, not vals: `all` above is initialized first and builds its oracle
  // strings from these eagerly — a val here would still be null then.
  private def demoVocabChars = "abcdegilnorstuw"
  private[queries] def demoVocab: Seq[String] =
    (Seq("table", "value", "scan", "a", "the", "wind", "##ow", "##gg") ++
      demoVocabChars.map(_.toString) ++
      demoVocabChars.map(c => s"##$c")).distinct

  private def duckVocab: String =
    demoVocab.map(p => s"'$p'").mkString("[", ", ", "]")

  /** The frozen fixture merge table for the BPE queries, rank = position.
    * Chosen so the corpus exercises every branch: chains through merged
    * symbols (t+h → th, th+e → the; o+r → or, or+t → ort), rank priority
    * over word position ('batch': c+h at rank 12 fires before a+t at 13
    * even though a+t sits earlier in the word), and words no merge
    * touches (dup, key, row …). A production table is a trained artifact
    * loaded the same way. */
  private[graft] def demoMerges: Seq[String] = Seq(
    "t h", "e r", "th e", "o r", "t er", "a n", "s t",
    "or t", "r e", "q u", "g e", "c h", "a t")

  private def duckMerges: String =
    demoMerges.map(p => s"'$p'").mkString("[", ", ", "]")

  /** DuckDB twin of [[graft.operators.Subword.bpeFoldSql]] as a
    * RECURSIVE-CTE prefix ending in `fin(word, syms)` — the identical
    * leftmost-minimum-rank one-merge-per-step loop, expressed as
    * recursion for the same reason as the wordpiece twin (list_reduce
    * corrupts struct accumulators in nested lambdas). Each level: find
    * the lowest-rank adjacent pair present in the table (correlated MIN
    * over the non-recursive merges relation), locate its leftmost
    * occurrence with list_position, splice. NULL rank → the terminal. */
  private def duckBpePrefix: String = "WITH RECURSIVE " + duckBpeCtes

  /** The CTE chunk of [[duckBpePrefix]] without the `WITH RECURSIVE`
    * keyword, so other queries (x_pipeline_modern) can splice it into a
    * larger recursive WITH. Defines merges/w3/bsteps/fin; the dictionary
    * comes from the FULL documents corpus, which is a superset of any
    * cleaned/filtered text's vocabulary (cleaning only deletes whole
    * tokens), so downstream joins against `fin` are unaffected. */
  private[queries] def duckBpeCtes: String =
    s"""merges AS (
       |  SELECT unnest($duckMerges) AS p,
       |         unnest(range(1, ${demoMerges.size + 1})) AS r),
       |w3 AS (
       |  SELECT DISTINCT word FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
       |  WHERE word <> ''),
       |bsteps AS (
       |  SELECT word,
       |         list_transform(range(1, length(word) + 1),
       |                        c0 -> substr(word, c0, 1)) AS syms,
       |         false AS done
       |  FROM w3
       |  UNION ALL
       |  SELECT t.word,
       |         CASE WHEN t.br IS NULL THEN t.syms
       |              ELSE t.syms[1:t.pos - 1]
       |                   || [t.syms[t.pos] || t.syms[t.pos + 1]]
       |                   || t.syms[t.pos + 2:len(t.syms)] END,
       |         t.br IS NULL
       |  FROM (
       |    SELECT t0.word, t0.syms, t0.br,
       |           CASE WHEN t0.br IS NULL THEN NULL
       |                ELSE list_position(
       |                  list_transform(range(1, len(t0.syms)),
       |                    i4 -> t0.syms[i4] || ' ' || t0.syms[i4 + 1]),
       |                  (SELECT m3.p FROM merges m3 WHERE m3.r = t0.br)) END AS pos
       |    FROM (
       |      SELECT s.word, s.syms,
       |             (SELECT MIN(m2.r) FROM merges m2 WHERE list_contains(
       |                list_transform(range(1, len(s.syms)),
       |                  i2 -> s.syms[i2] || ' ' || s.syms[i2 + 1]),
       |                m2.p)) AS br
       |      FROM bsteps s WHERE NOT s.done) t0) t),
       |fin AS (SELECT word, syms FROM bsteps WHERE done)""".stripMargin

  /** DuckDB twin of [[graft.operators.Subword.wordpieceFoldSql]] as a
    * RECURSIVE-CTE prefix (vocab + distinct words + the greedy chain +
    * `fin(word, pieces, unk)`): the identical algorithm, but expressed as
    * joins because DuckDB 1.0's list_reduce corrupts a struct
    * accumulator captured inside nested lambdas (measured: a nested
    * lambda saw pos=3 while the outer accumulator held 2). One step per
    * recursion level; the best match is a correlated `arg_max(piece,
    * length)` over the non-recursive vocab (ties impossible — two
    * same-length pieces matching one position would be equal strings);
    * NULL best → the [UNK] terminal. */
  private def duckWordpiecePrefix: String = {
    val match2 =
      """(CASE WHEN s.pos > 1 THEN substr(v2.p, 1, 2) = '##'
        |      ELSE substr(v2.p, 1, 2) <> '##' END)
        |AND substr(s.word, s.pos,
        |      length(v2.p) - CASE WHEN s.pos > 1 THEN 2 ELSE 0 END)
        |    = CASE WHEN s.pos > 1 THEN substr(v2.p, 3) ELSE v2.p END""".stripMargin
    s"""WITH RECURSIVE vocab AS (SELECT unnest($duckVocab) AS p),
       |w2 AS (
       |  SELECT DISTINCT word FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
       |  WHERE word <> ''),
       |steps AS (
       |  SELECT word, 1 AS pos, CAST([] AS VARCHAR[]) AS pieces, false AS unk
       |  FROM w2
       |  UNION ALL
       |  SELECT t.word,
       |         CASE WHEN t.bp IS NULL THEN t.pos
       |              ELSE t.pos + length(t.bp)
       |                   - CASE WHEN t.pos > 1 THEN 2 ELSE 0 END END,
       |         CASE WHEN t.bp IS NULL THEN t.pieces
       |              ELSE list_append(t.pieces, t.bp) END,
       |         t.bp IS NULL
       |  FROM (
       |    SELECT s.word, s.pos, s.pieces,
       |           (SELECT arg_max(v2.p, length(v2.p)) FROM vocab v2
       |            WHERE $match2) AS bp
       |    FROM steps s WHERE NOT s.unk AND s.pos <= length(s.word)) t),
       |fin AS (SELECT word, pieces, unk FROM steps
       |        WHERE unk OR pos > length(word))""".stripMargin
  }
}
