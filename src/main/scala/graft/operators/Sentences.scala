package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pinned rule-based sentence segmentation — the granularity C4's
  * cleaning pipeline works at (Raffel et al. 2020 discard duplicated
  * THREE-SENTENCE spans; sentence-level filters drop boilerplate
  * lines). No ML splitter: the rule is part of the operator's meaning,
  * replayed exactly by the DuckDB twin (the RE2 ∩ Java discipline —
  * the natural "keep the terminator" form needs a lookbehind, which
  * RE2 lacks, so the PINNED contract drops terminators instead):
  *
  *  - boundaries = runs of `[.!?]` followed by ≥1 space;
  *  - each segment's trailing `[.!?]`-run is stripped (the terminator
  *    of a text-final sentence has no following space, so stripping
  *    AFTER the split treats final and medial sentences alike);
  *  - segments trim and empty ones drop (a doc of pure punctuation
  *    emits nothing);
  *  - abbreviation dots split like any other (stated: 'dr. smith' is
  *    two sentences under this rule — a deterministic over-split, the
  *    right bias for dedup where the cost of a split is a shorter
  *    span key, never a missed duplicate).
  */
object Sentences {

  /** Boundary pattern (identical in both engines). */
  val SplitPattern: String = "[.!?]+ +"

  /** SQL for the sentence LIST of a text expr, per dialect. */
  def sentencesSql(x: String, duck: Boolean): String =
    if (duck)
      s"list_filter(list_transform(string_split_regex($x, '$SplitPattern'), " +
        s"sx -> trim(regexp_replace(sx, '[.!?]+$$', ''))), sx -> sx <> '')"
    else
      s"filter(transform(split($x, '$SplitPattern'), " +
        s"sx -> trim(regexp_replace(sx, '[.!?]+$$', ''))), sx -> sx != '')"

  /** Segment an (id, text) relation: (doc_id, sent_idx, n_words,
    * sentence), sent_idx 0-based in document order. Pure per-row
    * flatMap (posexplode of an in-row split) — no shuffle. */
  def sentenceRelation(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .withColumn("__sg", expr(sentencesSql(textCol, duck = false)))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(col("__sg")))
      .select(col("doc_id"), col("pos").cast("long").as("sent_idx"),
        expr("CAST(size(split(col, ' ')) AS BIGINT)").as("n_words"),
        col("col").as("sentence"))

  /** C4's three-sentence-span dedup (Raffel et al. 2020 §2.2: "we
    * discarded all but one of any three-sentence span occurring more
    * than once"): per document, every window of 3 CONSECUTIVE
    * sentences keys a digest; a span whose digest occurs elsewhere in
    * the corpus keeps only its CANONICAL occurrence — smallest
    * (doc_id, sent_idx), the deterministic min-struct rule — and every
    * sentence covered by a non-canonical duplicated span is removed.
    * Output: (doc_id, n_sents, n_removed, clean_text) with clean_text
    * = surviving sentences joined by '. ' in order (terminators were
    * pinned away by the splitter). Docs with < 3 sentences carry no
    * span and survive whole.
    *
    * Plan at 100 TB: sentence segmentation is a per-row flatMap; the
    * only corpus-scale shuffle carries (digest, doc_id, sent_idx) —
    * 16-byte keys, never text; the duplicated-span relation is
    * duplication-bounded and re-enters as the removal side of an
    * aggregate; clean text reassembles in the same per-doc aggregate
    * that counts removals. The sentence relation stages once and
    * feeds the span keys AND the reassembly. */
  /** Span keys of a (doc_id, sent_idx, n_words, sentence) relation:
    * (doc_id, sent_idx, digest) — digest of sentences i, i+1, i+2. */
  def spansOf(sent: DataFrame): DataFrame =
    sent
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("sent_idx"), col("sentence"))))
        .as("__ss"))
      // greatest(…, 1) dodges the descending sequence(1, 0) trap; the
      // filter drops windows that run past the end (and everything,
      // for docs with < 3 sentences). try_element_at, not [] — ANSI
      // mode throws on out-of-range indexing inside the windows the
      // filter is about to drop (concat_ws skips the NULLs meanwhile).
      .select(col("doc_id"), expr(
        """explode(filter(
          |  transform(sequence(1, greatest(size(__ss) - 2, 1)),
          |    i -> named_struct(
          |      'sent_idx', CAST(i - 1 AS BIGINT),
          |      'digest', md5(concat_ws(' | ',
          |        try_element_at(__ss, i).sentence,
          |        try_element_at(__ss, i + 1).sentence,
          |        try_element_at(__ss, i + 2).sentence)))),
          |  sp -> sp.sent_idx + 3 <= size(__ss)))""".stripMargin).as("sp"))
      .select(col("doc_id"), col("sp.sent_idx").as("sent_idx"),
        col("sp.digest").as("digest"))

  /** The (id, sh) CONTAINMENT projection of three-sentence spans —
    * each document's DISTINCT span-digest set, the text shape the
    * modality-generic growing gate
    * ([[graft.streaming.ContainmentIngest]]) probes and folds exactly
    * like audio CDC chunks or image keypoints: a re-post carrying a
    * consecutive run of an ingested document's sentences has its span
    * set contained in the original's and flags at the threshold. Docs
    * with < 3 sentences carry no span and emit nothing (they cannot
    * plagiarize a span). */
  def spanShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spansOf(sentenceRelation(docs, idCol, textCol))
      .groupBy(col("doc_id").as("id"))
      .agg(collect_set(col("digest")).as("sh"))
      .select(col("id"), col("sh"))

  def spanDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sent = graft.sources.Tables.stage(
      sentenceRelation(docs, idCol, textCol))
    // staged: the span keys feed the duplicate aggregate AND the removal
    // join — unstaged, the per-doc collect_list + window Generate over
    // the corpus-sized sentence relation executed twice (r18
    // ProbeMetrics: two byte-identical ObjectHashAggregate→Generate
    // subtrees in the executed plan; verdict item 6).
    val spans = graft.sources.Tables.stage(spansOf(sent))
    // duplicated digests + their canonical occurrence (min-struct).
    val dup = spans.groupBy(col("digest"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("doc_id"), col("sent_idx"))).as("__canon"))
      .filter(col("__n") > 1)
      .select(col("digest"), col("__canon.doc_id").as("__cd"),
        col("__canon.sent_idx").as("__ci"))
    // sentences covered by a NON-canonical duplicated span.
    val removed = spans.join(dup, Seq("digest"))
      .filter(!(col("doc_id") === col("__cd") && col("sent_idx") === col("__ci")))
      .select(col("doc_id"),
        explode(expr("sequence(sent_idx, sent_idx + 2)")).as("sent_idx"))
      .distinct()
    sent.join(removed.withColumn("__rm", lit(true)),
        Seq("doc_id", "sent_idx"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_sents"),
        sum(when(col("__rm"), 1L).otherwise(0L)).cast("long").as("n_removed"),
        array_join(expr(
          """transform(
            |  filter(sort_array(collect_list(named_struct(
            |    'i', sent_idx, 's', sentence, 'rm', coalesce(__rm, false)))),
            |    e -> NOT e.rm),
            |  e -> e.s)""".stripMargin), ". ").as("clean_text"))
  }
}
