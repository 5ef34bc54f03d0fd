package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic subword (wordpiece) tokenization over a FROZEN vocab —
  * greedy longest-match, the Wu et al. 2016 / BERT convention: a vocab
  * entry is either an initial piece (`abc`) or a continuation piece
  * (`##bc`); each word is consumed left-to-right, at every position the
  * LONGEST vocab entry of the right class that matches wins, and a word
  * with no match at some position tokenizes to the single `[UNK]` piece.
  *
  * Why it exists here: every token-level operator in a training pipeline
  * (packing budgets, token counts, length gates) should budget by what the
  * MODEL'S tokenizer will produce, not by whitespace words — a
  * whitespace-packed 1024-"token" sequence can blow a 1024-subword model
  * context. The vocab is a frozen artifact (trained offline, shipped with
  * the model); the operator takes it as a plain `Seq[String]`.
  *
  * Scale design — tokenize the DICTIONARY, not the corpus:
  *  - the greedy fold runs once per DISTINCT word ([[wordpieceTable]] —
  *    corpus word counts follow Zipf, so distinct words are orders of
  *    magnitude fewer than occurrences), and per-document counts come from
  *    the map-side (doc, token, tf) run-length projection
  *    ([[Ranking.termFrequencies]]) broadcast-joined against that table —
  *    the corpus text is scanned once and never re-tokenized per
  *    occurrence;
  *  - the vocab rides the plan as a broadcast literal (`typedlit`), like
  *    the ANN centroid/codebook literals — no join to look up pieces;
  *  - the fold itself is a bounded higher-order expression (≤ |word|
  *    steps, each a filter over the vocab literal): HOFs evaluate
  *    interpreted, which is exactly why the fold is confined to the
  *    distinct-word relation instead of the corpus-sized hot path.
  *
  * Determinism: pure string/integer operations, no hashing, no floats —
  * a SQL twin replays it exactly (greedy ties are impossible: two
  * same-length pieces matching the same position would be the same
  * string). Contract: vocab pieces are non-empty after stripping `##`,
  * and corpus words contain no `#` (the convention's escape hatch — same
  * contract as the published wordpiece vocabularies).
  */
object Subword {

  /** The greedy longest-match fold as one SQL expression over `wordCol`
    * (a non-empty word) and `vocabCol` (the vocab as an array<string>
    * literal — attach with `typedlit`). Result: struct(pos, pieces,
    * unk) — `pieces` in display form (`##`-prefixed continuations), `unk`
    * true iff some position had no match.
    *
    * Shape notes: the inner `aggregate(array(best), acc, …)` is a
    * let-binding (fold over a one-element array), so the best-match
    * reduction is evaluated once per step instead of three times; lambda
    * variables are suffixed (p4/a6/v6/a7/b7/s9) so the expression nests
    * without shadowing — the same discipline as Ann.l2sqSql. */
  def wordpieceFoldSql(wordCol: String, vocabCol: String): String = {
    val best =
      s"""aggregate(
         |  filter($vocabCol, p4 ->
         |    IF(acc.pos > 1, substring(p4, 1, 2) = '##', substring(p4, 1, 2) != '##')
         |    AND substring($wordCol, acc.pos, length(p4) - IF(acc.pos > 1, 2, 0))
         |        = IF(acc.pos > 1, substring(p4, 3), p4)),
         |  '', (a6, v6) -> IF(length(v6) > length(a6), v6, a6))""".stripMargin
    s"""aggregate(sequence(1, length($wordCol)),
       |  named_struct('pos', 1, 'pieces', array_repeat('', 0), 'unk', false),
       |  (acc, s9) -> IF(acc.unk OR acc.pos > length($wordCol), acc,
       |    aggregate(array($best), acc, (a7, b7) -> IF(b7 = '',
       |      named_struct('pos', a7.pos, 'pieces', a7.pieces, 'unk', true),
       |      named_struct('pos', a7.pos + length(b7) - IF(a7.pos > 1, 2, 0),
       |        'pieces', concat(a7.pieces, array(b7)), 'unk', false)))))""".stripMargin
  }

  /** Tokenize a DISTINCT-word relation (column `word`, non-empty) against
    * the frozen vocab. Output: (word, pieces — space-joined display form
    * or '[UNK]', n_pieces, is_unk). This is the dictionary table the
    * corpus-sized paths broadcast-join against. */
  def wordpieceTable(words: DataFrame, vocab: Seq[String]): DataFrame =
    words
      .withColumn("__v", typedlit(vocab))
      .withColumn("__st", expr(wordpieceFoldSql("word", "__v")))
      .select(col("word"),
        expr("IF(__st.unk, '[UNK]', array_join(__st.pieces, ' '))").as("pieces"),
        expr("IF(__st.unk, 1, size(__st.pieces))").cast("long").as("n_pieces"),
        col("__st.unk").as("is_unk"))

  /** Per-document subword statistics: (doc_id, n_words, n_subwords,
    * n_unk_words). One corpus scan: the staged termFrequencies projection
    * feeds BOTH the distinct-word relation the fold runs on and the
    * per-document aggregate (an unstaged plan would re-run the tokenize
    * scan chain per consumer — the same discipline as tfidf's staged tf);
    * the wordpiece table broadcasts onto the tf join, so corpus-sized
    * rows never shuffle on the skewed token key. */
  def docSubwordCounts(docs: DataFrame, idCol: String, textCol: String,
                       vocab: Seq[String]): DataFrame = {
    val tf = graft.sources.Tables.stage(
      Ranking.termFrequencies(docs, idCol, textCol))
    val wp = wordpieceTable(
      tf.select(col("token").as("word")).distinct(), vocab)
    tf.join(broadcast(wp), tf("token") === wp("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        sum(col("tf") * col("n_pieces")).as("n_subwords"),
        sum(col("tf") * col("is_unk").cast("long")).as("n_unk_words"))
  }

  /** Token-budget packing where the budget is SUBWORDS, not whitespace
    * words — the variant that matches what a model tokenizer will charge
    * (`[UNK]` counts 1, multi-piece words count their pieces). Same
    * greedy sequential bin assignment as Curation.packSequences: shard =
    * doc_id % `shards` (the output-file parallelism), bin = running
    * subword count before me div `budget`, cumulative sum integer-exact
    * in doc_id order. Output: (shard, bin, n_docs, subwords). */
  def packBySubwords(docs: DataFrame, shards: Int, budgetSubwords: Int,
                     vocab: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docSubwordCounts(docs, "doc_id", "text", vocab)
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum", sum(col("n_subwords")).over(w))
      .withColumn("bin", expr(s"(cum - n_subwords) div $budgetSubwords"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_subwords")).as("subwords"))
  }

  // --------------------------------------------------------------- BPE
  // Byte-pair-encoding MERGE-RANK application (the Sennrich et al. 2016
  // convention GPT/Llama tokenizers follow) — a different algorithm from
  // wordpiece's longest-match: the frozen artifact is an ORDERED list of
  // merges ("a b" → "ab", rank = list position), and tokenization
  // repeatedly merges the lowest-RANK adjacent symbol pair until no pair
  // in the sequence is in the table. Budgeting a GPT/Llama pack with the
  // wordpiece counts mis-charges multi-piece words — this is the missing
  // half of the tokenizer surface.
  //
  // Step semantics (the exact contract both engines replay): each step
  // merges the LEFTMOST occurrence of the minimum-rank adjacent pair.
  // For a well-formed trained table this is iteration-for-iteration
  // equivalent to the usual "merge ALL occurrences of the best pair"
  // loop (a pair involving a merged symbol was necessarily created
  // later in training, so its rank is higher and can't preempt the
  // remaining occurrences); stating it one-occurrence-per-step makes the
  // algorithm deterministic for ARBITRARY tables too, so the DuckDB twin
  // agrees bitwise regardless. No [UNK]: unmerged characters simply
  // remain single-character tokens (the byte-level-BPE convention).
  //
  // Scale: same dictionary-not-corpus discipline as wordpiece — the fold
  // (≤ |word| interpreted HOF steps, each O(|word|·|merges|) over the
  // typedlit merge literal) runs once per DISTINCT word; corpus text is
  // scanned once into the staged map-side tf projection and the token
  // table broadcasts onto it.

  /** The merge-rank fold as one SQL expression over `wordCol` (non-empty
    * word) and `mergesCol` (the ranked merges as an array<string>
    * literal of "left right" pairs — attach with `typedlit`; rank =
    * 1-based array position). Result: array<string> of final symbols.
    *
    * Same let-binding shape as [[wordpieceFoldSql]]: `aggregate(array(v),
    * acc, …)` binds the best-rank / leftmost-position sub-expressions
    * once per step; lambda variables are suffixed so nesting never
    * shadows. `length(word)` outer steps suffice — each real step shrinks
    * the symbol count by one, and a no-merge step is the identity. */
  def bpeFoldSql(wordCol: String, mergesCol: String): String = {
    // lowest rank among adjacent pairs present in the table (NULL if none)
    val bestRank =
      s"""array_min(filter(transform(sequence(1, size(acc) - 1),
         |  i2 -> array_position($mergesCol,
         |          concat(element_at(acc, i2), ' ', element_at(acc, i2 + 1)))),
         |  r3 -> r3 > 0))""".stripMargin
    // leftmost position of that pair
    val leftPos =
      s"""array_min(filter(transform(sequence(1, size(a7) - 1),
         |  i4 -> IF(concat(element_at(a7, i4), ' ', element_at(a7, i4 + 1))
         |             = element_at($mergesCol, cast(br7 as int)), i4, cast(null as int))),
         |  p5 -> p5 IS NOT NULL))""".stripMargin
    s"""aggregate(sequence(1, length($wordCol)),
       |  transform(sequence(1, length($wordCol)), c0 -> substring($wordCol, c0, 1)),
       |  (acc, s9) -> IF(size(acc) < 2, acc,
       |    aggregate(array($bestRank), acc, (a7, br7) -> IF(br7 IS NULL, a7,
       |      aggregate(array($leftPos), a7, (a8, ps8) -> concat(
       |        slice(a8, 1, ps8 - 1),
       |        array(concat(element_at(a8, ps8), element_at(a8, ps8 + 1))),
       |        slice(a8, ps8 + 2, size(a8) - ps8 - 1)))))))""".stripMargin
  }

  /** Tokenize a DISTINCT-word relation (column `word`, non-empty) with
    * the frozen ranked merge table. Output: (word, tokens — space-joined,
    * n_tokens). The dictionary table corpus-sized paths broadcast-join
    * against. Contract: words contain no space (the merge-pair
    * separator — guaranteed by whitespace tokenization upstream). */
  def bpeTable(words: DataFrame, merges: Seq[String]): DataFrame =
    words
      .withColumn("__m", typedlit(merges))
      .withColumn("__sy", expr(bpeFoldSql("word", "__m")))
      .select(col("word"),
        expr("array_join(__sy, ' ')").as("tokens"),
        expr("size(__sy)").cast("long").as("n_tokens"))

  /** Per-document BPE statistics: (doc_id, n_words, n_bpe_tokens). Same
    * one-corpus-scan shape as [[docSubwordCounts]] — the staged tf
    * projection feeds both the distinct-word fold and the per-doc
    * aggregate, with the token table broadcast. */
  def docBpeCounts(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[String]): DataFrame = {
    val tf = graft.sources.Tables.stage(
      Ranking.termFrequencies(docs, idCol, textCol))
    val bp = bpeTable(tf.select(col("token").as("word")).distinct(), merges)
    tf.join(broadcast(bp), tf("token") === bp("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        sum(col("tf") * col("n_tokens")).as("n_bpe_tokens"))
  }

  /** [[packBySubwords]] with the budget in BPE tokens — what a GPT/Llama
    * training mix must budget by. Output: (shard, bin, n_docs, bpe_tokens). */
  def packByBpe(docs: DataFrame, shards: Int, budgetTokens: Int,
                merges: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docBpeCounts(docs, "doc_id", "text", merges)
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum", sum(col("n_bpe_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_bpe_tokens) div $budgetTokens"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens")).as("bpe_tokens"))
  }

  /** TRAIN `k` BPE merges from a corpus — the TRAINING half of the BPE
    * family ([[bpeTable]]/[[docBpeCounts]] APPLY a given merge list; this
    * LEARNS one, Sennrich et al. 2016): start from characters, repeat k
    * times "count adjacent piece pairs weighted by word frequency, merge
    * the most frequent pair everywhere" (ties → lexicographically
    * smallest (a, b) — pinned identically in both engines). Returns the
    * learned merges in [[bpeTable]]'s "a b" format — train feeds apply
    * directly — plus the per-iteration audit relation
    * (iter, a, b, cnt, tokens_after), recomputed IN-PLAN from the staged
    * level relations so the emitted rows are engine-computed, not
    * driver-claimed.
    *
    * Segmentations ride a delimiter string ('|p1||p2||…|'): merging pair
    * (a, b) is `replace(seg, '|a||b|', '|ab|')` — both engines replace
    * left-to-right non-overlapping, which IS the BPE convention (in a
    * run 'aaa', (a,a) merges once: [aa, a]), and the double delimiter
    * makes adjacent occurrences ([a,b,a,b] → [ab, ab]) and cross-piece
    * false matches ([ab, c] vs pair (b, c)) both correct — a
    * single-delimiter form fails the first, an undelimited form the
    * second (measured into the spec).
    *
    * Scale shape: the loop runs over the DISTINCT-WORD dictionary
    * (Zipf-bounded — the tokenize-the-dictionary discipline), one
    * dictionary-sized aggregate per merge; each level stages (the
    * iterative-operator discipline — level i feeds the argmax, the next
    * level, AND the audit, and Spark re-executes lazy subplans per
    * reference); the per-iteration argmax is a by-contract-tiny
    * single-row collect (the CC settle pattern). Words are restricted to
    * ^[a-z0-9]+$ (the pre-tokenizer letter/digit-run convention — also
    * what keeps the delimiter and replace literals collision-free).
    *
    * Honest k contract: the loop is LINEAR in k — one driver round trip
    * and one dictionary aggregate per merge — right for audit/demo
    * vocabularies (tens to hundreds of merges). A production 30k-merge
    * vocabulary wants a batched round (merge the top-m non-overlapping
    * pairs per iteration, the standard practical relaxation) before
    * this shape is economical; stated rather than hidden. */
  def trainBpe(docs: DataFrame, textCol: String, k: Int): (Seq[String], DataFrame) = {
    require(k >= 1, s"k=$k")
    val piecesExpr = "split(substring(seg, 2, length(seg) - 2), '\\\\|\\\\|')"
    def pairsOf(lvl: DataFrame): DataFrame =
      lvl.withColumn("p", expr(piecesExpr))
        .filter(expr("size(p) > 1")) // sequence(1, 0) is DESCENDING, not empty
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(p) - 1),
            |  i -> named_struct('a', element_at(p, i), 'b', element_at(p, i + 1)))""".stripMargin))
          .as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).cast("long").as("cnt"))
    // argmax with the min-struct trick: max cnt, then LEX-SMALLEST (a, b)
    // — max(struct(cnt, a, b)) would tie-break toward the LARGEST pair.
    def argmax(pairs: DataFrame): DataFrame =
      pairs.select(min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("m"))
        .select(col("m.a").as("a"), col("m.b").as("b"), (-col("m.nc")).cast("long").as("cnt"))
    var cur = graft.sources.Tables.stage(
      docs.select(explode(expr(s"split(lower($textCol), ' ')")).as("w"))
        .filter(expr("w rlike '^[a-z0-9]+$'"))
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))
        .withColumn("seg", expr(
          """concat('|', array_join(
            |  transform(sequence(1, length(w)), i -> substring(w, i, 1)), '||'), '|')""".stripMargin))
        .select("freq", "seg"))
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](cur)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val top = argmax(pairsOf(cur)).collect()
      if (top.isEmpty || top.head.isNullAt(0)) exhausted = true // every word one piece
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        cur = graft.sources.Tables.stage(cur.withColumn("seg",
          expr(s"replace(seg, '|$a||$b|', '|$a$b|')")))
        levels += cur
      }
    }
    require(merges.nonEmpty, "trainBpe: corpus yielded no mergeable pairs")
    val audit = merges.indices.map { idx =>
      val m = argmax(pairsOf(levels(idx)))
      val t = levels(idx + 1).select(
        sum(expr(s"freq * size($piecesExpr)")).cast("long").as("tokens_after"))
      m.crossJoin(t).select(lit((idx + 1).toLong).as("iter"),
        col("a"), col("b"), col("cnt"), col("tokens_after"))
    }.reduce(_.unionAll(_)).orderBy(col("iter"))
    (merges.map { case (a, b) => s"$a $b" }.toSeq, audit)
  }

  /** WordPiece vocabulary TRAINING (the learning half [[wordpieceTable]]
    * applies) — the third trained tokenizer family beside [[trainBpe]]
    * and [[trainUnigram]]. Same merge LOOP as BPE, different merge
    * OBJECTIVE (Schuster & Nakajima 2012, the BERT trainer): pick the
    * adjacent pair maximizing the likelihood-gain score
    * count(ab) / (count(a)·count(b)) — frequent-but-predictable pairs
    * (high denominators) lose to genuinely cohesive ones. Restated in
    * exact integers (the no-libm discipline): score = (cnt·2^30) div
    * (cnt_a·cnt_b), floor division identical in both engines; ties →
    * lexicographically smallest (a, b). Overflow is impossible under
    * the guarded contract Σ freq·len < 2^31 (then cnt·2^30 < 2^61 and
    * cnt_a·cnt_b < 2^62) — checked up front, never silently wrapped.
    *
    * Symbols ride the [[trainBpe]] double-delimiter segmentations, but
    * in the WORDPIECE convention: the word-initial character is bare,
    * every continuation is '##'-marked ('abc' → '|a||##b||##c|'), so
    * initial and continuation units count separately (the convention's
    * point) and a merge (x, y) — y is always a continuation by the
    * position invariant — produces x + y-minus-'##' under x's own
    * marker. Returned vocab = the character alphabet (both forms) plus
    * every merged symbol, which is exactly what [[wordpieceTable]]'s
    * greedy longest-match consumes: train → apply composes.
    *
    * The audit relation (iter, a, b, cnt, cnt_a, cnt_b, score,
    * tokens_after) is recomputed in-plan from the staged per-round
    * segmentations (the trainBpe discipline — engine-computed, not
    * driver-claimed; tokens_after independently pins the replace
    * semantics). Scale shape and honest-k contract identical to
    * [[trainBpe]]: dictionary-sized aggregates, one tiny collect per
    * round, linear in k. */
  def trainWordpiece(docs: DataFrame, textCol: String, k: Int,
                     scaleBits: Int = 30): (Seq[String], DataFrame) = {
    require(k >= 1, s"k=$k")
    val scale = 1L << scaleBits
    val piecesExpr = "split(substring(seg, 2, length(seg) - 2), '\\\\|\\\\|')"
    val dict = graft.sources.Tables.stage(
      docs.select(explode(expr(s"split(lower($textCol), ' ')")).as("w"))
        .filter(expr("w rlike '^[a-z0-9]+$'"))
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq")))
    val totalChars = dict.agg(sum(expr("freq * length(w)")).cast("long"))
      .head().getLong(0)
    // score = (cnt·2^scaleBits) div (cnt_a·cnt_b) with every count
    // ≤ totalChars, so the bound must move with the parameter:
    // cnt·2^scaleBits < 2^62 ⇔ totalChars < 2^(62 − scaleBits).
    require(scaleBits >= 1 && scaleBits <= 40, s"scaleBits=$scaleBits")
    require(totalChars < (1L << (62 - scaleBits)),
      s"trainWordpiece: $totalChars weighted chars overflow the 2^$scaleBits-scaled " +
        "integer score; shrink the corpus or the scale")
    def symsOf(lvl: DataFrame): DataFrame =
      lvl.withColumn("p", expr(piecesExpr))
    def pairCounts(lvl: DataFrame): DataFrame =
      symsOf(lvl).filter(expr("size(p) > 1")) // sequence(1, 0) is DESCENDING
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(p) - 1),
            |  i -> named_struct('a', element_at(p, i), 'b', element_at(p, i + 1)))""".stripMargin))
          .as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).cast("long").as("cnt"))
    def symCounts(lvl: DataFrame): DataFrame =
      symsOf(lvl).select(col("freq"), explode(col("p")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).cast("long").as("scnt"))
    // pair scores: the broadcast is the by-contract-bounded symbol table.
    def scored(lvl: DataFrame): DataFrame = {
      val sc = symCounts(lvl)
      pairCounts(lvl)
        .join(broadcast(sc.select(col("sym").as("a"), col("scnt").as("cnt_a"))), "a")
        .join(broadcast(sc.select(col("sym").as("b"), col("scnt").as("cnt_b"))), "b")
        .withColumn("score", expr(s"(cnt * $scale) div (cnt_a * cnt_b)"))
    }
    // min-struct argmax (the trainBpe trick): (-score, a, b) prefix is a
    // total order — the count fields ride along for the audit.
    def argmax(sc: DataFrame): DataFrame =
      sc.select(min(struct((-col("score")).as("ns"), col("a"), col("b"),
          col("cnt"), col("cnt_a"), col("cnt_b"))).as("m"))
        .select(col("m.a").as("a"), col("m.b").as("b"), col("m.cnt").as("cnt"),
          col("m.cnt_a").as("cnt_a"), col("m.cnt_b").as("cnt_b"),
          (-col("m.ns")).cast("long").as("score"))
    var cur = graft.sources.Tables.stage(
      dict.withColumn("seg", expr(
        """concat('|', array_join(
          |  transform(sequence(1, length(w)),
          |    i -> IF(i = 1, substring(w, i, 1), concat('##', substring(w, i, 1)))),
          |  '||'), '|')""".stripMargin))
        .select("freq", "seg"))
    val level0 = cur
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](cur)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val top = argmax(scored(cur)).collect()
      if (top.isEmpty || top.head.isNullAt(0)) exhausted = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val m = a + b.stripPrefix("##")
        cur = graft.sources.Tables.stage(cur.withColumn("seg",
          expr(s"replace(seg, '|$a||$b|', '|$m|')")))
        levels += cur
      }
    }
    require(merges.nonEmpty, "trainWordpiece: corpus yielded no mergeable pairs")
    val audit = merges.indices.map { idx =>
      val m = argmax(scored(levels(idx)))
      val t = levels(idx + 1).select(
        sum(expr(s"freq * size($piecesExpr)")).cast("long").as("tokens_after"))
      m.crossJoin(t).select(lit((idx + 1).toLong).as("iter"),
        col("a"), col("b"), col("cnt"), col("cnt_a"), col("cnt_b"),
        col("score"), col("tokens_after"))
    }.reduce(_.unionAll(_)).orderBy(col("iter"))
    val alphabet = level0.select(explode(expr(piecesExpr)).as("sym"))
      .distinct().orderBy(col("sym"))
      .collect().map(_.getString(0)).toSeq
    val vocab = (alphabet ++ merges.map { case (a, b) => a + b.stripPrefix("##") })
      .distinct
    (vocab, audit)
  }

  // ----------------------------------------------------------- unigram LM
  // Unigram-language-model segmentation (Kudo 2018 — the SentencePiece
  // convention T5/ALBERT/mBART tokenizers follow), the third and last of
  // the deployed subword families: the frozen artifact is a vocabulary of
  // pieces with SCORES, and a word tokenizes to the segmentation
  // minimizing total cost (cost ∝ −log p, here pre-scaled frozen
  // INTEGERS — the trained artifact ships them; no floats enter either
  // engine). Wordpiece is a greedy heuristic and BPE replays merge
  // history; unigram is the only one that OPTIMIZES, so its budgets can
  // differ from both on the same vocab.
  //
  // Pinned determinism contract (what both engines replay bitwise):
  // Viterbi DP over word positions, best[i] = min over piece lengths
  // L ≤ maxLen with word[i−L+1..i] ∈ vocab of best[i−L] + cost(piece);
  // ties break toward the LONGEST final piece. Both rules ride ONE
  // integer: candidates compare by combo = cost·32 + (32 − L) (valid
  // while maxLen < 32 — asserted), so the argmin is total and the winner
  // decodes arithmetically (L = 32 − combo mod 32) — which is also what
  // lets the DuckDB twin take a plain scalar MIN instead of an
  // arg_min-of-struct (a correlated arg_min(struct) trips a DuckDB 1.0
  // binder bug). A position with NO matching piece consumes one
  // character at the frozen `unkCost` (the UNK fallback — fires exactly
  // where the vocab's character coverage ends).
  //
  // Scale: same dictionary-not-corpus discipline as the other two — the
  // DP (≤ |word| interpreted HOF steps, each O(maxLen) map probes into
  // the typedlit vocab literal) runs once per DISTINCT word; corpus text
  // is scanned once into the staged map-side tf projection and the token
  // table broadcasts onto it.

  /** The Viterbi fold as one SQL expression over `wordCol` (non-empty
    * word) and `vmapCol` (the piece→cost vocab as a map<string,bigint>
    * literal — attach with `typedlit`). Result: the full best[0..len]
    * history as array<struct<c: bigint, ts: array<string>>> (1-based;
    * element len+1 is the word's segmentation).
    *
    * Same let-binding shape as [[bpeFoldSql]]: `aggregate(array(bk),
    * acc, …)` binds the min-combo scalar once per step; lambda variables
    * are suffixed so nesting never shadows. */
  def unigramFoldSql(wordCol: String, vmapCol: String, maxLen: Int,
                     unkCost: Long): String = {
    require(maxLen >= 1 && maxLen < 32, s"maxLen=$maxLen (combo encoding)")
    // min combo among pieces ending at position s9 (NULL if none match)
    val bk =
      s"""array_min(filter(transform(sequence(1, least(s9, $maxLen)),
         |  L2 -> IF(element_at($vmapCol, substring($wordCol, s9 - L2 + 1, L2)) IS NULL,
         |           cast(null as bigint),
         |           (element_at(acc, s9 - L2 + 1).c
         |            + element_at($vmapCol, substring($wordCol, s9 - L2 + 1, L2))) * 32
         |           + 32 - L2)),
         |  k3 -> k3 IS NOT NULL))""".stripMargin
    s"""aggregate(sequence(1, length($wordCol)),
       |  array(named_struct('c', cast(0 as bigint), 'ts', array_repeat('', 0))),
       |  (acc, s9) -> aggregate(array($bk), acc, (a6, bk6) -> concat(a6, array(
       |    IF(bk6 IS NULL,
       |      named_struct('c', element_at(a6, s9).c + $unkCost,
       |        'ts', concat(element_at(a6, s9).ts, array(substring($wordCol, s9, 1)))),
       |      named_struct('c', bk6 div 32,
       |        'ts', concat(element_at(a6, s9 - cast(32 - bk6 % 32 as int) + 1).ts,
       |          array(substring($wordCol, s9 - cast(32 - bk6 % 32 as int) + 1,
       |                          cast(32 - bk6 % 32 as int))))))))))""".stripMargin
  }

  /** Tokenize a DISTINCT-word relation (column `word`, non-empty) with
    * the frozen scored piece vocabulary. Output: (word, tokens —
    * space-joined, n_tokens, cost — the minimized total). The dictionary
    * table corpus-sized paths broadcast-join against. */
  def unigramTable(words: DataFrame, pieces: Seq[(String, Long)],
                   unkCost: Long = 100L): DataFrame = {
    require(pieces.nonEmpty && pieces.forall(_._1.nonEmpty))
    val maxLen = pieces.map(_._1.length).max
    words
      .withColumn("__uv", typedlit(pieces.toMap))
      .withColumn("__fin", expr(
        s"element_at(${unigramFoldSql("word", "__uv", maxLen, unkCost)}, length(word) + 1)"))
      .select(col("word"),
        expr("array_join(__fin.ts, ' ')").as("tokens"),
        expr("size(__fin.ts)").cast("long").as("n_tokens"),
        col("__fin.c").as("cost"))
  }

  /** Per-document unigram statistics: (doc_id, n_words, n_uni_tokens).
    * Same one-corpus-scan shape as [[docSubwordCounts]]. */
  def docUnigramCounts(docs: DataFrame, idCol: String, textCol: String,
                       pieces: Seq[(String, Long)],
                       unkCost: Long = 100L): DataFrame = {
    val tf = graft.sources.Tables.stage(
      Ranking.termFrequencies(docs, idCol, textCol))
    val ut = unigramTable(
      tf.select(col("token").as("word")).distinct(), pieces, unkCost)
    tf.join(broadcast(ut), tf("token") === ut("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        sum(col("tf") * col("n_tokens")).as("n_uni_tokens"))
  }

  /** Unigram-LM vocabulary TRAINING (the learning half [[unigramTable]]
    * applies) — Viterbi-EM over the distinct-word dictionary, the
    * hard-EM variant of Kudo 2018's SentencePiece recipe, restated in
    * EXACT INTEGERS so both engines replay every round bitwise (the
    * no-libm discipline: a float −log p model is not bit-portable, an
    * integer-log2 cost model is):
    *
    *  - SEED: every substring of every dictionary word up to `maxLen`
    *    chars, counted at every position (overlaps counted — both
    *    engines enumerate (start, len) pairs identically), weighted by
    *    word frequency. The vocabulary is ALL single characters (full
    *    coverage, so the UNK fallback never fires during training) plus
    *    the top-`budget` multi-char substrings by (count DESC, piece
    *    ASC — the pinned total order).
    *  - COST MODEL: cost(p) = bits(total) − bits(cnt_p) + 1 with
    *    bits(x) = length(bin(x)) — an exact integer ⌊log2⌋ surrogate
    *    for −log p (the HLL rho trick; identical in DuckDB). Frequent
    *    pieces are cheap; cost ≥ 1 always.
    *  - E-STEP (round r): Viterbi-segment every dictionary word under
    *    vocab r−1 (the [[unigramFoldSql]] DP — training and application
    *    share one segmenter, so train → apply composes by
    *    construction).
    *  - M-STEP: re-count pieces from the Viterbi segmentations
    *    (weighted by word frequency), re-cost with total = Σ counts
    *    (= Σ freq·n_tokens), and PRUNE to budget: characters are always
    *    kept (unused ones re-cost at cnt = 1 — the pinned floor);
    *    multi-char pieces keep the top-`budget` USED ones — a piece the
    *    optimal segmentations stop using drops out, which is exactly
    *    Kudo's prune reinterpreted under hard EM.
    *
    * Returns the final scored pieces (feed [[unigramTable]] /
    * [[packByUnigram]] directly) and the TRAJECTORY relation
    * (round, piece, cost) for rounds 0..rounds, engine-computed from
    * the staged per-round vocab relations — the full training history
    * is what the oracle checks bitwise.
    *
    * Scale shape: the trainBpe discipline — every aggregate is over the
    * Zipf-bounded dictionary (or its substring expansion, ≤ maxLen×
    * chars per word), never the corpus; per-round vocab relations stage
    * (each feeds the next round's typedlit literal, the trajectory, and
    * the chars LEFT JOIN); the per-round collect is vocab-sized
    * (≤ budget + |alphabet| rows, by contract). Honest-rounds contract:
    * LINEAR driver rounds like trainBpe's k — right for bounded demo/
    * audit vocabularies; a production 100k-piece unigram train wants
    * the same batched relaxation noted there. */
  def trainUnigram(docs: DataFrame, textCol: String, budget: Int, rounds: Int,
                   maxLen: Int = 4, unkCost: Long = 100L)
      : (Seq[(String, Long)], DataFrame) = {
    require(budget >= 1 && rounds >= 1 && maxLen >= 2 && maxLen < 32)
    val costExpr = "CAST(length(bin(total)) - length(bin(cnt)) + 1 AS BIGINT)"
    val dict = graft.sources.Tables.stage(
      docs.select(explode(expr(s"split(lower($textCol), ' ')")).as("w"))
        .filter(expr("w rlike '^[a-z0-9]+$'"))
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq")))
    val cand = graft.sources.Tables.stage(
      dict.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($maxLen, length(w) - i + 1)),
           |    L -> substring(w, i, L))))""".stripMargin)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("cnt")))
    val chars = cand.filter(expr("length(piece) = 1"))
    def topMulti(counts: DataFrame): DataFrame =
      counts.filter(expr("length(piece) > 1"))
        .orderBy(col("cnt").desc, col("piece").asc).limit(budget)
        .select(col("piece"), col("cnt"))
    def costed(counts: DataFrame, tot: DataFrame): DataFrame =
      counts.crossJoin(broadcast(tot))
        .select(col("piece"), expr(costExpr).as("cost"))
    val vocab0 = graft.sources.Tables.stage(costed(
      chars.select(col("piece"), col("cnt")).unionAll(topMulti(cand)),
      chars.agg(sum(col("cnt")).cast("long").as("total"))))
    val vocabs = scala.collection.mutable.ArrayBuffer[DataFrame](vocab0)
    var pieces = vocab0.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    for (_ <- 1 to rounds) {
      val seg = unigramTable(dict.select(col("w").as("word")), pieces, unkCost)
      val used = graft.sources.Tables.stage(
        seg.join(dict, seg("word") === dict("w"))
          .select(col("freq"), explode(expr("split(tokens, ' ')")).as("piece"))
          .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("cnt")))
      val next = graft.sources.Tables.stage(costed(
        chars.select(col("piece")).join(used, Seq("piece"), "left")
          .select(col("piece"), coalesce(col("cnt"), lit(1L)).as("cnt"))
          .unionAll(topMulti(used)),
        used.agg(sum(col("cnt")).cast("long").as("total"))))
      vocabs += next
      pieces = next.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    val traj = vocabs.zipWithIndex.map { case (v, r) =>
      v.select(lit(r.toLong).as("round"), col("piece"), col("cost"))
    }.reduce(_.unionAll(_))
    (pieces.sortBy(_._1), traj)
  }

  /** [[packBySubwords]] with the budget in unigram-LM tokens — what a
    * SentencePiece-family mix must budget by. Output: (shard, bin,
    * n_docs, uni_tokens). */
  def packByUnigram(docs: DataFrame, shards: Int, budgetTokens: Int,
                    pieces: Seq[(String, Long)],
                    unkCost: Long = 100L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docUnigramCounts(docs, "doc_id", "text", pieces, unkCost)
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum", sum(col("n_uni_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_uni_tokens) div $budgetTokens"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_uni_tokens")).as("uni_tokens"))
  }
}
