package graft

import org.apache.spark.sql.functions._

import graft.operators.Subword

/** Algorithm pins for the greedy longest-match wordpiece fold — crafted
  * vocab cases the synthetic-corpus registry query can't exercise as
  * pointedly, plus the plan shape of the corpus-sized composition. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "un", "afford", "able", "##afford", "##able", "##a", "##b", "##le",
    "a", "b", "l", "e")

  private def tok(words: String*): Map[String, (String, Long, Boolean)] =
    Subword.wordpieceTable(words.toDF("word"), vocab)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("greedy longest match: whole word beats prefix, long continuation beats short") {
    val t = tok("able", "unaffordable", "ba")
    // whole-word piece wins over the char pieces.
    assert(t("able") == (("able", 1L, false)))
    // un + ##afford + ##able: at pos 3 both ##a and ##afford match — the
    // longest wins; at pos 9 both ##a/##able match — ##able wins.
    assert(t("unaffordable") == (("un ##afford ##able", 3L, false)))
    // continuation pieces only match PAST position 1: 'b' initial, then ##a.
    assert(t("ba") == (("b ##a", 2L, false)))
  }

  test("no match at any position collapses the whole word to [UNK]") {
    val t = tok("xyz", "ablex")
    assert(t("xyz") == (("[UNK]", 1L, true)))
    // prefix tokenizes fine, then 'x' has no piece → the WORD is [UNK],
    // not a partial sequence (the wordpiece contract).
    assert(t("ablex") == (("[UNK]", 1L, true)))
  }

  test("docSubwordCounts: per-doc sums over occurrences, one broadcast join") {
    val docs = Seq(
      (1L, "able able unaffordable"),
      (2L, "xyz ba")).toDF("doc_id", "text")
    val got = Subword.docSubwordCounts(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: 3 words, 1+1+3 subwords, 0 unk; doc 2: 2 words, 1+2, 1 unk.
    assert(got(1L) == ((3L, 5L, 0L)))
    assert(got(2L) == ((2L, 3L, 1L)))
    val plan = Subword.docSubwordCounts(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"wordpiece table must broadcast onto the tf relation:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("packBySubwords bins by the subword budget, not whitespace words") {
    // 4 docs in one shard, 3 subwords each, budget 6 → bins {0,0,1,1}.
    val docs = Seq.tabulate(4)(i => (i.toLong * 8, "unaffordable"))
      .toDF("doc_id", "text")
    val got = Subword.packBySubwords(docs, shards = 8, budgetSubwords = 6, vocab)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((0L, 0L, 2L, 6L), (0L, 1L, 2L, 6L)))
  }

  test("fold is insensitive to vocab list order (longest match, not first match)") {
    val shuffled = scala.util.Random.shuffle(vocab)
    val a = Subword.wordpieceTable(Seq("unaffordable").toDF("word"), vocab)
      .as[(String, String, Long, Boolean)].collect().head
    val b = Subword.wordpieceTable(Seq("unaffordable").toDF("word"), shuffled)
      .as[(String, String, Long, Boolean)].collect().head
    assert(a == b)
  }

  // ------------------------------------------- BPE merge-rank application

  private def bpe(merges: Seq[String], words: String*): Map[String, (String, Long)] =
    Subword.bpeTable(words.toDF("word"), merges)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("BPE applies merges in RANK order, not position order") {
    val merges = Seq("t h", "e r", "th e")
    val t = bpe(merges, "ther", "the", "xyz", "a")
    // t,h,e,r: (t,h)=r1 wins → [th,e,r]; then (e,r)=r2 BEATS (th,e)=r3
    // even though (th,e) sits first in the word → [th, er].
    assert(t("ther") == (("th er", 2L)))
    // full chain: t+h=th, th+e=the — a merged symbol merging again.
    assert(t("the") == (("the", 1L)))
    // no applicable merge: characters remain (byte-level convention, no UNK).
    assert(t("xyz") == (("x y z", 3L)))
    assert(t("a") == (("a", 1L)))
  }

  test("BPE merges the LEFTMOST occurrence first (the pinned step contract)") {
    // 'aaa' with a single 'a a' merge: leftmost → [aa, a], never [a, aa].
    assert(bpe(Seq("a a"), "aaa")("aaa") == (("aa a", 2L)))
    // 'papa': (p,a) at 1 then at 2 → [pa, pa].
    assert(bpe(Seq("p a"), "papa")("papa") == (("pa pa", 2L)))
  }

  test("docBpeCounts sums over occurrences; token table broadcasts") {
    val merges = Seq("t h", "e r", "th e")
    val docs = Seq(
      (1L, "the ther the"),
      (2L, "xyz a")).toDF("doc_id", "text")
    val got = Subword.docBpeCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 3 words, 1+2+1 tokens; doc 2: 2 words, 3+1 tokens.
    assert(got(1L) == ((3L, 4L)))
    assert(got(2L) == ((2L, 4L)))
    val plan = Subword.docBpeCounts(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"BPE table must broadcast onto the tf relation:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("packByBpe bins by the BPE budget") {
    // 4 docs in one shard, 'ther ther' = 4 tokens each, budget 8 → bins {0,0,1,1}.
    val merges = Seq("t h", "e r", "th e")
    val docs = Seq.tabulate(4)(i => (i.toLong * 8, "ther ther"))
      .toDF("doc_id", "text")
    val got = Subword.packByBpe(docs, shards = 8, budgetTokens = 8, merges)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((0L, 0L, 2L, 8L), (0L, 1L, 2L, 8L)))
  }

  test("trainBpe learns the hand-computed merges; ties break lexicographic") {
    // dictionary {low: 3, banana: 1}:
    //   round 1: (l,o)=3 ties (o,w)=3 → lex smallest (l,o); tokens 15→12
    //   round 2: (lo,w)=3 wins; low fuses whole → tokens 9
    //   round 3: (a,n)=2 ties (n,a)=2 → (a,n); banana → [b,an,an,a] → 7
    val docs = Seq("low low banana", "low").toDF("text")
    val (merges, audit) = Subword.trainBpe(docs, "text", k = 3)
    assert(merges == Seq("l o", "lo w", "a n"))
    assert(audit.as[(Long, String, String, Long, Long)].collect().toSeq ==
      Seq((1L, "l", "o", 3L, 12L), (2L, "lo", "w", 3L, 9L), (3L, "a", "n", 2L, 7L)))
    // train → apply composes: the learned list feeds bpeTable directly.
    val t = Subword.bpeTable(Seq("low", "lot", "nano").toDF("word"), merges)
      .as[(String, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(t == Map("low" -> "low", "lot" -> "lo t", "nano" -> "n an o"))
  }

  test("trainBpe: pair counts see overlaps, the merge replaces non-overlapping (aaa)") {
    // 'aaa' ×2: pc counts the OVERLAPPING (a,a) pairs (2 per word → 4),
    // but the round's replace merges leftmost-non-overlapping → [aa, a],
    // so tokens_after = 2 pieces × 2 words = 4 — the two numbers pin the
    // two different conventions, and a double-delimiter bug in either
    // direction (missed adjacent occurrence / phantom overlap merge)
    // breaks one of them.
    val (m1, a1) = Subword.trainBpe(Seq("aaa aaa").toDF("text"), "text", k = 1)
    assert(m1 == Seq("a a"))
    assert(a1.as[(Long, String, String, Long, Long)].collect().toSeq ==
      Seq((1L, "a", "a", 4L, 4L)))
    // adjacent non-overlapping occurrences BOTH merge: abab → [ab, ab].
    val (m2, a2) = Subword.trainBpe(Seq("abab").toDF("text"), "text", k = 1)
    assert(m2 == Seq("a b"))
    assert(a2.as[(Long, String, String, Long, Long)].collect().toSeq ==
      Seq((1L, "a", "b", 2L, 2L)))
    // exhaustion: a corpus fused to single pieces stops early, honestly.
    val (m3, a3) = Subword.trainBpe(Seq("ab ab").toDF("text"), "text", k = 5)
    assert(m3 == Seq("a b") && a3.count() == 1L)
  }

  private def uni(pieces: Seq[(String, Long)],
                  words: String*): Map[String, (String, Long, Long)] =
    Subword.unigramTable(words.toDF("word"), pieces)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("unigram Viterbi picks the GLOBAL minimum, not the greedy longest match") {
    // 'abc' as one piece costs 20; ab+c costs 6 — greedy longest-match
    // (wordpiece's rule) would take 'abc'; Viterbi must split.
    val pieces = Seq("a" -> 4L, "b" -> 4L, "c" -> 1L, "ab" -> 5L, "abc" -> 20L)
    val t = uni(pieces, "abc", "ab", "cab")
    assert(t("abc") == (("ab c", 2L, 6L)))
    assert(t("ab") == (("ab", 1L, 5L)))
    // optimum may skip a greedy prefix: c+ab (1+5) beats c+a+b (9).
    assert(t("cab") == (("c ab", 2L, 6L)))
  }

  test("unigram cost ties break toward the LONGEST final piece (the pinned contract)") {
    // 'ba' = 24 exactly equals b+a = 24 — the combo encoding must pick 'ba'.
    val pieces = Seq("a" -> 12L, "b" -> 12L, "ba" -> 24L)
    assert(uni(pieces, "ba")("ba") == (("ba", 1L, 24L)))
  }

  test("unigram UNK fallback consumes one uncovered char at the frozen cost") {
    val pieces = Seq("a" -> 1L, "aa" -> 1L)
    val t = uni(pieces, "axa", "x", "aaxaa")
    assert(t("axa") == (("a x a", 3L, 102L)))
    assert(t("x") == (("x", 1L, 100L)))
    // DP still optimizes around the UNK island: aa|x|aa = 1+100+1.
    assert(t("aaxaa") == (("aa x aa", 3L, 102L)))
  }

  test("unigram fold equals an independent reference DP on random vocab/words") {
    // reference Viterbi with the pinned combo tie-break, written
    // imperatively — shares no code with the SQL fold.
    def refUni(word: String, m: Map[String, Long], maxLen: Int,
               unk: Long): (Long, Seq[String]) = {
      val best = new Array[(Long, Seq[String])](word.length + 1)
      best(0) = (0L, Nil)
      for (p <- 1 to word.length) {
        var cand: (Long, Long, Seq[String]) = null // (combo, cost, toks)
        for (l <- 1 to math.min(p, maxLen)) {
          val piece = word.substring(p - l, p)
          m.get(piece).foreach { c =>
            val cost = best(p - l)._1 + c
            val combo = cost * 32 + 32 - l
            if (cand == null || combo < cand._1)
              cand = (combo, cost, best(p - l)._2 :+ piece)
          }
        }
        best(p) =
          if (cand == null)
            (best(p - 1)._1 + unk, best(p - 1)._2 :+ word.substring(p - 1, p))
          else (cand._2, cand._3)
      }
      best(word.length)
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    // random multi-char pieces over {a,b,c} (d left uncovered → UNK path),
    // random costs INCLUDING deliberate tie opportunities (coarse grid).
    val singles = Seq("a" -> 10L, "b" -> 10L, "c" -> 10L)
    val multis = Seq.fill(12) {
      val len = 2 + rnd.nextInt(2)
      val p = Seq.fill(len)("abc"(rnd.nextInt(3))).mkString
      p -> (5L + 5L * rnd.nextInt(5))
    }.distinct.filter { case (p, _) => !singles.exists(_._1 == p) }
    val pieces = (singles ++ multis).distinctBy(_._1)
    val m = pieces.toMap
    val maxLen = pieces.map(_._1.length).max
    val words = Seq.fill(60)(
      Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString).distinct
    val got = uni(pieces, words: _*)
    words.foreach { w =>
      val (c, ts) = refUni(w, m, maxLen, 100L)
      assert(got(w) == ((ts.mkString(" "), ts.size.toLong, c)),
        s"word=$w pieces=$pieces")
    }
  }

  test("docUnigramCounts sums over occurrences; token table broadcasts") {
    val pieces = Seq("a" -> 4L, "b" -> 4L, "c" -> 1L, "ab" -> 5L)
    val docs = Seq((1L, "abc ab abc"), (2L, "c c")).toDF("doc_id", "text")
    val got = Subword.docUnigramCounts(docs, "doc_id", "text", pieces)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 3 words, 2+1+2 tokens; doc 2: 2 words, 1+1.
    assert(got(1L) == ((3L, 5L)))
    assert(got(2L) == ((2L, 2L)))
    val plan = Subword.docUnigramCounts(docs, "doc_id", "text", pieces)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"unigram table must broadcast onto the tf relation:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("trainWordpiece: likelihood score beats raw frequency; train → apply composes") {
    // freqs: ab=8, ac=8, zq=2. Symbols: a(initial)=16, ##b=8, ##c=8,
    // z=2, ##q=2. Scores (S = 2^30): (a,##b) = 8S/(16·8) = S/16;
    // (a,##c) = S/16; (z,##q) = 2S/(2·2) = S/2. BPE would merge the
    // cnt-8 pair; wordpiece merges the COHESIVE (z,##q) first — that
    // asymmetry is the objective, pinned here. Round 2: (a,##b) vs
    // (a,##c) tie at S/16 → lex smallest b wins.
    val docs = Seq((1L, ("ab " * 8 + "ac " * 8 + "zq zq").trim))
      .toDF("doc_id", "text")
    val (vocab, audit) = Subword.trainWordpiece(docs, "text", k = 2)
    val rows = audit
      .as[(Long, String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, "z", "##q", 2L, 2L, 2L, 1L << 29, 34L),
      (2L, "a", "##b", 8L, 16L, 8L, 1L << 26, 26L)),
      s"audit: $rows")
    assert(vocab.toSet ==
      Set("a", "z", "##b", "##c", "##q", "zq", "ab"), s"vocab: $vocab")
    // the learned vocab feeds the greedy longest-match application.
    val applied = Subword
      .wordpieceTable(Seq("ab", "ac", "zq").toDF("word"), vocab)
      .select(col("word"), col("pieces")).as[(String, String)].collect().toMap
    assert(applied("ab") == "ab")
    assert(applied("ac") == "a ##c")
    assert(applied("zq") == "zq")
  }

  test("trainUnigram: hand-computed Viterbi-EM trajectory on a pinned fixture") {
    // dict: 'abab' freq 2 (two tokens of doc 1), 'cd' freq 1.
    // chars: a=4 b=4 c=1 d=1 → total₀=10, bits(10)=4.
    // multi candidates: ab=4; ba/aba/bab/abab=2; cd=1 → budget 2 keeps
    // ab then (tie cnt=2, piece ASC) aba.
    // costs₀ (bits(tot)−bits(cnt)+1): a,b→2  c,d→4  ab→2  aba→3.
    // round 1 Viterbi: 'abab' → [ab, ab] (cost 4; aba+b = 5, chars = 8);
    // 'cd' → [c, d]. used: ab=4, c=1, d=1 → total₁=6, bits(6)=3.
    // vocab₁: chars a,b (unused → cnt 1) cost 3; c,d (cnt 1) cost 3;
    // multi keeps only ab (cost 3−3+1=1); aba pruned (unused).
    // round 2 re-segments identically → fixpoint.
    val docs = Seq((1L, "abab abab"), (2L, "cd")).toDF("doc_id", "text")
    val (pieces, traj) = Subword.trainUnigram(docs, "text", budget = 2, rounds = 2)
    val got = traj.as[(Long, String, Long)].collect().toSet
    val r0 = Set((0L, "a", 2L), (0L, "b", 2L), (0L, "c", 4L), (0L, "d", 4L),
      (0L, "ab", 2L), (0L, "aba", 3L))
    val r1 = Set(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L), ("ab", 1L))
    val expected = r0 ++ r1.map(p => (1L, p._1, p._2)) ++ r1.map(p => (2L, p._1, p._2))
    assert(got == expected, s"trajectory:\n got=$got\n expected=$expected")
    // the learned artifact feeds the application path directly.
    assert(pieces.toSet == r1)
    val applied = Subword.unigramTable(Seq("abab", "cd").toDF("word"), pieces)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(applied("abab") == (("ab ab", 2L, 2L)))
    assert(applied("cd") == (("c d", 2L, 6L)))
  }
}
