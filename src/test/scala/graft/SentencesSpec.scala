package graft

import org.apache.spark.sql.functions._

import graft.operators.Sentences

/** Sentence segmentation + C4 span dedup a-priori cases (the registry
  * queries oracle-check the full chains on the corpus; these pin the
  * CONTRACT claims on hand-built documents). */
class SentencesSpec extends SparkSpec {
  import spark.implicits._

  private def sents(text: String): Seq[(Long, Long, String)] =
    Sentences.sentenceRelation(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .select(col("doc_id"), col("sent_idx"), col("sentence"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._2)

  test("splitter: boundaries, final terminator, runs, empties, over-split") {
    // medial and FINAL sentences are treated alike (terminators strip
    // after the split); terminator RUNS are one boundary.
    assert(sents("one two. three four! five six").map(_._3) ==
      Seq("one two", "three four", "five six"))
    assert(sents("ends with dot.").map(_._3) == Seq("ends with dot"))
    assert(sents("wait... what?! ok").map(_._3) == Seq("wait", "what", "ok"))
    // pure punctuation emits nothing; a doc with no terminators is ONE
    // sentence.
    assert(sents("... !!").isEmpty)
    assert(sents("no punctuation here at all").map(_._3) ==
      Seq("no punctuation here at all"))
    // the stated deterministic over-split: abbreviation dots split.
    assert(sents("dr. smith arrived").map(_._3) == Seq("dr", "smith arrived"))
  }

  test("span dedup: duplicated 3-spans keep the min-(doc, idx) occurrence only") {
    // doc 1 and doc 2 share sentences s1..s3 (one duplicated span);
    // doc 3 shares nothing; doc 4 has < 3 sentences (no span — immune
    // even though its text EQUALS part of doc 1's).
    val docs = Seq(
      (1L, "alpha beta. gamma delta. epsilon zeta. unique one here."),
      (2L, "intro words. alpha beta. gamma delta. epsilon zeta. tail two."),
      (3L, "totally different. content lives. in this doc. entirely so."),
      (4L, "alpha beta. gamma delta.")).toDF("id", "t")
    val out = Sentences.spanDedup(docs, "id", "t")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: canonical occurrence (smallest doc_id) — keeps everything.
    assert(out(0) == (1L, 4L, 0L,
      "alpha beta. gamma delta. epsilon zeta. unique one here"), out(0))
    // doc 2: its copy of the span (sentences 1..3) is removed; intro
    // and tail survive.
    assert(out(1) == (2L, 5L, 3L, "intro words. tail two"), out(1))
    // doc 3: untouched; doc 4: too short to carry a span — whole.
    assert(out(2)._3 == 0L && out(3) == (4L, 2L, 0L, "alpha beta. gamma delta"),
      s"${out(2)} / ${out(3)}")
  }

  test("overlapping duplicated spans union their removals") {
    // docs share FOUR consecutive sentences ⇒ two overlapping
    // duplicated spans in each; the non-canonical doc loses the union
    // (4 sentences), not 6.
    val docs = Seq(
      (1L, "a a. b b. c c. d d. one one."),
      (2L, "a a. b b. c c. d d. two two.")).toDF("id", "t")
    val out = Sentences.spanDedup(docs, "id", "t")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) == (1L, 5L, 0L, "a a. b b. c c. d d. one one"), out(0))
    assert(out(1) == (2L, 5L, 4L, "two two"), out(1))
  }
}
