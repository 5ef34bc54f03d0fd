package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ranking, TextDedup}

/** Ranking operators (Ranking.scala) + C4-style line dedup
  * (TextDedup.stripCommonLines): value fixtures small enough to check by
  * hand, plus the plan-shape claims (map-side tf, broadcast df, capped
  * postings aggregator). */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a c"),
    (2L, "a b d d"),
    (3L, "e e e a")).toDF("doc_id", "text")

  test("termFrequencies computes per-doc distinct-token counts map-side") {
    val tf = Ranking.termFrequencies(docs, "doc_id", "text")
    val got = tf.as[(Long, String, Int)].collect().toSet
    assert(got == Set(
      (1L, "a", 2), (1L, "b", 1), (1L, "c", 1),
      (2L, "a", 1), (2L, "b", 1), (2L, "d", 2),
      (3L, "e", 3), (3L, "a", 1)))
    // the whole tf relation is a projection + generator — zero Exchanges.
    val plan = tf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("runEndsSql: empty arrays yield empty runs, not an index-0 error") {
    // sequence(1, 0) is DESCENDING [1, 0]; unguarded, index 0 survives the
    // filter (the `i = size` disjunct holds) and the consuming transform's
    // element_at(s, 0) throws. The helper is public — pin the guard.
    val got = spark.sql(
      s"""SELECT ${Ranking.runEndsSql("s")} AS ends,
         |       ${Ranking.runCountsSql(s"(${Ranking.runEndsSql("s")})")} AS counts
         |FROM VALUES (array()), (array('x')), (array('x','x','y'))
         |  AS t(s)""".stripMargin)
      .collect().map(r => (r.getSeq[Int](0).toList, r.getSeq[Int](1).toList))
    assert(got.toSeq == Seq(
      (Nil, Nil), (List(1), List(1)), (List(2, 3), List(2, 1))))
  }

  test("tfidfTopK ranks rare-but-frequent tokens first, token tie-break") {
    // N=3. df: a=3, b=2, c=1, d=1, e=1.
    // doc 3 scores: e = 3*3/1 = 9, a = 1*3/3 = 1 → top2 = e, a.
    val got = Ranking.tfidfTopK(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 3L)
      .orderBy(col("score").desc)
      .select(col("token"), col("score"))
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("e", 9.0), ("a", 1.0)))
  }

  test("invertedIndex caps postings at k smallest doc ids") {
    val got = Ranking.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((3L, "1,2")))  // df exact, postings capped to 2
    assert(got("d") == ((1L, "2")))
    assert(got("e") == ((1L, "3")))
  }

  test("MinKLongs merge keeps global minima under any partitioning") {
    val agg = new Ranking.MinKLongs(3)
    val left = List(7L, 9L, 12L).foldLeft(agg.zero)(agg.reduce)
    val right = List(1L, 8L, 30L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(left, right).items == List(1L, 7L, 8L))
    assert(agg.merge(right, left).items == List(1L, 7L, 8L))
  }

  test("bm25TermScores emits exact-rational factors, matched terms only") {
    val got = Ranking.bm25TermScores(docs, "doc_id", "text", Seq("d", "e"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        col("tf_norm"), col("idf_odds"))
      .as[(Long, String, Long, Long, Long, Double, Double)].collect().toSet
    // N=3, total=12. d: doc2 tf=2 dl=4; e: doc3 tf=3 dl=4.
    // tf_norm(d) = 22*2*12 / (10*12*2 + 3*12 + 9*4*3) = 528/384
    // tf_norm(e) = 22*3*12 / (10*12*3 + 3*12 + 9*4*3) = 792/504
    // idf_odds (df=1 both) = (2*3 - 2 + 1) / 3 = 5/3
    assert(got == Set(
      (2L, "d", 2L, 1L, 4L, 528.0 / 384.0, 5.0 / 3.0),
      (3L, "e", 3L, 1L, 4L, 792.0 / 504.0, 5.0 / 3.0)))
  }

  test("bm25TermScores refuses duplicated query terms") {
    // a duplicate term doubles df and multiplies the terms.head-slice
    // corpus stats by its multiplicity — every score silently wrong.
    val e = intercept[IllegalArgumentException] {
      Ranking.bm25TermScores(docs, "doc_id", "text", Seq("a", "a", "b"))
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("tfidfTopK: N counts distinct non-null-text docs (contract)") {
    // a null-text row produces no tf rows; counting it into N would shift
    // every idf while never scoring the row. The operator filters it up
    // front, so adding null-text rows must not change any surviving score.
    val clean = Ranking.tfidfTopK(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double)].collect().toSet
    val dirty0 = docs.union(Seq((4L, null: String)).toDF("doc_id", "text"))
    val dirty = Ranking.tfidfTopK(dirty0, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double)].collect().toSet
    assert(dirty == clean)
  }

  test("stripCommonLines removes cross-doc lines, keeps singletons in order") {
    // width=2 lines: d1 = ["x y", "z w"], d2 = ["x y", "q r"],
    // d3 = ["x y"] → "x y" banned (3 docs), everything else kept.
    val d = Seq((1L, "x y z w"), (2L, "x y q r"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextDedup.stripCommonLines(d, "doc_id", "text", width = 2, minDocs = 2)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 1L, "z w"), (2L, 1L, "q r"), (3L, 0L, "")))
  }

  test("line reassembly preserves original line order") {
    // no banned lines (minDocs=2, all lines unique) → text round-trips.
    val d = Seq((1L, "a1 a2 b1 b2 c1 c2")).toDF("doc_id", "text")
    val got = TextDedup.stripCommonLines(d, "doc_id", "text", width = 2, minDocs = 2)
      .as[(Long, Long, String)].collect().head
    assert(got == ((1L, 3L, "a1 a2 b1 b2 c1 c2")))
  }

  test("collocations: bound phrase outranks frequent independent pair") {
    // "new york" always co-occurs (10×, each part 10× total) → score N/10.
    // "of the" also appears 10× but its parts are everywhere (of=20,
    // the=30) → score N/60. PMI must rank the bound phrase first.
    val d = (0 until 10).map { i =>
      (i.toLong, s"new york of the w$i of x$i the y$i the z$i")
    }.toDF("doc_id", "text")
    val got = Ranking.collocations(d, "doc_id", "text", minCount = 5, k = 10)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.head._1 == "new york", got.map(_._1).mkString(","))
    val ny = got.find(_._1 == "new york").get
    assert(ny._2 == 10 && ny._3 == 10 && ny._4 == 10, ny)
    val ofThe = got.find(_._1 == "of the").get
    assert(ofThe._2 == 10 && ofThe._3 == 20 && ofThe._4 == 30, ofThe)
    assert(ny._5 > ofThe._5)
  }

  test("collocations bigram counts match brute force, incl. <2-token docs") {
    val rnd = new scala.util.Random(7)
    val alpha = Vector("a", "b", "c", "d")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(8))(alpha(rnd.nextInt(4))).mkString(" "))
    }
    // split("") = [""], a 1-token doc — no bigrams; 0-token impossible.
    val toks = docs.map(_._2.split(" ", -1).toSeq)
    val expUni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expBg = toks.flatMap(t => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Ranking.collocations(docs.toDF("doc_id", "text"), "doc_id", "text",
      minCount = 1, k = 10000)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.map(g => g._1 -> g._2).toMap == expBg)
    got.foreach { g =>
      val Array(a, b) = g._1.split(" ", -1)
      assert(g._3 == expUni(a) && g._4 == expUni(b), g)
    }
  }

  test("importanceScores: exact reference, bounds, and target separation") {
    import spark.implicits._
    val scale = 1000000L
    // disjoint vocabularies: target docs should score ~scale, the alien
    // doc ~0, and a half-half doc in between.
    val docs = Seq(
      (1L, "alpha beta gamma alpha", true),
      (2L, "beta gamma delta", true),
      (3L, "zork quux blarg", false),
      (4L, "alpha beta zork quux", false),
      (5L, null.asInstanceOf[String], false)).toDF("doc_id", "text", "tgt")
    val got = graft.operators.Ranking
      .importanceScores(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // null text excluded
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    // driver-side reference with identical truncating integer math
    val corpus = Seq(
      (1L, Seq("alpha", "beta", "gamma", "alpha"), true),
      (2L, Seq("beta", "gamma", "delta"), true),
      (3L, Seq("zork", "quux", "blarg"), false),
      (4L, Seq("alpha", "beta", "zork", "quux"), false))
    def bk(t: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString.take(3)
    }
    val all = corpus.flatMap { case (_, ts, tg) => ts.map(t => (bk(t), tg)) }
    val w = all.groupBy(_._1).map { case (b, os) =>
      b -> os.count(_._2).toLong * scale / os.size }
    corpus.foreach { case (id, ts, _) =>
      val raw = ts.map(t => w(bk(t))).sum
      val (gid, graw, gn, gavg) = got(id)
      assert(gid == id && graw == raw && gn == ts.size &&
        gavg == raw / ts.size, s"doc $id: got $graw/$gn/$gavg want $raw")
    }
    // separation: pure-target docs outscore the alien doc
    assert(got(1L)._4 > got(3L)._4 && got(2L)._4 > got(3L)._4)
    assert(got(4L)._4 > got(3L)._4 && got(4L)._4 < got(1L)._4)
  }

  test("qualityClassifier: driver-settle ≡ staged-counts fallback, bitwise") {
    import spark.implicits._
    val cdocs = Seq(
      (1L, "good clean prose here", true),
      (2L, "clean prose good good", true),
      (3L, "spam junk spam junk", false),
      (4L, "good clean spam junk", false)).toDF("doc_id", "text", "pos")
    def all(maxSettle: Int) = graft.operators.Ranking
      .qualityClassifier(cdocs, "doc_id", "text", col("pos"),
        maxSettleHexDigits = maxSettle)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // the settle path (counts collected to a local relation) and the
    // wide-bucket-space fallback (counts staged) must emit identical
    // rows — grouped sums of grouped sums either way (r18).
    assert(all(graft.operators.Ranking.DefaultMaxSettleHexDigits) == all(0))
  }

  test("qualityClassifier: exact reference, keep threshold, novel vocab") {
    import spark.implicits._
    val scale = 1000000L
    // disjoint vocabularies: positive docs should keep, the alien doc
    // drop, and the mixed doc sit between.
    val cdocs = Seq(
      (1L, "good clean prose here", true),
      (2L, "clean prose good good", true),
      (3L, "spam junk spam junk", false),
      (4L, "good clean spam junk", false),
      (5L, null.asInstanceOf[String], false)).toDF("doc_id", "text", "pos")
    val got = graft.operators.Ranking
      .qualityClassifier(cdocs, "doc_id", "text", col("pos"))
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    // driver-side reference with identical truncating integer math over
    // unigram + bigram features.
    def feats(ts: Seq[String]) =
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val corpus = Seq(
      (1L, "good clean prose here", true),
      (2L, "clean prose good good", true),
      (3L, "spam junk spam junk", false),
      (4L, "good clean spam junk", false))
      .map { case (id, t, p) => (id, feats(t.split(" ", -1).toSeq), p) }
    def bk(t: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString.take(3)
    }
    val all = corpus.flatMap { case (_, fs, p) => fs.map(f => (bk(f), p)) }
    // weights center at the CORPUS positive prior, not 1/2 — the implicit
    // bias that keeps the 0 threshold discriminative for minority labels.
    val prior = all.count(_._2).toLong * scale / all.size
    val w = all.groupBy(_._1).map { case (b, os) =>
      b -> (os.count(_._2).toLong * scale / os.size - prior) }
    corpus.foreach { case (id, fs, _) =>
      val score = fs.map(f => w(bk(f))).sum
      val (gid, gscore, gn, gkeep) = got(id)
      assert(gid == id && gscore == score && gn == fs.size &&
        gkeep == (score >= 0), s"doc $id: got $gscore/$gn/$gkeep want $score")
    }
    // separation: pure-positive docs keep, the alien doc drops.
    assert(got(1L)._4 && got(2L)._4 && !got(3L)._4)
    // novel vocabulary scores 0 but still counts toward n_feats (left
    // join + coalesce) — the streamed-batch ≡ batch equivalence hinge.
    val weights = graft.operators.Ranking.classifierWeights(
      graft.operators.Ranking.classifierRelation(
        cdocs, "doc_id", "text", col("pos")))
    val novel = graft.operators.Ranking.classifyAgainstWeights(
      graft.operators.Ranking.classifierRelation(
        Seq((9L, "utterly unseen tokens")).toDF("doc_id", "text"),
        "doc_id", "text", lit(false)),
      weights)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(novel.toSeq == Seq((9L, 0L, 5L, true)), novel.toSeq)
  }

  test("tfidf/bm25 plans broadcast the df side; banned lines broadcast anti") {
    val sfDocs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val tfidfPlan = Ranking.tfidfTopK(sfDocs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(tfidfPlan.contains("BroadcastHashJoin"), tfidfPlan.take(2000))
    val linePlan = TextDedup.stripCommonLines(sfDocs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(linePlan.contains("BroadcastHashJoin") &&
      linePlan.contains("LeftAnti"), linePlan.take(3000))
  }

  test("LM quality scores: hand-computed bits, OOV floor, gibberish separation") {
    import spark.implicits._
    // reference LM: bigram counts "the cat"=2, "the dog"=1, "cat sat"=1,
    // "cat ran"=1, "dog sat"=1; contexts the=3, cat=2, dog=1; total=6.
    // bits(n) = length(bin(n)): bits(1)=1, bits(2)=2, bits(3)=2, bits(6)=3.
    val ref = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"))
      .toDF("doc_id", "text")
    val tf = Ranking.bigramFrequencies(ref, "doc_id", "text")
    val (lm, cx, tot) = Ranking.ngramLm(tf)

    // self-scored: each ref doc costs exactly 1 bit over 2 bigrams.
    //  r1: "the cat" → bits(3)−bits(2)=0; "cat sat" → bits(2)−bits(1)=1
    //  r2: "the cat" → 0;                "cat ran" → 1
    //  r3: "the dog" → bits(3)−bits(1)=1; "dog sat" → bits(1)−bits(1)=0
    val self = Ranking.lmQualityScores(ref, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(self(id) == ((id, 1L, 2L, 0.5)), s"doc $id: ${self(id)}")
    }

    // frozen-LM candidates: fluent text scores seen-bigram bits, unseen
    // bigrams pay the OOV floor bits(total)+1 = 4 — gibberish separates.
    //  c10 "the cat sat": 0 + 1 = 1 over 2
    //  c20 "zq qz zq":    4 + 4 = 8 over 2 (both unseen)
    //  c30 "the dog ran": bits(3)−bits(1)=1 + OOV 4 = 5 over 2
    val cand = Seq(
      (10L, "the cat sat"), (20L, "zq qz zq"), (30L, "the dog ran"))
      .toDF("doc_id", "text")
    val got = Ranking.scoreAgainstLm(
      Ranking.bigramFrequencies(cand, "doc_id", "text"), lm, cx, tot)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 1L, 2L, 0.5)), got(10L))
    assert(got(20L) == ((20L, 8L, 2L, 4.0)), got(20L))
    assert(got(30L) == ((30L, 5L, 2L, 2.5)), got(30L))
    assert(got(20L)._4 > got(30L)._4 && got(30L)._4 > got(10L)._4,
      "gibberish must score strictly above partially-novel above fluent")

    // contract edges: <2-token and null-text docs emit nothing.
    val edge = Ranking.lmQualityScores(
      Seq((7L, "solo"), (8L, null.asInstanceOf[String]), (9L, "a b"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(edge == Set(9L), edge)
  }

  test("MinKTagged keeps the k smallest packed keys with payloads, any merge order") {
    val agg = new Ranking.MinKTagged(3)
    def t(pk: Long) = Ranking.Tagged(pk, s"s$pk")
    val left = List(t(7), t(9), t(12)).foldLeft(agg.zero)(agg.reduce)
    val right = List(t(1), t(8), t(30)).foldLeft(agg.zero)(agg.reduce)
    val exp = List(t(1), t(7), t(8))
    assert(agg.merge(left, right).items == exp)
    assert(agg.merge(right, left).items == exp)
  }

  test("rrfFuse: exact integer contributions, cross-list boost, disjoint universes") {
    import spark.implicits._
    // list A ranks docs (10, 11, 12); list B ranks (11, 13). With
    // kRrf = 60 and scale = 1048576: contribution(rank) = 1048576 div
    // (60 + rank) → r1 = 17189, r2 = 16912, r3 = 16644.
    val a = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
      .toDF("q_id", "rank", "neighbor_id")
    val b = Seq((0L, 1, 11L), (0L, 2, 13L))
      .toDF("q_id", "rank", "neighbor_id")
    val got = Ranking.rrfFuse(Seq(a, b))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got == Map(
      10L -> (1L, 17189L),         // rank 1 in A only
      11L -> (2L, 16912L + 17189L), // rank 2 in A + rank 1 in B — top fused
      12L -> (1L, 16644L),
      13L -> (1L, 16912L)), got)
    // the cross-list doc outranks every single-list doc, including A's #1.
    val best = got.maxBy(_._2._2)._1
    assert(best == 11L, s"fused winner $best")
  }
}
