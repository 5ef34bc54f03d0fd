package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Semantics of the reusable dedup operators, especially the
  * document-frequency cap (the quadratic-hot-key guard). */
class TextDedupSpec extends SparkSpec {

  import spark.implicits._

  // doc 1/2: genuine near-dups (share almost all shingles).
  // docs 10..15: unrelated, but all contain one ubiquitous boilerplate
  // phrase ("terms of service apply here") → one hot shingle set.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (10L, "alpha beta gamma terms of service apply here one"),
    (11L, "delta epsilon zeta terms of service apply here two"),
    (12L, "eta theta iota terms of service apply here three"),
    (13L, "kappa lambda mu terms of service apply here four"),
    (14L, "nu xi omicron terms of service apply here five"),
    (15L, "pi rho sigma terms of service apply here six")
  ).toDF("doc_id", "text")

  test("jaccardPairs finds true near-dups and reports exact Jaccard") {
    val sh = TextDedup.shingleRelation(docs, "doc_id", "text")
    val pairs = TextDedup.jaccardPairs(sh, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    val j = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    // 10 tokens → 8 shingles each, 7 shared → 7 / (8 + 8 - 7)
    assert(math.abs(j - 7.0 / 9.0) < 1e-15)
  }

  test("dfCap prunes hot-shingle candidates but never distorts survivors") {
    val sh = TextDedup.shingleRelation(docs, "doc_id", "text")
    // Boilerplate shingles ("terms of service" etc.) have df = 6: without a
    // cap they generate all 15 cross pairs of docs 10..15 as candidates.
    val uncapped = TextDedup.jaccardPairs(sh, threshold = 0.0)
    assert(uncapped.count() >= 16) // 15 boilerplate pairs + the near-dup pair

    val capped = TextDedup.jaccardPairs(sh, threshold = 0.0, dfCap = Some(5))
    val rows = capped.collect()
    // hot-shingle-only pairs are gone...
    assert(rows.forall(r => !(r.getLong(0) >= 10L && r.getLong(1) >= 10L)))
    // ...and the genuine near-dup survives with its EXACT Jaccard (the cap
    // only gates candidate generation; verification uses full sets).
    val j = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    assert(math.abs(j - 7.0 / 9.0) < 1e-15)
  }

  test("the df-cap window adds no exchange beyond the candidate join's") {
    // Compare under the at-scale plan (shuffle join): with broadcast
    // allowed, the tiny uncapped side broadcasts and the counts aren't
    // comparable. At scale both sides shuffle on the shingle key, and the
    // df-cap window's hashpartitioning(s) IS that partitioning — the
    // candidate join reuses it, so capped and uncapped plans shuffle the
    // same number of times.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sh = TextDedup.shingleRelation(docs, "doc_id", "text")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
      val base = exchanges(TextDedup.jaccardPairs(sh, 0.5))
      val withCap = exchanges(TextDedup.jaccardPairs(sh, 0.5, Some(5)))
      assert(withCap <= base,
        s"df-cap should reuse the join's shingle partitioning: $base -> $withCap")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhashLshPairs agrees with exact Jaccard on the near-dup pair") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sh = TextDedup.shingleRelation(docs, "doc_id", "text")
    val pairs = TextDedup.minhashLshPairs(sh, k = 12, bands = 4, threshold = 0.5)
      .collect()
    val hit = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(hit.isDefined, "LSH missed a 0.78-Jaccard pair (12 hashes / 4 bands)")
    assert(math.abs(hit.get.getDouble(2) - 7.0 / 9.0) < 1e-15)
  }

  test("bandCap prunes hot-band candidates but never distorts survivors") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // 6 byte-identical docs share EVERY band -> 15 pairs from one hot
    // band cluster; the near-dup pair 1/2 shares at least one band of its
    // own. bandCap=5 kills the identical cluster's bands, keeps 1/2.
    val withDups = docs.union(
      (100L to 104L).map(i => (i, "zeta eta theta same same same same body"))
        .toDF("doc_id", "text"))
      .union(Seq((105L, "zeta eta theta same same same same body")).toDF("doc_id", "text"))
    val sh = TextDedup.shingleRelation(withDups, "doc_id", "text")
    val uncapped = TextDedup.minhashLshPairs(sh, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = TextDedup.minhashLshPairs(sh, threshold = 0.5, bandCap = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.contains((1L, 2L)))
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      s"capped should drop the 6-dup cluster's pairs: $capped")
    assert(capped.contains((1L, 2L)), s"survivor pair lost: $capped")
  }

  test("simhashPairs: banding never misses within maxHamming; verify is exact") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val withExact = docs.union(Seq(
      (99L, "the quick brown fox jumps over the lazy dog tonight") // = doc 1
    ).toDF("doc_id", "text"))
    val pairs = TextDedup.simhashPairs(withExact, "doc_id", "text", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // byte-identical docs → hamming 0, always found (every band equal).
    assert(pairs.contains((1L, 99L, 0L)))
    // exhaustive cross-check on this corpus: banding + verify ≡ brute force
    // for every pair within the threshold (pigeonhole guarantee).
    val fps = withExact
      .withColumn("hs", expr("transform(array_distinct(split(lower(text), ' ')), t -> md5(t))"))
      .select(col("doc_id"), expr("simhash128(hs)").as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def ham(a: String, b: String): Int = a.zip(b).map { case (x, y) =>
      java.lang.Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
    }.sum
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = ham(fa, fb) if h <= 7
    } yield (ia, ib, h.toLong)).sorted.toSeq
    assert(pairs.sorted.toSeq == brute)
  }

  test("stage() parquet-staging mode yields identical results to localCheckpoint") {
    // graft.stage.dir switches Tables.stage from localCheckpoint (fast,
    // lineage-truncated, dies with an executor) to a parquet staging table
    // (the cluster-safe 100 TB mode) — same API, same results.
    def run(): Seq[(Long, Long, Double)] =
      TextDedup.minhashLshPairs(
        TextDedup.shingleRelation(docs, "doc_id", "text"),
        k = 12, bands = 4, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val viaCheckpoint = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    val viaParquet =
      try run()
      finally spark.conf.unset("graft.stage.dir")
    assert(viaParquet == viaCheckpoint)
    // and the staging tables actually landed as parquet.
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("stage_")))
  }

  test("minhashLshPairsAgainst finds new-vs-corpus pairs, broadcasts the batch") {
    // "new batch" = doc 2 (near-dup of corpus doc 1) + doc 20 (unrelated).
    val batch = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (20L, "completely unrelated fresh content about nothing at all"))
      .toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") =!= 2L)
    val newSh = TextDedup.shingleRelation(batch, "doc_id", "text", n = 3)
    val refSh = TextDedup.shingleRelation(corpus, "doc_id", "text", n = 3)
    val pairs = TextDedup.minhashLshPairsAgainst(newSh, refSh, threshold = 0.5)
    val got = pairs.select(col("da"), col("db")).as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 1L)))
    // the batch side (band keys AND shingle verify) joins as broadcast —
    // the corpus relation never shuffles for any join: every join must be
    // broadcast (a SortMergeJoin would mean a corpus-side Exchange).
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("containmentPairs catches subset duplication that Jaccard misses") {
    // doc 30 is fully contained in the much larger doc 31: containment
    // c(30→31) = 1.0 but Jaccard ≈ |30|/|31| ≪ threshold.
    val d = Seq(
      (30L, "one two three four five six"),
      (31L, "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sh = TextDedup.shingleRelation(d, "doc_id", "text", n = 3)
    val cont = TextDedup.containmentPairs(sh, threshold = 0.9)
      .select(col("da"), col("db"), col("c_ab")).as[(Long, Long, Double)].collect()
    assert(cont.toSeq == Seq((30L, 31L, 1.0)))
    val jac = TextDedup.jaccardPairs(sh, threshold = 0.9)
    assert(jac.count() == 0)
  }

  // repeatedSpans fixture: disjoint vocab families per document except the
  // deliberately shared material, so no accidental duplicated windows.
  private lazy val spanCorpus = Seq(
    // docs 1/2 share a 10-token passage (sh1..sh10) at different offsets.
    (1L, "p1 p2 p3 sh1 sh2 sh3 sh4 sh5 sh6 sh7 sh8 sh9 sh10 s1 s2"),
    (2L, "q1 q2 sh1 sh2 sh3 sh4 sh5 sh6 sh7 sh8 sh9 sh10 r1 r2 r3"),
    // shorter than k=4 → zero windows, zero rows.
    (3L, "one two three"),
    // within-document repetition: "z1 z2 z3 z4" occurs twice in doc 4
    // (minCount counts total occurrences, not distinct documents).
    (4L, "a b c d e f z1 z2 z3 z4 g h i j z1 z2 z3 z4 k l"),
    // adjacency merge: doc 5's duplicated windows sit at pos 0 and pos 4
    // (coverage exactly adjacent) → one merged span; in doc 6 the same two
    // phrases are separated by 5 unique tokens → two spans.
    (5L, "m1 m2 m3 m4 u1 u2 u3 u4"),
    (6L, "m1 m2 m3 m4 v1 v2 v3 v4 w1 u1 u2 u3 u4"),
    // byte-identical documents → one span covering every token.
    (7L, "c1 c2 c3 c4 c5 c6"),
    (8L, "c1 c2 c3 c4 c5 c6")
  ).toDF("doc_id", "text")

  test("repeatedSpans merges duplicated windows into maximal spans") {
    val spans = TextDedup.repeatedSpans(spanCorpus, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set(
      (1L, 3L, 12L, 7L),   // shared passage at offset 3: window starts 3..9
      (2L, 2L, 11L, 7L),   // same passage at offset 2
      (4L, 6L, 9L, 1L),    // within-doc repeat, first occurrence
      (4L, 14L, 17L, 1L),  // within-doc repeat, second occurrence
      (5L, 0L, 7L, 2L),    // adjacent coverage (pos 0 + pos 4) merged
      (6L, 0L, 3L, 1L),    // separated phrases stay separate spans
      (6L, 9L, 12L, 1L),
      (7L, 0L, 5L, 3L),    // whole-document duplicate
      (8L, 0L, 5L, 3L)))
  }

  test("repeatedSpans shuffle-join probe path matches the broadcast path") {
    val b = TextDedup.repeatedSpans(spanCorpus, "doc_id", "text", k = 4)
      .collect().toSet
    val s = TextDedup.repeatedSpans(spanCorpus, "doc_id", "text", k = 4,
      broadcastDup = false).collect().toSet
    assert(b == s)
  }

  test("spansAgainstIndex finds exactly the spans copied from the reference") {
    val ref = spanCorpus.filter(col("doc_id") === 2)
    val batch = spanCorpus.filter(col("doc_id") === 1 || col("doc_id") === 3)
    val idx = TextDedup.spanIndex(ref, "doc_id", "text", k = 4)
    val got = TextDedup.spansAgainstIndex(batch, idx, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1's shared passage against ref doc 2; doc 3 is shorter than k.
    assert(got == Set((1L, 3L, 12L, 7L)))
    val shuffled = TextDedup.spansAgainstIndex(batch, idx, "doc_id", "text",
      k = 4, broadcastIndex = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(shuffled == got)
  }

  test("exactGroups collapses byte-identical docs to the smallest id") {
    val dups = docs.union(Seq((99L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text"))
    val groups = TextDedup.exactGroups(dups, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getLong(0) == 1L && groups.head.getLong(1) == 2L)
  }

  test("editDistancePairs: lossless length blocking ≡ brute force; block attrs respected") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    // random corpus with lengths clustered at the W = 16 bucket seams,
    // plus PLANTED pairs that straddle a boundary (len 15 vs len 17 —
    // different buckets, must still be found) and one identical-text
    // cross-lang pair (must be excluded by the block attribute).
    val planted = (0 until 5).flatMap { k =>
      val s = randStr(15)
      Seq((200L + 2 * k, s, "en"), (201L + 2 * k, s + "xy", "en"))
    }
    val crossLang = Seq((300L, "identical text here", "en"),
      (301L, "identical text here", "de"))
    val noise = (0 until 60).map { i =>
      (i.toLong, randStr(12 + rnd.nextInt(12)), if (i % 2 == 0) "en" else "de")
    }
    val all = noise ++ planted ++ crossLang
    val got = TextDedup.editDistancePairs(all.toDF("doc_id", "text", "lang"),
        "doc_id", "text", maxDist = 10, blockCols = Seq("lang"),
        bucketWidth = 16)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      a <- all; b <- all
      if a._1 < b._1 && a._3 == b._3
      d = lev(a._2, b._2) if d <= 10
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the planted straddling pairs are all found at distance 2...
    (0 until 5).foreach(k => assert(got.contains((200L + 2 * k, 201L + 2 * k, 2L))))
    // ...and the identical cross-lang pair is excluded by the block attr.
    assert(!got.exists(p => p._1 == 300L && p._2 == 301L))
    intercept[IllegalArgumentException] {
      TextDedup.editDistancePairs(all.toDF("doc_id", "text", "lang"),
        "doc_id", "text", maxDist = 20, bucketWidth = 16)
    }
  }

  test("softDedup: cluster sizes exact, keep rule = salted threshold, singletons always kept") {
    // clusters: 'aa' ×3, 'bb' ×2, and 5 singletons.
    val rows = Seq((1L, "aa"), (2L, "aa"), (3L, "aa"), (10L, "bb"), (11L, "bb")) ++
      (20L to 24L).map(i => (i, s"uniq$i"))
    val got = TextDedup.softDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().map { case (id, n, k) => id -> (n, k) }.toMap
    val sizes = rows.groupBy(_._2).map { case (_, g) => g.map(_._1) -> g.size.toLong }
    sizes.foreach { case (ids, n) => ids.foreach(id => assert(got(id)._1 == n)) }
    // independent statement of the keep rule.
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.foreach { case (id, (n, kept)) =>
      val th = if (n == 1L) "g"
        else f"${4294967296L / n}%08x" // lower-hex, lpad 8
      assert(kept == (if (md5hex(s"soft:$id").take(8) < th) 1L else 0L), s"id=$id")
    }
    (20L to 24L).foreach(id => assert(got(id)._2 == 1L, "singletons always keep"))
  }

  test("editDistancePairs/editIndex cellCap: hot cells dropped whole, cold pairs untouched") {
    // One deliberately HOT (lang, bucket) cell — ten 'en' titles of
    // length 16-18 (bucket 1 at W = 16), pairwise within maxDist — plus
    // cold cells: an 'en' bucket-0 pair, a 'de' pair in the SAME bucket
    // as the hot cell (different block attr → different cell), and a
    // bucket-0 'en' probe at distance 2 from a hot-cell member (the
    // adjacent-bucket endpoint case).
    val hot = (0 until 10).map(i => (100L + i, s"boilerplate title${('a' + i).toChar}", "en"))
    val coldEn = Seq((200L, "short name a", "en"), (201L, "short name b", "en"))
    val coldDe = Seq((300L, "der gleiche titel x", "de"), (301L, "der gleiche titel y", "de"))
    // len 15 → bucket 0, dist 3 (drop "lea") to hot member 100 in bucket 1
    val probe = Seq((400L, "boilerplate tit", "en"))
    val all = hot ++ coldEn ++ coldDe ++ probe
    val df = all.toDF("doc_id", "text", "lang")

    val un = TextDedup.editDistancePairs(df, "doc_id", "text",
      maxDist = 4, blockCols = Seq("lang"), bucketWidth = 16)
      .as[(Long, Long, Long)].collect().toSet
    val capped = TextDedup.editDistancePairs(df, "doc_id", "text",
      maxDist = 4, blockCols = Seq("lang"), bucketWidth = 16,
      cellCap = Some(8)).as[(Long, Long, Long)].collect().toSet

    val hotIds = hot.map(_._1).toSet
    // every uncapped pair with BOTH endpoints outside the hot cell survives…
    assert(capped == un.filter(p => !hotIds(p._1) && !hotIds(p._2)))
    // …the hot cell's own pairs and the adjacent-bucket probe's pair are
    // dropped (endpoint-in-capped-cell contract), and the cold cells —
    // including the same-bucket 'de' cell, which the block attr keeps a
    // SEPARATE cell — are intact.
    assert(un.exists(p => hotIds(p._1) && hotIds(p._2)))
    assert(un.contains((100L, 400L, 3L)) && !capped.exists(p => p._2 == 400L))
    assert(capped.contains((200L, 201L, 1L)))
    assert(capped.exists(p => p._1 == 300L && p._2 == 301L))

    // index-build form: probes into the capped cell find nothing; probes
    // into cold cells are bitwise what the uncapped index yields.
    val idxCap = TextDedup.editIndex(df, "doc_id", "text",
      blockCols = Seq("lang"), bucketWidth = 16, cellCap = Some(8))
    val idxUn = TextDedup.editIndex(df, "doc_id", "text",
      blockCols = Seq("lang"), bucketWidth = 16)
    val batch = Seq((500L, "boilerplate titlez", "en"),
      (501L, "der gleiche titel z", "de")).toDF("doc_id", "text", "lang")
    def pairsOf(idx: org.apache.spark.sql.DataFrame) =
      TextDedup.editPairsAgainstIndex(batch, "doc_id", "text", idx,
        maxDist = 4, blockCols = Seq("lang"), bucketWidth = 16)
        .as[(Long, Long, Long)].collect().toSet
    val pCap = pairsOf(idxCap)
    val pUn = pairsOf(idxUn)
    assert(!pCap.exists(p => hotIds(p._2)) && pUn.exists(p => hotIds(p._2)))
    assert(pCap == pUn.filter(p => !hotIds(p._2)) && pCap.exists(_._1 == 501L))
  }

  test("lshPlan: S-curve math, below-target bias, registry-geometry anchor") {
    // the candidate probability is the textbook 1 − (1 − s^r)^b and
    // MONOTONE in s (more similar → more likely candidated).
    val probs = (0 to 10).map(i => TextDedup.lshCandidateProb(i / 10.0, 4, 3))
    assert(probs.head == 0.0 && probs.last == 1.0)
    assert(probs.zip(probs.tail).forall { case (a, b) => a <= b }, probs)

    // the registry geometry (k=12, bands=4 ⇒ r=3): threshold
    // (1/4)^(1/3) ≈ 0.63 — pairs at the shipped 0.5 verify threshold
    // are proposed with prob ≈ 0.41, at 0.8 with 1 − 0.488⁴ ≈ 0.9433.
    val (_, all12) = TextDedup.lshPlan(12, 0.63)
    val g = all12.find(p => p.bands == 4).get
    assert(math.abs(g.threshold - math.pow(0.25, 1.0 / 3)) < 1e-12)
    assert(math.abs(TextDedup.lshCandidateProb(0.8, 4, 3) - 0.943287) < 1e-3)

    // planner bias: the picked plan's threshold sits at-or-below target
    // (recall errs HIGH; exact verification owns precision) and is the
    // largest such divisor geometry.
    for (t <- Seq(0.5, 0.7, 0.9); n <- Seq(12, 64, 128)) {
      val (pick, all) = TextDedup.lshPlan(n, t)
      assert(pick.bands * pick.rowsPerBand == n)
      val below = all.filter(_.threshold <= t)
      if (below.nonEmpty)
        assert(pick.threshold == below.map(_.threshold).max,
          s"n=$n t=$t pick=$pick")
      // recall at target always ≥ the candidate prob at target − 0.2.
      assert(pick.recallAtTarget >= pick.fpAtDistant)
    }
  }

  test("lshPlan curve vs MEASURED banding recall on a controlled-Jaccard corpus") {
    // The planner's operating curve is driver-side math — this pins it
    // against OBSERVATION: pairs constructed at EXACT Jaccard (shared
    // token windows — A = s0..s34, B = s5..s39 ⇒ 30/40 = 0.75; distant
    // pairs s0..s34 vs s21..s55 ⇒ 14/56 = 0.25), disjoint token
    // namespaces so no cross-pair candidates exist, threshold 0 so the
    // verify stage passes every candidate — the output IS the candidate
    // set and measured recall IS the banding's. 500 pairs per level;
    // md5 minhashing is deterministic, so the measured rates are fixed
    // numbers and the brackets are stable, not flaky. Scratch runs the
    // same harness at 20k pairs for the README table.
    val n = 500
    def half(ns: String, off: Long, idOff: Int, from: Int, to: Int) =
      spark.range(n).selectExpr(
        s"$off + id * 2 + $idOff AS id",
        s"""transform(sequence($from, $to),
           |  j -> concat('$ns', CAST(id AS STRING), ':', CAST(j AS STRING)))
           |  AS sh""".stripMargin)
    val sh = graft.sources.Tables.stage(
      half("p", 0L, 0, 0, 34).union(half("p", 0L, 1, 5, 39))
        .union(half("q", 1000000L, 0, 0, 34))
        .union(half("q", 1000000L, 1, 21, 55)))
    for ((b, r) <- Seq((4, 6), (6, 4), (8, 3))) {
      val out = TextDedup.minhashLshPairs(sh, k = 24, bands = b,
        threshold = 0.0)
        .select(col("da")).as[Long].collect()
      val recall = out.count(_ < 1000000L).toDouble / n
      val distant = out.count(_ >= 1000000L).toDouble / n
      val pRecall = TextDedup.lshCandidateProb(0.75, b, r)
      val pDistant = TextDedup.lshCandidateProb(0.25, b, r)
      assert(math.abs(recall - pRecall) <= 0.06,
        f"($b×$r) measured recall $recall%.3f vs predicted $pRecall%.3f")
      assert(math.abs(distant - pDistant) <= 0.04,
        f"($b×$r) measured distant rate $distant%.3f vs predicted $pDistant%.3f")
    }
  }
}
