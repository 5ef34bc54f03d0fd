package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Property-style invariants (seeded randomized inputs, 25 cases each) —
  * the ScalaCheck-shaped layer from SURVEY.md §5(c). */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  test("explode conserves elements: |explode(arrays)| == Σ sizes") {
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val arrays = Seq.fill(rnd.nextInt(20) + 1)(
        Seq.fill(rnd.nextInt(5))(rnd.nextInt(100)))
      val df = arrays.toDF("arr")
      val exploded = df.select(explode(col("arr"))).count()
      assert(exploded == arrays.map(_.size).sum)
    }
  }

  test("union all preserves counts: |a ∪ b| == |a| + |b|") {
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(10)).toDF("v")
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(10)).toDF("v")
      assert(a.unionByName(b).count() == a.count() + b.count())
    }
  }

  test("minhash_sig is invariant under shingle permutation (min is order-free)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val sh = Seq.fill(rnd.nextInt(30) + 1)(rnd.alphanumeric.take(8).mkString)
      val perm = rnd.shuffle(sh)
      val df = Seq((sh, perm)).toDF("a", "b")
        .select(expr("minhash_sig(a, 12)").as("sa"),
          expr("minhash_sig(b, 12)").as("sb"))
      val r = df.collect()(0)
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("simhash128 is invariant under token-hash permutation (sum is order-free)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val hs = Seq.fill(rnd.nextInt(30) + 1)(
        (1 to 32).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString)
      val perm = rnd.shuffle(hs)
      val df = Seq((hs, perm)).toDF("a", "b")
        .select(expr("simhash128(a)").as("sa"), expr("simhash128(b)").as("sb"))
      val r = df.collect()(0)
      assert(r.getString(0) == r.getString(1))
    }
  }

  test("cosine_sim is bitwise symmetric and self-similarity ≈ 1") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val v = Seq.fill(16)(rnd.nextFloat() - 0.5f)
      val w = Seq.fill(16)(rnd.nextFloat() - 0.5f)
      val r = Seq((v, w)).toDF("a", "b")
        .select(expr("cosine_sim(a, b)"), expr("cosine_sim(b, a)"),
          expr("cosine_sim(a, a)"))
        .collect()(0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
  }

  test("TopKNeighbors equals sort-based top-k under any partitioning/merge order") {
    import graft.operators.Ann.{NeighborList, ScoredNeighbor, TopKNeighbors}
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(60) + 1
      val k = rnd.nextInt(10) + 1
      // duplicate cos values on purpose: ties must break by c_id.
      val rows = (0 until n).map(i =>
        ScoredNeighbor(i.toLong, (rnd.nextInt(8) - 4) / 4.0))
      val agg = new TopKNeighbors(k)
      // random partitioning into 1..5 buffers, random merge order.
      val parts = rnd.shuffle(rows).grouped(rnd.nextInt(12) + 12).toSeq
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      val expected = rows.sortBy(r => (-r.cos, r.c_id)).take(k).toList
      assert(agg.finish(merged) == NeighborList(expected))
    }
  }

  test("MinKByHash equals sort-based min-k under any partitioning/merge order") {
    import graft.operators.Sampling.{HashedId, HashedIdList, MinKByHash}
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(60) + 1
      val k = rnd.nextInt(10) + 1
      val rows = (0 until n).map(i =>
        HashedId(rnd.alphanumeric.take(3).mkString.toLowerCase, i.toLong))
      val agg = new MinKByHash(k)
      val parts = rnd.shuffle(rows).grouped(rnd.nextInt(12) + 12).toSeq
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      val expected = rows.sortBy(r => (r.h, r.id)).take(k).toList
      assert(agg.finish(merged) == HashedIdList(expected))
    }
  }

  test("KmvValues: k-set algebra — commutative, associative, idempotent, duplicate-blind") {
    import graft.operators.TypedAggregators
    (1 to 25).foreach { _ =>
      val k = rnd.nextInt(12) + 1
      def randSet() = (0 until rnd.nextInt(80) + 1)
        .map(_ => s"t${rnd.nextInt(50)}").distinct
      def kset(tokens: Seq[String]) =
        tokens.map(TypedAggregators.hash60).distinct.sorted.take(k)
      val (xa, xb, xc) = (randSet(), randSet(), randSet())
      val (a, b, c) = (kset(xa), kset(xb), kset(xc))
      import TypedAggregators.kmvMerge
      // the algebra every fold/overlap path leans on:
      assert(kmvMerge(a, b, k) == kmvMerge(b, a, k))
      assert(kmvMerge(kmvMerge(a, b, k), c, k) == kmvMerge(a, kmvMerge(b, c, k), k))
      assert(kmvMerge(a, a, k) == a)
      // merge of per-side k-sets ≡ the k-set of the true union.
      assert(kmvMerge(a, b, k) == kset(xa ++ xb))
      // duplicates occupy no slots (set semantics through the aggregator).
      val agg = new TypedAggregators.KmvValues(k)
      val withDups = rnd.shuffle(xa ++ xa ++ xa)
      val parts = withDups.grouped(rnd.nextInt(8) + 4).toSeq
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == a)
    }
  }

  test("MinKLongs equals sort-based min-k under any partitioning/merge order") {
    import graft.operators.Ranking.{MinKLongs, Postings}
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(60) + 1
      val k = rnd.nextInt(10) + 1
      // distinct ids (the operator's contract: one row per doc×token).
      val rows = rnd.shuffle((0 until n).map(_.toLong * 3))
      val agg = new MinKLongs(k)
      val parts = rows.grouped(rnd.nextInt(12) + 12).toSeq
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == Postings(rows.sorted.take(k).toList))
    }
  }

  test("groupPercentilesDisc equals the sorted ceil(p*n)-th element") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      val vals = Seq.fill(rnd.nextInt(80) + 1)(rnd.nextInt(20))
      val p = (rnd.nextInt(9) + 1) / 10.0
      val got = graft.operators.Quantiles.groupPercentilesDisc(
        vals.map(("g", _)).toDF("g", "v"), "g", "v", Seq("th" -> p))
        .as[(String, Int)].collect().head._2
      val expected = vals.sorted.apply(math.ceil(p * vals.size).toInt - 1)
      assert(got == expected, s"p=$p vals=${vals.sorted}")
    }
  }

  test("hashSample keeps a stable subset: sample(r1) ⊆ sample(r2) for r1 ≤ r2") {
    import spark.implicits._
    val df = (0 until 500).map(_.toLong).toDF("id")
    def ids(rate: Double): Set[Long] =
      graft.operators.Sampling.hashSample(df, "id", rate)
        .collect().map(_.getLong(0)).toSet
    val s5 = ids(0.05); val s20 = ids(0.20); val s100 = ids(1.0)
    assert(s5.subsetOf(s20) && s20.subsetOf(s100) && s100.size == 500)
    // rate is honored within a loose binomial bound.
    assert(s20.size > 500 * 0.1 && s20.size < 500 * 0.35, s20.size)
  }

  test("cdcChunks: prefix edits leave downstream chunks byte-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val toks = Seq.fill(300)(s"t${rnd.nextInt(50)}")
    val edited = Seq("ins1", "ins2", "ins3") ++ toks
    def chunks(text: String): Seq[String] =
      graft.queries.Curation
        .cdcChunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          w = 4, thresholdHex = "20")
        .orderBy(col("chunk")).select("chunk_text")
        .collect().map(_.getString(0)).toSeq
    val a = chunks(toks.mkString(" "))
    val b = chunks(edited.mkString(" "))
    // every token lands in exactly one chunk, in order.
    assert(a.mkString(" ") == toks.mkString(" "))
    assert(b.mkString(" ") == edited.mkString(" "))
    // content-defined: once past the first boundary after the edit, chunk
    // boundaries re-align — the shared suffix is identical chunk-for-chunk.
    val m = math.min(a.size, b.size) - 2
    assert(m > 5, s"degenerate fixture: ${a.size}/${b.size} chunks")
    assert(a.takeRight(m) == b.takeRight(m),
      s"downstream chunks diverged (a=${a.size}, b=${b.size})")
    // the contrast: fixed-stride chunking shares almost NO chunk after a
    // 3-token prefix insert (every window shifts).
    def strided(ts: Seq[String]): Seq[String] =
      ts.grouped(32).map(_.mkString(" ")).toSeq
    val shared = strided(toks).toSet.intersect(strided(edited).toSet)
    assert(shared.size <= 1, s"stride unexpectedly stable: $shared")
  }

  test("weightedSample: ≡ hashSample at constant rate, monotone, exact edges") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i % 30).toLong)).toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) = d.select("id").collect().map(_.getLong(0)).toSet
    // constant rate 1/10 coincides with the unweighted gate (coordinated
    // ladders: floor(2^32/10) = floor(0.1 * 2^32)).
    assert(ids(graft.operators.Sampling.weightedSample(df, "id", "1", "10")) ==
      ids(graft.operators.Sampling.hashSample(df, "id", 0.1)))
    // raising a weight only ever ADDS rows.
    val lo = ids(graft.operators.Sampling.weightedSample(df, "id", "w", "30"))
    val hi = ids(graft.operators.Sampling.weightedSample(
      df.withColumn("w5", col("w") + 5), "id", "w5", "30"))
    assert(lo.subsetOf(hi), s"${(lo -- hi).take(5)} dropped by a weight raise")
    // num >= den keeps everything; num = 0 keeps nothing.
    assert(ids(graft.operators.Sampling.weightedSample(df, "id", "99", "30")).size == 500)
    assert(ids(graft.operators.Sampling.weightedSample(df, "id", "0", "30")).isEmpty)
  }

  test("assignSplits: full coverage, append-stable, fractions honored, salted") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = (0 until 1000).map(_.toLong).toDF("id")
    val got = graft.operators.Sampling.assignSplits(df, "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 1000)
    assert(got.values.forall(Set("train", "val", "test")))
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 700 && n("train") < 900, n)
    assert(n("val") > 40 && n("val") < 170, n)
    // appending data never moves an existing row's split.
    val small = graft.operators.Sampling
      .assignSplits((0 until 300).map(_.toLong).toDF("id"), "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    small.foreach { case (k, v) => assert(got(k) == v, s"id=$k moved") }
    // the "split:" salt decorrelates from hashSample's bare-id ladder: a
    // 10 % hash sample must NOT land entirely in one split.
    val sampledSplits = graft.operators.Sampling.hashSample(df, "id", 0.10)
      .collect().map(r => got(r.getLong(0))).toSet
    assert(sampledSplits.size >= 2, s"sample correlated with splits: $sampledSplits")
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.assignSplits(df, "id", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.assignSplits(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("deterministicShuffle is a permutation: bijective, stable, shard-consistent") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val ids = Seq.fill(rnd.nextInt(200) + 50)(rnd.nextLong()).distinct
      val df = ids.toDF("id")
      val once = graft.operators.Sampling.deterministicShuffle(df, "id", shards = 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      // bijection over the input ids; re-run identical (no rand anywhere).
      assert(once.map(_._1).toSet == ids.toSet && once.length == ids.size)
      val again = graft.operators.Sampling.deterministicShuffle(df, "id", shards = 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      assert(once.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
      // shard is a pure function of the sort key's first byte.
      once.foreach { case (_, k, s) =>
        assert(s == Integer.parseInt(k.substring(0, 2), 16) % 4, s"$k -> $s") }
    }
  }

  test("repetition counters: nonnegative, bounded by overlap, zero for distinct docs") {
    // overlapping grams cover each char ≤ n times, so cnt·len sums are
    // bounded by ~n× total_chars (fractions CAN exceed 1 by design —
    // Gopher thresholds sit well below that); all-distinct docs must
    // report zero duplicated-3-gram chars.
    val q = SparkEntry.registry.find(_.name == "x_repetition").get
    val rows = q.fn(spark, sf("sf0.001"))
      .select(col("total_chars"), col("top2_chars"), col("dup3_chars"),
        col("frac_top2"), col("frac_dup3")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 3 * r.getLong(0), r.toString)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 4 * r.getLong(0), r.toString)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(4) >= 0.0, r.toString)
    }
    import spark.implicits._
    val distinctDoc = Seq((1L, (1 to 50).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    // run the same expressions over a doc with zero repeated n-grams by
    // reusing the registry fn on a temp parquet dir shaped like testdata.
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    distinctDoc.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val z = q.fn(spark, dir).select("top2_chars", "dup3_chars").head()
    assert(z.getLong(0) > 0)  // the max 2-gram occurs once: chars = its length
    assert(z.getLong(1) == 0L, s"all-distinct doc reported dup3=${z.getLong(1)}")
  }

  test("bucketed percentiles ≡ one-level histogram percentiles on random data") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(400) + 100)(
        ("g" + rnd.nextInt(3), rnd.nextInt(50) + rnd.nextDouble()))
      val df = rows.toDF("g", "v")
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
      val a = graft.operators.Quantiles.groupPercentilesDisc(df, "g", "v", ps)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val b = graft.operators.Quantiles
        .groupPercentilesDiscBucketed(df, "g", "v", ps, buckets = 7)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(a == b)
    }
  }

  test("repeatedSpans ≡ a driver-side reference on random small-vocab corpora") {
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val k = rnd.nextInt(3) + 2 // 2..4
      val vocab = Vector("a", "b", "c", "d") // tiny vocab forces collisions
      val docs = (0 until rnd.nextInt(6) + 2).map { id =>
        (id.toLong,
          Seq.fill(rnd.nextInt(25) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: duplicated k-windows (total count ≥ 2), intervals merged
      // when the next start ≤ prev + k.
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val wins = toks.flatMap { case (id, ts) =>
        if (ts.size < k) Nil
        else (0 to ts.size - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (w, occ) => w -> occ.size }
      val expected = wins.filter(w => counts(w._3) >= 2).map(w => (w._1, w._2))
        .groupBy(_._1).flatMap { case (id, ps0) =>
          val ps = ps0.map(_._2).sorted
          val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var start = ps.head; var prev = ps.head; var n = 1L
          for (p <- ps.tail) {
            if (p <= prev + k) { prev = p; n += 1 }
            else {
              spans += ((id, start.toLong, (prev + k - 1).toLong, n))
              start = p; prev = p; n = 1
            }
          }
          spans += ((id, start.toLong, (prev + k - 1).toLong, n))
          spans
        }.toSet
      val got = graft.operators.TextDedup
        .repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"k=$k docs=$docs")
    }
  }

  test("spansAgainstIndex ≡ a driver-side reference on random split corpora") {
    import spark.implicits._
    (1 to 6).foreach { _ =>
      val k = rnd.nextInt(3) + 2
      val vocab = Vector("a", "b", "c", "d")
      def mkDocs(n: Int, idBase: Long) = (0 until n).map { i =>
        (idBase + i,
          Seq.fill(rnd.nextInt(25) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val refDocs = mkDocs(rnd.nextInt(4) + 1, 100L)
      val batchDocs = mkDocs(rnd.nextInt(5) + 2, 0L)
      def windows(t: String): Seq[(Int, String)] = {
        val ts = t.split(" ").toSeq
        if (ts.size < k) Nil
        else (0 to ts.size - k).map(i => i -> ts.slice(i, i + k).mkString(" "))
      }
      val refSet = refDocs.flatMap(d => windows(d._2).map(_._2)).toSet
      val expected = batchDocs.flatMap { case (id, t) =>
        val ps = windows(t).filter(w => refSet(w._2)).map(_._1)
        if (ps.isEmpty) Nil
        else {
          val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var start = ps.head; var prev = ps.head; var n = 1L
          for (p <- ps.tail) {
            if (p <= prev + k) { prev = p; n += 1 }
            else {
              spans += ((id, start.toLong, (prev + k - 1).toLong, n))
              start = p; prev = p; n = 1
            }
          }
          spans += ((id, start.toLong, (prev + k - 1).toLong, n))
          spans
        }
      }.toSet
      val idx = graft.operators.TextDedup
        .spanIndex(refDocs.toDF("doc_id", "text"), "doc_id", "text", k)
      val got = graft.operators.TextDedup
        .spansAgainstIndex(batchDocs.toDF("doc_id", "text"), idx, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"k=$k ref=$refDocs batch=$batchDocs")
    }
  }

  test("audioShingles64: hop-aligned trims are always contained (randomized)") {
    (1 to 25).foreach { _ =>
      // random even amplitudes (exact under halving), constant per
      // 4-sample window, 70-130 windows; random hop-aligned trims.
      val m = rnd.nextInt(60) + 70
      val amps = Array.fill(m)((rnd.nextInt(8192) - 4096) * 2)
      def wav(off: Int, take: Int, f: Int => Int = identity): Array[Byte] =
        graft.operators.Media.wavBytes(8000,
          Array.tabulate(take * 4)(i => f(amps(off + i / 4)).toShort))
      val full = graft.operators.Media.audioShingles64(wav(0, m), 4, 4).get.toSet
      val front = rnd.nextInt((m - 66) / 2)
      val back = rnd.nextInt((m - 66) / 2)
      val trimmed = graft.operators.Media
        .audioShingles64(wav(front, m - front - back), 4, 4).get.toSet
      assert(trimmed.subsetOf(full),
        s"m=$m front=$front back=$back: trimmed shingles must be contained")
      // half volume on top of the trim: still contained (even amps).
      val halved = graft.operators.Media
        .audioShingles64(wav(front, m - front - back, _ / 2), 4, 4).get.toSet
      assert(halved == trimmed, "exact half volume must not move a single bit")
    }
  }

  test("classifierWeights: bounded by the prior; score ≡ brute reference") {
    import spark.implicits._
    val scale = 1000000L
    (1 to 10).foreach { _ =>
      val nDocs = rnd.nextInt(12) + 6
      val vocab = Vector.fill(10)(rnd.alphanumeric.take(5).mkString.toLowerCase)
      val docs = (1 to nDocs).map { i =>
        (i.toLong,
          Seq.fill(rnd.nextInt(8) + 2)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          rnd.nextBoolean())
      }
      val df = docs.toDF("doc_id", "text", "pos")
      val rel = graft.operators.Ranking
        .classifierRelation(df, "doc_id", "text", col("pos"))
      val w = graft.operators.Ranking.classifierWeights(rel)
        .as[(String, Long)].collect().toMap
      // driver-side brute reference over the SAME feature stream.
      def feats(t: String) = {
        val ts = t.split(" ", -1).toSeq
        ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      }
      def bk(f: String) = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(f.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString.take(3)
      }
      val all = docs.flatMap { case (_, t, p) => feats(t).map(f => (bk(f), p)) }
      val prior = all.count(_._2).toLong * scale / all.size
      val expW = all.groupBy(_._1).map { case (b, os) =>
        b -> (os.count(_._2).toLong * scale / os.size - prior) }
      assert(w == expW, "weights must equal the brute reference")
      // bounds: w ∈ [-prior, scale - prior] (ratio ∈ [0, scale]).
      w.values.foreach(v => assert(v >= -prior && v <= scale - prior, s"w=$v"))
      // score identity: per-doc score = Σ tf·w over its features.
      val got = graft.operators.Ranking.classifyAgainstWeights(rel,
        graft.operators.Ranking.classifierWeights(rel))
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      docs.foreach { case (id, t, _) =>
        val fs = feats(t)
        val score = fs.map(f => expW(bk(f))).sum
        assert(got(id) == ((score, fs.size.toLong, score >= 0L)), s"doc $id")
      }
    }
  }
}
