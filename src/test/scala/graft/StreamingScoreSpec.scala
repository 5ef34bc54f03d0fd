package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ranking
import graft.sources.Tables
import graft.streaming.{ScoreIngest, Stream}

/** Streaming importance-scoring ingest end-to-end
  * (graft.streaming.ScoreIngest). Asserts the load-bearing claims:
  *  1. per-batch scores ≡ the batch operator's scoring of the same rows
  *     against the same frozen weights — exact integers;
  *  2. the corpus weights are staged EXACTLY once; micro-batches create
  *     no staging dirs;
  *  3. novel vocabulary scores 0 weight but still length-normalizes;
  *  4. version rotation swaps the weights atomically between batches. */
class StreamingScoreSpec extends SparkSpec {

  test("ScoreIngest: per-batch ≡ batch scoring; staged once; rotation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)

      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildWeights(corpus, "doc_id", "text",
          isTarget = col("lang") === "en"))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"weights = one staged relation, got $stageDirs")

      // batch-mode truth: the same fresh rows scored against the same
      // frozen weights.
      val expected = Ranking.scoreAgainstWeights(
        Ranking.importanceRelation(fresh, "doc_id", "text", lit(false)),
        state.get().weights)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no scores — vacuous")

      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = ScoreIngest.start(s, state, "value.doc_id", "value.text") {
        (scores, version, _) =>
          versions += version
          got ++= scores.as[(Long, Long, Long, Long)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(fresh.filter(col("doc_id") % 20 === 0))
      send(fresh.filter(col("doc_id") % 20 =!= 0))
      assert(got.toSet == expected,
        s"streamed scores diverge from batch operator:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 1, "micro-batches must create no staging dirs")

      // novel vocabulary: every token unseen → raw = 0, n_tokens still
      // counted, avg_w = 0 (left join + coalesce, not dropped rows).
      got.clear()
      Seq((777L, "qqqxyzzy wwwplugh qqqxyzzy")).toDF("doc_id", "text")
        .createOrReplaceTempView("novel_rows")
      send(spark.table("novel_rows"))
      val novel = got.toSeq.filter(_._1 == 777L)
      assert(novel == Seq((777L, 0L, 3L, 0L)),
        s"novel-vocab doc must score (0, 3, 0): $novel")

      // ROTATE: retrain with the TARGET INVERTED — scores must flip to
      // the new weights at the next batch, not mid-stream.
      state.set(ScoreIngest.buildWeights(corpus, "doc_id", "text",
        isTarget = col("lang") =!= "en", version = 1L))
      assert(stageDirs == 2, "rotation rebuilds exactly one staged relation")
      val expected1 = Ranking.scoreAgainstWeights(
        Ranking.importanceRelation(fresh, "doc_id", "text", lit(false)),
        state.get().weights)
        .as[(Long, Long, Long, Long)].collect().toSet
      got.clear()
      send(fresh)
      assert(got.toSet == expected1,
        "post-rotation scores must match the v1 weights")
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 2, "post-rotation micro-batches staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("classifier gate: per-batch ≡ batch verdicts; staged once; rotation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)
      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildClassifier(corpus, "doc_id", "text",
          isPositive = col("source").isin("src0", "src1", "src2")))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      // two PER-VERSION staged relations since r17: the (bk, pos) counts
      // pre-aggregate (one corpus-feature pass feeds the two-pass weight
      // builder) + the weights themselves. The discipline under test is
      // unchanged: staging happens at corpus-version build time ONLY —
      // the per-batch assertions below still pin zero new dirs per batch.
      assert(stageDirs == 2, s"classifier = counts + weights staged, got $stageDirs")

      val expected = Ranking.classifyAgainstWeights(
        Ranking.classifierRelation(fresh, "doc_id", "text", lit(false)),
        state.get().weights)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(expected.nonEmpty && expected.exists(_._4) && expected.exists(!_._4),
        "fixture must produce both keeps and drops — vacuous otherwise")

      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Boolean)]
      val q = ScoreIngest.startClassifierGate(s, state, "value.doc_id", "value.text") {
        (verdicts, _, _) =>
          got ++= verdicts.as[(Long, Long, Long, Boolean)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(fresh.filter(col("doc_id") % 20 === 0))
      send(fresh.filter(col("doc_id") % 20 =!= 0))
      assert(got.toSet == expected,
        s"streamed verdicts diverge:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 2, "micro-batches must create no staging dirs")

      // ROTATE with the label inverted: verdicts must flip to the new
      // weights at the next batch.
      state.set(ScoreIngest.buildClassifier(corpus, "doc_id", "text",
        isPositive = !col("source").isin("src0", "src1", "src2"), version = 1L))
      assert(stageDirs == 4, "rotation rebuilds exactly one counts+weights pair")
      val expected1 = Ranking.classifyAgainstWeights(
        Ranking.classifierRelation(fresh, "doc_id", "text", lit(false)),
        state.get().weights)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      got.clear()
      send(fresh)
      assert(got.toSet == expected1, "post-rotation verdicts must match v1")
      assert(stageDirs == 4, "post-rotation micro-batches staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("LM gate: per-batch ≡ batch scoring; OOV floor; staged once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)

      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLm(corpus, "doc_id", "text"))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      // build stages tf + lm + cx + tot — exactly four, once.
      assert(stageDirs == 4, s"LM build = four staged relations, got $stageDirs")

      // batch-mode truth against the same frozen model.
      val st = state.get()
      val expected = Ranking.scoreAgainstLm(
        Ranking.bigramFrequencies(fresh, "doc_id", "text"),
        st.lm, st.cx, st.tot)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no scores — vacuous")

      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
      val q = ScoreIngest.startLmGate(s, state, "value.doc_id", "value.text") {
        (scores, _, _) =>
          got ++= scores.as[(Long, Long, Long, Double)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(fresh)
      assert(got.toSet == expected,
        s"streamed LM scores diverge from batch operator:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 4, "micro-batches must create no staging dirs")

      // OOV floor: an all-gibberish doc pays bits(total) + 1 per bigram —
      // deterministic, never NULL, strictly above any seen-bigram cost.
      got.clear()
      send(Seq((888L, "qqqxyzzy wwwplugh vvvfrotz")).toDF("doc_id", "text"))
      val total = st.tot.as[Long].head()
      val floor = java.lang.Long.toBinaryString(total).length + 1L
      val oov = got.toSeq.filter(_._1 == 888L)
      assert(oov == Seq((888L, 2 * floor, 2L, floor.toDouble)),
        s"gibberish doc must pay the OOV floor $floor per bigram: $oov")
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("folding LM gate: score-then-fold; fold ≡ fresh build; OOV stops at batch N+1; fenced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = Seq((1L, "the cat sat"), (2L, "the cat ran"),
        (3L, "the dog sat")).toDF("doc_id", "text")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildFoldingLm(corpus, "doc_id", "text"))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long, Double)]]
      val q = ScoreIngest.startLmFolding(s, state, "value.doc_id", "value.text") {
        (scores, _, _) =>
          got += scores.as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // batch 1: 'zq qz' is NOVEL — pays the OOV floor against the
      // pre-batch model (total = 6 → floor = bits(6)+1 = 4).
      val b1 = Seq((10L, "zq qz zq")).toDF("doc_id", "text")
      send(b1)
      assert(got(0) == Seq((10L, 8L, 2L, 4.0)), s"b1 scores: ${got(0)}")

      // the grown model ≡ a fresh build over corpus ∪ b1, bitwise.
      val grown = state.get()
      val fresh = ScoreIngest.buildFoldingLm(corpus.unionByName(b1),
        "doc_id", "text")
      def lmSet(st: ScoreIngest.FoldingLmState) =
        st.lm.df.as[(String, Long)].collect().toSet
      assert(lmSet(grown) == lmSet(fresh),
        "fold must equal a fresh LM build over everything seen")

      // batch 2: the SAME bigrams no longer pay the OOV floor — both are
      // now singleton-context model bigrams (ctx = cnt = 1 ⇒ 0 bits;
      // the trailing 'zq' has no successor, so ctx(zq) = 1, not 2).
      got.clear()
      send(Seq((20L, "zq qz zq")).toDF("doc_id", "text"))
      assert(got(0) == Seq((20L, 0L, 2L, 0.0)),
        s"post-fold scores must use the grown model: ${got(0)}")

      // replay fence: a re-delivered batch neither scores nor re-folds
      // (double-folding would double counts — NOT idempotent).
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      got.clear()
      send(b1)
      assert(got.isEmpty && (state.get() eq fenced),
        "fenced batch must neither fold nor emit")
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("folding LM gate generalizes to order n: trigram fold ≡ fresh, OOV at the prefix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // trigram model: lm = {abc:2, bcd:1, bce:1}, ctx prefixes are
      // 2-GRAMS ({'a b':2, 'b c':2}), total = 4.
      val corpus = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildFoldingLm(corpus, "doc_id", "text", n = 3))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long, Double)]]
      val q = ScoreIngest.startLmFolding(s, state, "value.doc_id", "value.text") {
        (scores, _, _) =>
          got += scores.as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // novel trigrams pay the OOV floor bits(4) + 1 = 4 against the
      // pre-batch model; a doc of < 3 tokens emits nothing.
      send(Seq((10L, "x y z w"), (11L, "p q")).toDF("doc_id", "text"))
      assert(got(0) == Seq((10L, 8L, 2L, 4.0)), s"b1 scores: ${got(0)}")

      // the fold is the SAME multiset merge at any order: grown ≡ fresh.
      val fresh = ScoreIngest.buildFoldingLm(
        corpus.unionByName(Seq((10L, "x y z w"), (11L, "p q"))
          .toDF("doc_id", "text")), "doc_id", "text", n = 3)
      assert(state.get().n == 3 &&
        state.get().lm.df.as[(String, Long)].collect().toSet ==
          fresh.lm.df.as[(String, Long)].collect().toSet,
        "order-n fold must equal a fresh order-n build")

      // post-fold, the same trigrams are singleton-PREFIX predictions
      // (ctx('x y') = cnt('x y z') = 1 ⇒ 0 bits).
      got.clear()
      send(Seq((20L, "x y z w")).toDF("doc_id", "text"))
      assert(got(0) == Seq((20L, 0L, 2L, 0.0)), s"b2 scores: ${got(0)}")
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("lang gate: per-batch ≡ batch classification against the frozen weights") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = Seq(
        (1L, "aaa aab aba baa", "aa"),
        (2L, "xxx xxy xyx yxx", "xx")).toDF("doc_id", "text", "lbl")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLangWeights(corpus, "doc_id", "text", col("lbl")))

      val batch = Seq((10L, "aab aba aab"), (11L, "xxy xyx"))
        .toDF("doc_id", "text")
      // the batch operator's verdicts against the SAME frozen weights.
      val exp = Ranking.classifyLangs(
        Ranking.langFeatureRelation(batch, "doc_id", "text",
          lit(null).cast("string"))
          .select(col("doc_id"), col("bk"), col("tf")),
        state.get().weights)
        .as[(Long, String, Long)].collect().toSet
      assert(exp.map(r => r._1 -> r._2) == Set(10L -> "aa", 11L -> "xx"))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String, Long)]]
      val q = ScoreIngest.startLangGate(s, state, "value.doc_id", "value.text") {
        (preds, _, _) => got += preds.as[(Long, String, Long)].collect().toSet
      }
      val payloads = batch
        .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
        .as[String].collect()
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()
      assert(got.toSeq == Seq(exp), s"streamed: $got vs batch: $exp")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("folding lang gate: classify-then-fold; fold ≡ fresh; novel lang learns at batch N+1; fenced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = Seq(
        (1L, "aaa aab aba baa", "aa"),
        (2L, "xxx xxy xyx yxx", "xx")).toDF("doc_id", "text", "lbl")
      val state = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildFoldingLang(corpus, "doc_id", "text", col("lbl")))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lbl", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Map[Long, String]]
      val q = ScoreIngest.startLangFolding(s, state,
        "value.doc_id", "value.text", "value.lbl") { (preds, _, _) =>
        got += preds.select(col("doc_id"), col("lang_pred"))
          .as[(Long, String)].collect().toMap
      }
      def send(rows: Seq[(Long, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "text", "lbl")
          .select(to_json(struct(col("doc_id"), col("text"), col("lbl"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // batch 1 introduces NOVEL language 'zz' (labeled) plus an
      // unlabeled doc in the same style: the gate classifies against
      // the PRE-batch weights, which know only aa/xx — the zz-style
      // docs share NO trained bucket, so they emit NOTHING (the
      // no-evidence contract; gate-then-fold means the batch's own
      // labels cannot influence its verdicts).
      val b1 = Seq(
        (10L, "zzz zzy zyz yzz", "zz"),
        (11L, "zzy zyz", null.asInstanceOf[String]))
      send(b1)
      assert(got(0).isEmpty,
        s"pre-fold weights must hold no zz evidence: ${got(0)}")

      // the folded counts ≡ a fresh build over corpus ∪ b1's LABELED
      // rows, bitwise (the unlabeled doc contributes nothing).
      val fresh = ScoreIngest.buildFoldingLang(
        corpus.unionByName(Seq((10L, "zzz zzy zyz yzz", "zz"))
          .toDF("doc_id", "text", "lbl")),
        "doc_id", "text", col("lbl"))
      def cSet(st: ScoreIngest.FoldingLangState) =
        st.counts.df.as[(String, String, Long)].collect().toSet
      def wSet(st: ScoreIngest.FoldingLangState) =
        st.weights.df.as[(String, String, Long)].collect().toSet
      assert(cSet(state.get()) == cSet(fresh), "folded counts diverged")
      assert(wSet(state.get()) == wSet(fresh), "rebuilt weights diverged")

      // batch 2: the same zz-style unlabeled doc now classifies 'zz'.
      got.clear()
      send(Seq((20L, "zzy zyz", null.asInstanceOf[String])))
      assert(got(0) == Map(20L -> "zz"), s"post-fold: ${got(0)}")

      // replay fence: a re-delivered batch neither emits nor re-folds.
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      got.clear()
      send(b1)
      assert(got.isEmpty && (state.get() eq fenced))
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }
}
