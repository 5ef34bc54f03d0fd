package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ann
import graft.sources.Tables
import graft.streaming.{AnnIngest, Stream}

/** Streaming ANN ingest end-to-end (graft.streaming.AnnIngest): an
  * embedding stream retrieves per-batch top-k neighbors against ONE
  * persisted corpus LSH signature index. Asserts the load-bearing claims:
  *  1. per-batch results ≡ the batch operator (Ann.lshTopK) on the same
  *     query vectors — bitwise, cosines included;
  *  2. the corpus banding is staged EXACTLY once; micro-batches create no
  *     staging dirs;
  *  3. version rotation swaps the index atomically between batches. */
class StreamingAnnSpec extends SparkSpec {

  test("AnnIngest: per-batch top-k ≡ batch lshTopK; staged once; rotation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") >= 10)
      val queries = e.filter(col("id") < 10)

      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildIndex(corpus))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"index = one staged banded relation, got $stageDirs")

      // batch-mode truth, same params, same corpus.
      val expected = Ann.lshTopK(queries, corpus, k = 5)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no neighbors — vacuous")

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = AnnIngest.start(s, state, "value.vec_id", "value.embedding", k = 5) {
        (topk, version, _) =>
          versions += version
          got ++= topk.as[(Long, Int, Long, Double)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // two micro-batches; union must equal the batch operator bitwise
      // (JSON float round-trip is exact: Float.toString round-trips).
      send(queries.filter(col("id") < 5))
      send(queries.filter(col("id") >= 5))
      assert(got.toSet == expected,
        s"streamed top-k diverges from batch operator:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 1, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus additionally holds an exact copy of query 0's
      // vector under a new id — identical signature lands in every band,
      // so after the swap it MUST surface as a cos=1 rank-1 neighbor.
      val clone = queries.filter(col("id") === 0)
        .select(lit(99999L).as("id"), col("embedding"))
      state.set(AnnIngest.buildIndex(corpus.unionByName(clone), version = 1L))
      assert(stageDirs == 2, "rotation rebuilds exactly one staged relation")
      got.clear()
      send(queries.filter(col("id") === 0))
      val top1 = got.toSeq.filter(r => r._1 == 0L && r._2 == 1)
      assert(top1.map(_._3) == Seq(99999L),
        s"post-rotation rank-1 must be the planted clone: $got")
      assert(top1.head._4 > 0.999999) // self-cosine up to sqrt rounding
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 2, "post-rotation micro-batch staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("startSemanticGate: per-batch flags ≡ batch operator; staged once; rotation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") % 10 =!= 0)
      val fresh = e.filter(col("id") % 10 === 0)
      val cents = e.filter(col("id") < 8)

      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildSemanticIndex(corpus, cents, threshold = 0.45))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"semantic index = one staged assignment, got $stageDirs")

      val expected = Ann
        .semanticFlagAgainst(fresh, state.get().assigned, cents, threshold = 0.45)
        .as[(Long, Long, Long, Option[Long])].collect().toSet
      assert(expected.nonEmpty, "fixture produced no batch rows — vacuous")

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Option[Long])]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = AnnIngest.startSemanticGate(s, state, "value.vec_id", "value.embedding") {
        (flags, version, _) =>
          versions += version
          got ++= flags.as[(Long, Long, Long, Option[Long])].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(fresh.filter(col("id") < 25))
      send(fresh.filter(col("id") >= 25))
      assert(got.toSet == expected,
        s"streamed flags diverge from batch operator:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 1, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus gains an exact copy of batch vector 0 — after
      // the swap, vector 0's similar count must rise by exactly one.
      val preN = expected.find(_._1 == 0L).get._3
      val clone = fresh.filter(col("id") === 0)
        .select(lit(99999L).as("id"), col("embedding"))
      state.set(AnnIngest.buildSemanticIndex(corpus.unionByName(clone), cents,
        threshold = 0.45, version = 1L))
      assert(stageDirs == 2, "rotation rebuilds exactly one staged relation")
      got.clear()
      send(fresh.filter(col("id") === 0))
      val post = got.toSeq.filter(_._1 == 0L)
      assert(post.map(_._3) == Seq(preN + 1),
        s"post-rotation similar count for vec 0: ${post.map(_._3)} vs pre $preN")
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 2, "post-rotation micro-batch staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("lshTopKAgainstIndex: corpus never shuffles; batch side broadcasts") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id").as("id"), col("embedding"))
    val idx = Ann.bandedRelation(e.filter(col("id") >= 10), "c_id", "ce")
    val plan = Ann.lshTopKAgainstIndex(e.filter(col("id") < 10), idx, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe must broadcast the batch side:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must not shuffle for the join:\n${plan.take(2000)}")
  }

  test("startPqGate: per-batch ADC top-k ≡ batch pqTopK; staged once; rotation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") >= 10)
      val queries = e.filter(col("id") < 10)
      val cb = e.filter(col("id") >= 10 && col("id") < 26)

      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildPqIndex(corpus, cb, m = 8))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"PQ index = one staged code relation, got $stageDirs")

      // batch-mode truth: the all-in-one operator on the same inputs.
      val expected = Ann.pqTopK(queries, corpus, cb, k = 5, m = 8)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no neighbors — vacuous")

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = AnnIngest.startPqGate(s, state, "value.vec_id", "value.embedding", k = 5) {
        (topk, version, _) =>
          versions += version
          got ++= topk.as[(Long, Int, Long, Double)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(queries.filter(col("id") < 5))
      send(queries.filter(col("id") >= 5))
      assert(got.toSet == expected,
        s"streamed PQ top-k diverges from batch operator:\n extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(stageDirs == 1, "micro-batches must create no staging dirs")

      // ROTATE: v1 corpus gains a CLONE of query 0 under a new id. The
      // clone's codes are query 0's own quantization, so its ADC against
      // query 0 is the MINIMUM possible (every subspace term is the
      // codebook minimum) — it must surface in query 0's top-k.
      val planted = queries.filter(col("id") === 0)
        .select(lit(99999L).as("id"), col("embedding"))
      state.set(AnnIngest.buildPqIndex(corpus.unionByName(planted), cb,
        m = 8, version = 1L))
      assert(stageDirs == 2, "rotation rebuilds exactly one staged relation")
      got.clear()
      send(queries)
      assert(got.exists(r => r._1 == 0L && r._3 == 99999L),
        s"post-rotation top-k of query 0 must surface its planted clone: " +
          got.filter(_._1 == 0L).toString)
      assert(versions.distinct == Seq(0L, 1L), s"versions seen: $versions")
      assert(stageDirs == 2, "post-rotation micro-batches staged new dirs")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("multiProbe gate: streamed ≡ batch lshTopKMultiProbe; flag flips without restaging") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") >= 10)
      val queries = e.filter(col("id") < 10)

      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildIndex(corpus, multiProbe = true))
      def stageDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stageDirs == 1, s"index = one staged banded relation, got $stageDirs")

      // batch-mode truths, same params, same corpus: the multi-probe gate
      // must replay lshTopKMultiProbe bitwise, and after the flag flip the
      // SAME staged index must replay single-probe lshTopK bitwise.
      val expectedMp = Ann.lshTopKMultiProbe(queries, corpus, k = 5)
        .as[(Long, Int, Long, Double)].collect().toSet
      val expectedSp = Ann.lshTopK(queries, corpus, k = 5)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(expectedMp.nonEmpty, "fixture produced no neighbors — vacuous")

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
      val q = AnnIngest.start(s, state, "value.vec_id", "value.embedding", k = 5) {
        (topk, _, _) => got ++= topk.as[(Long, Int, Long, Double)].collect()
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(queries)
      assert(got.toSet == expectedMp,
        s"multi-probe streamed top-k diverges from batch lshTopKMultiProbe:\n" +
          s" extra=${got.toSet -- expectedMp}\n missing=${expectedMp -- got.toSet}")

      // probe-mode rotation: flip the flag WITHOUT rebuilding — the index
      // is byte-identical across modes, so no new staging dir may appear.
      state.set(state.get().copy(multiProbe = false, version = 1L))
      got.clear()
      send(queries)
      assert(got.toSet == expectedSp,
        s"single-probe streamed top-k diverges from batch lshTopK:\n" +
          s" extra=${got.toSet -- expectedSp}\n missing=${expectedSp -- got.toSet}")
      assert(stageDirs == 1, "flag flip must not restage the index")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("startGrowing multiProbe: first-batch probe ≡ batch lshTopKMultiProbe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") >= 10)
      val queries = e.filter(col("id") < 10)
      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildGrowingIndex(corpus, multiProbe = true))

      val expected = Ann.lshTopKMultiProbe(queries, corpus, k = 3)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(expected.nonEmpty, "fixture produced no neighbors — vacuous")

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
      val q = AnnIngest.startGrowing(s, state, "value.vec_id", "value.embedding",
        k = 3) { (topk, _, _) =>
          got ++= topk.as[(Long, Int, Long, Double)].collect()
      }
      val payloads = queries
        .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
        .as[String].collect()
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
      // the probe runs BEFORE the fold, so batch 1's top-k is against the
      // seed corpus exactly — the growing gate's multi-probe path must
      // replay the batch operator bitwise. The flag survives the fold.
      assert(got.toSet == expected,
        s"growing-gate multi-probe diverges from batch lshTopKMultiProbe:\n" +
          s" extra=${got.toSet -- expected}\n missing=${expected -- got.toSet}")
      assert(state.get().multiProbe, "fold must preserve the probe-mode flag")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("startGrowing: probe-then-grow; cross-batch retrieval; grown ≡ fresh; fenced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val e = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = e.filter(col("id") >= 20)
      val state = new java.util.concurrent.atomic.AtomicReference(
        AnnIngest.buildGrowingIndex(corpus))

      // b1 plants a DISTINCTIVE vector (id 9001): a clone of vector 0,
      // which is NOT in the corpus — only the fold makes it findable.
      val v0 = e.filter(col("id") === 0).select(col("embedding"))
        .as[Seq[Float]].head()
      val b1 = e.filter(col("id") >= 10 && col("id") < 20)
        .union(Seq((9001L, v0)).toDF("id", "embedding"))
      // b2 queries with vector 0 itself — its clone from b1 must be the
      // cos = 1.0 top neighbor.
      val b2 = e.filter(col("id") === 0)

      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Int, Long, Double)]]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = AnnIngest.startGrowing(s, state, "value.vec_id", "value.embedding",
        k = 3) { (topk, version, _) =>
          versions += version
          got += topk.as[(Long, Int, Long, Double)].collect().toSet
      }
      def send(df: org.apache.spark.sql.DataFrame): Unit = {
        val payloads = df
          .select(to_json(struct(col("id").as("vec_id"), col("embedding"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(b1)
      send(b2)
      assert(versions.toSeq == Seq(1L, 2L), s"fold versions: $versions")
      // cross-batch: the b1 clone is vector 0's rank-1, cos 1.0 neighbor.
      assert(got.last.exists(r => r._1 == 0L && r._2 == 1 && r._3 == 9001L),
        s"b1 clone not retrievable by b2: ${got.last}")
      // grown index content ≡ a fresh build over corpus + b1 + b2 vectors.
      val union = corpus.union(b1).union(b2)
      val freshIdx = AnnIngest.buildGrowingIndex(union)
      def bandSet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("c_id"), col("band")).as[(Long, String)].collect().toSet
      assert(bandSet(state.get().banded) == bandSet(freshIdx.banded),
        "grown banded relation must equal the fresh union build's")
      // RETIRE the clone: it must stop being retrievable immediately.
      val retired = AnnIngest.retire(state.get(), Seq(9001L).toDF("c_id"), tag = 500L)
      val after = Ann.lshTopKAgainstIndex(b2, retired.banded, 3)
        .select(col("neighbor_id")).as[Long].collect()
      assert(!after.contains(9001L), s"retired vector still retrieved: ${after.toSeq}")
      state.set(retired)

      // RESTART: rebuilt-from-dirs index answers identically.
      val restoredIdx = AnnIngest.restoreGrowingIndex(spark,
        state.get().path, state.get().tombstonesPath,
        foldedBatch = state.get().foldedBatch)
      assert(bandSet(restoredIdx.banded) == bandSet(state.get().banded),
        "restored index must equal the live index")

      // replay fence: a batch at/below foldedBatch is skipped entirely.
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      val before = versions.size
      send(b2)
      assert(versions.size == before && (state.get() eq fenced),
        "fenced batch must neither fold nor emit")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
