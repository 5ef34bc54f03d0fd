package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Graph
import graft.streaming.{GraphIngest, Stream}

/** Streaming graph maintenance end-to-end (graft.streaming.GraphIngest —
  * the FOLDING gates): edge batches arrive on a stream and each fold's
  * result must be bit-identical to a full recompute over every edge seen
  * so far; the components gate additionally pins the one-live-state-dir
  * staging contract. */
class StreamingGraphSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  private def randomEdges(n: Int, nodes: Int): Seq[(Long, Long)] =
    Seq.fill(n)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))

  private def mkStream(ms: MemoryStream[KMsg]): Stream = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    Stream.fromKafkaShaped(spark, ms.toDF(), schema)
  }
  private def send(ms: MemoryStream[KMsg],
                   q: org.apache.spark.sql.streaming.StreamingQuery,
                   rows: Seq[(Long, Long)]): Unit = {
    val payloads = rows.toDF("src", "dst")
      .select(to_json(struct(col("src"), col("dst"))).as("j"))
      .as[String].collect()
    ms.addData(payloads.zipWithIndex.map { case (j, i) =>
      KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
    }.toIndexedSeq: _*)
    q.processAllAvailable()
  }

  test("components gate: folds ≡ full recompute; one live state dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val initial = randomEdges(40, 30)
      val batches = Seq(randomEdges(15, 30), randomEdges(15, 35))
      val state = new java.util.concurrent.atomic.AtomicReference(
        GraphIngest.buildComponents(initial.toDF("a", "b"), "a", "b"))
      def stateDirs: Int = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("stage_"))
      assert(stateDirs == 1, s"initial state = one dir, got $stateDirs")

      val ms = MemoryStream[KMsg]
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
      val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = GraphIngest.startComponents(mkStream(ms), state,
        "value.src", "value.dst") { (labels, version, _) =>
          versions += version
          got += labels.as[(Long, Long)].collect().toSet
      }
      var seen = initial
      for (b <- batches) {
        send(ms, q, b)
        seen = seen ++ b
        val full = Graph.connectedComponents(seen.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toSet
        assert(got.last == full, s"fold diverged after ${got.size} batches")
        // Deferred reclaim: the superseded dir stays live until the NEXT
        // fold (the caller's durable-record window) — never more than two.
        assert(stateDirs <= 2,
          s"at most new + superseded state dirs may be live, got $stateDirs")
      }
      assert(versions.toSeq == Seq(1L, 2L), s"fold versions: $versions")
      // Caller reclaims after durably recording the new path → one dir.
      state.get().reclaim()
      assert(stateDirs == 1,
        s"reclaim() must leave exactly the live state dir, got $stateDirs")

      // RESTART: rebuild from the persisted labeling dir alone.
      val live = state.get()
      val restored = GraphIngest.restoreComponents(spark,
        live.components.path.get, live.version, live.foldedBatch)
      assert(restored.components.df.as[(Long, Long)].collect().toSet == got.last,
        "restored labeling must equal the live state")
      assert(restored.foldedBatch == live.foldedBatch)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("triangles gate: folds ≡ full recompute over edges seen so far") {
    val initial = randomEdges(60, 25)
    val batches = Seq(randomEdges(20, 25), randomEdges(20, 28))
    val state = new java.util.concurrent.atomic.AtomicReference(
      GraphIngest.buildTriangles(initial.toDF("a", "b"), "a", "b"))
    val ms = MemoryStream[KMsg]
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
    val q = GraphIngest.startTriangles(mkStream(ms), state,
      "value.src", "value.dst") { (counts, _, _) =>
        got += counts.as[(Long, Long, Long)].collect().toSet
    }
    var seen = initial
    for (b <- batches) {
      send(ms, q, b)
      seen = seen ++ b
      val full = Graph.triangleCounts(seen.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.last == full, s"fold diverged after ${got.size} batches")
    }
  }

  test("pageRank gate: folded history ≡ pageRankState over the union") {
    val initial = randomEdges(50, 20)
    val batches = Seq(randomEdges(15, 20), randomEdges(15, 24))
    val state = new java.util.concurrent.atomic.AtomicReference(
      GraphIngest.buildPageRank(initial.toDF("a", "b"), "a", "b"))
    val ms = MemoryStream[KMsg]
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Seq[Long])]]
    val q = GraphIngest.startPageRank(mkStream(ms), state,
      "value.src", "value.dst") { (ranks, _, _) =>
        got += ranks.as[(Long, Long, Seq[Long])].collect().toSet
    }
    var seen = initial
    for (b <- batches) {
      send(ms, q, b)
      seen = seen ++ b
      val full = Graph.pageRankState(seen.toDF("a", "b"), "a", "b")
        .ranks.as[(Long, Long, Seq[Long])].collect().toSet
      assert(got.last == full, s"fold diverged after ${got.size} batches")
    }
  }

  test("k-core gate: fold ≡ full re-peel; one edge resurrects a peeled chain") {
    // path 1-2-3-4: its 2-core is EMPTY (the endpoints peel and the
    // cascade eats the whole chain).
    val initial = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val state = new java.util.concurrent.atomic.AtomicReference(
      GraphIngest.buildKCore(initial.toDF("a", "b"), "a", "b", k = 2))
    assert(state.get().core.df.isEmpty, "path graph has an empty 2-core")

    val ms = MemoryStream[KMsg]
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val q = GraphIngest.startKCore(mkStream(ms), state,
      "value.src", "value.dst") { (core, _, _) =>
        got += core.as[(Long, Long)].collect().toSet
    }
    // ONE closing edge lifts node 4 AND node 1 over the threshold and
    // resurrects every previously-peeled node — the no-locality cascade
    // the gate's honesty note documents.
    send(ms, q, Seq((4L, 1L)))
    val extra = randomEdges(20, 12)
    send(ms, q, extra)
    q.stop()
    assert(got(0) == Set((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
    val all = initial ++ Seq((4L, 1L)) ++ extra
    val want = Graph.kCore(all.toDF("a", "b"), "a", "b", 2)
      .as[(Long, Long)].collect().toSet
    assert(got(1) == want, "fold must equal a full re-peel over the union")
    assert(state.get().foldedBatch == 1L && state.get().version == 2L)
  }

  test("LPA gate: fold ≡ full re-propagation; a batch bridge re-communities both sides") {
    // two 4-cliques, NO bridge yet: two separate communities labeled by
    // their min ids (0 and 4).
    val cliques = for {
      h <- Seq(0L, 4L); i <- 0 until 3; j <- i + 1 until 4
    } yield (h + i, h + j)
    val state = new java.util.concurrent.atomic.AtomicReference(
      GraphIngest.buildLpa(cliques.toDF("a", "b"), "a", "b", iterations = 4))
    assert(state.get().labels.df.as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
          4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 4L))

    val ms = MemoryStream[KMsg]
    val got = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    val q = GraphIngest.startLpa(mkStream(ms), state,
      "value.src", "value.dst") { (labels, _, _) =>
        got += labels.as[(Long, Long)].collect().toMap
    }
    // batch 0: one bridge — the cliques stay separate communities (one
    // bridge vote never outweighs three intra-clique votes).
    send(ms, q, Seq((3L, 4L)))
    // batch 1: densify the bridge until the right clique flips — every
    // left-clique node now also neighbors the right side.
    val densify = for (l <- 0L to 3L; r <- 4L to 7L) yield (l, r)
    send(ms, q, densify)
    val extra = randomEdges(20, 12)
    send(ms, q, extra)
    q.stop()
    assert(got(0) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 4L),
      s"one bridge must not merge the communities: ${got(0)}")
    // each fold ≡ the batch operator over the union of edges seen so far.
    val afterDensify = cliques ++ Seq((3L, 4L)) ++ densify
    assert(got(1) == Graph.labelPropagation(
      afterDensify.toDF("a", "b"), "a", "b", 4)
      .as[(Long, Long)].collect().toMap,
      "fold must equal full re-propagation over the union")
    val all = afterDensify ++ extra
    assert(got(2) == Graph.labelPropagation(all.toDF("a", "b"), "a", "b", 4)
      .as[(Long, Long)].collect().toMap)
    assert(state.get().foldedBatch == 2L && state.get().version == 3L)
  }

  test("restoreLpa: persisted labels/edges round-trip; pending dirs sweep") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val initial = Seq((1L, 2L), (2L, 3L), (3L, 1L))
      val state = new java.util.concurrent.atomic.AtomicReference(
        GraphIngest.buildLpa(initial.toDF("a", "b"), "a", "b", iterations = 3))
      val ms = MemoryStream[KMsg]
      val q = GraphIngest.startLpa(mkStream(ms), state,
        "value.src", "value.dst") { (_, _, _) => () }
      send(ms, q, Seq((3L, 4L)))
      q.stop()
      val live = state.get()
      val pending = live.superseded.map(_.path.get)
      assert(pending.nonEmpty)
      val restored = GraphIngest.restoreLpa(spark, live.labels.path.get,
        live.edges.path.get, iterations = 3, live.version, live.foldedBatch,
        superseded = pending)
      assert(restored.labels.df.as[(Long, Long)].collect().toSet ==
        live.labels.df.as[(Long, Long)].collect().toSet)
      restored.reclaim()
      pending.foreach(p =>
        assert(!new java.io.File(p).exists, s"pre-crash dir $p leaked"))
      assert(new java.io.File(live.labels.path.get).exists)
      assert(new java.io.File(live.edges.path.get).exists)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("restoreKCore: pre-crash pending-reclaim dirs sweep when their paths are passed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val initial = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      val state = new java.util.concurrent.atomic.AtomicReference(
        GraphIngest.buildKCore(initial.toDF("a", "b"), "a", "b", k = 2))
      val ms = MemoryStream[KMsg]
      val q = GraphIngest.startKCore(mkStream(ms), state,
        "value.src", "value.dst") { (_, _, _) => () }
      send(ms, q, Seq((4L, 1L)))
      q.stop()
      // the fold superseded the initial core+edges dirs; a crash NOW
      // leaves them pending deferred reclaim.
      val live = state.get()
      val pending = live.superseded.map(_.path.get)
      assert(pending.nonEmpty)
      pending.foreach(p => assert(new java.io.File(p).exists))

      val restored = GraphIngest.restoreKCore(spark, live.core.path.get,
        live.edges.path.get, k = 2, live.version, live.foldedBatch,
        superseded = pending)
      assert(restored.core.df.as[(Long, Long)].collect().toSet ==
        live.core.df.as[(Long, Long)].collect().toSet)
      // the first post-restart fold's backstop reclaim() sweeps them…
      restored.reclaim()
      pending.foreach(p =>
        assert(!new java.io.File(p).exists, s"pre-crash dir $p leaked"))
      // …and the live state dirs are untouched.
      assert(new java.io.File(live.core.path.get).exists)
      assert(new java.io.File(live.edges.path.get).exists)
    } finally spark.conf.unset("graft.stage.dir")
  }
}
