package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{LinkGraphIngest, Stream}

/** Self-maintaining hyperlink graph (graft.streaming.LinkGraphIngest —
  * gate family #32). Asserts the family contract plus the gate's pins:
  *  1. fetch-then-link AND link-then-fetch both produce the edge —
  *     a dangling link waits in pending and resolves RETROACTIVELY
  *     when a later batch fetches its target;
  *  2. exactly-once edge emission (resolved edges never re-emit);
  *  3. a re-fetched URL resolves to the SMALLEST page id;
  *  4. consumed pending rows stop resolving (append-only tombstones);
  *  5. restore from the four roots answers identically. */
class StreamingLinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("link graph: retro-resolution, exactly-once edges, min-id refetch, restore") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val uA = "https://www.site1.com/d/1"
      val uB = "https://www.site2.com/d/2"
      val uC = "https://www.site3.com/d/3"
      // seed corpus: page A links the not-yet-fetched B — a dangling
      // link into the initial pending set.
      val corpus = Seq(
        (1L, uA, s"""<p><a href="$uB">to b</a></p>"""))
        .toDF("doc_id", "url", "html")
      val state = new java.util.concurrent.atomic.AtomicReference(
        LinkGraphIngest.buildLinkGraph(corpus, "doc_id", "url", "html"))
      assert(state.get().edges.count() == 0)
      assert(state.get().pending.as[(String, Long)].collect().toSeq ==
        Seq((uB, 1L)))

      // b1 fetches B: its messy link to A resolves at once (2→1), its
      // link to C goes pending, and the SEED's dangling A→B link
      // retro-resolves (1→2).
      val b1 = Seq((2L, uB,
        "<p><a href=\"https://WWW.Site1.COM:443/d/1?utm_source=z\">a</a> " +
          s"""<a href="$uC">c</a></p>"""))
      // b2 fetches C (no links) — retro edge 2→3 — and RE-fetches A's
      // url under id 9 (no links): the map must keep resolving A as 1.
      val b2 = Seq(
        (3L, uC, "<p>no links at all here</p>"),
        (9L, uA, "<p>refetched, still no links</p>"))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, String)]]
      val q = LinkGraphIngest.startLinkGraph(s, state,
        "value.doc_id", "value.url", "value.html") { (edges, _, _) =>
        got += edges.as[(Long, Long, String)].collect().toSet
      }
      def send(rows: Seq[(Long, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url", "html")
          .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(b1)
      send(b2)
      q.stop()

      assert(got.toSeq == Seq(
        Set((2L, 1L, uA), (1L, 2L, uB)),
        Set((2L, 3L, uC))),
        s"emissions: $got")

      val st = state.get()
      assert(st.edges.as[(Long, Long)].collect().toSet ==
        Set((2L, 1L), (1L, 2L), (2L, 3L)))
      assert(st.pending.count() == 0, "everything resolved")

      val restored = LinkGraphIngest.restoreLinkGraph(spark, st.urlsPath,
        st.edgesPath, st.pendingPath, st.consumedPath, st.aliasesPath,
        st.aliasConsumedPath, st.version, st.foldedBatch)
      assert(restored.edges.as[(Long, Long)].collect().toSet ==
        st.edges.as[(Long, Long)].collect().toSet)
      assert(restored.pending.count() == 0)

      // compaction: live views identical, the url map consolidates to
      // min id per url (the re-fetched A under id 9 purges), tombstone
      // roots reset, and the compacted state keeps folding (a further
      // batch retro-resolves against the compacted map).
      val compacted = LinkGraphIngest.compactState(spark, restored)
      assert(compacted.edges.as[(Long, Long)].collect().toSet ==
        st.edges.as[(Long, Long)].collect().toSet)
      assert(compacted.urls.as[(String, Long)].collect().toSet ==
        Set((uA, 1L), (uB, 2L), (uC, 3L)),
        "min-id consolidation must purge the re-fetch duplicate row")
      assert(graft.streaming.Gate.readGrown(spark, compacted.consumedPath)
        .count() == 0)
      assert(compacted.pending.count() == 0 && compacted.aliases.count() == 0)
      // a NEW stream restarts batch ids at 0 — reset the replay fence
      // for the new id space (a checkpoint-resumed stream would keep
      // its ids and the carried fence; the caller owns that choice).
      val state2 = new java.util.concurrent.atomic.AtomicReference(
        compacted.copy(foldedBatch = -1L))
      val ms2 = MemoryStream[KMsg]
      val q2 = LinkGraphIngest.startLinkGraph(
        Stream.fromKafkaShaped(spark, ms2.toDF(), schema), state2,
        "value.doc_id", "value.url", "value.html") { (_, _, _) => () }
      val p2 = Seq((4L, "https://www.site4.com/d/4",
        s"""<p><a href="$uA">back to a</a></p>"""))
        .toDF("doc_id", "url", "html")
        .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
        .as[String].collect()
      ms2.addData(p2.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(2000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q2.processAllAvailable(); q2.stop()
      assert(state2.get().edges.as[(Long, Long)].collect().toSet ==
        Set((2L, 1L), (1L, 2L), (2L, 3L), (4L, 1L)),
        "post-compaction fold must resolve against the compacted map")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("link graph + directed rank maintenance: per-batch folds ≡ rank over the live edges") {
    import graft.operators.Graph
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val urls = (1 to 6).map(i => i.toLong -> s"https://www.site$i.com/d/$i").toMap
      def page(id: Long, links: Long*): (Long, String, String) =
        (id, urls(id),
          links.map(l => s"""<a href="${urls(l)}">x</a>""").mkString("<p>", " ", "</p>"))
      // seed fetches page 1 (link to 2 waits pending); batches fetch
      // 2..6 with back/forward links — every batch emits edges
      // (including retro-resolutions) that fold into the rank state.
      val corpus = Seq(page(1L, 2L)).toDF("doc_id", "url", "html")
      val state = new java.util.concurrent.atomic.AtomicReference(
        LinkGraphIngest.buildLinkGraph(corpus, "doc_id", "url", "html"))
      var rank = Graph.pageRankDirectedState(
        Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d",
        iterations = 3, scale = 1000000000L)
      val b1 = Seq(page(2L, 1L, 3L), page(3L, 1L))
      val b2 = Seq(page(4L, 2L, 5L), page(5L, 4L), page(6L, 1L, 4L))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val q = LinkGraphIngest.startLinkGraph(s, state,
        "value.doc_id", "value.url", "value.html") { (edges, _, _) =>
        // the composition the operator pair exists for: each batch's
        // newly resolved (incl. retro-resolved) edges fold into the
        // directed rank state.
        rank = Graph.pageRankDirectedRefreshState(rank,
          edges.select(col("s"), col("d")), "s", "d")
      }
      def send(rows: Seq[(Long, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url", "html")
          .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      send(b1)
      send(b2)
      q.stop()

      // the folded rank state ≡ a fresh directed build over the gate's
      // LIVE edge relation, bitwise.
      val fresh = Graph.pageRankDirectedState(state.get().edges, "s", "d",
        iterations = 3, scale = 1000000000L)
      def rows(st: Graph.PageRankDirectedState) =
        st.ranks.select(col("node"), col("degree"),
          expr("array_join(transform(rs, x -> CAST(x AS STRING)), ',')"))
          .as[(Long, Long, String)].collect().toSet
      assert(rows(rank) == rows(fresh), "folded rank diverged from fresh")
      assert(rows(rank).nonEmpty)
    } finally spark.conf.unset("graft.stage.dir")
  }
}
