package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Graph, Web}
import graft.streaming.{FrontierIngest, LinkGraphIngest, ScoreIngest,
  Stream, WebIngest}

/** The FULL crawl loop, end-to-end: FrontierIngest (RFC robots + the
  * per-domain discovery budget) decides WHAT to fetch next, the fetched
  * batch flows into WebIngest (extract → PII → LM gate → exact dedup)
  * AND LinkGraphIngest (url→id map, retro-resolving edges), and each
  * batch's newly resolved edges fold into the incremental directed
  * rank — the composition all four gates exist for, driven as ONE loop
  * where batch N's novel frontier IS batch N+1's fetch set.
  *
  * The world is a small static web with every gate load-bearing:
  *  - robots blocks c.com/private (linked, never discovered);
  *  - d.com hosts FOUR linked pages but the discovery budget (cap 2)
  *    admits only the two smallest-hash urls — the other two are never
  *    fetched and their inbound links stay pending;
  *  - b.example.org republishes a.com/1's body under different chrome
  *    (dedup collapses it cross-batch, PII redaction included);
  *  - one page plants an email (n_pii observable).
  *
  * End-state pins (the ≡-batch contracts):
  *  1. the fetched closure is exactly the a-priori reachable-allowed
  *     set (budget picks computed from the same salted hash);
  *  2. the link-graph's live edges ≡ a FRESH buildLinkGraph over the
  *     fetched pages, bitwise;
  *  3. the folded directed-rank state ≡ a fresh build over the live
  *     edges, bitwise (the x_linkgraph_rank_incremental contract);
  *  4. WebIngest's grown digest root ≡ md5 of the REDACTED extracted
  *     text of the accepted canonical pages (the x_pipeline_crawl
  *     digest contract). */
class StreamingCrawlLoopSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("frontier → fetch → web-curate + link-graph + rank fold: one driven loop, end state ≡ batch builds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def u(host: String, p: String) = s"https://www.$host/$p"
      val uA1 = u("a.com", "d/1"); val uA2 = u("a.com", "d/2")
      val uB1 = u("b.example.org", "d/1")
      // a1 links b1 ONLY through its OLD spelling — the server answers
      // that url with a 301 to uB1, so the a1 → b1 edge exists only if
      // the redirect alias folds into the url→id map (retroactively:
      // the alias arrives in round 2, b1 itself is fetched in round 3).
      val uB1old = u("b.example.org", "old/1")
      val uPriv = u("c.com", "private/x")
      val uD = (1 to 4).map(i => u("d.com", s"d/$i"))
      val bodyShared = "the quick brown fox jumps over the lazy dog again"
      def page(title: String, links: Seq[String], bodies: String*): String =
        s"<html><head><title>$title</title></head><body>" +
          bodies.map(b => s"<p>$b</p>").mkString +
          links.map(l => s"""<a href="$l">l</a>""").mkString("<p>", " ", "</p>") +
          "</body></html>"
      // 3xx responses the world serves: url → Location target. The
      // fetch layer delivers them to the FRONTIER (the url was fetched
      // — it folds as seen, no links extract from the empty body) and
      // to the LINK gate as alias rows; never to WebIngest (the 200 +
      // text/html page projection — WarcIngest.pages' filter).
      val redirects = Map(uB1old -> uB1)
      // the static web, keyed by url. ids are the fetch order.
      val world = Map(
        uA1 -> ((10L, page("T", Seq(uB1old, uPriv, uA2),
          bodyShared, "alpha content block one here"))),
        uA2 -> ((11L, page("T", uD :+ uB1,
          "mail bob@x.example.com today", "beta content block two here"))),
        // b1 republishes a1's body under different chrome: a different
        // (short — the r14 title trap) title and a different link set,
        // both outside the extracted text.
        uB1 -> ((12L, page("U", Seq(uA1),
          bodyShared, "alpha content block one here"))),
        uD(0) -> ((13L, page("T", Nil, "delta one content", "delta tail block"))),
        uD(1) -> ((14L, page("T", Nil, "delta two content", "delta tail block"))),
        uD(2) -> ((15L, page("T", Nil, "delta three content", "delta tail block"))),
        uD(3) -> ((16L, page("T", Nil, "delta four content", "delta tail block"))),
        // the 301: an empty body, id by fetch order like any response.
        uB1old -> ((17L, "")))

      // the robots relation comes from a RAW robots.txt BODY through
      // the RFC 9309 parser (Web.parseRobots) — the frontier's robots
      // input is end-to-end real. The '*' group's 'Disallow: /' would
      // block EVERY c.com url, so group selection (graftbot's exact
      // group wins, star excluded) is load-bearing: a selection bug
      // would empty the frontier, not just unblock /private.
      val robotsBody =
        "# crawl fixture\r\n" +
          "User-agent: graftbot\r\n" +
          "Disallow: /private*\r\n" +
          "Crawl-delay: 7\r\n" +
          "\r\n" +
          "User-agent: *\r\n" +
          "Disallow: /\r\n" +
          "Crawl-delay: 9\r\n"
      val robots = Web.parseRobots(
        Seq(("www.c.com", robotsBody)).toDF("host", "body"),
        "host", "body", agent = "GraftBot")
        .select(col("host"), col("pattern"), col("allow"))
      // crawl-delays come from the SAME raw bodies (group selection is
      // load-bearing here too: the '*' group's 9 must not shadow the
      // graftbot group's 7); d.com publishes its own delay 5; hosts
      // without a body (a.com, b.example.org) take the default 1.
      val delays = Web.parseCrawlDelay(
        Seq(("www.c.com", robotsBody),
          ("www.d.com", "User-agent: GraftBot\nCrawl-delay: 5\n"))
          .toDF("host", "body"),
        "host", "body", agent = "GraftBot")
      assert(delays.as[(String, Long)].collect().toSet ==
        Set(("www.c.com", 7L), ("www.d.com", 5L)))
      val ref = Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text")
      val lm = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLm(ref, "doc_id", "text"))

      val frontierState = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(Seq.empty[String].toDF("url"), "url"))
      val webState = new java.util.concurrent.atomic.AtomicReference(
        WebIngest.buildState(
          Seq.empty[(Long, String, String)].toDF("doc_id", "url", "text"),
          "doc_id", "url", "text", cap = 100L))
      val linkState = new java.util.concurrent.atomic.AtomicReference(
        LinkGraphIngest.buildLinkGraph(
          Seq.empty[(Long, String, String)].toDF("doc_id", "url", "html"),
          "doc_id", "url", "html"))
      var rank = Graph.pageRankDirectedState(
        Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d",
        iterations = 3, scale = 1000000000L)

      // `loc` = the 3xx Location (absent/null on page rows — from_json
      // nulls missing fields, so page JSON never has to spell it).
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType), StructField("loc", StringType)))
      val msF = MemoryStream[KMsg]; val msW = MemoryStream[KMsg]
      val msL = MemoryStream[KMsg]
      var novel = Seq.empty[String]
      val manifests = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long], Option[Long], Boolean)]
      val qF = FrontierIngest.startFrontier(
        Stream.fromKafkaShaped(spark, msF.toDF(), schema), frontierState,
        "value.doc_id", "value.url", "value.html",
        robotsRfc = Some(robots), domainCap = Some(2L)) { (nov, _, _) =>
        novel = nov.select(col("url")).as[String].collect().toSeq.sorted
      }
      val qW = WebIngest.start(
        Stream.fromKafkaShaped(spark, msW.toDF(), schema), webState, lm,
        "value.doc_id", "value.url", "value.html",
        minBlocks = 2L, threshPct = 100000L) { (m, _, _) =>
        manifests ++= m.select(col("doc_id"), col("n_pii"), col("dup_of"),
          col("kept"))
          .as[(Long, Option[Long], Option[Long], Boolean)].collect().toSeq
      }
      val qL = LinkGraphIngest.startLinkGraph(
        Stream.fromKafkaShaped(spark, msL.toDF(), schema), linkState,
        "value.doc_id", "value.url", "value.html",
        aliasCols = Some(("value.url", "value.loc"))) { (edges, _, _) =>
        rank = Graph.pageRankDirectedRefreshState(rank,
          edges.select(col("s"), col("d")), "s", "d")
      }

      def send(ms: MemoryStream[KMsg],
               q: org.apache.spark.sql.streaming.StreamingQuery,
               rows: Seq[(Long, String, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url", "html", "loc")
          .select(to_json(struct(col("doc_id"), col("url"), col("html"),
            col("loc"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null,
            j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // THE LOOP: fetch, learn the frontier, fetch what it discovered.
      var toFetch = Seq(uA1)
      var lastSchedule = Seq.empty[(String, String, Long)]
      val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
      var rounds = 0
      while (toFetch.nonEmpty && rounds < 10) {
        val batch = toFetch.map { url =>
          val (id, html) = world(url)
          (id, url, html, redirects.get(url).orNull)
        }
        fetched ++= toFetch
        send(msF, qF, batch)
        // WebIngest consumes PAGES only (the 200 + text/html
        // projection) — 3xx rows never reach curation.
        send(msW, qW, batch.filter(_._4 == null))
        send(msL, qL, batch)
        // batch N's novel frontier IS batch N+1's fetch set (urls the
        // world doesn't serve would 404 — none here by construction);
        // each fetch set dispatches under the per-host politeness
        // schedule (crawl-delays parsed above).
        toFetch = novel.filter(world.contains)
        if (toFetch.nonEmpty)
          lastSchedule = Web.scheduleFetches(
            toFetch.toDF("url"), "url", delays, defaultDelayS = 1L)
            .select(col("host"), col("url"), col("slot_s"))
            .as[(String, String, Long)].collect().toSeq.sortBy(r => (r._1, r._3))
        novel = Seq.empty
        rounds += 1
      }
      qF.stop(); qW.stop(); qL.stop()

      // 1. the fetched closure: a1 → {a2, b1old} (c.com/private robots-
      // blocked) → b1old 301s; a2 discovers b1 + d.com under budget 2
      // → b1 and the two smallest-'fq:'-hash d urls; nothing further.
      val dPicks = uD.sortBy(x => (md5hex("fq:" + x), x)).take(2)

      // the final round's dispatch: b1 alone on its host at slot 0;
      // the two d.com picks spaced by d.com's own delay 5 (url order).
      val dSorted = dPicks.sorted
      assert(lastSchedule == Seq(
        ("www.b.example.org", uB1, 0L),
        ("www.d.com", dSorted(0), 0L),
        ("www.d.com", dSorted(1), 5L)), s"schedule: $lastSchedule")
      assert(fetched.toSet == Set(uA1, uA2, uB1old, uB1) ++ dPicks,
        s"fetched: $fetched (expected d picks $dPicks)")
      assert(rounds == 3, s"a1 / a2+b1old / b1+2 d-pages — got $rounds")

      // 2. live edges ≡ a fresh batch build over the same fetched PAGES
      // + the alias relation (the fresh build sees the same redirects a
      // real re-parse of the archive would yield). The a1 → b1 edge
      // exists in BOTH only through the alias: a1 spells b1 as uB1old.
      val freshAliases = FrontierIngest.aliasLinks(
        redirects.toSeq.toDF("f", "t"), "f", "t")
      val freshLg = LinkGraphIngest.buildLinkGraph(
        fetched.toSeq.filterNot(redirects.contains)
          .map(url => { val (id, h) = world(url); (id, url, h) })
          .toDF("doc_id", "url", "html"),
        "doc_id", "url", "html", aliases = Some(freshAliases))
      assert(linkState.get().edges.as[(Long, Long)].collect().toSet ==
        freshLg.edges.as[(Long, Long)].collect().toSet,
        "loop-folded edges diverged from the fresh batch build")
      assert(linkState.get().edges.as[(Long, Long)].collect().toSet
        .contains((10L, 12L)),
        "the alias-mediated a1 → b1 edge must exist (redirect collapse)")
      // links to never-fetched pages (robots-blocked, over-budget) wait
      // pending in BOTH builds.
      assert(linkState.get().pending.select(col("url")).as[String]
        .collect().toSet ==
        freshLg.pending.select(col("url")).as[String].collect().toSet)

      // 3. the folded rank ≡ a fresh directed build over the live edges.
      val freshRank = Graph.pageRankDirectedState(linkState.get().edges,
        "s", "d", iterations = 3, scale = 1000000000L)
      def rankRows(st: Graph.PageRankDirectedState) =
        st.ranks.select(col("node"), col("degree"),
          expr("array_join(transform(rs, x -> CAST(x AS STRING)), ',')"))
          .as[(Long, Long, String)].collect().toSet
      assert(rankRows(rank) == rankRows(freshRank),
        "folded rank diverged from fresh")

      // 4. curation verdicts: b1 (id 12) collapses onto a1 (id 10) —
      // same body under different chrome, across batches; a2 carries
      // the planted email.
      val byId = manifests.groupBy(_._1).view.mapValues(_.head).toMap
      assert(byId(10L)._3.isEmpty && byId(10L)._4, s"a1: ${byId(10L)}")
      assert(byId(12L)._3 == Some(10L) && !byId(12L)._4,
        s"b1 must collapse onto a1: ${byId(12L)}")
      assert(byId(11L)._2 == Some(1L) && byId(11L)._4, s"a2 pii: ${byId(11L)}")
      // the grown digest root ≡ md5 of the redacted extracted text of
      // the accepted canonicals (recomputed the batch way).
      val acceptedIds = manifests.filter(_._4).map(_._1).toSet
      val pages = fetched.toSeq
        .map(url => { val (id, h) = world(url); (id, url, h) })
        .toDF("doc_id", "url", "html")
      val batchDigests = graft.operators.Pii.withRedacted(
        graft.operators.Html.extractText(pages, "doc_id", "html",
          minChars = 10, maxDensityPct = 34), "text", out = "rtext")
        .filter(col("doc_id").isin(acceptedIds.toSeq: _*))
        .select(md5(col("rtext")), col("doc_id"))
        .as[(String, Long)].collect().toSet
      val grown = graft.streaming.Gate.readGrown(spark,
        webState.get().digestsPath).as[(String, Long)].collect().toSet
      assert(grown == batchDigests,
        s"digest root diverged: $grown vs $batchDigests")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
