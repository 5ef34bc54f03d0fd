package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{FrontierIngest, Stream}

/** Crawl-frontier discovery gate (graft.streaming.FrontierIngest —
  * gate family #31). Asserts the family contract plus the gate's pins:
  *  1. gate-then-fold: novelty is judged against the PRE-batch seen
  *     set — a messy respelling of a SEEDED url is not novel, and a
  *     url discovered in batch N is not novel in batch N+1;
  *  2. link resolution: absolute http(s) hrefs pass, root-relative AND
  *     path-relative hrefs resolve against the fetching page's
  *     canonical scheme+host+base-dir, other schemes (mailto:) drop;
  *  3. a url both FETCHED and discovered in one batch is not novel;
  *  4. set semantics in a batch: one row per canonical url, discoverer
  *     = min referring page id, n_refs counts referring PAGES;
  *  5. restore from the seen root answers identically. */
class StreamingFrontierSpec extends SparkSpec {
  import spark.implicits._

  test("frontier gate: discovery vs seen set, resolution rules, fold, restore") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val corpus = Seq("https://www.site0.com/d/0").toDF("url")
      val state = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(corpus, "url"))

      val h1 =
        "<p><a href=\"https://WWW.Site0.COM:443/d/0?utm_source=feed\">seen</a>" +
          " <a href=\"https://www.site2.com/d/2\">new</a>" +
          " <a href=\"/about\">rel</a>" +
          " <a href=\"deep/page.html\">pathrel</a>" +
          " <a href=\"https://www.site1.com/d/1\">self</a>" +
          " <a href=\"mailto:x@y.example\">mail</a></p>"
      val b1 = Seq((1L, "https://WWW.Site1.COM:443/d/1?utm_source=x", h1))
      // batch 2: pages 2 and 3 both link site4/d/4 (n_refs = 2,
      // discoverer = 2); site2/d/2 was discovered in b1 — no longer novel.
      val h2 = "<p><a href=\"https://www.site2.com/d/2\">old</a>" +
        " <a href=\"https://www.site4.com/d/4\">fresh</a></p>"
      val h3 = "<p><a href=\"https://www.site4.com/d/4\">fresh too</a></p>"
      val b2 = Seq(
        (2L, "https://www.site3.com/d/3", h2),
        (3L, "https://www.site3.com/d/3b", h3))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(String, Long, Long)]]
      val q = FrontierIngest.startFrontier(s, state,
        "value.doc_id", "value.url", "value.html") { (novel, _, _) =>
        got += novel.as[(String, Long, Long)].collect().toSet
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
        Set(("https://www.site2.com/d/2", 1L, 1L),
          ("https://www.site1.com/about", 1L, 1L),
          ("https://www.site1.com/d/deep/page.html", 1L, 1L)),
        Set(("https://www.site4.com/d/4", 2L, 2L))),
        s"novel emissions: $got")

      // the folded seen set = seed + b1 page + b1 discoveries + b2 pages
      // + b2 discovery.
      val st = state.get()
      val seen = st.seen.as[String].collect().toSet
      assert(seen == Set(
        "https://www.site0.com/d/0",
        "https://www.site1.com/d/1",
        "https://www.site2.com/d/2",
        "https://www.site1.com/about",
        "https://www.site1.com/d/deep/page.html",
        "https://www.site3.com/d/3",
        "https://www.site3.com/d/3b",
        "https://www.site4.com/d/4"), seen)

      // restore from the root answers identically.
      val restored = FrontierIngest.restoreFrontier(spark, st.seenPath,
        st.version, st.foldedBatch)
      assert(restored.seen.as[String].collect().toSet == seen)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("frontier gate: robots Disallow rules block discoveries, never the fold of fetches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val state = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(
          Seq.empty[String].toDF("url"), "url"))
      val robots = Seq(("www.site1.com", "/private")).toDF("host", "prefix")

      // page 1 links its own /private/1 (disallowed), /ok (allowed),
      // and a cross-host /private (NOT covered — host selectivity).
      val h1 = "<p><a href=\"/private/1\">p</a> <a href=\"/ok\">o</a>" +
        " <a href=\"https://www.site9.com/private/z\">other</a></p>"
      val b1 = Seq((1L, "https://www.site1.com/d/1", h1))
      // a later batch re-links the disallowed path — still blocked
      // (rules are frozen for the query; the url never entered seen,
      // so an unblocking redeploy could still discover it).
      val h2 = "<p><a href=\"https://www.site1.com/private/1\">again</a></p>"
      val b2 = Seq((2L, "https://www.site1.com/d/2", h2))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(String, Long, Long)]]
      val q = FrontierIngest.startFrontier(s, state,
        "value.doc_id", "value.url", "value.html",
        robots = Some(robots)) { (novel, _, _) =>
        got += novel.as[(String, Long, Long)].collect().toSet
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
        Set(("https://www.site1.com/ok", 1L, 1L),
          ("https://www.site9.com/private/z", 1L, 1L)),
        Set.empty),
        s"novel emissions: $got")
      // the disallowed url never folded into seen via discovery — only
      // the fetched pages and the allowed discoveries did.
      val seen = state.get().seen.as[String].collect().toSet
      assert(seen == Set(
        "https://www.site1.com/d/1", "https://www.site1.com/d/2",
        "https://www.site1.com/ok", "https://www.site9.com/private/z"),
        seen)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("frontier gate: RFC 9309 rules — an Allow override inside a Disallow subtree un-blocks its discoveries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val state = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(Seq.empty[String].toDF("url"), "url"))
      val rfc = Seq(
        ("www.site1.com", "/private", false),
        ("www.site1.com", "/private/ok*", true)).toDF("host", "pattern", "allow")
      val h1 = "<p><a href=\"/private/1\">p</a> " +
        "<a href=\"/private/ok/2\">o</a> <a href=\"/pub\">q</a></p>"
      val b1 = Seq((1L, "https://www.site1.com/d/1", h1))
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
      val q = FrontierIngest.startFrontier(s, state,
        "value.doc_id", "value.url", "value.html",
        robotsRfc = Some(rfc)) { (novel, _, _) =>
        got += novel.select(col("url")).as[String].collect().toSet
      }
      val payloads = b1.toDF("doc_id", "url", "html")
        .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
        .as[String].collect()
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()
      // /private/1 blocked (only Disallow matches); /private/ok/2
      // allowed (the longer Allow wins); /pub untouched.
      assert(got.toSeq == Seq(Set(
        "https://www.site1.com/private/ok/2",
        "https://www.site1.com/pub")), got)
      val seen = state.get().seen.as[String].collect().toSet
      assert(!seen.contains("https://www.site1.com/private/1"),
        "a disallowed discovery must never fold into seen")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("frontier gate: a discovered-then-fetched url folds ONCE — the root stays duplicate-free and quota priors count urls, not rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def h(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(("fq:" + s).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val state = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(Seq.empty[String].toDF("url"), "url"))
      // b1: page /d/1 discovers /a. b2: /a is FETCHED (the discovered
      // url enters as a page — the gate's core flow) and discovers /b.
      // b3: a fresh fetch discovers /e /f — the prior must count 3
      // distinct urls (/d/1, /a, /b), NOT 4 rows (a double-folded /a),
      // so exactly one more discovery fits under cap 4.
      val b1 = Seq((1L, "https://www.site1.com/d/1",
        "<p><a href=\"/a\">a</a></p>"))
      val cands2 = Seq("/b").map(p => s"https://www.site1.com$p")
      val h2 = cands2.map(u => s"""<a href="$u">l</a>""")
        .mkString("<p>", " ", "</p>")
      val b2 = Seq((2L, "https://www.site1.com/a", h2))
      val cands3 = Seq("/e", "/f").map(p => s"https://www.site1.com$p")
      val h3 = cands3.map(u => s"""<a href="$u">l</a>""")
        .mkString("<p>", " ", "</p>")
      val b3 = Seq((3L, "https://www.site1.com/d/3", h3))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
      val q = FrontierIngest.startFrontier(s, state,
        "value.doc_id", "value.url", "value.html",
        domainCap = Some(4L)) { (novel, _, _) =>
        got += novel.select(col("url")).as[String].collect().toSet
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
      send(b1); send(b2); send(b3)
      q.stop()

      val pick2 = cands2.minBy(u => (h(u), u))
      val pick3 = cands3.minBy(u => (h(u), u))
      assert(got.toSeq == Seq(
        Set("https://www.site1.com/a"), Set(pick2), Set(pick3)),
        s"emitted: $got (expected picks $pick2, $pick3)")
      // the root is duplicate-free: /a appears once despite being both
      // discovered (b1) and fetched (b2); /d/3's fetch folded normally.
      val rows = state.get().seen.as[String].collect().toSeq
      assert(rows.size == rows.distinct.size,
        s"seen root carries duplicate rows: ${rows.sorted}")
      assert(rows.toSet == Set("https://www.site1.com/d/1",
        "https://www.site1.com/a", pick2,
        "https://www.site1.com/d/3", pick3), rows.sorted)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("frontier gate: domain discovery budget — quota fills smallest-hash first, over-quota drops unfolded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def h(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(("fq:" + s).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      // seed: site1.com already holds TWO seen urls; cap 3 leaves one
      // slot. site2.com is fresh (quota 3).
      val state = new java.util.concurrent.atomic.AtomicReference(
        FrontierIngest.buildFrontier(
          Seq("https://www.site1.com/d/1", "https://www.site1.com/d/2")
            .toDF("url"), "url"))
      // page 1 (on site1) discovers three site1 urls + one site2 url.
      val cands = Seq("/p/a", "/p/b", "/p/c").map(p => s"https://www.site1.com$p")
      val html = (cands :+ "https://www.site2.com/x")
        .map(u => s"""<a href="$u">l</a>""").mkString("<p>", " ", "</p>")
      val b1 = Seq((1L, "https://www.site1.com/d/1", html))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
      val q = FrontierIngest.startFrontier(s, state,
        "value.doc_id", "value.url", "value.html",
        domainCap = Some(3L)) { (novel, _, _) =>
        got += novel.select(col("url")).as[String].collect().toSet
      }
      val payloads = b1.toDF("doc_id", "url", "html")
        .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
        .as[String].collect()
      ms.addData(payloads.zipWithIndex.map { case (j, i) =>
        KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()

      // site1's one remaining slot goes to the smallest 'fq:'-salted
      // hash; site2's url rides its empty quota.
      val pick = cands.minBy(u => (h(u), u))
      assert(got.toSeq == Seq(Set(pick, "https://www.site2.com/x")),
        s"emitted: $got, expected pick $pick")
      // over-quota urls never folded — the seen set holds exactly the
      // seeds + the fetched page url + the two kept discoveries.
      val seen = state.get().seen.as[String].collect().toSet
      assert(seen == Set(
        "https://www.site1.com/d/1", "https://www.site1.com/d/2",
        pick, "https://www.site2.com/x"), seen)
    } finally spark.conf.unset("graft.stage.dir")
  }
}
