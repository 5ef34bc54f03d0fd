package graft

import org.apache.spark.sql.functions._

import graft.streaming.{ScoreIngest, WarcIngest, WebIngest}

/** WARC-archive streaming ingest (graft.streaming.WarcIngest): crawl
  * archives land as `.warc.gz` segment FILES, the file source picks
  * each new segment up exactly once, and the parsed pages flow into
  * the SAME WebIngest gate the Kafka-shaped streams feed. Pins:
  *  1. segment-per-batch delivery: a page in segment 2 that duplicates
  *     segment 1's extracted text collapses CROSS-SEGMENT (the grown
  *     digest root works over the file source too);
  *  2. the pinned projection: only status-200 text/html `response`
  *     records surface — a 404 record and an image/png record spliced
  *     into a segment never reach the gate;
  *  3. doc_id = hash60(WARC record id), replay-stable (the a-priori
  *     expectation is recomputed driver-side);
  *  4. PII counts ride through (the WebIngest contract, unchanged). */
class StreamingWarcSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** The id WarcIngest derives for a page written by Warc.write. */
  private def docId(url: String): Long = h60(s"<urn:graft:${md5hex(url)}>")

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(b); g.close(); bo.toByteArray
  }

  private def rec(status: String, ctype: String, uri: String,
                  body: String): Array[Byte] = {
    val http = (s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n")
      .getBytes("UTF-8") ++ body.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x:$uri>\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("warc segments → file source → web-curate: cross-segment dedup, non-page records skipped, stable ids") {
    val stage = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", stage)
    try {
      val watch = java.nio.file.Files.createTempDirectory("graft-warc-in")
      def page(title: String, bodies: String*): String =
        s"<html><head><title>$title</title></head><body>" +
          bodies.map(b => s"<p>$b</p>").mkString + "</body></html>"
      val u1 = "https://www.s1.com/d/1"
      val u2 = "https://www.s2.com/d/2"
      val u3 = "https://www.s3.com/d/3"
      val shared = "the quick brown fox jumps over the lazy dog"
      val seg1 = Seq((u1, page("T", shared, "first page tail block")))
      // segment 2: u2 republishes u1's body under different chrome;
      // u3 carries a planted email.
      val seg2 = Seq(
        (u2, page("U", shared, "first page tail block")),
        (u3, page("T", "mail bob@x.example.com today", "third page block")))

      val lm = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLm(Seq((1L, shared)).toDF("doc_id", "text"),
          "doc_id", "text"))
      val state = new java.util.concurrent.atomic.AtomicReference(
        WebIngest.buildState(
          Seq.empty[(Long, String, String)].toDF("doc_id", "url", "text"),
          "doc_id", "url", "text", cap = 100L))
      val manifests = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long], Option[Long], Boolean)]
      val q = WebIngest.start(WarcIngest.stream(spark, watch.toString),
        state, lm, "doc_id", "url", "html",
        minBlocks = 2L, threshPct = 100000L) { (m, _, _) =>
        manifests ++= m.select(col("doc_id"), col("n_pii"),
          col("dup_of"), col("kept"))
          .as[(Long, Option[Long], Option[Long], Boolean)]
          .collect().toSeq
      }
      graft.sources.Warc.write(seg1.toDF("url", "html"), "url", "html",
        watch.toString, files = 1, prefix = "seg1", replace = false)
      q.processAllAvailable()
      // segment 2 gains two NON-PAGE records spliced in: a 404 and a
      // png payload — the pinned projection must skip both.
      graft.sources.Warc.write(seg2.toDF("url", "html"), "url", "html",
        watch.toString, files = 1, prefix = "seg2", replace = false)
      val segFile = new java.io.File(watch.toString, "seg2-00000.warc.gz")
      val extra = gz(rec("404 Not Found", "text/html",
        "https://www.s9.com/gone", page("T", "not found body", "tail"))) ++
        gz(rec("200 OK", "image/png", "https://www.s9.com/i.png",
          "fake png bytes"))
      val fos = new java.io.FileOutputStream(segFile, true)
      try fos.write(extra) finally fos.close()
      // the raw append invalidates Hadoop LocalFileSystem's checksum
      // sidecar — drop it (real archives carry no .crc files).
      new java.io.File(watch.toString, ".seg2-00000.warc.gz.crc").delete()
      q.processAllAvailable()
      q.stop()

      val byId = manifests.groupBy(_._1).view.mapValues(_.head).toMap
      // stable derived ids AND the non-page skip in one check: only the
      // three real pages' hash60(record-id) ids surface (the 404/png
      // records carry different record ids — absent means skipped).
      assert(byId.keySet == Set(docId(u1), docId(u2), docId(u3)),
        s"ids must be the derived page ids only: ${byId.keySet}")
      // cross-segment dedup: u2 collapses onto u1's id.
      assert(byId(docId(u1))._3.isEmpty && byId(docId(u1))._4,
        s"u1: ${byId(docId(u1))}")
      assert(byId(docId(u2))._3 == Some(docId(u1)) && !byId(docId(u2))._4,
        s"u2 must collapse onto u1: ${byId(docId(u2))}")
      assert(byId(docId(u3))._2 == Some(1L) && byId(docId(u3))._4,
        s"u3: ${byId(docId(u3))}")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
