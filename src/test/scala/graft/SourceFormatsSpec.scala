package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-format source coverage beyond parquet (the reference reads Kafka
  * only — §2.3; Spark's readers make csv/json extension surface free).
  * Round-trips the events table through each format and checks parity. */
class SourceFormatsSpec extends SparkSpec {

  private lazy val events =
    Tables.events(spark, sf("sf0.001")).select("event_id", "event_type", "value")

  test("json round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == events.count())
    val a = events.agg(sum(col("value")).cast("decimal(20,2)")).collect()(0).getDecimal(0)
    val b = back.agg(sum(col("value")).cast("decimal(20,2)")).collect()(0).getDecimal(0)
    assert(a == b)
  }

  test("csv round-trip with header + explicit schema preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(events.schema).csv(dir)
    assert(back.count() == events.count())
    assert(back.filter(col("event_type") === "click").count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("orc round-trip preserves rows, schema, and pushes filters down") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val back = graft.sources.Orc.roundTrip(events, dir, files = 2)
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
    // ORC scans participate in predicate pushdown like parquet.
    val plan = back.filter(col("event_id") < 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]")
      || plan.contains("LessThan(event_id,100)"), plan.take(600))
  }

  test("Jsonl.roundTrip: gzip JSONL is lossless on hostile text") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line\nbreak\ttab\rcr"),
      (2L, "quote\"back\\slash/fwd"),
      (3L, "caf\u00e9 \u65e5\u672c\u8a9e non-BMP \ud83d\ude00 \u2028ls\u2029ps"),
      (4L, "ctrl\u0001\u0002 nul\u0000 bell\u0007"),
      (5L, null.asInstanceOf[String]),
      (6L, "")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val back = graft.sources.Jsonl.roundTrip(nasty, dir, files = 2)
    // the files on disk really are gzip members.
    val gz = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(gz.nonEmpty, new java.io.File(dir).listFiles.map(_.getName).mkString(","))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows(back) == rows(nasty))
    // JSON scans surface every field nullable (a row may omit any key) —
    // names and types survive, nullability intentionally does not.
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      nasty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    intercept[IllegalArgumentException] {
      graft.sources.Jsonl.roundTrip(nasty, dir, files = 0)
    }
  }

  test("Csv.roundTrip: RFC-4180 CSV is lossless on hostile text") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "comma, separated, values"),
      (2L, "embedded \"quotes\" and \"\"doubled\"\""),
      (3L, "line\nbreak and\r\ncrlf"),
      (4L, "café 日本語 non-BMP 😀"),
      (5L, null.asInstanceOf[String]),
      (6L, ""),
      (7L, "trailing space  "),
      (8L, "\"leading quote")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csvrt").toString
    val back = graft.sources.Csv.roundTrip(nasty, dir, files = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // exact, INCLUDING null vs empty string staying distinct.
    assert(rows(back) == rows(nasty))
    // the quote dialect on disk is doubled quotes (RFC 4180), not
    // Spark's default backslash escaping — what external readers parse.
    val text = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .mkString("\n")
    assert(text.contains("\"\"quotes\"\""), text.take(400))
    assert(!text.contains("\\\""), text.take(400))
    intercept[IllegalArgumentException] {
      graft.sources.Csv.roundTrip(nasty, dir, files = 0)
    }
  }

  test("Warc.roundTrip: response records survive; warcinfo skipped; unicode bodies exact") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://a.example.com/x?q=1", "<html>plain</html>"),
      (2L, "https://b.example.com/café", "café 日本語 😀 body"),
      (3L, "https://c.example.com/empty", ""),
      (4L, "https://d.example.com/crlfish", "has \r\n\r\n inside? no — body is length-bounded"),
      (5L, null.asInstanceOf[String], "skipped: null url"),
      (6L, "https://e.example.com/nullbody", null.asInstanceOf[String]))
      .toDF("id", "url", "body")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    val back = graft.sources.Warc.roundTrip(pages, "url", "body", dir, files = 2)
    // the files on disk are real multi-member gzip (.warc.gz).
    val gz = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".warc.gz"))
    assert(gz.length == 2, new java.io.File(dir).listFiles.map(_.getName).mkString(","))
    // every file leads with a warcinfo member — the reader provably
    // skips it (only response rows come back).
    val got = back
      .select(col("target_uri"), expr("decode(body, 'UTF-8')"),
        col("http_status"), col("warc_type"), col("http_content_type"))
      .as[(String, String, Int, String, String)].collect().toSet
    val want = pages.where(col("url").isNotNull && col("body").isNotNull)
      .select(col("url"), col("body")).as[(String, String)].collect()
      .map { case (u, b) => (u, b, 200, "response", "text/html; charset=utf-8") }
      .toSet
    assert(got == want, s"got $got")
    intercept[IllegalArgumentException] {
      graft.sources.Warc.write(pages, "url", "body", dir, files = 0)
    }
  }

  test("Warc.writeBinary: hostile binary payloads round-trip bit-exactly (embedded CRLFCRLF, gzip magic, all byte values)") {
    import spark.implicits._
    val rnd = new scala.util.Random(707)
    val payloads = Seq(
      // every byte value once, in order
      (1L, "https://b.example/i/1", Array.tabulate(256)(_.toByte)),
      // the record separator INSIDE a body — must be data, not structure
      (2L, "https://b.example/i/2",
        "head\r\n\r\nmiddle\r\n\r\ntail".getBytes("UTF-8")),
      // gzip magic at the start (a nested archive payload)
      (3L, "https://b.example/i/3",
        Array[Byte](0x1f, 0x8b.toByte, 8, 0) ++
          Array.fill(64)(rnd.nextInt.toByte)),
      (4L, "https://b.example/i/4", Array.empty[Byte]))
    val dir = java.nio.file.Files.createTempDirectory("graft-warcbin").toString
    graft.sources.Warc.writeBinary(payloads.toDF("id", "url", "body"),
      "url", "body", "application/octet-stream", dir, files = 2)
    val back = graft.sources.Warc.read(spark, dir)
      .select(col("target_uri"), col("http_content_type"), col("body"))
      .as[(String, String, Array[Byte])].collect()
      .map(r => (r._1, r._2, r._3.toSeq)).toSet
    val want = payloads
      .map(p => (p._2, "application/octet-stream", p._3.toSeq)).toSet
    assert(back == want)
  }

  test("Warc.parseFile: salvage semantics — records before damage kept, request records skipped, truncation stops the file") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def rec(wtype: String, uri: String, body: String,
            ctype: String = "application/http; msgtype=response"): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n")
        .getBytes("UTF-8") ++ body.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Record-ID: <urn:x:1>\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Type: $ctype\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    // request records (real WARC files interleave them) are skipped.
    val mixed = gz(rec("request", "https://a/x", "GET ignored")) ++
      gz(rec("response", "https://a/x", "kept one")) ++
      gz(rec("response", "https://a/y", "kept two"))
    val ok = graft.sources.Warc.parseFile(mixed)
    assert(ok.map(r => (r.target_uri, new String(r.body, "UTF-8"))) ==
      Seq(("https://a/x", "kept one"), ("https://a/y", "kept two")))
    // truncated second record: the first survives, parse stops.
    val full = rec("response", "https://a/z", "after damage never seen")
    val damaged = gz(rec("response", "https://a/x", "kept one")) ++
      gz(full.take(full.length / 2))
    val sal = graft.sources.Warc.parseFile(damaged)
    assert(sal.map(r => new String(r.body, "UTF-8")) == Seq("kept one"))
    // garbage bytes parse to zero records, never throw.
    assert(graft.sources.Warc.parseFile("not gzip at all".getBytes).isEmpty)
  }

  test("WET conversion records: round trip, refers-to back-link, suffix separation from response archives") {
    import spark.implicits._
    val rows = Seq(
      ("https://w.example/a", "extracted text alpha"),
      ("https://w.example/b", "unicode café 日本語 text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toString
    // BOTH formats into ONE directory — the suffix globs must separate.
    graft.sources.Warc.write(rows.toDF("url", "body"), "url", "body", dir,
      files = 1, replace = true)
    graft.sources.Warc.writeText(rows.toDF("url", "text"), "url", "text",
      dir, files = 1, replace = false)
    val wet = graft.sources.Warc.readWet(spark, dir)
      .select(col("target_uri"), expr("decode(body, 'UTF-8')"),
        col("warc_type"), col("http_status"), col("http_content_type"),
        col("warc_refers_to"))
      .as[(String, String, String, Int, String, String)].collect()
      .sortBy(_._1)
    assert(wet.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq ==
      rows.sortBy(_._1).map { case (u, t) =>
        (u, t, "conversion", 0, "text/plain") })
    // refers-to = the RESPONSE record's id for the same uri.
    val respIds = graft.sources.Warc.read(spark, dir)
      .select(col("target_uri"), col("record_id"))
      .as[(String, String)].collect().toMap
    wet.foreach(r => assert(r._6 == respIds(r._1),
      s"refers-to must back-link the response record: $r"))
    // WAT metadata segments into the SAME directory: all three globs
    // must separate by suffix.
    graft.sources.Warc.writeMeta(
      rows.map { case (u, _) => (u, s"""{"u":"$u"}""") }.toDF("url", "json"),
      "url", "json", dir, files = 1, replace = false)
    val wat = graft.sources.Warc.readWat(spark, dir)
      .select(col("target_uri"), expr("decode(body, 'UTF-8')"),
        col("warc_type"), col("http_content_type"), col("warc_refers_to"))
      .as[(String, String, String, String, String)].collect().sortBy(_._1)
    assert(wat.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      rows.sortBy(_._1).map { case (u, _) =>
        (u, s"""{"u":"$u"}""", "metadata", "application/json") })
    wat.foreach(r => assert(r._5 == respIds(r._1),
      s"WAT refers-to must back-link the response record: $r"))
    // each reader sees ONLY its own format.
    assert(graft.sources.Warc.read(spark, dir).count() == 2)
    assert(graft.sources.Warc.readWet(spark, dir).count() == 2)
    assert(graft.sources.Warc.readWat(spark, dir).count() == 2)
    // the CDX sidecars coexist (named after the archive minus .gz) and
    // index all THREE formats' members.
    assert(graft.sources.Warc.readCdx(spark, dir).count() == 6)
  }

  test("Warc.withDecodedText: charset resolution + transfer decode, pinned edge semantics") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val gz = graft.functions.Transcode.gzip _
    def rows(uri: String, ct: String, ce: String, body: Array[Byte]) =
      (uri, ct, ce, body)
    val cafe = "café — fin" // é + em dash, cp1252-mappable
    val fix = Seq(
      // 1: charset param wins even when a CONTRADICTORY meta tag exists
      rows("https://t/1", "text/html; charset=windows-1252", "",
        ("<meta charset=\"utf-8\">" + cafe).getBytes("windows-1252")),
      // 2: no param → meta sniff (http-equiv form)
      rows("https://t/2", "text/html", "",
        ("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">" + cafe)
          .getBytes("windows-1252")),
      // 3: no param, meta BEYOND the 1024-byte prescan window → UTF-8
      rows("https://t/3", "text/html", "",
        (("x" * 1100) + "<meta charset=\"windows-1252\">abc").getBytes("UTF-8")),
      // 4: unknown charset name → UTF-8 fallback (never a drop)
      rows("https://t/4", "text/html; charset=not-a-charset", "", cafe.getBytes("UTF-8")),
      // 5: gzip transfer encoding decodes before the charset pass
      rows("https://t/5", "text/html; charset=utf-8", "gzip", gz(cafe.getBytes("UTF-8"))),
      // 6: CORRUPT gzip → NULL text (sentinel, not a task failure)
      rows("https://t/6", "text/html; charset=utf-8", "gzip",
        Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)),
      // 7: unsupported transfer encoding → NULL text (outside the subset)
      rows("https://t/7", "text/html; charset=utf-8", "br", cafe.getBytes("UTF-8")),
      // 8: malformed bytes under the resolved charset → U+FFFD, not null
      rows("https://t/8", "text/html; charset=utf-8", "",
        Array[Byte]('a', 0xC3.toByte) /* truncated UTF-8 sequence */ ))
      .toDF("url", "ct", "ce", "body")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cs").toString
    graft.sources.Warc.writeHttp(fix, "url", "body", "ct", "ce", dir, files = 1)
    val got = graft.sources.Warc
      .withDecodedText(graft.sources.Warc.read(spark, dir))
      .select(col("target_uri"), col("text"))
      .as[(String, String)].collect().toMap
    assert(got("https://t/1") == "<meta charset=\"utf-8\">" + cafe)
    assert(got("https://t/2").endsWith(cafe) && got("https://t/2").contains("windows-1252"))
    // beyond-window meta: bytes decode as UTF-8 (here identical — the
    // point is the sniff did NOT fire; the tag text survives verbatim)
    assert(got("https://t/3") == ("x" * 1100) + "<meta charset=\"windows-1252\">abc")
    assert(got("https://t/4") == cafe)
    assert(got("https://t/5") == cafe)
    assert(got("https://t/6") == null)
    assert(got("https://t/7") == null)
    assert(got("https://t/8") == "a\uFFFD")
    // the parsed relation surfaces the Content-Encoding header ('' absent)
    val ces = graft.sources.Warc.read(spark, dir)
      .select(col("target_uri"), col("http_content_encoding"))
      .as[(String, String)].collect().toMap
    assert(ces("https://t/5") == "gzip" && ces("https://t/1") == "")
  }

  test("chunked transfer decoding: transparent dechunk, framing violations skip the record, other codings skip") {
    import spark.implicits._
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def rec(uri: String, entity: Array[Byte], te: String): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Transfer-Encoding: $te\r\n\r\n").getBytes("UTF-8") ++ entity
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x:1>\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def chunks(parts: String*): Array[Byte] =
      (parts.map(p =>
        s"${p.getBytes("UTF-8").length.toHexString}\r\n$p\r\n").mkString +
        "0\r\n\r\n").getBytes("UTF-8")

    // writer → reader round trip: chunk framing vanishes; the body may
    // itself contain CRLFCRLF (data, never a separator) and hex-ish
    // text; a chunked+gzip'd entity dechunks FIRST then gunzips via
    // withDecodedText (transfer coding before content coding).
    val body = "alpha\r\n\r\nbeta 1a\r\n" + ("x" * 257)
    val fix = Seq(
      ("https://c/1", body.getBytes("UTF-8"), "", true),
      ("https://c/2", gz(body.getBytes("UTF-8")), "gzip", true),
      ("https://c/3", body.getBytes("UTF-8"), "", false))
      .toDF("url", "body", "ce", "ck")
      .withColumn("ct", lit("text/plain"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-ck").toString
    graft.sources.Warc.writeHttp(fix, "url", "body", "ct", "ce", dir,
      files = 1, chunkedCol = Some("ck"), chunkBytes = 7)
    val got = graft.sources.Warc
      .withDecodedText(graft.sources.Warc.read(spark, dir))
      .select(col("target_uri"), col("text"))
      .as[(String, String)].collect().toMap
    assert(got.size == 3 && got.values.forall(_ == body))

    // hand-built edges: chunk extensions after ';' ignore; a framing
    // violation (bad hex, short data, trailer fields, trailing bytes,
    // missing terminator) SKIPS the record and parsing CONTINUES
    // (tier-2 salvage — WARC framing intact); a transfer coding
    // outside the subset ('deflate') skips too.
    val okExt = ("5;name=v\r\nhello\r\n0\r\n\r\n").getBytes("UTF-8")
    val badHex = ("zz\r\nhello\r\n0\r\n\r\n").getBytes("UTF-8")
    val shortData = ("ff\r\nhello\r\n0\r\n\r\n").getBytes("UTF-8")
    val trailer = chunks("hello").dropRight(2) ++
      "X-T: 1\r\n\r\n".getBytes("UTF-8")
    val noTerm = chunks("hello").dropRight(5)
    val file = gz(rec("https://c/ext", okExt, "chunked")) ++
      gz(rec("https://c/badhex", badHex, "chunked")) ++
      gz(rec("https://c/short", shortData, "chunked")) ++
      gz(rec("https://c/trailer", trailer, "chunked")) ++
      gz(rec("https://c/noterm", noTerm, "chunked")) ++
      gz(rec("https://c/deflate", chunks("hi"), "deflate")) ++
      gz(rec("https://c/last", chunks("sur", "vives"), "chunked"))
    val parsed = graft.sources.Warc.parseFile(file)
    assert(parsed.map(r => (r.target_uri, new String(r.body, "UTF-8"))) ==
      Seq(("https://c/ext", "hello"), ("https://c/last", "survives")))
  }

  test("cache validators surface: ETag / Last-Modified headers, '' when absent") {
    import spark.implicits._
    val fix = Seq(
      ("https://v/1", "b1", "\"abc\"", "Mon, 01 Jun 2026 00:00:00 GMT"),
      ("https://v/2", "b2", "", "Mon, 02 Jun 2026 00:00:00 GMT"),
      ("https://v/3", "b3", "", ""))
      .toDF("url", "body", "et", "lm")
      .withColumn("b", expr("CAST(body AS BINARY)"))
      .withColumn("ct", lit("text/plain")).withColumn("ce", lit(""))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-vl").toString
    graft.sources.Warc.writeHttp(fix, "url", "b", "ct", "ce", dir, files = 1,
      etagCol = Some("et"), lastModifiedCol = Some("lm"))
    val m = graft.sources.Warc.read(spark, dir)
      .select(col("target_uri"), col("http_etag"), col("http_last_modified"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("https://v/1") == ("\"abc\"", "Mon, 01 Jun 2026 00:00:00 GMT"))
    assert(m("https://v/2") == ("", "Mon, 02 Jun 2026 00:00:00 GMT"))
    assert(m("https://v/3") == ("", ""))
  }

  test("revisit records: write-time payload dedup, deterministic scope, read-side resolution") {
    import spark.implicits._
    // three urls share one payload, one differs; files = 1 puts every
    // row in one shard → original = MIN url of the digest group.
    val rows = Seq(
      ("https://r/b", "shared payload"),
      ("https://r/a", "shared payload"),
      ("https://r/c", "shared payload"),
      ("https://r/d", "unique payload"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-rv").toString
    graft.sources.Warc.writeDedup(rows.toDF("url", "body"), "url", "body",
      dir, files = 1)
    val parsed = graft.sources.Warc.read(spark, dir)
    val types = parsed.select(col("target_uri"), col("warc_type"))
      .as[(String, String)].collect().toMap
    assert(types == Map("https://r/a" -> "response",
      "https://r/b" -> "revisit", "https://r/c" -> "revisit",
      "https://r/d" -> "response"))
    // revisits are bodyless on disk — the storage saving is real.
    val rawLens = parsed
      .select(col("warc_type"), expr("length(body)"))
      .as[(String, Int)].collect()
    assert(rawLens.forall { case (t, n) =>
      if (t == "revisit") n == 0 else n > 0 })
    // resolution restores every payload under the revisit's identity.
    val res = graft.sources.Warc.resolveRevisits(parsed)
      .select(col("target_uri"), expr("decode(body, 'UTF-8')"),
        col("warc_type"))
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(res.map(r => (r._1, r._2)).toSeq ==
      rows.sortBy(_._1).map { case (u, b) => (u, b) })
    // the CDX sidecar carries the rv:-prefixed revisit ids — ranged
    // audit reads can fetch a revisit record directly.
    val cdxIds = graft.sources.Warc.readCdx(spark, dir)
      .select(col("target_uri"), col("record_id"))
      .as[(String, String)].collect().toMap
    assert(cdxIds("https://r/b").startsWith("<urn:graft:rv:"))
    assert(cdxIds("https://r/a").startsWith("<urn:graft:") &&
      !cdxIds("https://r/a").contains(":rv:"))
    // a revisit whose original is absent resolves to a NULL body —
    // surfaced, never dropped.
    val orphan = graft.sources.Warc.resolveRevisits(
      parsed.filter(col("warc_type") === "revisit"))
    assert(orphan.count() == 2 &&
      orphan.filter(col("body").isNull).count() == 2)
  }
}
