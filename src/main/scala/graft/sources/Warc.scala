package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.{SerializableWritable, TaskContext}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC-1.0) web-archive source — the format every
  * real 100 TB web corpus run starts from (CommonCrawl publishes its
  * crawls as `.warc.gz` files). This is the crawl pipelines' input
  * layer: fetched pages enter as WARC `response` records and leave the
  * parser as a (record_id, target_uri, http_status, body, …) relation
  * that [[graft.operators.Html]] extraction consumes directly.
  *
  * Pinned WARC subset (stated — the CommonCrawl shape):
  *  - one gzip MEMBER per record, members concatenated per file (the
  *    CommonCrawl convention; a multi-member stream decompresses as one
  *    stream under both `gzip -d` and `GZIPInputStream`);
  *  - each record = a `WARC/1.0` version line, a CRLF-terminated header
  *    block (`WARC-Type`, `WARC-Record-ID`, `WARC-Date`,
  *    `WARC-Target-URI`, `Content-Type`, `Content-Length`), an empty
  *    line, `Content-Length` payload BYTES, then the `\r\n\r\n` record
  *    separator;
  *  - `WARC-Type: response` records with an `application/http`
  *    content type parse into rows, and `WARC-Type: conversion`
  *    records (the WET extracted-text shape — no HTTP envelope,
  *    payload = text, `WARC-Refers-To` back-link) parse with
  *    http_status 0; `warcinfo` / `request` / other records are
  *    consumed and SKIPPED (the reader proves the skip — every
  *    written file leads with a `warcinfo` member);
  *  - the HTTP payload splits at its first `\r\n\r\n`: the status code
  *    comes from the status line, `http_content_type` from the header
  *    block (case-insensitive name), `body` is the raw bytes after the
  *    split (Content-Length-bounded). A `Transfer-Encoding: chunked`
  *    payload is DECHUNKED transparently (RFC 9112 §7.1, empty-trailer
  *    subset — raw heritrix-style archives keep the coding even though
  *    CommonCrawl strips it); any other transfer coding, or a chunked
  *    framing violation, SKIPS the record like a malformed payload;
  *  - `WARC-Type: revisit` records (ISO 28500 §6.7.2, the
  *    identical-payload-digest dedup profile [[writeDedup]] emits)
  *    parse like responses — head-only payload, empty body,
  *    `warc_refers_to` naming the record that holds the bytes;
  *    [[resolveRevisits]] is the read-side join that restores them;
  *  - a record with damaged FRAMING (bad version line, malformed or
  *    truncated WARC header block, unparsable Content-Length, short
  *    payload) stops that FILE's parse; records before the damage are
  *    kept (stated — the salvage convention). A record whose payload
  *    is complete but whose trailing separator is damaged still
  *    emits, then parse stops. A record whose WARC framing is intact
  *    but whose HTTP PAYLOAD is malformed (no `\r\n\r\n` header
  *    separator, unparsable status line) is SKIPPED and parse
  *    CONTINUES — intact framing means the next record boundary is
  *    still trustworthy, so later records are salvageable; only
  *    framing damage makes the rest of the file unreadable.
  *
  * Scale contract (the [[Jsonl]] discipline):
  *  - gzip members are not seekable without an index, so ingest runs
  *    ONE TASK PER FILE — the file count IS the parallelism. At 100 TB
  *    CommonCrawl ships ~100k files of ~1 GB; write with `files` ≥
  *    executors × cores for the same effect.
  *  - the reader loads a whole file per task (`binaryFile` source) —
  *    size files so one fits comfortably in an executor core's share
  *    (≤1 GB with the default 4 GB/core is the CommonCrawl geometry).
  *  - WARC is an INTERCHANGE boundary, not the at-rest format: parse
  *    once, project (uri, body, status), write parquet; every
  *    downstream pass then gets pushdown/pruning/splittable scans.
  *  - no predicate reaches the WARC scan (opaque bytes) — filter AFTER
  *    the parse projection, in the same stage (no shuffle between).
  */
object Warc {

  /** One parsed `response` record. `body` is the raw HTTP payload body
    * bytes — exactly as archived: if the server sent
    * `Content-Encoding: gzip`, these are the COMPRESSED bytes
    * (`http_content_encoding` carries the header, `''` when absent);
    * [[withDecodedText]] is the pinned decode layer. Image/audio
    * payloads ride the same column untouched (the multimodal binary
    * convention). */
  final case class WarcRecord(record_id: String, warc_type: String,
                              warc_date: String, target_uri: String,
                              http_status: Int, http_content_type: String,
                              http_content_encoding: String,
                              http_location: String,
                              http_etag: String,
                              http_last_modified: String,
                              warc_refers_to: String,
                              body: Array[Byte])

  /** Deterministic fixture date — callers pass a real crawl timestamp
    * in deployment; the default keeps round-trip fixtures replayable. */
  val DefaultDate = "2026-01-01T00:00:00Z"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md5hexBytes(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  /** One gzip member holding exactly `bytes`. */
  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(bytes); gz.close()
    bo.toByteArray
  }

  private val Crlf2 = "\r\n\r\n".getBytes("UTF-8")

  /** Wrap `body` in HTTP/1.1 chunked transfer framing: `chunkBytes`-
    * sized chunks (hex size line, data, CRLF each), then the
    * `0\r\n\r\n` terminator (empty trailer section — the pinned
    * subset). */
  private def chunkify(body: Array[Byte], chunkBytes: Int): Array[Byte] = {
    val bo = new ByteArrayOutputStream(body.length + 64)
    var off = 0
    while (off < body.length) {
      val n = math.min(chunkBytes, body.length - off)
      bo.write(s"${n.toHexString}\r\n".getBytes("UTF-8"))
      bo.write(body, off, n)
      bo.write("\r\n".getBytes("UTF-8"))
      off += n
    }
    bo.write("0\r\n\r\n".getBytes("UTF-8"))
    bo.toByteArray
  }

  /** A `response` record for (uri, body) with payload content type
    * `ctype`; record id = md5 of the uri (the deterministic-fixture
    * discipline — deployments carry real uuids, the parser never
    * interprets the id). The body is RAW BYTES, Content-Length-bounded
    * — `\r\n\r\n` sequences inside a binary body are data, never
    * separators (the parser reads exactly `Content-Length` bytes).
    * `chunked = true` frames the body in chunked transfer coding
    * instead ([[chunkify]]). */
  private def responseRecord(uri: String, body: Array[Byte],
                             date: String,
                             ctype: String = "text/html; charset=utf-8",
                             cenc: String = "",
                             status: String = "200 OK",
                             location: String = "",
                             chunked: Boolean = false,
                             chunkBytes: Int = 100,
                             etag: String = "",
                             lastModified: String = "")
      : Array[Byte] = {
    // chunked responses carry Transfer-Encoding INSTEAD of an HTTP
    // Content-Length (RFC 9112 §6.2 forbids both); the WARC record's
    // own Content-Length still frames the raw payload exactly.
    val entity = if (chunked) chunkify(body, chunkBytes) else body
    val http = (s"HTTP/1.1 $status\r\n" +
      s"Content-Type: $ctype\r\n" +
      (if (cenc.nonEmpty) s"Content-Encoding: $cenc\r\n" else "") +
      (if (location.nonEmpty) s"Location: $location\r\n" else "") +
      (if (etag.nonEmpty) s"ETag: $etag\r\n" else "") +
      (if (lastModified.nonEmpty) s"Last-Modified: $lastModified\r\n" else "") +
      (if (chunked) "Transfer-Encoding: chunked\r\n"
       else s"Content-Length: ${body.length}\r\n") +
      "\r\n").getBytes("UTF-8") ++ entity
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:${md5hex(uri)}>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ Crlf2
  }

  /** The per-file lead `warcinfo` record — real WARC files carry one;
    * the reader must skip it (and provably does: every round-tripped
    * file starts with it, yet only `response` rows come back). */
  private def warcinfoRecord(pid: Int, date: String): Array[Byte] = {
    val fields = "software: graft\r\n".getBytes("UTF-8")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:graft:warcinfo:$pid>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${fields.length}\r\n\r\n").getBytes("UTF-8") ++
      fields ++ Crlf2
  }

  /** Per-partition file writer shared by the three writers: the
    * `.warc.gz` member stream PLUS its CDX-style sidecar index
    * `<prefix>-<pid>.cdx` — one tab-separated line per response
    * record: `record_id \t target_uri \t file \t offset \t length`
    * (offset/length of the record's GZIP MEMBER in the archive file —
    * known as members are emitted, free at write time). The index is
    * what makes single-record re-reads possible without reparsing the
    * archive ([[readRanged]]): gzip members are unseekable WITHOUT it,
    * so takedown/audit workflows would otherwise pay a whole-file
    * parse per record (the CommonCrawl CDX convention). Both files are
    * partition-id-named — task retries overwrite, never duplicate; the
    * reader's `*.warc.gz` glob never sees the sidecar. URIs carry no
    * tabs by contract (canonical crawl urls — stated). */
  private def writePartitionFiles(path: String, prefix: String, pid: Int,
                                  conf: org.apache.hadoop.conf.Configuration,
                                  date: String,
                                  recs: Iterator[(String, String, Array[Byte])],
                                  suffix: String = ".warc.gz")
      : Unit = {
    val name = f"$prefix-$pid%05d$suffix"
    val f = new Path(path, name)
    val fs = f.getFileSystem(conf)
    val out = fs.create(f, true)
    val idx = new StringBuilder
    try {
      val info = gzMember(warcinfoRecord(pid, date))
      out.write(info)
      var off = info.length.toLong
      recs.foreach { case (id, uri, recordBytes) =>
        val member = gzMember(recordBytes)
        out.write(member)
        idx.append(s"$id\t$uri\t$name\t$off\t${member.length}\n")
        off += member.length
      }
    } finally out.close()
    // sidecar named after the archive minus '.gz' — WARC and WET
    // segments sharing a directory never collide.
    val fi = fs.create(new Path(path,
      name.stripSuffix(".gz") + ".cdx"), true)
    try fi.write(idx.toString.getBytes("UTF-8")) finally fi.close()
  }

  /** Write `df`'s (urlCol, bodyCol) rows as `files` `.warc.gz` files
    * under `path` (replacing it): per file, a `warcinfo` member then
    * one `response` member per row, plus the CDX sidecar
    * ([[writePartitionFiles]]). Executors write their own files
    * (partition-id-named — task retries overwrite, never duplicate).
    * Rows with a NULL url or body are SKIPPED (a null page is not a
    * fetch — stated). Body strings write as UTF-8 bytes. */
  def write(df: DataFrame, urlCol: String, bodyCol: String, path: String,
            files: Int, date: String = DefaultDate,
            prefix: String = "part", replace: Boolean = true): Unit = {
    require(files > 0, s"files=$files must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(urlCol).cast("string"), col(bodyCol).cast("string"))
      .where(col(urlCol).isNotNull && col(bodyCol).isNotNull)
      .repartition(files)
      .foreachPartition { (it: Iterator[Row]) =>
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map(r => (s"<urn:graft:${md5hex(r.getString(0))}>",
            r.getString(0),
            responseRecord(r.getString(0),
              r.getString(1).getBytes("UTF-8"), date))))
      }
  }

  /** CRLF-terminated line off a raw stream (None at EOF). Header lines
    * are ASCII-in-practice; UTF-8 decode is the pinned superset. */
  private def readLine(in: InputStream): Option[String] = {
    var b = in.read()
    if (b < 0) return None
    val bo = new ByteArrayOutputStream(64)
    while (b >= 0 && b != '\n') { bo.write(b); b = in.read() }
    val s = bo.toByteArray
    val n = if (s.nonEmpty && s(s.length - 1) == '\r') s.length - 1
            else s.length
    Some(new String(s, 0, n, "UTF-8"))
  }

  private def readN(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) return None
      off += k
    }
    Some(buf)
  }

  /** Decode an HTTP/1.1 chunked transfer entity (RFC 9112 §7.1):
    * hex-size line (chunk extensions after `;` ignored), data, CRLF,
    * repeated; the `0` last-chunk must be followed by exactly one
    * CRLF (EMPTY trailer section — the pinned subset; trailer fields
    * are outside it). Returns None on ANY framing violation — bad hex,
    * short data, missing CRLF, trailing bytes — so the caller skips
    * the record (the tier-2 salvage contract: intact WARC framing,
    * malformed HTTP payload). */
  private def dechunk(a: Array[Byte]): Option[Array[Byte]] = {
    val bo = new ByteArrayOutputStream(a.length.max(16))
    var i = 0
    def line(): Option[String] = {
      var j = i
      while (j + 1 < a.length && !(a(j) == '\r' && a(j + 1) == '\n')) j += 1
      if (j + 1 >= a.length) None
      else { val s = new String(a, i, j - i, "UTF-8"); i = j + 2; Some(s) }
    }
    while (true) {
      line() match {
        case None => return None
        case Some(sz) =>
          val hex = sz.split(";", 2)(0).trim
          val n =
            try Integer.parseInt(hex, 16)
            catch { case _: NumberFormatException => return None }
          if (n < 0) return None
          if (n == 0)
            return if (i + 2 == a.length && a(i) == '\r' && a(i + 1) == '\n')
              Some(bo.toByteArray)
            else None
          if (i + n + 2 > a.length) return None
          bo.write(a, i, n)
          if (!(a(i + n) == '\r' && a(i + n + 1) == '\n')) return None
          i += n + 2
      }
    }
    None
  }

  /** Parsed fields off an HTTP response head block: status code (None
    * when the status line is unparsable), content type, content
    * encoding, location, transfer encoding (all lowercased names,
    * values trimmed, `''` when absent). */
  private def parseHttpHead(head: String)
      : (Option[Int], String, String, String, String, String, String) = {
    val lines = head.split("\r\n")
    val status = lines.headOption
      .map(_.split(" ", 3))
      .filter(p => p.length >= 2 && p(0).startsWith("HTTP/"))
      .flatMap(p => scala.util.Try(p(1).toInt).toOption)
    def hdr(name: String): String = lines.drop(1)
      .find(_.toLowerCase.startsWith(name + ":"))
      .map(_.substring(name.length + 1).trim)
      .getOrElse("")
    (status, hdr("content-type"), hdr("content-encoding"),
      hdr("location"), hdr("transfer-encoding").toLowerCase,
      hdr("etag"), hdr("last-modified"))
  }

  /** Index of the first `\r\n\r\n` in `a`, or -1. */
  private def headerEnd(a: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < a.length) {
      if (a(i) == '\r' && a(i + 1) == '\n' &&
          a(i + 2) == '\r' && a(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one `.warc.gz` file's bytes into its `response` records —
    * the pinned salvage semantics above. Pure function of the bytes
    * (executor-side, one call per file task). */
  def parseFile(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ListBuffer.empty[WarcRecord]
    val in =
      try new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      catch { case _: java.io.IOException => return out.toSeq }
    try {
      var ok = true
      while (ok) {
        readLine(in) match {
          case None => ok = false                        // clean EOF
          case Some("WARC/1.0") =>
            var hdrs = Map.empty[String, String]
            var bad = false
            var done = false
            while (!done && !bad) {
              readLine(in) match {
                case Some("") => done = true
                case Some(l) =>
                  val i = l.indexOf(':')
                  if (i <= 0) bad = true
                  else hdrs += (l.substring(0, i).trim.toLowerCase ->
                    l.substring(i + 1).trim)
                case None => bad = true                  // truncated header
              }
            }
            val len = hdrs.get("content-length")
              .flatMap(x => scala.util.Try(x.toInt).toOption)
              .filter(_ >= 0)
            if (bad || len.isEmpty) ok = false
            else readN(in, len.get) match {
              case None => ok = false                    // truncated payload
              case Some(payload) =>
                val wtype = hdrs.getOrElse("warc-type", "")
                if ((wtype == "response" || wtype == "revisit") &&
                    hdrs.getOrElse("content-type", "")
                      .startsWith("application/http")) {
                  val he = headerEnd(payload)
                  if (he >= 0) {
                    val head = new String(payload, 0, he, "UTF-8")
                    // 3xx responses carry the redirect target in
                    // `location` — the alias edge canonicalization and
                    // the link graph need it ('' when absent).
                    val (status, ctype, cenc, loc, te, etag, lastMod) =
                      parseHttpHead(head)
                    val raw = java.util.Arrays.copyOfRange(
                      payload, he + 4, payload.length)
                    // transfer decode: ''/identity pass through;
                    // chunked dechunks; any OTHER transfer coding (or
                    // a chunked framing violation) SKIPS the record —
                    // tier-2 salvage, parse continues (a revisit's
                    // head-only payload carries no transfer coding).
                    val body: Option[Array[Byte]] =
                      if (te.isEmpty || te == "identity") Some(raw)
                      else if (te == "chunked") dechunk(raw)
                      else None
                    status.foreach { st =>
                      body.foreach { b =>
                        out += WarcRecord(
                          hdrs.getOrElse("warc-record-id", ""),
                          wtype,
                          hdrs.getOrElse("warc-date", ""),
                          hdrs.getOrElse("warc-target-uri", ""),
                          st, ctype, cenc, loc, etag, lastMod,
                          hdrs.getOrElse("warc-refers-to", ""),
                          b)
                      }
                    }
                  }
                } else if (wtype == "conversion" || wtype == "metadata") {
                  // WET `conversion` (extracted text) and WAT
                  // `metadata` (JSON envelope) records — the
                  // CommonCrawl companions: no HTTP envelope, the
                  // payload IS the content; status 0 by convention;
                  // `warc_refers_to` links back to the originating
                  // response record.
                  out += WarcRecord(
                    hdrs.getOrElse("warc-record-id", ""),
                    wtype,
                    hdrs.getOrElse("warc-date", ""),
                    hdrs.getOrElse("warc-target-uri", ""),
                    0, hdrs.getOrElse("content-type", ""), "", "", "", "",
                    hdrs.getOrElse("warc-refers-to", ""),
                    payload)
                }
                // the \r\n\r\n record separator: a complete record with
                // a damaged separator still emitted above; parse stops.
                if (!readN(in, 4).exists(_.sameElements(Crlf2))) ok = false
            }
          case Some(_) => ok = false                     // bad version line
        }
      }
    } catch { case _: java.io.IOException => () } finally in.close()
    out.toSeq
  }

  /** Read every `.warc.gz` under `path` into the parsed relation —
    * one task per file (the gzip-parallelism contract). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
      .load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(parseFile _)
      .toDF()
  }

  /** The CDX-style record index written beside the archives
    * ([[writePartitionFiles]]): one row per response record —
    * (record_id, target_uri, file, offset, length), offset/length of
    * the record's gzip member inside `file`. A whole-corpus relation
    * of tiny rows: join it by record id or url to plan single-record
    * re-reads ([[readRanged]]) without reparsing archives. */
  def readCdx(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").option("pathGlobFilter", "*.cdx").load(path)
      .select(split(col("value"), "\t").as("__p"))
      .select(expr("element_at(__p, 1)").as("record_id"),
        expr("element_at(__p, 2)").as("target_uri"),
        expr("element_at(__p, 3)").as("file"),
        expr("CAST(element_at(__p, 4) AS BIGINT)").as("offset"),
        expr("CAST(element_at(__p, 5) AS BIGINT)").as("length"))

  /** RANGED single-record reads driven by an index selection — the
    * takedown/audit path: `sel` exposes (file, offset, length) rows
    * ([[readCdx]] filtered/joined down to the records wanted,
    * k-bounded by that workflow's contract). Each row seeks into its
    * archive and inflates exactly ONE gzip member, so bytes read =
    * Σ selected member lengths, NOT Σ archive sizes — at 100k × 1 GB
    * archives, fetching k records costs k seeks instead of k full
    * parses (the whole reason the sidecar exists; WarcCdxSpec pins
    * the byte bound). Output = the parsed [[WarcRecord]] relation of
    * exactly the selected records. */
  def readRanged(spark: SparkSession, path: String,
                 sel: DataFrame): DataFrame = {
    import spark.implicits._
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    sel.select(col("file").cast("string"), col("offset").cast("long"),
        col("length").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        it.flatMap { case (file, off, len) =>
          val p = new Path(path, file)
          val in = p.getFileSystem(conf.value).open(p)
          try {
            in.seek(off)
            val buf = new Array[Byte](len.toInt)
            in.readFully(buf)
            parseFile(buf)
          } finally in.close()
        }
      }.toDF()
  }

  /** [[write]] for BINARY payloads (image/audio/video archives — the
    * multimodal half of a real crawl): `bodyCol` must be BinaryType,
    * `ctype` is the records' payload content type (e.g. `image/png`).
    * Bytes ride Content-Length-bounded — any byte sequence, including
    * `\r\n\r\n`, round-trips exactly. Null url/body rows skip. */
  def writeBinary(df: DataFrame, urlCol: String, bodyCol: String,
                  ctype: String, path: String, files: Int,
                  date: String = DefaultDate, prefix: String = "part",
                  replace: Boolean = true): Unit = {
    require(files > 0, s"files=$files must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(urlCol).cast("string"), col(bodyCol).cast("binary"))
      .where(col(urlCol).isNotNull && col(bodyCol).isNotNull)
      .repartition(files)
      .foreachPartition { (it: Iterator[Row]) =>
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map(r => (s"<urn:graft:${md5hex(r.getString(0))}>",
            r.getString(0),
            responseRecord(r.getString(0), r.getAs[Array[Byte]](1), date,
              ctype))))
      }
  }

  /** [[writeBinary]] with PER-ROW HTTP headers — the fixture/egress
    * writer for heterogeneous archives (what a real crawl produces):
    * `ctypeCol` carries each record's `Content-Type` (charset param
    * and all), `cencCol` its `Content-Encoding` (`''` = no header —
    * the writer never invents one). The BODY bytes are written
    * verbatim: a `Content-Encoding: gzip` row must already carry
    * gzip'd bytes (`gzip_bytes(...)` — the writer does not compress;
    * that keeps write and read strictly inverse and the archived
    * bytes exactly what the "server" sent). Null url/body rows skip.
    * `statusCol`/`locationCol` (optional) carry a per-row HTTP status
    * line tail (e.g. `301 Moved Permanently`) and a `Location` header
    * (`''` = no header) — the redirect-archiving shape: real crawls
    * record 3xx responses, and the alias edges they carry are what
    * lets a page fetched via a redirected spelling collapse with its
    * canonical twin downstream. */
  def writeHttp(df: DataFrame, urlCol: String, bodyCol: String,
                ctypeCol: String, cencCol: String, path: String,
                files: Int, date: String = DefaultDate,
                prefix: String = "part", replace: Boolean = true,
                statusCol: Option[String] = None,
                locationCol: Option[String] = None,
                chunkedCol: Option[String] = None,
                chunkBytes: Int = 100,
                etagCol: Option[String] = None,
                lastModifiedCol: Option[String] = None): Unit = {
    require(files > 0, s"files=$files must be positive")
    require(chunkBytes > 0, s"chunkBytes=$chunkBytes must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    val statusC = statusCol.map(c => col(c).cast("string"))
      .getOrElse(lit("200 OK"))
    val locC = locationCol.map(c => col(c).cast("string")).getOrElse(lit(""))
    val chunkC = chunkedCol.map(c => col(c).cast("boolean"))
      .getOrElse(lit(false))
    val etagC = etagCol.map(c => col(c).cast("string")).getOrElse(lit(""))
    val lastModC = lastModifiedCol.map(c => col(c).cast("string"))
      .getOrElse(lit(""))
    df.select(col(urlCol).cast("string"), col(bodyCol).cast("binary"),
        col(ctypeCol).cast("string"), col(cencCol).cast("string"),
        statusC, locC, chunkC, etagC, lastModC)
      .where(col(urlCol).isNotNull && col(bodyCol).isNotNull)
      .repartition(files)
      .foreachPartition { (it: Iterator[Row]) =>
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map(r => (s"<urn:graft:${md5hex(r.getString(0))}>",
            r.getString(0),
            responseRecord(r.getString(0), r.getAs[Array[Byte]](1), date,
              ctype = Option(r.getString(2)).getOrElse(""),
              cenc = Option(r.getString(3)).getOrElse(""),
              status = Option(r.getString(4)).getOrElse("200 OK"),
              location = Option(r.getString(5)).getOrElse(""),
              chunked = !r.isNullAt(6) && r.getBoolean(6),
              chunkBytes = chunkBytes,
              etag = Option(r.getString(7)).getOrElse(""),
              lastModified = Option(r.getString(8)).getOrElse("")))))
      }
  }

  /** One `revisit` record (ISO 28500 §6.7.2, the
    * identical-payload-digest profile — how real archives avoid
    * re-storing unchanged payloads): the HTTP HEAD is kept (status,
    * content type) but the body is NOT — `WARC-Refers-To` names the
    * record that holds it, `WARC-Payload-Digest` states the shared
    * digest. Revisit ids are `rv:`-prefixed so they never collide
    * with the original's id. */
  private def revisitRecord(uri: String, origUri: String, digestHex: String,
                            date: String,
                            ctype: String = "text/html; charset=utf-8")
      : Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $ctype\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes("UTF-8")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: revisit\r\n" +
      s"WARC-Record-ID: <urn:graft:rv:${md5hex(uri)}>\r\n" +
      s"WARC-Refers-To: <urn:graft:${md5hex(origUri)}>\r\n" +
      "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
      s"WARC-Payload-Digest: md5:$digestHex\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ Crlf2
  }

  /** [[write]] with WRITE-TIME payload dedup via `revisit` records —
    * the storage half of the archive dedup real crawlers run (ISO
    * 28500 §6.7.2 identical-payload-digest; Heritrix's dedup module):
    * within each shard, the FIRST occurrence of a payload digest
    * writes a full `response` record; every repeat writes a bodyless
    * `revisit` record whose `WARC-Refers-To` names the original.
    * [[resolveRevisits]] is the read-side inverse.
    *
    * Dedup scope is pinned DETERMINISTIC (oracle-replayable):
    *  - shard = `hash60(url) % files` (the md5-derived 60-bit row
    *    hash — engine-neutral, so an oracle can replay the
    *    assignment); rows shuffle ON the shard key and sort within
    *    partitions by (shard, url);
    *  - the original of a (shard, digest) group is therefore its
    *    MINIMUM url; two hash-colliding shards sharing a partition
    *    dedup independently (the seen-map keys on (shard, digest),
    *    never on the partition).
    * Cross-shard repeats each write their own original — the honest
    * price of shuffle-free-scale dedup scope (global dedup would be a
    * pre-pass with [[graft.operators.TextDedup]], stated). Urls are
    * distinct per write by contract (the CDX id discipline). */
  def writeDedup(df: DataFrame, urlCol: String, bodyCol: String,
                 path: String, files: Int, date: String = DefaultDate,
                 prefix: String = "part", replace: Boolean = true): Unit = {
    require(files > 0, s"files=$files must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(urlCol).cast("string"), col(bodyCol).cast("string"),
        expr(s"pmod(CAST(conv(substring(md5($urlCol), 1, 15), 16, 10) " +
          s"AS BIGINT), $files)").as("__shard"))
      .where(col(urlCol).isNotNull && col(bodyCol).isNotNull)
      .repartition(files, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(urlCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val seen = scala.collection.mutable.Map.empty[(Long, String), String]
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map { r =>
            val uri = r.getString(0)
            val body = r.getString(1).getBytes("UTF-8")
            val sh = r.getLong(2)
            val dg = md5hexBytes(body)
            seen.get((sh, dg)) match {
              case Some(orig) =>
                (s"<urn:graft:rv:${md5hex(uri)}>", uri,
                  revisitRecord(uri, orig, dg, date))
              case None =>
                seen((sh, dg)) = uri
                (s"<urn:graft:${md5hex(uri)}>", uri,
                  responseRecord(uri, body, date))
            }
          })
      }
  }

  /** Read-side inverse of [[writeDedup]]: resolve each `revisit` row's
    * payload from its original via ONE equi-join on
    * `warc_refers_to = record_id` — the revisit keeps its own identity
    * (id, uri, date, status) and takes the original's body /
    * content-type / content-encoding. A revisit whose original is not
    * in `df` (cross-write references) keeps a NULL body — surfaced,
    * never silently dropped (stated). Non-revisit rows pass through
    * untouched. The join shuffles on record ids only — bodies move
    * once, on the original side. */
  def resolveRevisits(df: DataFrame): DataFrame = {
    val base = df.filter(col("warc_type") =!= "revisit")
    val orig = df.filter(col("warc_type") === "response")
      .select(col("record_id").as("__oid"), col("body").as("__obody"),
        col("http_content_type").as("__octype"),
        col("http_content_encoding").as("__ocenc"))
    val rv = df.filter(col("warc_type") === "revisit")
      .join(orig, col("warc_refers_to") === col("__oid"), "left")
      .select(col("record_id"), col("warc_type"), col("warc_date"),
        col("target_uri"), col("http_status"),
        coalesce(col("__octype"), col("http_content_type"))
          .as("http_content_type"),
        coalesce(col("__ocenc"), col("http_content_encoding"))
          .as("http_content_encoding"),
        col("http_location"), col("http_etag"), col("http_last_modified"),
        col("warc_refers_to"),
        col("__obody").as("body"))
    base.select(rv.columns.map(col): _*).unionByName(rv)
  }

  /** The HTTP payload DECODE LAYER over a parsed relation ([[read]] /
    * [[readStream]] output) — appends `outCol`, the payload body as
    * TEXT under the pinned resolution (what every text operator
    * downstream consumes; skipping this and calling
    * `decode(body, 'UTF-8')` turns every legacy-charset or gzip'd
    * record into mojibake that silently poisons digests, LM scores,
    * and dedup):
    *
    *  1. TRANSFER decode (`Content-Encoding`, case-insensitive):
    *     absent/`identity` → raw bytes; `gzip`/`x-gzip` → gunzip
    *     (corrupt stream → NULL text — the undecodable sentinel);
    *     any OTHER encoding (`br`, `deflate`, `compress`) → NULL
    *     text (outside the pinned subset — stated, never mis-decoded;
    *     chunked transfer is a transfer-hop artifact real archives
    *     strip, [[parseFile]]'s stated exclusion).
    *  2. CHARSET resolution, first match wins (the WHATWG/CCNet
    *     order): the `Content-Type` header's `charset=` parameter
    *     (optional quotes); else a `<meta … charset=…>` sniff —
    *     covering both `<meta charset="x">` and the http-equiv
    *     `content="text/html; charset=x"` form — over the first 1024
    *     decoded-as-latin-1 bytes (ISO-8859-1 maps every byte, so the
    *     sniff itself cannot fail; 1024 is the pinned window — HTML5's
    *     prescan bound); else UTF-8.
    *  3. DECODE in the resolved charset: malformed/unmappable byte
    *     sequences become U+FFFD (never a null or a task failure);
    *     an unknown/misspelled charset NAME falls back to UTF-8
    *     (both pinned in [[graft.functions.Transcode]]).
    *
    * One codegen projection (native expressions — gunzip /
    * charset_decode), no UDF, no shuffle; runs in the same stage as
    * the parse. Registers the graft functions on the session (the
    * registry-session contract). */
  def withDecodedText(df: DataFrame, outCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn("__w_ce", lower(trim(col("http_content_encoding"))))
      .withColumn("__w_b", expr(
        """CASE WHEN __w_ce IN ('', 'identity') THEN body
          |     WHEN __w_ce IN ('gzip', 'x-gzip') THEN gunzip(body)
          |     ELSE CAST(NULL AS BINARY) END""".stripMargin))
      .withColumn("__w_csp", expr(
        """lower(regexp_extract(http_content_type,
          |  '(?i)charset="?([^";, ]+)', 1))""".stripMargin))
      .withColumn("__w_meta", expr(
        """lower(regexp_extract(
          |  charset_decode(substring(__w_b, 1, 1024), 'iso-8859-1'),
          |  '(?i)<meta[^>]*charset="?([^"/>;, ]+)', 1))""".stripMargin))
      .withColumn(outCol, expr(
        """CASE WHEN __w_b IS NULL THEN CAST(NULL AS STRING)
          |     ELSE charset_decode(__w_b,
          |            CASE WHEN __w_csp != '' THEN __w_csp
          |                 WHEN __w_meta != '' THEN __w_meta
          |                 ELSE 'utf-8' END) END""".stripMargin))
      .drop("__w_ce", "__w_b", "__w_csp", "__w_meta")
  }

  /** One WET `conversion` record — the CommonCrawl extracted-text
    * companion format: no HTTP envelope, the payload IS the UTF-8
    * text; `WARC-Refers-To` links back to the originating response
    * record (the [[write]] id discipline: md5 of the uri). */
  private def conversionRecord(uri: String, text: Array[Byte],
                               date: String): Array[Byte] =
    (s"WARC/1.0\r\n" +
      s"WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:graft:wet:${md5hex(uri)}>\r\n" +
      s"WARC-Refers-To: <urn:graft:${md5hex(uri)}>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${text.length}\r\n\r\n").getBytes("UTF-8") ++
      text ++ Crlf2

  /** Write (urlCol, textCol) as WET files (`.warc.wet.gz` —
    * CommonCrawl's extracted-text delivery format, `conversion`
    * records): the EGRESS side of extraction, so a graft-curated
    * corpus inter-operates with every WET consumer. Same per-file
    * warcinfo lead, per-record gzip members, partition-id naming, and
    * CDX sidecar as [[write]]; [[read]]'s `*.warc.gz` glob never
    * matches WET segments — the two formats separate by suffix even
    * in one directory. Null url/text rows skip. */
  def writeText(df: DataFrame, urlCol: String, textCol: String,
                path: String, files: Int, date: String = DefaultDate,
                prefix: String = "part", replace: Boolean = true): Unit = {
    require(files > 0, s"files=$files must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(urlCol).cast("string"), col(textCol).cast("string"))
      .where(col(urlCol).isNotNull && col(textCol).isNotNull)
      .repartition(files)
      .foreachPartition { (it: Iterator[Row]) =>
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map(r => (s"<urn:graft:wet:${md5hex(r.getString(0))}>",
            r.getString(0),
            conversionRecord(r.getString(0),
              r.getString(1).getBytes("UTF-8"), date))),
          suffix = ".warc.wet.gz")
      }
  }

  /** One WAT `metadata` record — the CommonCrawl metadata companion
    * format: `Content-Type: application/json`, the payload IS the
    * JSON envelope; `WARC-Refers-To` links back to the originating
    * response record (the [[write]] id discipline). */
  private def metadataRecord(uri: String, json: Array[Byte],
                             date: String): Array[Byte] =
    (s"WARC/1.0\r\n" +
      s"WARC-Type: metadata\r\n" +
      s"WARC-Record-ID: <urn:graft:wat:${md5hex(uri)}>\r\n" +
      s"WARC-Refers-To: <urn:graft:${md5hex(uri)}>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/json\r\n" +
      s"Content-Length: ${json.length}\r\n\r\n").getBytes("UTF-8") ++
      json ++ Crlf2

  /** Write (urlCol, jsonCol) as WAT files (`.warc.wat.gz` —
    * CommonCrawl's metadata delivery format, `metadata` records with
    * JSON envelopes): the metadata EGRESS beside [[writeText]]'s WET,
    * completing the WARC/WAT/WET triple. The caller assembles the
    * envelope JSON engine-side (a `to_json` projection — see
    * x_source_wat); the writer frames it. Same per-file warcinfo
    * lead, per-record gzip members, partition-id naming, and CDX
    * sidecar as [[write]]; the `.warc.gz` / `.warc.wet.gz` globs
    * never match WAT segments (suffix separation). Null url/json
    * rows skip. */
  def writeMeta(df: DataFrame, urlCol: String, jsonCol: String,
                path: String, files: Int, date: String = DefaultDate,
                prefix: String = "part", replace: Boolean = true): Unit = {
    require(files > 0, s"files=$files must be positive")
    val spark = df.sparkSession
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(urlCol).cast("string"), col(jsonCol).cast("string"))
      .where(col(urlCol).isNotNull && col(jsonCol).isNotNull)
      .repartition(files)
      .foreachPartition { (it: Iterator[Row]) =>
        writePartitionFiles(path, prefix, TaskContext.getPartitionId(),
          conf.value, date,
          it.map(r => (s"<urn:graft:wat:${md5hex(r.getString(0))}>",
            r.getString(0),
            metadataRecord(r.getString(0),
              r.getString(1).getBytes("UTF-8"), date))),
          suffix = ".warc.wat.gz")
      }
  }

  /** Read every `.warc.wat.gz` under `path` into the parsed relation
    * (`metadata` rows: body = the JSON envelope bytes, http_status 0,
    * warc_refers_to set) — one task per file, the [[read]] contract. */
  def readWat(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wat.gz")
      .load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(parseFile _)
      .toDF()
  }

  /** Read every `.warc.wet.gz` under `path` into the parsed relation
    * (`conversion` rows: body = the text bytes, http_status 0,
    * warc_refers_to set) — one task per file, the [[read]] contract. */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.warc.wet.gz")
      .load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(parseFile _)
      .toDF()
  }

  /** STREAMING read over a growing `.warc.gz` directory — the archive
    * ingest path: crawl archives land as files (new WARC segments per
    * crawl batch), Structured Streaming's file source picks each NEW
    * file up exactly once, and the parse runs one task per file (the
    * same contract as [[read]]; `binaryFile` has a fixed schema, so no
    * inference pass). Feed the result to the curation gates via
    * `Stream.fromDataFrame` — see graft.streaming.WarcIngest. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // streaming file sources demand an explicit schema even for
    // fixed-schema formats — this is binaryFile's own, verbatim.
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .schema(binSchema)
      .load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(parseFile _)
      .toDF()
  }

  /** Write (urlCol, bodyCol) as WARC under `path`, read it back parsed.
    * The write is eager; the returned frame scans the WARC copy. */
  def roundTrip(df: DataFrame, urlCol: String, bodyCol: String,
                path: String, files: Int,
                date: String = DefaultDate): DataFrame = {
    write(df, urlCol, bodyCol, path, files, date)
    read(df.sparkSession, path)
  }
}
