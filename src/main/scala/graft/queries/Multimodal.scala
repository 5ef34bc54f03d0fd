package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{MediaRecord, Media}
import graft.sources.Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata — and REAL pixel decoding on top.
  *
  * Two layers, both real ([[graft.operators.Media]]):
  *  - header parsing: JPEG marker-walking to SOF, PNG IHDR, GIF logical
  *    screen descriptor — pure byte-walking over the binary column;
  *  - full pixel decode via the JDK's headless `javax.imageio`
  *    (PNG/JPEG/GIF/BMP — no external codec needed), feeding exact
  *    integer pixel statistics and the dHash perceptual fingerprint.
  *
  * The oracle design makes every stage load-bearing: payloads are
  * synthesized with KNOWN content (dimensions embedded in real container
  * headers; pixel gradients encoded through a real lossless PNG encode),
  * the engine must parse/decode them back out of the bytes, and the
  * DuckDB oracle states the ground-truth arithmetic in closed form — any
  * parsing or decoding bug hash-mismatches.
  *
  * Scale shape: per-row projection / typed mapPartitions only — no
  * shuffle, linear, executor-side (the dedup query adds the banded
  * self-join, see [[graft.operators.ImageDedup]]).
  */
object Multimodal {

  val all: Seq[Q] = Seq(
    // ------------------------- metadata projection over real PNG payloads
    // payload = real PNG signature + IHDR carrying (100 + doc_id % 200,
    // 100 + 7·doc_id % 300) + the text bytes as stand-in chunk data. The
    // engine SNIFFS the magic and PARSES width/height back from the IHDR
    // bytes (substring/conv over the binary column — codegen'd, no UDF);
    // the oracle asserts the known embedded values.
    Q("x_multimodal_meta", (s, d) => {
      fanOut(documents(s, d))
        .withColumn("payload", concat(
          expr("unhex('89504E470D0A1A0A0000000D49484452')"),
          expr("unhex(lpad(hex(100 + doc_id % 200), 8, '0'))"),
          expr("unhex(lpad(hex(100 + (doc_id * 7) % 300), 8, '0'))"),
          col("text").cast("binary")))
        .select(
          col("doc_id"),
          expr("octet_length(payload)").as("byte_len"),
          sha2(col("text").cast("binary"), 256).as("sha"),
          // real magic sniffing over the binary column.
          when(expr("substring(payload, 1, 8)") === expr("unhex('89504E470D0A1A0A')"),
            lit("png")).otherwise(lit("unknown")).as("format"),
          // real IHDR parse: big-endian u32s at offsets 17 and 21.
          expr("CAST(conv(hex(substring(payload, 17, 4)), 16, 10) AS INT)").as("width"),
          expr("CAST(conv(hex(substring(payload, 21, 4)), 16, 10) AS INT)").as("height"),
          expr("substring(text, 1, 16)").as("frame_sample"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, text, sha256(text) AS sha FROM documents)
      SELECT doc_id,
             24 + octet_length(encode(text)) AS byte_len,
             sha,
             'png' AS format,
             CAST(100 + doc_id % 200 AS INT) AS width,
             CAST(100 + (doc_id * 7) % 300 AS INT) AS height,
             substr(text, 1, 16) AS frame_sample
      FROM t ORDER BY doc_id""")),

    // --------------------- typed decode pipeline (JPEG/PNG/GIF round-trip)
    // The Dataset[MediaRecord] → Dataset[MediaFeatures] mapPartitions
    // pipeline with the JPEG MARKER WALK on the hot path: payloads are
    // structurally-real containers (format cycles jpeg/png/gif by doc_id)
    // built with known dimensions; extractFeatures must walk the segments
    // and read them back. byte_len pins the builders' structural layout.
    Q("x_media_dimensions", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (100 + id % 200).toInt
          val h = (100 + (id * 7) % 300).toInt
          (id % 3) match {
            case 0 => MediaRecord(id, "jpeg", Media.jpegBytes(w, h))
            case 1 => MediaRecord(id, "png", Media.pngBytes(w, h))
            case _ => MediaRecord(id, "gif", Media.gifBytes(w, h))
          }
        }
      Media.extractFeatures(recs)
        .select(col("id").as("doc_id"), col("format"),
          col("width"), col("height"), col("byteLen").as("byte_len"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id,
             ['jpeg', 'png', 'gif'][CAST(doc_id % 3 AS INT) + 1] AS format,
             CAST(100 + doc_id % 200 AS INT) AS width,
             CAST(100 + (doc_id * 7) % 300 AS INT) AS height,
             CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN ${Media.jpegBytes(1, 1).length}
               WHEN 1 THEN ${Media.pngBytes(1, 1).length}
               ELSE ${Media.gifBytes(1, 1).length} END AS INT) AS byte_len
      FROM documents ORDER BY doc_id""")),

    // ------------------------- REAL pixel decode → exact channel statistics
    // Payloads are REAL PNGs (ImageIO-encoded executor-side) carrying a
    // known per-pixel RGB gradient; the engine must FULLY DECODE the
    // compressed stream (zlib scanlines, filters — javax.imageio) to
    // reproduce the per-channel and luma sums the oracle states in closed
    // form. PNG is lossless, so any decode bug hash-mismatches. All sums
    // are exact integers — no FP anywhere.
    Q("x_media_pixels", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (9 + id % 8).toInt
          val h = (8 + (id * 3) % 9).toInt
          MediaRecord(id, "png", Media.encodePng(w, h, (x, y) =>
            ((((x * 3 + y * 5 + id) % 256) << 16) |
              (((x * 7 + y * 11 + id * 3) % 256) << 8) |
              ((x * 13 + y + id * 5) % 256)).toInt))
        }
      Media.extractPixelFeatures(recs)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("pixCount").as("pix_count"), col("sumR").as("sum_r"),
          col("sumG").as("sum_g"), col("sumB").as("sum_b"),
          col("lumaSum").as("luma_sum"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH dims AS (
        SELECT doc_id, CAST(9 + doc_id % 8 AS INT) AS width,
               CAST(8 + (doc_id * 3) % 9 AS INT) AS height
        FROM documents),
      xs AS (SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM dims),
      px AS (SELECT doc_id, width, height, x, unnest(range(0, height)) AS y FROM xs),
      c AS (SELECT doc_id, width, height,
              (x*3 + y*5 + doc_id) % 256 AS r,
              (x*7 + y*11 + doc_id*3) % 256 AS g,
              (x*13 + y + doc_id*5) % 256 AS b
            FROM px)
      SELECT doc_id, width, height,
             CAST(COUNT(*) AS BIGINT) AS pix_count,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(2126*r + 7152*g + 722*b) AS BIGINT) AS luma_sum
      FROM c GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // ------------------------------------- REAL resize, proven end-to-end
    // encode(gradient) → nearest-neighbor resize to 8×8 (exact integer
    // sampling: source pixel (⌊x·srcW/8⌋, ⌊y·srcH/8⌋)) → lossless PNG
    // re-encode → decode → channel sums. The oracle restates the sampled
    // pixels in closed form, so the whole decode→resample→encode→decode
    // chain must be exact to hash-match.
    Q("x_media_resize", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (9 + id % 8).toInt
          val h = (8 + (id * 3) % 9).toInt
          MediaRecord(id, "png", Media.encodePng(w, h, (x, y) =>
            ((((x * 3 + y * 5 + id) % 256) << 16) |
              (((x * 7 + y * 11 + id * 3) % 256) << 8) |
              ((x * 13 + y + id * 5) % 256)).toInt))
        }
      Media.extractPixelFeatures(Media.resize(recs, 8, 8))
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("sumR").as("sum_r"), col("sumG").as("sum_g"),
          col("sumB").as("sum_b"), col("lumaSum").as("luma_sum"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH dims AS (
        SELECT doc_id, 9 + doc_id % 8 AS sw, 8 + (doc_id * 3) % 9 AS sh
        FROM documents),
      xs AS (SELECT doc_id, sw, sh, unnest(range(0, 8)) AS x FROM dims),
      px AS (SELECT doc_id, sw, sh, x, unnest(range(0, 8)) AS y FROM xs),
      src AS (SELECT doc_id, (x * sw) // 8 AS sx, (y * sh) // 8 AS sy FROM px),
      c AS (SELECT doc_id,
              (sx*3 + sy*5 + doc_id) % 256 AS r,
              (sx*7 + sy*11 + doc_id*3) % 256 AS g,
              (sx*13 + sy + doc_id*5) % 256 AS b
            FROM src)
      SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(2126*r + 7152*g + 722*b) AS BIGINT) AS luma_sum
      FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // ----------------------------- REAL audio parse → exact PCM statistics
    // The audio modality needs no codec at all: PCM WAV is uncompressed,
    // so a genuine RIFF chunk walk (the fixture embeds an ignorable LIST
    // chunk the parser must skip) + little-endian sample reads ARE the
    // decode. Samples are synthesized in closed form; the oracle restates
    // the amplitude/energy sums — the features an audio curation pipeline
    // gates on (silence, clipping, loudness) — all exact integers.
    Q("x_media_audio", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val n = (200 + id % 300).toInt
          val rate = (8000 + (id % 5) * 1000).toInt
          val samples = Array.tabulate(n)(i =>
            ((i * 7L + id * 13L) % 65536L - 32768L).toShort)
          MediaRecord(id, "wav", Media.wavBytes(rate, samples))
        }
      Media.extractAudioFeatures(recs)
        .select(col("id").as("doc_id"), col("sampleRate").as("sample_rate"),
          col("nSamples").as("n_samples"), col("sumAbs").as("sum_abs"),
          col("maxAbs").as("max_abs"), col("sumSq").as("sum_sq"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH d AS (
        SELECT doc_id, 200 + doc_id % 300 AS n,
               CAST(8000 + (doc_id % 5) * 1000 AS INT) AS sample_rate
        FROM documents),
      s AS (SELECT doc_id, sample_rate, unnest(range(0, n)) AS i FROM d),
      v AS (SELECT doc_id, sample_rate,
              (i*7 + doc_id*13) % 65536 - 32768 AS smp
            FROM s)
      SELECT doc_id, sample_rate,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(abs(smp)) AS BIGINT) AS sum_abs,
             CAST(MAX(abs(smp)) AS BIGINT) AS max_abs,
             CAST(SUM(smp * smp) AS BIGINT) AS sum_sq
      FROM v GROUP BY doc_id, sample_rate ORDER BY doc_id""")),

    // --------------------------- REAL video demux → frame sample → parse
    // MJPEG AVI is RIFF + JPEG — both already parsed for real, so the
    // video pipeline composes genuine pieces end to end: demux the AVI
    // chunk walk (skipping the builder's JUNK chunk), keep every 2nd
    // frame, and read each sampled frame's dimensions back out of its
    // JPEG markers. Frame dims are synthesized in closed form per
    // (doc, frame); the oracle restates them — a demux bug (wrong frame
    // order, pad-byte drift, JUNK misparse) or a JPEG-walk bug
    // hash-mismatches.
    Q("x_media_video", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val nf = (3 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            Media.jpegBytes(
              (40 + (id + f * 7) % 100).toInt,
              (30 + (id * 3 + f) % 80).toInt)
          }
          MediaRecord(id, "avi", Media.aviBytes(frames, 100, 80))
        }
      Media.sampleVideoFrames(recs, everyK = 2)
        .map { fr =>
          val (w, h) = Media.headerDimensions(fr.payload).getOrElse((-1, -1))
          (fr.id, fr.frameIdx, w, h)
        }
        .toDF("doc_id", "frame_idx", "width", "height")
        .orderBy(col("doc_id"), col("frame_idx"))
    }, Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents),
      f AS (SELECT doc_id, unnest(range(0, nf)) AS frame_idx FROM d)
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(40 + (doc_id + frame_idx*7) % 100 AS INT) AS width,
             CAST(30 + (doc_id*3 + frame_idx) % 80 AS INT) AS height
      FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""")),

    // ------------------------------ perceptual AUDIO dedup (energy contour)
    // Near-duplicate audio via the 64-bit energy-contour fingerprint
    // (Media.audioFingerprint64) — VOLUME-INVARIANT by construction,
    // so each group's re-mastered variants (samples scaled ×(1+v)) keep
    // the base fingerprint exactly, while a small additive edit in the
    // first two windows moves ≤ 2 bits. Pair generation reuses the
    // generic banded-Hamming machinery (ImageDedup.dhashPairs operates
    // on any (id, 64-bit hash) relation); the oracle recomputes windows,
    // energies, bits, and the FULL quadratic pair set from the
    // closed-form samples — all exact integers.
    Q("x_dedup_audio", (s, d) => {
      import s.implicits._
      val hashes = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 4
          val v = (id % 4).toInt
          // per-WINDOW md5-derived amplitude (constant within each
          // 4-sample window) — bases get structurally INDEPENDENT energy
          // contours. Affine formulas are not enough here: a value-space
          // shift between bases preserves most neighbor comparisons, so
          // "(a·base + b·w) mod m" fixtures made half the corpus collide.
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = Array.tabulate(260) { i =>
            val dig = md.digest(s"$base:${i / 4}".getBytes("UTF-8"))
            val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
            val sb = h16 % 16384 - 8192
            val p = if (v > 0 && i < 8) v * 300 else 0
            math.max(-32768, math.min(32767, sb * (1 + v) + p)).toShort
          }
          (id, Media.audioFingerprint64(
            Media.wavBytes(16000, samples)).get)
        }.toDF("id", "h")
      graft.operators.ImageDedup.dhashPairs(hashes, maxHamming = 3)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS v FROM documents),
      idx AS (SELECT doc_id, base, v, unnest(range(0, 260)) AS i FROM d),
      smp AS (SELECT doc_id, i // 4 AS w,
                GREATEST(-32768, LEAST(32767,
                  (list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, 5), k ->
                       CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(base AS VARCHAR) || ':' ||
                                    CAST(i // 4 AS VARCHAR)), k, 1)) - 1 AS BIGINT))),
                     (acc, hv) -> acc * 16 + hv) % 16384 - 8192) * (1 + v) +
                  CASE WHEN v > 0 AND i < 8 THEN v*300 ELSE 0 END)) AS s
              FROM idx),
      e AS (SELECT doc_id, w, CAST(SUM(s*s) AS BIGINT) AS e
            FROM smp GROUP BY doc_id, w),
      bits AS (SELECT a.doc_id, a.w AS pos,
                 CASE WHEN a.e < b.e THEN '1' ELSE '0' END AS bit
               FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1
               WHERE a.w < 64),
      hs AS (SELECT doc_id, string_agg(bit, '' ORDER BY pos) AS bs
             FROM bits GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(len(list_filter(range(1, 65),
                 i -> substr(a.bs, i, 1) != substr(b.bs, i, 1))) AS BIGINT) AS hamming
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id)
      SELECT da, db, hamming FROM pairs WHERE hamming <= 3 ORDER BY da, db""")),

    // ------------------- trim-robust AUDIO dedup (contour shingle sets)
    // The trim gap x_dedup_audio cannot cover: its length-relative
    // 65-window fingerprint breaks when a copy is CUT (every boundary
    // shifts). Media.audioShingles64 uses fixed-size windows + sliding
    // 64-bit contour shingles, so hop-aligned cuts shift the window grid
    // by whole hops and interior shingles survive verbatim; containment
    // over the shingle SETS (TextDedup.containmentPairs — the same
    // machinery as video dedup) catches trimmed AND re-volumed copies.
    // Fixture: groups of 3 docs share an md5-derived per-window signal —
    // v1 = front-trimmed by 8 hops, v2 = trimmed 4 hops AND exactly
    // half volume (even amplitudes, so /2 is exact and energies scale by
    // exactly 1/4). The oracle rebuilds contours from the closed-form
    // windows and restates containment on the bit-string shingles (a
    // bijection of the packed longs).
    Q("x_dedup_audio_trim", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          val off = if (v == 1) 8 else if (v == 2) 4 else 0
          val m = 130 - off
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = Array.tabulate(m * 4) { i =>
            val dig = md.digest(s"$base:${i / 4 + off}".getBytes("UTF-8"))
            val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
            val a = h16 % 8192 - 4096
            (if (v == 2) a else a * 2).toShort
          }
          MediaRecord(id, "wav", Media.wavBytes(16000, samples))
        }
      graft.operators.TextDedup.containmentPairs(
        Media.audioShingleSets(recs, win = 4, hop = 4).toDF(),
        threshold = 0.85)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v,
                        CASE doc_id % 3 WHEN 1 THEN 8 WHEN 2 THEN 4
                             ELSE 0 END AS woff
                 FROM documents),
      w AS (SELECT doc_id, base, v, woff,
                   unnest(range(0, 130 - woff)) AS j
            FROM d),
      a AS (SELECT doc_id, v, j,
                   (list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(1, 5), k ->
                        CAST(strpos('0123456789abcdef',
                          substr(md5(CAST(base AS VARCHAR) || ':' ||
                                     CAST(woff + j AS VARCHAR)), k, 1)) - 1
                          AS BIGINT))),
                      (acc, hv) -> acc * 16 + hv) % 8192 - 4096) AS amp
            FROM w),
      e AS (SELECT doc_id, j,
                   4 * (CASE WHEN v = 2 THEN amp ELSE amp * 2 END)
                     * (CASE WHEN v = 2 THEN amp ELSE amp * 2 END) AS e
            FROM a),
      bits AS (SELECT x.doc_id, x.j AS pos,
                      CASE WHEN x.e < y.e THEN '1' ELSE '0' END AS bit
               FROM e x JOIN e y ON x.doc_id = y.doc_id AND y.j = x.j + 1),
      bs AS (SELECT doc_id, string_agg(bit, '' ORDER BY pos) AS bs
             FROM bits GROUP BY doc_id),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(range(1, len(bs) - 62),
                      i -> substr(bs, i, 64))) AS sh
             FROM bs),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(a.sh) AS c_ab,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(b.sh) AS c_ba
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT da, db, c_ab, c_ba FROM p
      WHERE GREATEST(c_ab, c_ba) >= 0.85
      ORDER BY da, db""")),

    // --------------- RESAMPLE-robust audio dedup (time-normalized shingles)
    // The gap x_dedup_audio_trim leaves open: its windows are sized in
    // SAMPLES, so a resampled copy (8 kHz re-encode of a 16 kHz
    // recording — ubiquitous in crawled audio) aggregates different time
    // slices per window and the contour scrambles (MediaSpec pins the
    // loss). Media.audioShinglesRate sizes the window grid in TIME
    // (sampleRate/hopsPerSec samples per hop): both encodings compare
    // the SAME time windows, and any resampler that preserves per-window
    // energy order preserves every contour bit. Groups of 3 share
    // md5-derived per-window amplitudes: v0 = 16 kHz original, v1 = its
    // exact 2× decimation at 8 kHz AND half volume (window-constant even
    // amplitudes ⇒ every energy scales by exactly 1/16, comparisons
    // untouched), v2 = 8 kHz + front-trim of 6 hops (trim robustness
    // now composes rate-independently — hops are 1/4000 s at EITHER
    // rate). The oracle rebuilds contours from the closed-form window
    // amplitudes (energy ∝ amp², positive scale factors cancel in the
    // comparisons) and restates containment on bit-string shingles.
    Q("x_dedup_audio_resample", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          val woff = if (v == 2) 6 else 0
          val m = 130 - woff
          val perWin = if (v == 0) 4 else 2 // samples per 1/4000 s hop
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = Array.tabulate(m * perWin) { i =>
            val dig = md.digest(s"$base:${i / perWin + woff}".getBytes("UTF-8"))
            val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
            val a = h16 % 8192 - 4096
            (if (v == 1) a else a * 2).toShort
          }
          MediaRecord(id, "wav",
            Media.wavBytes(if (v == 0) 16000 else 8000, samples))
        }
      graft.operators.TextDedup.containmentPairs(
        Media.audioShingleSetsRate(recs, hopsPerSec = 4000).toDF(),
        threshold = 0.85)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v,
                        CASE WHEN doc_id % 3 = 2 THEN 6 ELSE 0 END AS woff
                 FROM documents),
      w AS (SELECT doc_id, base, woff,
                   unnest(range(0, 130 - woff)) AS j
            FROM d),
      a AS (SELECT doc_id, j,
                   (list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(1, 5), k ->
                        CAST(strpos('0123456789abcdef',
                          substr(md5(CAST(base AS VARCHAR) || ':' ||
                                     CAST(woff + j AS VARCHAR)), k, 1)) - 1
                          AS BIGINT))),
                      (acc, hv) -> acc * 16 + hv) % 8192 - 4096) AS amp
            FROM w),
      e AS (SELECT doc_id, j, amp * amp AS e FROM a),
      bits AS (SELECT x.doc_id, x.j AS pos,
                      CASE WHEN x.e < y.e THEN '1' ELSE '0' END AS bit
               FROM e x JOIN e y ON x.doc_id = y.doc_id AND y.j = x.j + 1),
      bs AS (SELECT doc_id, string_agg(bit, '' ORDER BY pos) AS bs
             FROM bits GROUP BY doc_id),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(range(1, len(bs) - 62),
                      i -> substr(bs, i, 64))) AS sh
             FROM bs),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(a.sh) AS c_ab,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(b.sh) AS c_ba
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT da, db, c_ab, c_ba FROM p
      WHERE GREATEST(c_ab, c_ba) >= 0.85
      ORDER BY da, db""")),

    // --------------- ARBITRARY-trim audio dedup (content-defined chunks)
    // The alignment gap the shingle families document away: their fixed
    // window GRID survives only hop-multiple cuts. Media.audioCdcChunks
    // applies the x_chunk_cdc recipe to the SAMPLE stream — a Rabin
    // rolling hash over the last 8 samples cuts a chunk wherever
    // r ≡ 0 (mod 32), so boundaries are functions of CONTENT alone and a
    // trim of ANY length (37 / 13+29 samples here — deliberately not
    // multiples of anything) damages only the head/tail chunks; interior
    // chunk keys survive verbatim and containment over the key sets
    // catches the copies. Fixture: groups of 3 share md5-derived
    // per-SAMPLE amplitudes (CDC operates at sample level — per-window
    // fixtures would under-exercise the hash); v1 = front-trim 37,
    // v2 = front 13 + end 29. The oracle recomputes the rolling hash
    // closed-form per position (the w-term fold over the sample-list
    // slice — no recursion needed), re-derives the boundary set, folds
    // each chunk's fingerprint, and restates containment. All integer
    // arithmetic below 2^62; chunk-key collisions across groups are
    // modeled identically by both engines (the x_dedup_video rule).
    Q("x_dedup_audio_cdc", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          val (off, n) = v match {
            case 0 => (0, 520)
            case 1 => (37, 483)
            case _ => (13, 478)
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = Array.tabulate(n) { i =>
            val dig = md.digest(s"$base:${i + off}".getBytes("UTF-8"))
            val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
            (h16 % 8192 - 4096).toShort
          }
          MediaRecord(id, "wav", Media.wavBytes(16000, samples))
        }
      graft.operators.TextDedup.containmentPairs(
        Media.audioCdcChunkSets(recs).toDF(), threshold = 0.8)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v,
                        CASE doc_id % 3 WHEN 1 THEN 37 WHEN 2 THEN 13
                             ELSE 0 END AS off,
                        CASE doc_id % 3 WHEN 1 THEN 483 WHEN 2 THEN 478
                             ELSE 520 END AS n
                 FROM documents),
      idx AS (SELECT doc_id, base, off, unnest(range(0, n)) AS i FROM d),
      smp AS (SELECT doc_id, i,
                     (list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(1, 5), k ->
                          CAST(strpos('0123456789abcdef',
                            substr(md5(CAST(base AS VARCHAR) || ':' ||
                                       CAST(off + i AS VARCHAR)), k, 1)) - 1
                            AS BIGINT))),
                        (acc, hv) -> acc * 16 + hv) % 8192 - 4096)
                     + 32768 AS u
              FROM idx),
      ull AS (SELECT doc_id, list(u ORDER BY i) AS ul, COUNT(*) AS n
              FROM smp GROUP BY doc_id),
      rr AS (SELECT doc_id, i,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                                             ul[i - 6 : i + 1]),
                      (acc, u2) -> (acc * 1000003 + u2) % 2147483647) AS r
             FROM (SELECT doc_id, ul, unnest(range(7, n)) AS i FROM ull)),
      bl AS (SELECT doc_id, list(i ORDER BY i) AS bl
             FROM rr WHERE r % 32 = 0 GROUP BY doc_id),
      asg AS (SELECT s.doc_id, s.i, s.u,
                     len(list_filter(COALESCE(b.bl, CAST([] AS BIGINT[])),
                                     p -> p < s.i)) AS cid
              FROM smp s LEFT JOIN bl b ON s.doc_id = b.doc_id),
      ckl AS (SELECT doc_id, cid, list(u ORDER BY i) AS us, COUNT(*) AS ln
              FROM asg GROUP BY doc_id, cid),
      ck AS (SELECT doc_id,
                    list_reduce(list_prepend(CAST(0 AS BIGINT), us),
                      (acc, u2) -> (acc * 1000033 + u2) % 2147483647)
                      * 1048576 + LEAST(ln, 1048575) AS key
             FROM ckl),
      sets AS (SELECT doc_id, list_distinct(list(key)) AS sh
               FROM ck GROUP BY doc_id),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(a.sh) AS c_ab,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(b.sh) AS c_ba
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      SELECT da, db, c_ab, c_ba FROM p
      WHERE GREATEST(c_ab, c_ba) >= 0.8
      ORDER BY da, db"""), headline = true),

    // ------------------------------- perceptual image dedup (dHash pairs)
    // Groups of 4 docs share a base gradient; variants perturb the red
    // channel in a narrow left strip (clamped, not wrapped — v=1/v=2 are
    // gentle NEAR-duplicates, v=3 is a heavy edit that usually exceeds
    // the Hamming budget). The engine decodes the real PNGs, block-
    // averages luma onto the 9×8 dHash grid, and finds pairs within
    // Hamming ≤ 3 via LOSSLESS 4-band candidate generation
    // (graft.operators.ImageDedup); the oracle recomputes the identical
    // integer pipeline from the closed-form pixels and checks against the
    // FULL quadratic ground truth — proving both the decode and that
    // banding loses nothing.
    Q("x_dedup_image", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 4
          val v = (id % 4).toInt
          MediaRecord(id, "png", Media.encodePng(16, 16, (x, y) => {
            val r0 = ((x * 3 + y * 5 + base * 11) % 256).toInt
            val r =
              if (v == 3 && x < 5) math.min(r0 + 120, 255)
              else if ((v == 1 || v == 2) && x < 2)
                math.min(r0 + (if (v == 1) 8 else 30), 255)
              else r0
            val g = ((x * 7 + y * 11 + base * 3) % 256).toInt
            val b = ((x * 13 + y + base * 5) % 256).toInt
            (r << 16) | (g << 8) | b
          }))
        }
      graft.operators.ImageDedup.pairs(recs, maxHamming = 3)
        .orderBy(col("da"), col("db"))
    }, headline = true, oracle = Some("""
      WITH d AS (SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS v FROM documents),
      xs AS (SELECT doc_id, base, v, unnest(range(0, 16)) AS x FROM d),
      px AS (SELECT doc_id, base, v, x, unnest(range(0, 16)) AS y FROM xs),
      lum AS (
        SELECT doc_id, x, y,
          2126 * (CASE WHEN v = 3 AND x < 5
                       THEN least((x*3 + y*5 + base*11) % 256 + 120, 255)
                       WHEN v IN (1, 2) AND x < 2
                       THEN least((x*3 + y*5 + base*11) % 256 +
                                  CASE v WHEN 1 THEN 8 ELSE 30 END, 255)
                       ELSE (x*3 + y*5 + base*11) % 256 END)
          + 7152 * ((x*7 + y*11 + base*3) % 256)
          +  722 * ((x*13 + y + base*5) % 256) AS luma
        FROM px),
      cells AS (
        SELECT doc_id, (9*(x+1)-1) // 16 AS gx, y // 2 AS gy,
               CAST(SUM(luma) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cell
        FROM lum GROUP BY doc_id, (9*(x+1)-1) // 16, y // 2),
      bits AS (
        SELECT a.doc_id, a.gy * 8 + a.gx AS pos,
               CASE WHEN a.cell < b.cell THEN '1' ELSE '0' END AS bit
        FROM cells a JOIN cells b
          ON a.doc_id = b.doc_id AND b.gx = a.gx + 1 AND b.gy = a.gy
        WHERE a.gx < 8),
      hs AS (SELECT doc_id, string_agg(bit, '' ORDER BY pos) AS bs
             FROM bits GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(len(list_filter(range(1, 65),
                 i -> substr(a.bs, i, 1) != substr(b.bs, i, 1))) AS BIGINT) AS hamming
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id)
      SELECT da, db, hamming FROM pairs WHERE hamming <= 3 ORDER BY da, db""")),

    // ------------------------ CROP-ROBUST image dedup (tiled dHash shingles)
    // Whole-image dHash (x_dedup_image) survives resize and luma shift
    // but ANY crop or pad re-frames the 9×8 grid and scrambles every bit
    // (ImageDedupSpec proves the loss at the shipped Hamming budget).
    // The image analog of the audio aligned-fingerprint → sliding-
    // shingles upgrade: hash OVERLAPPING 18×16 TILES at hop 8
    // (ImageDedup.dhashShingles) and flag via set containment — a
    // hop-aligned crop/pad leaves surviving tiles' pixels untouched.
    // Groups of 3: v0 = 26×24 original, v1 = crop (left 8 px removed),
    // v2 = pad (8 px of fresh content prepended). Pixels are flat
    // 2×2-px gray cells with md5-derived values — PNG is lossless and
    // tiles are 2-px aligned, so each tile hash is exact integer
    // arithmetic over the stated cells, which the oracle recomputes
    // cell-for-cell. Contract (stated, as for audio trims): crops must
    // be hop multiples; arbitrary offsets need a smaller hop.
    Q("x_dedup_image_crop", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          def cell(tag: String, cx: Int, cy: Int): Int = {
            val md = java.security.MessageDigest.getInstance("MD5")
            md.digest(s"$tag:$base:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
          }
          val w = v match { case 0 => 26; case 1 => 18; case _ => 34 }
          MediaRecord(id, "png", Media.encodePng(w, 24, (x, y) => {
            val (cx, cy) = (x / 2, y / 2)
            val g =
              if (v == 2 && cx < 4) cell("p", cx, cy)
              else if (v == 1) cell("i", cx + 4, cy)
              else if (v == 2) cell("i", cx - 4, cy)
              else cell("i", cx, cy)
            (g << 16) | (g << 8) | g
          }))
        }
      graft.operators.ImageDedup.shinglePairs(recs, threshold = 0.9)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v FROM documents),
      dims AS (SELECT doc_id, base, v,
                      CASE v WHEN 0 THEN 13 WHEN 1 THEN 9 ELSE 17 END AS ncx
               FROM d),
      cxs AS (SELECT doc_id, base, v, unnest(range(0, ncx)) AS cx FROM dims),
      cg AS (SELECT doc_id, base, v, cx, unnest(range(0, 12)) AS cy FROM cxs),
      cells AS (SELECT doc_id,
                       CASE v WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 3 END AS ntx,
                       cx, cy,
        (strpos('0123456789abcdef', substr(md5(
           CASE WHEN v = 2 AND cx < 4 THEN 'p' ELSE 'i' END || ':' ||
           CAST(base AS VARCHAR) || ':' ||
           CAST(CASE WHEN v = 1 THEN cx + 4
                     WHEN v = 2 AND cx >= 4 THEN cx - 4
                     ELSE cx END AS VARCHAR) || ':' ||
           CAST(cy AS VARCHAR)), 1, 1)) - 1) * 16 +
        (strpos('0123456789abcdef', substr(md5(
           CASE WHEN v = 2 AND cx < 4 THEN 'p' ELSE 'i' END || ':' ||
           CAST(base AS VARCHAR) || ':' ||
           CAST(CASE WHEN v = 1 THEN cx + 4
                     WHEN v = 2 AND cx >= 4 THEN cx - 4
                     ELSE cx END AS VARCHAR) || ':' ||
           CAST(cy AS VARCHAR)), 2, 1)) - 1) AS g
        FROM cg),
      tx AS (SELECT DISTINCT doc_id, ntx FROM cells),
      tp0 AS (SELECT doc_id, unnest(range(0, ntx)) AS ti FROM tx),
      tp AS (SELECT doc_id, ti, unnest(range(0, 2)) AS tj FROM tp0),
      gp0 AS (SELECT doc_id, ti, tj, unnest(range(0, 8)) AS gx FROM tp),
      gp AS (SELECT doc_id, ti, tj, gx, unnest(range(0, 8)) AS gy FROM gp0),
      bits AS (SELECT p.doc_id, p.ti, p.tj, p.gy * 8 + p.gx AS pos,
                      CASE WHEN a.g < b.g THEN '1' ELSE '0' END AS bit
               FROM gp p
               JOIN cells a ON a.doc_id = p.doc_id
                 AND a.cx = 4 * p.ti + p.gx AND a.cy = 4 * p.tj + p.gy
               JOIN cells b ON b.doc_id = p.doc_id
                 AND b.cx = 4 * p.ti + p.gx + 1 AND b.cy = 4 * p.tj + p.gy),
      toks AS (SELECT doc_id, ti, tj, string_agg(bit, '' ORDER BY pos) AS t
               FROM bits GROUP BY doc_id, ti, tj),
      tok AS (SELECT DISTINCT doc_id, t FROM toks),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
                FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT da, db,
             CAST(i AS DOUBLE) / sa.sz AS c_ab,
             CAST(i AS DOUBLE) / sb.sz AS c_ba
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE GREATEST(CAST(i AS DOUBLE) / sa.sz, CAST(i AS DOUBLE) / sb.sz) >= 0.9
      ORDER BY da, db""")),

    // ---------- ARBITRARY-offset crop dedup (content-defined keypoints)
    // x_dedup_image_crop's tile grid survives only hop-multiple crops —
    // the image half of the alignment gap the audio CDC chunker closed.
    // ImageDedup.keypointHashes anchors on CONTENT: a pixel is a keypoint
    // where its gray is a strict 3×3 local max AND ≡ 0 mod 4 (the CDC
    // density control); the key is the 5×5 patch's polynomial fold mod
    // 2^31−1. Max test, mod test, and patch are all content-local, so a
    // crop/pad of ANY offset preserves every interior keypoint verbatim
    // and containment flags the pair (cropped side containment = 1.0
    // exactly). Groups of 3 share per-PIXEL md5-derived grays (PNG
    // lossless ⇒ exact): v1 = crop at offsets (3, 2) — deliberately not
    // multiples of the tile hop — v2 = pad with fresh content at offsets
    // (3, 1). The oracle rebuilds each image's gray list closed-form and
    // replays the max test + fold per interior position (the CDC-oracle
    // list-slice style — no joins, no recursion). Cross-group key
    // collisions are modeled identically by both engines.
    Q("x_dedup_image_keypoint", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          def cell(tag: String, cx: Int, cy: Int): Int = {
            val md = java.security.MessageDigest.getInstance("MD5")
            md.digest(s"$tag:$base:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
          }
          val (w, h) = v match {
            case 0 => (28, 24); case 1 => (23, 21); case _ => (31, 25)
          }
          MediaRecord(id, "png", Media.encodePng(w, h, (x, y) => {
            val g =
              if (v == 1) cell("i", x + 3, y + 2)
              else if (v == 2 && (x < 3 || y < 1)) cell("p", x, y)
              else if (v == 2) cell("i", x - 3, y - 1)
              else cell("i", x, y)
            (g << 16) | (g << 8) | g
          }))
        }
      graft.operators.ImageDedup.keypointPairs(recs, threshold = 0.9)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v,
                        CASE doc_id % 3 WHEN 1 THEN 23 WHEN 2 THEN 31
                             ELSE 28 END AS w,
                        CASE doc_id % 3 WHEN 1 THEN 21 WHEN 2 THEN 25
                             ELSE 24 END AS h
                 FROM documents),
      px AS (SELECT doc_id, base, v, w, h, unnest(range(0, w * h)) AS i FROM d),
      pc AS (SELECT doc_id, base, v, w, h, i, i % w AS x, i // w AS y FROM px),
      pt AS (SELECT doc_id, base, w, h, i,
               CASE WHEN v = 2 AND (x < 3 OR y < 1) THEN 'p' ELSE 'i' END AS tag,
               CASE WHEN v = 1 THEN x + 3
                    WHEN v = 2 AND NOT (x < 3 OR y < 1) THEN x - 3
                    ELSE x END AS ox,
               CASE WHEN v = 1 THEN y + 2
                    WHEN v = 2 AND NOT (x < 3 OR y < 1) THEN y - 1
                    ELSE y END AS oy
             FROM pc),
      ph AS (SELECT doc_id, w, h, i,
               md5(tag || ':' || CAST(base AS VARCHAR) || ':' ||
                   CAST(ox AS VARCHAR) || ':' || CAST(oy AS VARCHAR)) AS m
             FROM pt),
      pg AS (SELECT doc_id, w, h, i,
               (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) AS g
             FROM ph),
      gl AS (SELECT doc_id, w, h, list(g ORDER BY i) AS gl
             FROM pg GROUP BY doc_id, w, h),
      xs AS (SELECT doc_id, w, h, gl, unnest(range(2, w - 2)) AS x FROM gl),
      ys AS (SELECT doc_id, w, gl, x, unnest(range(2, h - 2)) AS y FROM xs),
      kp AS (SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(0, 25), k ->
                   CAST(gl[(y + k // 5 - 2) * w + x + k % 5 - 2 + 1]
                        AS BIGINT))),
                 (acc, gv) -> (acc * 1000003 + gv) % 2147483647) AS key
             FROM ys
             WHERE gl[y * w + x + 1] % 4 = 0
               AND gl[y * w + x + 1] > list_max(list_transform(
                     [[-1,-1],[-1,0],[-1,1],[0,-1],[0,1],[1,-1],[1,0],[1,1]],
                     o -> gl[(y + o[1]) * w + x + o[2] + 1]))),
      sets AS (SELECT doc_id, list_distinct(list(key)) AS sh
               FROM kp GROUP BY doc_id),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(a.sh) AS c_ab,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(b.sh) AS c_ba
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      SELECT da, db, c_ab, c_ba FROM p
      WHERE GREATEST(c_ab, c_ba) >= 0.9
      ORDER BY da, db""")),

    // --------------------------------- VIDEO dedup (exact frame overlap)
    // Re-containerized copies and trimmed cuts of a video share
    // byte-identical FRAMES even though the container bytes differ
    // (muxing, fps, chunk layout) — so video-level dedup = set overlap
    // of demuxed frame digests (Media.videoFrameDigestSets) through the
    // EXISTING containment machinery (TextDedup.containmentPairs: the
    // trimmed-cut case is directional, exactly what containment catches
    // and Jaccard dilutes). Groups of 3: v0 original, v1 re-muxed at a
    // different fps (same frames), v2 trimmed (drops the first 2
    // frames). The oracle can't recompute md5 of container internals —
    // it doesn't need to: frame bytes are a bijection of the closed-form
    // (w, h) dims, so it restates the overlap on 'w:h' tokens; a demux
    // bug (frame order, pad bytes, JUNK misparse) breaks the digest
    // bijection and hash-mismatches.
    Q("x_dedup_video", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          val nf = (4 + base % 3).toInt
          val all = (0 until nf).map { f =>
            Media.jpegBytes(
              (40 + (base * 5 + f * 7) % 100).toInt,
              (30 + (base * 3 + f * 11) % 80).toInt)
          }
          val frames = if (v == 2) all.drop(2) else all
          val fps = if (v == 1) 40000 else 33333
          MediaRecord(id, "avi", Media.aviBytes(frames, 100, 80, fps))
        }
      graft.operators.TextDedup.containmentPairs(
        Media.videoFrameDigestSets(recs).toDF(), threshold = 0.9)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v FROM documents),
      n AS (SELECT doc_id, base, v, 4 + base % 3 AS nf FROM d),
      f AS (SELECT doc_id, base,
                   unnest(range(CASE WHEN v = 2 THEN 2 ELSE 0 END, nf)) AS fr
            FROM n),
      tok AS (SELECT DISTINCT doc_id,
                CAST(40 + (base*5 + fr*7) % 100 AS VARCHAR) || ':' ||
                CAST(30 + (base*3 + fr*11) % 80 AS VARCHAR) AS t
              FROM f),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
                FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT da, db,
             CAST(i AS DOUBLE) / sa.sz AS c_ab,
             CAST(i AS DOUBLE) / sb.sz AS c_ba
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE GREATEST(CAST(i AS DOUBLE) / sa.sz, CAST(i AS DOUBLE) / sb.sz) >= 0.9
      ORDER BY da, db""")),

    // ------------------- VIDEO dedup, RE-ENCODE-ROBUST (perceptual frames)
    // x_dedup_video keys on byte-identical frames, so ANY lossy re-encode
    // (the most common transformation in crawled video) produces zero
    // overlap. This variant decodes every demuxed MJPEG frame and hashes
    // its PIXELS (Media.videoPerceptualDigestSets: per-frame dHash →
    // distinct set → containment). Groups of 3: v0 original (quality
    // 0.9), v1 full RE-ENCODE at quality 0.45 (shares zero bytes with
    // v0 — MediaSpec proves the byte-digest operator loses it), v2
    // trimmed re-encode (drops the first 2 frames, quality 0.7). Frames
    // are gray 5-level staircases on 8×8-px cells (one JPEG DCT block
    // each; adjacent cells ≥ 60 gray apart, ≫ codec error at any
    // quality), with an md5-derived per-row offset, so each frame's
    // dHash is a CLOSED-FORM function of (base, frame) that the oracle
    // recomputes exactly — the lossy codec cannot flip a bit, which is
    // precisely the robustness property being shipped.
    Q("x_dedup_video_percept", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          val v = (id % 3).toInt
          val nf = (4 + base % 3).toInt
          def rowOffset(f: Int, gy: Int): Int = {
            val md = java.security.MessageDigest.getInstance("MD5")
            ((md.digest(s"$base:$f:$gy".getBytes("US-ASCII"))(0) >> 4) & 0xf) % 5
          }
          val drop = if (v == 2) 2 else 0
          val q = if (v == 0) 0.9f else if (v == 1) 0.45f else 0.7f
          val frames = (drop until nf).map { f =>
            Media.encodeJpeg(72, 64, q, (x, y) => {
              val g = ((x / 8 + rowOffset(f, y / 8)) % 5) * 60
              (g << 16) | (g << 8) | g
            })
          }
          MediaRecord(id, "avi", Media.aviBytes(frames, 72, 64))
        }
      graft.operators.TextDedup.containmentPairs(
        Media.videoPerceptualDigestSets(recs).toDF(), threshold = 0.9)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 3 AS base, doc_id % 3 AS v FROM documents),
      n AS (SELECT doc_id, base, v, 4 + base % 3 AS nf FROM d),
      f AS (SELECT doc_id, base,
                   unnest(range(CASE WHEN v = 2 THEN 2 ELSE 0 END, nf)) AS fr
            FROM n),
      g AS (SELECT doc_id, base, fr, unnest(range(0, 8)) AS gy FROM f),
      r AS (SELECT doc_id, fr, gy,
                   (strpos('0123456789abcdef',
                      substr(md5(CAST(base AS VARCHAR) || ':' ||
                                 CAST(fr AS VARCHAR) || ':' ||
                                 CAST(gy AS VARCHAR)), 1, 1)) - 1) % 5 AS t
            FROM g),
      b AS (SELECT doc_id, fr, gy, t, unnest(range(0, 8)) AS gx FROM r),
      bits AS (SELECT doc_id, fr, gy * 8 + gx AS pos,
                      CASE WHEN (gx + t) % 5 = 4 THEN '0' ELSE '1' END AS bit
               FROM b),
      toks AS (SELECT doc_id, fr, string_agg(bit, '' ORDER BY pos) AS t
               FROM bits GROUP BY doc_id, fr),
      tok AS (SELECT DISTINCT doc_id, t FROM toks),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
                FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT da, db,
             CAST(i AS DOUBLE) / sa.sz AS c_ab,
             CAST(i AS DOUBLE) / sb.sz AS c_ba
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE GREATEST(CAST(i AS DOUBLE) / sa.sz, CAST(i AS DOUBLE) / sb.sz) >= 0.9
      ORDER BY da, db""")),

    // ---------------- ROTATION/FLIP-ROBUST image dedup (canonical D4 dHash)
    // Whole-image dHash (x_dedup_image) survives resize/luma shift and
    // the tiled shingles (x_dedup_image_crop) survive crops, but a 90°
    // rotation or mirror re-frames the gradient grid and scrambles every
    // bit of both (ImageDedupSpec proves the loss). Canonicalize instead:
    // hash all 8 dihedral transforms of the decoded pixels
    // (ImageDedup.d4Hashes — the orbit is a D4 invariant, so every
    // lossless rotated/flipped copy shares it) and band on the
    // unsigned-minimum hash. Groups of 4 on 16×16 gray PNGs of 2×2
    // md5-derived cells: v1 = exact rot90 of v0 (canonical hamming 0 by
    // construction), v2 = mirror with one bottom-row cell nudged +10
    // (low-order-bit damage — the argmin-stability contract the operator
    // documents), v3 = fresh content. The oracle recomputes all 8
    // transform bitstrings per doc from the closed-form pixels (source
    // coordinates under each inverse transform), takes MIN as canonical,
    // and checks the FULL quadratic ground truth — banding again proven
    // lossless.
    Q("x_dedup_image_rot", (s, d) => {
      import s.implicits._
      val recs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 4
          val v = (id % 4).toInt
          def cell(tag: String, cx: Int, cy: Int): Int = {
            val md = java.security.MessageDigest.getInstance("MD5")
            md.digest(s"$tag:$base:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
          }
          MediaRecord(id, "png", Media.encodePng(16, 16, (x, y) => {
            val (pcx, pcy) = (x / 2, y / 2)
            val g = v match {
              case 0 => cell("i", pcx, pcy)
              case 1 => cell("i", pcy, 7 - pcx) // exact 90° rotation of v0
              case 2 => // mirror of v0 + one bottom-row cell nudged
                val g0 = cell("i", 7 - pcx, pcy)
                if (7 - pcx == 5 && pcy == 7) math.min(g0 + 10, 255) else g0
              case _ => cell("z", pcx, pcy)
            }
            (g << 16) | (g << 8) | g
          }))
        }
      graft.operators.ImageDedup.rotationRobustPairs(recs, maxHamming = 3)
        .orderBy(col("da"), col("db"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS v FROM documents),
      ts AS (SELECT doc_id, base, v, unnest(range(0, 8)) AS t FROM d),
      xs AS (SELECT doc_id, base, v, t, unnest(range(0, 16)) AS x FROM ts),
      px AS (SELECT doc_id, base, v, t, x, unnest(range(0, 16)) AS y FROM xs),
      -- payload-pixel source coordinate of transform t's pixel (x, y)
      sc AS (SELECT doc_id, base, v, t, x, y,
               CASE t WHEN 0 THEN x WHEN 1 THEN y WHEN 2 THEN 15 - x
                      WHEN 3 THEN 15 - y WHEN 4 THEN 15 - x WHEN 5 THEN y
                      WHEN 6 THEN x ELSE 15 - y END AS sx,
               CASE t WHEN 0 THEN y WHEN 1 THEN 15 - x WHEN 2 THEN 15 - y
                      WHEN 3 THEN x WHEN 4 THEN y WHEN 5 THEN x
                      WHEN 6 THEN 15 - y ELSE 15 - x END AS sy
             FROM px),
      -- content cell the payload references at (sx, sy), per variant
      cc AS (SELECT doc_id, base, v, t, x, y,
               CASE v WHEN 1 THEN sy // 2 WHEN 2 THEN 7 - sx // 2
                      ELSE sx // 2 END AS cx,
               CASE v WHEN 1 THEN 7 - sx // 2 ELSE sy // 2 END AS cy
             FROM sc),
      lum AS (SELECT doc_id, v, t, x, y, 10000 * (
               CASE WHEN v = 2 AND cx = 5 AND cy = 7
                 THEN LEAST(
                   (strpos('0123456789abcdef', substr(md5('i:' ||
                      CAST(base AS VARCHAR) || ':' || CAST(cx AS VARCHAR) ||
                      ':' || CAST(cy AS VARCHAR)), 1, 1)) - 1) * 16 +
                   (strpos('0123456789abcdef', substr(md5('i:' ||
                      CAST(base AS VARCHAR) || ':' || CAST(cx AS VARCHAR) ||
                      ':' || CAST(cy AS VARCHAR)), 2, 1)) - 1) + 10, 255)
                 ELSE
                   (strpos('0123456789abcdef', substr(md5(
                      CASE WHEN v = 3 THEN 'z:' ELSE 'i:' END ||
                      CAST(base AS VARCHAR) || ':' || CAST(cx AS VARCHAR) ||
                      ':' || CAST(cy AS VARCHAR)), 1, 1)) - 1) * 16 +
                   (strpos('0123456789abcdef', substr(md5(
                      CASE WHEN v = 3 THEN 'z:' ELSE 'i:' END ||
                      CAST(base AS VARCHAR) || ':' || CAST(cx AS VARCHAR) ||
                      ':' || CAST(cy AS VARCHAR)), 2, 1)) - 1)
               END) AS luma
             FROM cc),
      cells AS (
        SELECT doc_id, t, (9*(x+1)-1) // 16 AS gx, y // 2 AS gy,
               CAST(SUM(luma) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cell
        FROM lum GROUP BY doc_id, t, (9*(x+1)-1) // 16, y // 2),
      bits AS (
        SELECT a.doc_id, a.t, a.gy * 8 + a.gx AS pos,
               CASE WHEN a.cell < b.cell THEN '1' ELSE '0' END AS bit
        FROM cells a JOIN cells b
          ON a.doc_id = b.doc_id AND a.t = b.t
         AND b.gx = a.gx + 1 AND b.gy = a.gy
        WHERE a.gx < 8),
      hs AS (SELECT doc_id, t, string_agg(bit, '' ORDER BY pos) AS bs
             FROM bits GROUP BY doc_id, t),
      canon AS (SELECT doc_id, MIN(bs) AS bs FROM hs GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(len(list_filter(range(1, 65),
                 i -> substr(a.bs, i, 1) != substr(b.bs, i, 1))) AS BIGINT) AS hamming
        FROM canon a JOIN canon b ON a.doc_id < b.doc_id)
      SELECT da, db, hamming FROM pairs WHERE hamming <= 3 ORDER BY da, db""")),

    // ------------------- image-text PAIR ASSEMBLY (LAION-style curation)
    // The multimodal-dataset step that composes the web and image
    // operators: pages yield (img src, alt caption) candidates via
    // Html.extractImages (clean-FIRST — the fixture plants a fake <img>
    // inside a <script>; both attribute orders occur; doc_id % 11 = 0
    // pages omit alt → '' pinned; the alt carries entities and the src
    // escapes & as &amp; per the HTML spec, so the visibility transform
    // is load-bearing on BOTH fields), the src canonicalizes against the
    // image store's clean spelling (the page spells it messy —
    // host-case, :443, utm params — so the equi-join only works POST-
    // canonicalization), and the image side dedups by REAL decoded-pixel
    // dHash: payload pixels derive from seed = doc_id % 37, so ~1/37 of
    // the store is re-hosted duplicates — a re-hosted image under a
    // DIFFERENT caption resolves to the same canon_img (the verdict's
    // target case). The oracle models the hash grouping by seed (md5-
    // derived pixels: distinct seeds ⇒ distinct dHashes — if that ever
    // collided, groups would merge and n_copies would hash-mismatch, so
    // the oracle ASSERTS injectivity rather than assuming it) and
    // replays the extraction twin for the captions.
    //
    // Plan at 100 TB: extraction/canonicalization are per-row codegen;
    // the hash relation stages once (it feeds the canon aggregate AND
    // the pair join); all joins are equi-joins on short keys (canonical
    // url, 64-bit hash, id) — pages and payloads never pair
    // quadratically.
    Q("x_multimodal_pairs", (s, d) => {
      import s.implicits._
      import graft.operators.{Html, ImageDedup, Web}
      val docs = fanOut(documents(s, d)).select(col("doc_id"))
      val pages = docs
        .withColumn("__u", expr(
          """concat('https://IMG.Host', CAST(doc_id % 7 AS STRING),
            |'.COM:443/i/', CAST(doc_id AS STRING),
            |'.png?utm_source=feed&amp;v=1')""".stripMargin))
        .withColumn("__a", expr(
          """IF(doc_id % 11 = 0, '',
            |   concat('alt="Fig &#8212; ', CAST(doc_id AS STRING),
            |          ' &amp; caption"'))""".stripMargin))
        .withColumn("__html", expr(
          """concat('<html><head><script>var f = "<img src="https://evil.example/x.png">";</script>',
            |'</head><body><p>body text</p><img ',
            |IF(doc_id % 2 = 0,
            |   concat('src="', __u, '" ', __a),
            |   concat(__a, ' src="', __u, '"')),
            |'/></body></html>')""".stripMargin))
      val ex = Web.withCanonicalUrl(
        Html.extractImages(pages, "doc_id", "__html"), "src", "curl")
      val imgUrls = Web.withCanonicalUrl(
        docs.withColumn("__iu", expr(
          """concat('https://img.host', CAST(doc_id % 7 AS STRING),
            |'.com/i/', CAST(doc_id AS STRING), '.png?v=1')""".stripMargin)),
        "__iu", "icurl")
        .select(col("doc_id").as("img_id"), col("icurl"))
      val recs = docs.as[Long].map { id =>
        val seed = id % 37
        MediaRecord(id, "png", Media.encodePng(12, 12, (x, y) => {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"mmp:$seed:$x:$y".getBytes("UTF-8"))
          val g = java.lang.Byte.toUnsignedInt(h(0))
          (g << 16) | (g << 8) | g
        }))
      }
      // staged: the hash relation feeds the canon aggregate AND the join.
      val hashes = stage(ImageDedup.dhashRelation(recs))
      val canon = hashes.groupBy(col("h")).agg(
        min(col("id")).as("canon_img"),
        count(lit(1)).cast("long").as("n_copies"))
      ex.join(imgUrls, col("curl") === col("icurl"))
        .join(hashes, col("img_id") === col("id"))
        .join(canon, Seq("h"))
        .select(col("doc_id"), col("canon_img"),
          col("alt").as("caption"), col("n_copies"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH d AS (SELECT doc_id FROM documents),
      __img_src AS (
        SELECT doc_id,
          '<html><head><script>var f = "<img src="https://evil.example/x.png">";</script>' ||
          '</head><body><p>body text</p><img ' ||
          CASE WHEN doc_id % 2 = 0
               THEN 'src="' || u || '" ' || a
               ELSE a || ' src="' || u || '"' END ||
          '/></body></html>' AS h
        FROM (SELECT doc_id,
                'https://IMG.Host' || CAST(doc_id % 7 AS VARCHAR) ||
                '.COM:443/i/' || CAST(doc_id AS VARCHAR) ||
                '.png?utm_source=feed&amp;v=1' AS u,
                CASE WHEN doc_id % 11 = 0 THEN ''
                     ELSE 'alt="Fig &#8212; ' || CAST(doc_id AS VARCHAR) ||
                          ' &amp; caption"' END AS a
              FROM d)),
      ex AS (${graft.operators.Html.duckImageItems("h")}),
      grp AS (SELECT doc_id, doc_id % 37 AS seed FROM d),
      canon AS (SELECT seed, MIN(doc_id) AS canon_img,
                       CAST(COUNT(*) AS BIGINT) AS n_copies
                FROM grp GROUP BY seed)
      SELECT e.doc_id, c.canon_img, e.alt AS caption, c.n_copies
      FROM ex e
      JOIN grp g ON e.doc_id = g.doc_id
      JOIN canon c ON g.seed = c.seed
      ORDER BY e.doc_id"""), headline = true),

    // ------------------- WARC image archive → perceptual dedup
    // The multimodal half of the archive layer: image payloads ride
    // WARC response records as RAW BYTES (Content-Length-bounded —
    // \r\n\r\n inside a PNG is data, never a separator), round-trip
    // through Warc.writeBinary/read bit-exactly (bytes_ok compares
    // md5 against the pre-archive original ENGINE-side; the oracle
    // states 1 — the x_source_jsonl flag design), and feed dHash dedup
    // directly off the parsed relation. Payload pixels derive from
    // seed = doc_id % 37 (the x_multimodal_pairs bijection, fresh
    // salt), so the oracle models the hash grouping by seed — a
    // collision would merge groups and hash-mismatch n_copies.
    // Plan: parse = one task per archive file; the hash relation
    // stages once (feeds the canon aggregate AND the output join);
    // equi-joins on 64-bit hashes and ids only.
    Q("x_warc_images", (s, d) => {
      import s.implicits._
      import graft.operators.ImageDedup
      val imgs = fanOut(documents(s, d)).select(col("doc_id")).as[Long]
        .map { id =>
          val seed = id % 37
          (id, s"https://img.archive.example/i/$id.png",
            Media.encodePng(12, 12, (x, y) => {
              val h = java.security.MessageDigest.getInstance("MD5")
                .digest(s"wmi:$seed:$x:$y".getBytes("UTF-8"))
              val g = java.lang.Byte.toUnsignedInt(h(0))
              (g << 16) | (g << 8) | g
            }))
        }.toDF("doc_id", "url", "payload")
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_img/${new java.io.File(d).getName}"
      graft.sources.Warc.writeBinary(imgs, "url", "payload", "image/png",
        tmp, files = 4)
      val back = graft.sources.Warc.read(s, tmp)
        .filter(col("http_content_type") === "image/png")
        .withColumn("doc_id", expr(
          "CAST(split_part(split_part(target_uri, '/i/', 2), '.png', 1) AS BIGINT)"))
      val flags = back.select(col("doc_id"), md5(col("body")).as("__bm"))
        .join(imgs.select(col("doc_id"), md5(col("payload")).as("__pm")),
          Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST(CASE WHEN __bm <=> __pm THEN 1 ELSE 0 END AS BIGINT)")
            .as("bytes_ok"))
      val recs = back.select(col("doc_id"), col("body"))
        .as[(Long, Array[Byte])]
        .map { case (id, b) => MediaRecord(id, "png", b) }
      val hashes = stage(ImageDedup.dhashRelation(recs))
      val canon = hashes.groupBy(col("h")).agg(
        min(col("id")).as("canon_img"),
        count(lit(1)).cast("long").as("n_copies"))
      hashes.join(canon, Seq("h"))
        .select(col("id").as("doc_id"), col("canon_img"), col("n_copies"))
        .join(flags, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH grp AS (SELECT doc_id, doc_id % 37 AS seed FROM documents),
      canon AS (SELECT seed, MIN(doc_id) AS canon_img,
                       CAST(COUNT(*) AS BIGINT) AS n_copies
                FROM grp GROUP BY seed)
      SELECT g.doc_id, c.canon_img, c.n_copies, CAST(1 AS BIGINT) AS bytes_ok
      FROM grp g JOIN canon c ON g.seed = c.seed
      ORDER BY g.doc_id"""))
  )
}
