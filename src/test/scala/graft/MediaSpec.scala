package graft

import graft.operators.{MediaRecord, Media}

class MediaSpec extends SparkSpec {

  test("typed media pipeline: Dataset[MediaRecord] -> Dataset[MediaFeatures]") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "jpeg", "hello-media-bytes".getBytes("UTF-8")),
      MediaRecord(2L, "png", Array.fill[Byte](64)(7))))
    val out = Media.extractFeatures(ds).collect().sortBy(_.id)
    assert(out.length == 2)
    val a = out(0)
    assert(a.byteLen == 17)
    assert(a.sha256.length == 64 && a.sha256.matches("[0-9a-f]+"))
    // neither payload has a parseable header or a decodable stream —
    // the undecodable sentinel, never a synthesized dimension.
    assert(a.width == -1 && a.height == -1)
    assert(out(1).width == -1 && out(1).height == -1)
    assert(a.frameSample.length == Media.FrameBytes)
  }

  test("REAL header parsing: JPEG marker walk, PNG IHDR, GIF descriptor") {
    // the JPEG builder inserts APP0 + DQT segments BEFORE SOF0: a parser
    // that reads a fixed offset instead of walking markers fails here.
    assert(Media.jpegDimensions(Media.jpegBytes(641, 480)) == Some((641, 480)))
    assert(Media.pngDimensions(Media.pngBytes(1920, 1080)) == Some((1920, 1080)))
    assert(Media.gifDimensions(Media.gifBytes(320, 200)) == Some((320, 200)))
    // dispatch by magic, regardless of the caller's format label.
    assert(Media.headerDimensions(Media.jpegBytes(7, 9)) == Some((7, 9)))
    assert(Media.headerDimensions(Media.pngBytes(7, 9)) == Some((7, 9)))
    assert(Media.headerDimensions(Media.gifBytes(7, 9)) == Some((7, 9)))
    // content after the header does not disturb the parse.
    assert(Media.pngDimensions(
      Media.pngBytes(33, 44, Array.fill[Byte](100)(1))) == Some((33, 44)))
    // truncated and corrupt payloads are None, never garbage or a throw.
    assert(Media.jpegDimensions(Media.jpegBytes(641, 480).take(20)).isEmpty)
    assert(Media.jpegDimensions(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0)).isEmpty)
    assert(Media.pngDimensions("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(Media.headerDimensions(Array.empty[Byte]).isEmpty)
    // SOS (scan data) before any SOF aborts the walk.
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 1, 2).map(_.toByte)
    assert(Media.jpegDimensions(sosFirst).isEmpty)
    // a corrupt SOF whose declared length (< 7) cannot hold the dimension
    // fields must be None even when TRAILING bytes exist in the buffer —
    // not garbage dimensions read from the next segment's bytes.
    val shortSof = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x03, 0x08).map(_.toByte) ++
      Array(0xff, 0xdb, 0x00, 0x06, 0, 1, 2, 3).map(_.toByte) ++
      Array(0xff, 0xd9).map(_.toByte)
    assert(Media.jpegDimensions(shortSof).isEmpty)
  }

  test("extractFeatures uses the real parse for recognized containers") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "jpeg", Media.jpegBytes(800, 600)),
      MediaRecord(2L, "png", Media.pngBytes(1024, 768)),
      MediaRecord(3L, "gif", Media.gifBytes(99, 66)),
      MediaRecord(4L, "bin", "no header here".getBytes("UTF-8"))))
    val out = Media.extractFeatures(ds).collect().sortBy(_.id)
    assert((out(0).width, out(0).height) == (800, 600))
    assert((out(1).width, out(1).height) == (1024, 768))
    assert((out(2).width, out(2).height) == (99, 66))
    // unrecognized payloads report the undecodable sentinel.
    assert((out(3).width, out(3).height) == (-1, -1))
  }

  test("REAL pixel decode: ImageIO round-trips an encoded gradient exactly") {
    val w = 13; val h = 11
    def rgb(x: Int, y: Int): Int =
      (((x * 3 + y * 5) % 256) << 16) | (((x * 7 + y) % 256) << 8) | ((x + y * 11) % 256)
    val p = Media.decodePixels(Media.encodePng(w, h, rgb)).get
    assert((p.width, p.height) == (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert((p.argb(y * w + x) & 0xffffff) == rgb(x, y), s"pixel ($x,$y)")
    // a full decode also yields dimensions for containers the header walk
    // does not cover (decodeBatch's second chance) — and garbage is None.
    assert(Media.decodePixels("garbage".getBytes("UTF-8")).isEmpty)
  }

  test("dhash64: exact grid arithmetic, locality, and edge sensitivity") {
    // constant image: every cell equal -> no '<' comparison fires -> 0L.
    assert(Media.dhash64(Media.encodePng(16, 16, (_, _) => 0x808080)) ==
      Some(0L))
    // strictly increasing luma left-to-right: every comparison fires.
    assert(Media.dhash64(Media.encodePng(18, 16, (x, _) => {
      val v = x * 14; (v << 16) | (v << 8) | v
    })) == Some(-1L)) // all 64 bits set
    // too small for the 9x8 grid, or undecodable: None.
    assert(Media.dhash64(Media.encodePng(8, 8, (_, _) => 0)).isEmpty)
    assert(Media.dhash64("nope".getBytes("UTF-8")).isEmpty)
    // locality: a small perturbation moves few bits; an unrelated
    // gradient moves many.
    def grad(seed: Int)(x: Int, y: Int): Int = {
      val v = (x * 17 + y * 29 + seed * 37) % 256
      (v << 16) | (v << 8) | v
    }
    val a = Media.dhash64(Media.encodePng(16, 16, grad(1))).get
    val tweaked = Media.dhash64(Media.encodePng(16, 16, (x, y) =>
      if (x == 0 && y == 0) grad(1)(x, y) ^ 0x040404 else grad(1)(x, y))).get
    // different spatial structure (not a constant luma offset, which
    // dHash is deliberately invariant to): different multipliers.
    val other = Media.dhash64(Media.encodePng(16, 16, (x, y) => {
      val v = (x * 53 + y * 7 + 101) % 256
      (v << 16) | (v << 8) | v
    })).get
    assert(java.lang.Long.bitCount(a ^ tweaked) <= 3)
    assert(java.lang.Long.bitCount(a ^ other) > 3)
  }

  test("REAL WAV parse: RIFF chunk walk, PCM stats, corrupt streams are None") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 5)
    val wav = Media.wavBytes(44100, samples)
    // the builder embeds a LIST chunk between fmt and data — a parser
    // that assumes data at a fixed offset fails here.
    assert(Media.wavInfo(wav) == Some(Media.WavInfo(1, 44100, 16, 6)))
    val (n, sumAbs, maxAbs, sumSq) = Media.pcmStats(wav).get
    assert(n == 6 && sumAbs == 0L + 100 + 100 + 32767 + 32768 + 5)
    assert(maxAbs == 32768)
    assert(sumSq == samples.map(s => s.toLong * s).sum)
    // stereo: sample count divides by channels.
    assert(Media.wavInfo(Media.wavBytes(8000, samples, channels = 2))
      .get.nSamples == 3)
    // truncated data chunk, non-RIFF, and declared-size overrun → None.
    assert(Media.wavInfo(wav.dropRight(4)).isEmpty)
    assert(Media.wavInfo("not audio".getBytes("UTF-8")).isEmpty)
    // non-PCM audioFormat (IEEE float = 3) is rejected, not misread.
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Media.wavInfo(nonPcm).isEmpty)
    assert(Media.pcmStats(nonPcm).isEmpty)
  }

  test("audioFingerprint64: volume invariance, locality, degenerate streams") {
    def wav(f: Int => Int): Array[Byte] = Media.wavBytes(8000,
      Array.tabulate(260)(i => f(i).toShort))
    def base(i: Int): Int = (i * 11 + 5) % 16384 - 8192
    val h = Media.audioFingerprint64(wav(base)).get
    // scaling every sample (re-mastered volume) keeps the fingerprint.
    assert(Media.audioFingerprint64(wav(i => base(i) * 3)) == Some(h))
    assert(Media.audioFingerprint64(wav(i => base(i) / 2)) != None)
    // an edit confined to the first window moves at most 2 bits
    // (energies 0..1 → comparisons (0,1) and (1,2)).
    val edited = Media.audioFingerprint64(
      wav(i => if (i < 4) base(i) + 500 else base(i))).get
    assert(java.lang.Long.bitCount(h ^ edited) <= 2)
    // a different signal lands well past the dedup budget (measured 9).
    val other = Media.audioFingerprint64(wav(i => (i * 37 + 9) % 16384 - 8192)).get
    assert(java.lang.Long.bitCount(h ^ other) > 3)
    // fewer than 65 samples, or not a WAV: None.
    assert(Media.audioFingerprint64(
      Media.wavBytes(8000, Array.fill[Short](64)(1))).isEmpty)
    assert(Media.audioFingerprint64("nope".getBytes("UTF-8")).isEmpty)
  }

  test("audioShingles64: trimmed and re-volumed copies are contained; aligned fingerprint breaks on trim") {
    // md5-derived per-window amplitude (constant per 4-sample window, even
    // so /2 is exact) — neighbor comparisons are structurally independent
    // across windows (the affine-formula trap, see x_dedup_audio).
    def amp(w: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"trimfix:$w".getBytes("UTF-8"))
      val h16 = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
      (h16 % 8192 - 4096) * 2
    }
    def wav(off: Int, windows: Int, f: Int => Int = identity): Array[Byte] =
      Media.wavBytes(8000,
        Array.tabulate(windows * 4)(i => f(amp(i / 4 + off)).toShort))
    val full = Media.audioShingles64(wav(0, 130), win = 4, hop = 4).get
    // front-trim by 8 whole hops: every surviving shingle is in the full
    // set (containment 1.0 from the trimmed side).
    val trimmed = Media.audioShingles64(wav(8, 122), win = 4, hop = 4).get
    assert(trimmed.toSet.subsetOf(full.toSet) && trimmed.length >= 50)
    assert(full.toSet.intersect(trimmed.toSet).size == trimmed.toSet.size)
    // trim + exact half volume together: still fully contained.
    val halved = Media.audioShingles64(wav(4, 126, _ / 2), win = 4, hop = 4).get
    assert(halved.toSet.subsetOf(full.toSet))
    // the ALIGNED fingerprint loses the same trimmed copy — the gap this
    // operator exists for (length-relative windows shift under trimming).
    val hFull = Media.audioFingerprint64(wav(0, 130)).get
    val hTrim = Media.audioFingerprint64(wav(8, 122)).get
    assert(java.lang.Long.bitCount(hFull ^ hTrim) > 3)
    // a different signal shares (essentially) nothing.
    def amp2(w: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"otherfix:$w".getBytes("UTF-8"))
      (((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096) * 2
    }
    val other = Media.audioShingles64(Media.wavBytes(8000,
      Array.tabulate(130 * 4)(i => amp2(i / 4).toShort)), win = 4, hop = 4).get
    assert(full.toSet.intersect(other.toSet).size < 3)
    // too short for 65 contour bits: None.
    assert(Media.audioShingles64(wav(0, 64), win = 4, hop = 4).isEmpty)
  }

  test("audioCdcChunks: ARBITRARY trims contained where the window grid provably loses them") {
    // md5-derived per-SAMPLE amplitudes — CDC anchors at sample level.
    def amp(i: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"cdcfix:$i".getBytes("UTF-8"))
      (((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096)
    }
    def wav(off: Int, n: Int): Array[Byte] =
      Media.wavBytes(8000, Array.tabulate(n)(i => amp(i + off).toShort))
    val full = Media.audioCdcChunks(wav(0, 520)).get
    // a 37-sample front trim is a multiple of NOTHING (w=8, divisor=32):
    // every interior boundary is content-local, so at most the head chunk
    // differs — all other trimmed-side keys are in the full set.
    val trimmed = Media.audioCdcChunks(wav(37, 483)).get
    val lost = trimmed.toSet -- full.toSet
    assert(lost.size <= 1, s"non-head chunks changed under trim: $lost")
    assert(trimmed.toSet.intersect(full.toSet).size >= trimmed.length - 1)
    assert(full.length >= 8, s"fixture degenerate: ${full.length} chunks")
    // both-end trim (13 front + 29 back): at most head AND tail damaged.
    val both = Media.audioCdcChunks(wav(13, 478)).get
    assert((both.toSet -- full.toSet).size <= 2)
    // the GRID shingles lose the same copy — the gap CDC exists for.
    val gridFull = Media.audioShingles64(wav(0, 520), win = 4, hop = 4).get
    val gridTrim = Media.audioShingles64(wav(37, 483), win = 4, hop = 4).get
    assert(gridFull.toSet.intersect(gridTrim.toSet).size < gridTrim.length / 4,
      "fixed-grid shingles unexpectedly survived a non-hop-aligned trim")
    // a different signal shares nothing; too-short and non-PCM are None.
    def amp2(i: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"cdcother:$i".getBytes("UTF-8"))
      (((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096)
    }
    val other = Media.audioCdcChunks(Media.wavBytes(8000,
      Array.tabulate(520)(i => amp2(i).toShort))).get
    assert(full.toSet.intersect(other.toSet).isEmpty)
    assert(Media.audioCdcChunks(wav(0, 4)).isEmpty)
    assert(Media.audioCdcChunks(Array.fill[Byte](64)(7)).isEmpty)
  }

  test("audioShinglesRate: resampled copies identical where sample-count windows provably lose them") {
    // window-constant md5-derived amplitudes at two rates: the 16 kHz
    // original holds each amplitude for 4 samples, its exact 2×
    // decimation at 8 kHz for 2 — same signal, same time windows.
    def amp(w: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"ratefix:$w".getBytes("UTF-8"))
      (((dig(0) & 0xff) << 8 | (dig(1) & 0xff)) % 8192 - 4096) * 2
    }
    def wav(rate: Int, perWin: Int, off: Int, windows: Int,
            f: Int => Int = identity): Array[Byte] =
      Media.wavBytes(rate,
        Array.tabulate(windows * perWin)(i => f(amp(i / perWin + off)).toShort))
    val hi = wav(16000, 4, 0, 130)
    val lo = wav(8000, 2, 0, 130)
    // time-normalized grid (1/4000 s hops): identical shingle sets.
    val shHi = Media.audioShinglesRate(hi, hopsPerSec = 4000).get
    val shLo = Media.audioShinglesRate(lo, hopsPerSec = 4000).get
    assert(shHi.toSet == shLo.toSet && shHi.length >= 60)
    // ...where the SAMPLE-sized grid provably loses the pair: 4-sample
    // windows on the 8 kHz copy span two time windows each.
    val fixedLo = Media.audioShingles64(lo, win = 4, hop = 4).get
    assert(Media.audioShingles64(hi, win = 4, hop = 4).get
      .toSet.intersect(fixedLo.toSet).size < 3)
    // composes with the trim + volume contracts, rate-independently:
    // 8 kHz + 6-hop front-trim + half volume stays fully contained.
    val cut = Media.audioShinglesRate(
      wav(8000, 2, 6, 124, _ / 2), hopsPerSec = 4000).get
    assert(cut.toSet.subsetOf(shHi.toSet) && cut.length >= 55)
    // a rate the hop grid cannot align to is refused, not mis-hashed.
    assert(Media.audioShinglesRate(wav(11025, 4, 0, 130), hopsPerSec = 4000).isEmpty)
  }

  test("corrupt container fields are None, never a crash or forged value") {
    // WAV declaring 4 bits per sample: the bytes-per-sample divisor
    // would be zero — must reject, not throw ArithmeticException.
    val wav = Media.wavBytes(8000, Array[Short](1, 2, 3))
    val subByte = wav.clone(); subByte(34) = 4; subByte(35) = 0
    assert(Media.wavInfo(subByte).isEmpty)
    assert(Media.pcmStats(subByte).isEmpty)
    // PNG with a dimension field >= 2^31 (reads negative as signed):
    // must be None — 0xFFFFFFFF would otherwise FORGE the (-1, -1)
    // undecodable sentinel.
    val png = Media.pngBytes(10, 10)
    val hugeDims = png.clone()
    for (k <- 16 until 24) hugeDims(k) = 0xff.toByte
    assert(Media.pngDimensions(hugeDims).isEmpty)
    assert(Media.pngDimensions(png.clone()).contains((10, 10)))
    // AVI movi sub-chunk declaring a size near 2^31: the bounds check
    // must not overflow into a crash.
    val avi = Media.aviBytes(Seq(Array[Byte](1, 2, 3, 4)), 8, 8)
    // locate the '00dc' chunk and corrupt its declared size.
    val idx = (0 until avi.length - 4).find(k =>
      avi(k) == '0' && avi(k + 1) == '0' && avi(k + 2) == 'd' && avi(k + 3) == 'c').get
    val hugeChunk = avi.clone()
    hugeChunk(idx + 4) = 0xf0.toByte; hugeChunk(idx + 5) = 0xff.toByte
    hugeChunk(idx + 6) = 0xff.toByte; hugeChunk(idx + 7) = 0x7f.toByte
    assert(Media.aviVideoFrames(hugeChunk).isEmpty)
  }

  test("REAL AVI demux: header, frame chunks, pad bytes, non-video skip") {
    val f0 = Array[Byte](1, 2, 3)          // odd size → RIFF pad byte
    val f1 = Array[Byte](4, 5, 6, 7)
    val avi = Media.aviBytes(Seq(f0, f1), 640, 480, microSecPerFrame = 40000)
    assert(Media.aviInfo(avi) == Some(Media.AviInfo(40000, 2, 640, 480)))
    val frames = Media.aviVideoFrames(avi).get
    assert(frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq, "odd-size frame must round-trip (pad honored)")
    assert(frames(1).toSeq == f1.toSeq)
    // a hand-built movi with an interleaved AUDIO chunk ('01wb') — the
    // demux must skip it by size, not absorb it as a frame.
    def le4(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, body: Array[Byte]) =
      cc.getBytes("US-ASCII") ++ le4(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", f0) ++ chunk("01wb", Array[Byte](9, 9)) ++ chunk("00dc", f1))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++
      chunk("avih", le4(33333) ++ le4(0) ++ le4(0) ++ le4(0) ++ le4(2) ++
        le4(0) ++ le4(2) ++ le4(0) ++ le4(8) ++ le4(8) ++ Array.fill[Byte](16)(0)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val mixed = "RIFF".getBytes("US-ASCII") ++ le4(body.length) ++ body
    assert(Media.aviVideoFrames(mixed).get.map(_.toSeq) == Vector(f0.toSeq, f1.toSeq))
    // corrupt streams are None, not garbage.
    assert(Media.aviInfo(avi.take(20)).isEmpty)
    assert(Media.aviVideoFrames("not a video".getBytes("UTF-8")).isEmpty)
    // MJPEG composition: demuxed frames are REAL JPEGs the marker walk reads.
    val mjpeg = Media.aviBytes(
      Seq(Media.jpegBytes(111, 222), Media.jpegBytes(33, 44)), 111, 222)
    val dims = Media.aviVideoFrames(mjpeg).get.map(Media.headerDimensions)
    assert(dims == Vector(Some((111, 222)), Some((33, 44))))
  }

  test("sampleVideoFrames keeps every k-th demuxed frame with its index") {
    import spark.implicits._
    val frames = (0 until 5).map(i => Media.jpegBytes(10 + i, 20 + i))
    val ds = spark.createDataset(Seq(
      MediaRecord(7L, "avi", Media.aviBytes(frames, 10, 20)),
      MediaRecord(8L, "bin", "not a container".getBytes("UTF-8"))))
    val got = Media.sampleVideoFrames(ds, everyK = 2).collect().sortBy(_.frameIdx)
    assert(got.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(got.forall(_.id == 7L), "unparseable payloads must emit nothing")
    assert(Media.headerDimensions(got(1).payload) == Some((12, 22)))
  }

  test("decode runs per-partition (mapPartitions), preserving distribution") {
    import spark.implicits._
    val ds = spark.createDataset(
      (1L to 100L).map(i => MediaRecord(i, "webp", Array.fill[Byte](8)(i.toByte))))
      .repartition(4)
    val out = Media.extractFeatures(ds)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == 100)
  }

  test("frameSample keeps every k-th fixed-size frame with its index") {
    import spark.implicits._
    // 40-byte payload, 8-byte frames -> indices 0..4; everyK=2 -> 0,2,4.
    val payload = Array.tabulate(40)(_.toByte)
    val ds = spark.createDataset(Seq(MediaRecord(7L, "mp4", payload)))
    val frames = Media.frameSample(ds, frameBytes = 8, everyK = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.id == 7L))
    assert(frames(1).payload.toSeq == payload.slice(16, 24).toSeq)
  }

  test("videoFrameDigestSets: remux-invariant, trim is a subset, junk is empty") {
    import spark.implicits._
    val frames = (0 until 4).map(f => Media.jpegBytes(40 + f, 30 + f))
    val ds = spark.createDataset(Seq(
      MediaRecord(0L, "avi", Media.aviBytes(frames, 100, 80)),
      // same frames, different fps → different container bytes.
      MediaRecord(1L, "avi", Media.aviBytes(frames, 100, 80, microSecPerFrame = 40000)),
      // trimmed cut: first two frames dropped.
      MediaRecord(2L, "avi", Media.aviBytes(frames.drop(2), 100, 80)),
      MediaRecord(3L, "avi", Array.fill[Byte](64)(0x55))))
    val sets = Media.videoFrameDigestSets(ds).collect().map(r => r.id -> r.sh).toMap
    assert(sets(0L).size == 4 && sets(0L) == sets(0L).distinct.sorted)
    assert(sets(1L) == sets(0L), "re-muxed copy must share every frame digest")
    assert(sets(2L).size == 2 && sets(2L).forall(sets(0L).contains),
      "trimmed cut must be a digest subset")
    assert(sets(3L).isEmpty, "unparseable payload must yield an empty set")
  }

  // ---- shared staircase fixture machinery for the perceptual video path
  // (the exact construction x_dedup_video_percept's oracle replays): gray
  // 8×8-px flat cells, 5 levels × 60 gray apart, level = (gx + t) % 5
  // with t an md5-derived per-row offset — adjacent cells always differ
  // by ≥ 60 gray (≫ JPEG error), so the dHash is a closed-form function
  // of (base, f) at ANY encode quality.
  private def rowOffset(base: Long, f: Int, gy: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    ((md.digest(s"$base:$f:$gy".getBytes("US-ASCII"))(0) >> 4) & 0xf) % 5
  }
  private def closedFormDhash(base: Long, f: Int): Long = {
    var h = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      h = (h << 1) | (if ((gx + rowOffset(base, f, gy)) % 5 != 4) 1L else 0L)
    h
  }
  private def staircaseJpeg(base: Long, f: Int, q: Float): Array[Byte] =
    Media.encodeJpeg(72, 64, q, (x, y) => {
      val g = ((x / 8 + rowOffset(base, f, y / 8)) % 5) * 60
      (g << 16) | (g << 8) | g
    })

  test("encodeJpeg staircase: dHash is quality-invariant and closed-form exact") {
    for (base <- 0L until 25L; f <- 0 until 3; q <- Seq(0.45f, 0.7f, 0.9f)) {
      val got = Media.dhash64(staircaseJpeg(base, f, q))
      assert(got == Some(closedFormDhash(base, f)),
        s"dHash flip at base=$base f=$f q=$q: got=$got want=${closedFormDhash(base, f)}")
    }
  }

  test("videoPerceptualDigestSets catches re-encodes where byte digests provably lose them") {
    val nf = 5
    def video(id: Long, base: Long, drop: Int, q: Float) = MediaRecord(id, "avi",
      Media.aviBytes((drop until nf).map(staircaseJpeg(base, _, q)), 72, 64))
    val ds = spark.createDataset(Seq(
      video(0L, 7L, 0, 0.9f),   // original
      video(1L, 7L, 0, 0.45f),  // lossy re-encode — zero shared bytes
      video(2L, 7L, 2, 0.7f),   // trimmed re-encode
      video(3L, 8L, 0, 0.9f)))( // different content
      org.apache.spark.sql.Encoders.product[MediaRecord])
    // byte digests: the re-encoded copies share NO frame digest with the
    // original — the byte-level operator finds nothing to pair.
    val byteSets = Media.videoFrameDigestSets(ds).collect()
      .map(r => r.id -> r.sh.toSet).toMap
    assert(byteSets(0L).intersect(byteSets(1L)).isEmpty &&
      byteSets(0L).intersect(byteSets(2L)).isEmpty,
      "lossy re-encode must break every byte digest (else this fixture proves nothing)")
    // perceptual digests: re-encode preserves every frame hash; the trim
    // is a strict subset; different content shares nothing.
    val p = Media.videoPerceptualDigestSets(ds).collect()
      .map(r => r.id -> r.sh.toSet).toMap
    assert(p(0L) == p(1L), "re-encode must preserve the perceptual digest set")
    assert(p(2L).subsetOf(p(0L)) && p(2L).size == nf - 2,
      "trimmed re-encode must be a perceptual subset")
    assert(p(0L).intersect(p(3L)).isEmpty, "different content must not collide")
    // end-to-end: containment flags exactly the three within-group pairs.
    val pairs = graft.operators.TextDedup.containmentPairs(
      Media.videoPerceptualDigestSets(ds).toDF(), threshold = 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"pairs: $pairs")
  }
}
