package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}

/** One multimodal record: an opaque media payload + typed metadata.
  * Mirrors how a 100 TB training pipeline carries images/audio/video:
  * `binary` column, never decoded until a feature-extraction stage. */
final case class MediaRecord(id: Long, format: String, payload: Array[Byte])

/** Decoded/extracted features for one record. */
final case class MediaFeatures(
    id: Long, format: String, byteLen: Int, sha256: String,
    width: Int, height: Int, frameSample: Array[Byte])

/** Typed media feature-extraction pipeline.
  *
  * Everything here is REAL:
  *   - [[Media.headerDimensions]] walks JPEG markers to the SOF frame
  *     header and reads PNG IHDR / GIF logical screen descriptors —
  *     pure-JVM byte-walking over the binary column (works on payloads a
  *     full decoder would reject, e.g. header-only fixtures);
  *   - [[Media.decodePixels]] is a FULL pixel decode via the JDK's
  *     own `javax.imageio` (PNG/JPEG/GIF/BMP, headless, no external
  *     codec); [[extractPixelFeatures]] turns decoded pixels into exact
  *     integer channel/luma statistics, [[dhash64]] into a 64-bit
  *     perceptual difference hash, and [[resize]] performs true
  *     nearest-neighbor resampling with a lossless PNG re-encode;
  *   - payloads with neither a parseable header nor a decodable stream
  *     report sentinel dimensions (−1, −1) — quarantine routing, never a
  *     synthesized value.
  *
  * Spark plumbing shape (what a native-codec version would keep
  * unchanged):
  *   - `mapPartitions` so decoder state is initialized once per partition
  *     (not per row) and rows stream through in batches;
  *   - typed `Dataset[MediaRecord] → Dataset[MediaFeatures]` with product
  *     encoders (schema is explicit and stable);
  *   - all work executor-side; nothing is collected to the driver.
  *
  * At 100 TB: payloads dominate I/O, so the stage before this one should
  * project only (id, format, payload) — column pruning keeps sidecar
  * metadata out of the shuffle — and `spark.sql.files.maxPartitionBytes`
  * bounds decoder memory per task.
  */
object Media {

  // ImageIO's default decode path spools through a temp-file cache — pure
  // overhead for in-memory byte-array payloads, and disk-contention-prone
  // at 32 concurrent tasks. Static, thread-safe, process-wide.
  javax.imageio.ImageIO.setUseCache(false)

  val FrameBytes = 16

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** REAL (width, height) from a JPEG payload: walk the marker stream —
    * skipping variable-length segments (APPn, DQT, DHT, COM, …) by their
    * declared big-endian lengths and zero-length standalone markers
    * (RSTn, TEM) — to the first start-of-frame marker (SOF0–SOF15 except
    * the non-frame DHT/JPG/DAC codes C4/C8/CC), whose payload is
    * [precision, height:2, width:2, …]. None for truncated/corrupt
    * streams or when scan data (SOS) or EOI arrives before any SOF. */
  def jpegDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      // 0xFF fill bytes may pad between segments.
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0xd9 || marker == 0xda) return None
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // the SOF payload is [precision:1, height:2, width:2, …] — a
          // declared length under 7 cannot contain it, and without this
          // check a corrupt SOF would read the NEXT segment's bytes as
          // dimensions whenever the buffer happens to extend past it.
          if (len < 7 || i + 8 >= b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5)))
        }
        i += 2 + len
      }
    }
    None
  }

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL (width, height) from a PNG payload: the 8-byte signature must
    * be followed by the IHDR chunk (the spec requires it first), whose
    * data starts with big-endian width and height. The PNG spec caps
    * both at 2^31−1 and forbids 0 — a field outside that range is a
    * corrupt stream and must be None, not a negative dimension (which
    * could even forge the (−1, −1) undecodable sentinel). */
  def pngDimensions(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None

  /** REAL (width, height) from a GIF payload: GIF87a/GIF89a signature,
    * then the little-endian logical screen descriptor. */
  def gifDimensions(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** Dimensions by magic-number sniffing across the supported container
    * formats; None when the payload is none of them (or corrupt). */
  def headerDimensions(b: Array[Byte]): Option[(Int, Int)] =
    pngDimensions(b).orElse(gifDimensions(b)).orElse(jpegDimensions(b))

  /** A fully decoded image: dimensions + row-major ARGB pixels (the
    * packed ints `BufferedImage.getRGB` yields — alpha in the top byte,
    * then red, green, blue). */
  final case class Pixels(width: Int, height: Int, argb: Array[Int])

  /** REAL full pixel decode via the JDK's headless `javax.imageio`
    * (PNG/JPEG/GIF/BMP). None when no installed reader accepts the
    * stream (corrupt payloads, header-only fixtures, unknown formats) —
    * the quarantine route, never a synthesized image. PNG and BMP are
    * lossless, so an encode→decode round-trip reproduces pixels exactly
    * (the property every pixel oracle in graft.queries.Multimodal is
    * built on). */
  def decodePixels(b: Array[Byte]): Option[Pixels] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        Some(Pixels(w, h, px))
      }
    } catch { case _: Exception => None }

  /** Per-partition batch decode — the shape a native codec needs (init
    * once, stream rows). Dimensions come from the REAL header parse when
    * the payload carries a recognized container (cheap: no pixel work,
    * and it accepts header-only fixtures), else from a REAL full
    * `javax.imageio` decode (covers containers the header walk doesn't,
    * e.g. BMP), else the (−1, −1) undecodable sentinel. */
  def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    records.map { r =>
      val sha = MessageDigest.getInstance("SHA-256").digest(r.payload)
      val (w, h) = headerDimensions(r.payload)
        .orElse(decodePixels(r.payload).map(p => (p.width, p.height)))
        .getOrElse((-1, -1))
      MediaFeatures(
        id = r.id,
        format = r.format,
        byteLen = r.payload.length,
        sha256 = sha.map("%02x".format(_)).mkString,
        width = w,
        height = h,
        frameSample = r.payload.take(FrameBytes))
    }
  }

  /** Integer luma for one packed ARGB pixel: 2126·R + 7152·G + 722·B —
    * the BT.709 weights scaled by 10⁴ so everything stays in exact long
    * arithmetic (no FP, bit-identical across engines). */
  def luma(argb: Int): Long =
    2126L * ((argb >> 16) & 0xff) + 7152L * ((argb >> 8) & 0xff) +
      722L * (argb & 0xff)

  /** Exact per-image pixel statistics from a REAL decode. `decoded=false`
    * rows (no reader accepted the payload) carry −1 dims and zero sums. */
  final case class PixelStats(
      id: Long, format: String, width: Int, height: Int, pixCount: Long,
      sumR: Long, sumG: Long, sumB: Long, lumaSum: Long, decoded: Boolean)

  /** Dataset[MediaRecord] → Dataset[PixelStats]: full `javax.imageio`
    * decode + exact integer channel/luma sums, per-partition, all
    * executor-side. The sums are longs (a 2⁶⁴ overflow needs ~10¹⁶
    * pixels per image), so cross-engine comparison is exact. */
  def extractPixelFeatures(ds: Dataset[MediaRecord]): Dataset[PixelStats] =
    ds.mapPartitions(_.map { r =>
      decodePixels(r.payload) match {
        case Some(p) =>
          var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
          var i = 0
          while (i < p.argb.length) {
            val c = p.argb(i)
            sr += (c >> 16) & 0xff
            sg += (c >> 8) & 0xff
            sb += c & 0xff
            sl += luma(c)
            i += 1
          }
          PixelStats(r.id, r.format, p.width, p.height, p.argb.length.toLong,
            sr, sg, sb, sl, decoded = true)
        case None =>
          PixelStats(r.id, r.format, -1, -1, 0L, 0L, 0L, 0L, 0L, decoded = false)
      }
    })(Encoders.product[PixelStats])

  /** 64-bit perceptual difference hash (dHash) over REAL decoded pixels:
    * block-average the integer luma plane onto a 9×8 grid (cell (gx, gy)
    * covers pixels [⌊gx·w/9⌋, ⌊(gx+1)·w/9⌋) × [⌊gy·h/8⌋, ⌊(gy+1)·h/8⌋),
    * cell value = Σluma / area in integer division), then bit
    * p = gy·8 + gx (MSB-first) is 1 iff cell (gx, gy) < cell (gx+1, gy).
    * Every step is exact integer arithmetic — deterministic across
    * engines, which is what lets a SQL oracle recompute it from known
    * synthetic pixels. None when the image is undecodable or too small
    * to populate every grid cell (width < 9 or height < 8). */
  def dhash64(b: Array[Byte]): Option[Long] =
    decodePixels(b).flatMap { p =>
      if (p.width < 9 || p.height < 8) None
      else Some(dhashWindow(p, 0, 0, p.width, p.height))
    }

  /** The [[dhash64]] core over an arbitrary pixel WINDOW [wx, wx+ww) ×
    * [wy, wy+wh) of a decoded image — the building block of the
    * crop-robust tiled shingles ([[ImageDedup.dhashShingles]]). Same
    * exact integer arithmetic as the whole-image hash; callers must
    * ensure ww ≥ 9, wh ≥ 8 and the window lies inside the image. */
  def dhashWindow(p: Pixels, wx: Int, wy: Int, ww: Int, wh: Int): Long = {
    val grid = Array.ofDim[Long](9, 8)
    var gx = 0
    while (gx < 9) {
      val x0 = wx + gx * ww / 9; val x1 = wx + (gx + 1) * ww / 9
      var gy = 0
      while (gy < 8) {
        val y0 = wy + gy * wh / 8; val y1 = wy + (gy + 1) * wh / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(p.argb(y * p.width + x)); x += 1 }
          y += 1
        }
        grid(gx)(gy) = s / ((x1 - x0).toLong * (y1 - y0))
        gy += 1
      }
      gx += 1
    }
    var h = 0L
    var gy = 0
    while (gy < 8) {
      var x = 0
      while (x < 8) {
        h = (h << 1) | (if (grid(x)(gy) < grid(x + 1)(gy)) 1L else 0L)
        x += 1
      }
      gy += 1
    }
    h
  }

  private def be2(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be4(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Structurally-real minimal PNG: signature + IHDR (8-bit RGBA, zeroed
    * CRC) + optional trailing content. Fixture builder for specs and the
    * `x_media_dimensions` oracle (its length is part of the contract). */
  def pngBytes(w: Int, h: Int, content: Array[Byte] = Array.empty): Array[Byte] =
    PngSig ++ be4(13) ++ "IHDR".getBytes("US-ASCII") ++ be4(w) ++ be4(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be4(0) ++ content

  /** Structurally-real minimal JPEG: SOI, an APP0/JFIF segment and a DQT
    * stub (so parsers must actually WALK segments), SOF0 (8-bit grayscale)
    * carrying the dimensions, EOI. */
  def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xe0).map(_.toByte) ++ be2(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
      Array(0xff, 0xdb).map(_.toByte) ++ be2(6) ++ Array[Byte](0, 1, 2, 3) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be2(11) ++
      // SOF0 payload: precision, h:2, w:2, ncomp=1, then per-component
      // (id, sampling, quant table) — 9 bytes, declared length 11
      // (the length field counts itself).
      (Array[Byte](8) ++ be2(h) ++ be2(w) ++ Array[Byte](1, 1, 0x11, 0)) ++
      Array(0xff, 0xd9).map(_.toByte)

  /** Structurally-real minimal GIF89a: signature + logical screen
    * descriptor + trailer. */
  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte) ++
      Array[Byte](0, 0, 0, 0x3b)

  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions(decodeBatch)(Encoders.product[MediaFeatures])

  /** REAL resize: full decode, exact nearest-neighbor resampling
    * (source pixel (⌊x·srcW/w⌋, ⌊y·srcH/h⌋) — integer arithmetic, fully
    * deterministic, unlike interpolating scalers whose FP rounding is
    * implementation-defined), lossless PNG re-encode. Undecodable
    * payloads pass through unchanged (the quarantine route — dropping
    * them silently would hide data loss). */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    require(w > 0 && h > 0, s"w=$w h=$h")
    ds.mapPartitions(_.map { r =>
      decodePixels(r.payload) match {
        case Some(p) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val sy = y * p.height / h
            var x = 0
            while (x < w) {
              img.setRGB(x, y, p.argb(sy * p.width + x * p.width / w) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          r.copy(payload = bos.toByteArray)
        case None => r
      }
    })(Encoders.product[MediaRecord])
  }

  /** Encode a REAL PNG from a pixel function ((x, y) → packed 24-bit
    * RGB) via `javax.imageio` — the fixture builder behind the pixel
    * oracles: PNG is lossless, so the engine's decode must reproduce
    * exactly the pixels stated here, which a SQL oracle can restate in
    * closed form. */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a REAL JPEG from a pixel function at an explicit compression
    * quality — the fixture builder behind the RE-ENCODE-robust
    * perceptual oracles. JPEG is LOSSY, so unlike [[encodePng]] the
    * decoded pixels are NOT bitwise the stated ones; fixtures built here
    * must keep every decision margin (adjacent dHash cell separation)
    * far above the codec's worst-case error. The safe construction, used
    * by `x_dedup_video_percept`: gray 8×8-pixel-aligned flat cells (one
    * JPEG DCT block each — flat blocks survive as a quantized DC
    * coefficient, error ≲ ±10 gray levels even at quality 0.45) with
    * ≥ 60 gray levels between adjacent cells, so no block-average
    * comparison can ever flip and the exact-arithmetic oracle stays
    * valid across any re-encode quality. */
  def encodeJpeg(w: Int, h: Int, quality: Float,
                 rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  // ------------------------------------------------------------ audio
  // PCM WAV is uncompressed, so the AUDIO modality needs no codec at
  // all: a real RIFF chunk walk + little-endian sample reads cover
  // parse AND "decode" exactly — the audio twin of the image pipeline.

  /** Parsed WAV stream header: format fields from the `fmt ` chunk +
    * the sample count implied by the `data` chunk. */
  final case class WavInfo(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, nSamples: Long)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b.length >= i + 4 && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** REAL WAV parse: RIFF/WAVE signature, then a genuine chunk walk —
    * unknown chunks (LIST, fact, …) are skipped by their declared size
    * (+ the RIFF odd-size pad byte) until `fmt ` and `data` are both
    * seen. None for truncated/corrupt streams or non-PCM (compressed)
    * formats. */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (size > b.length) return None // corrupt declared size
      if (tag(b, i, "fmt ")) {
        // PCM needs ≥16 bytes: audioFormat(2) channels(2) rate(4)
        // byteRate(4) blockAlign(2) bits(2); audioFormat must be 1.
        if (size < 16 || i + 8 + 16 > b.length) return None
        val audioFormat = (b(i + 8) & 0xff) | ((b(i + 9) & 0xff) << 8)
        if (audioFormat != 1) return None
        fmt = Some((
          (b(i + 10) & 0xff) | ((b(i + 11) & 0xff) << 8),
          le32(b, i + 12),
          (b(i + 22) & 0xff) | ((b(i + 23) & 0xff) << 8)))
      } else if (tag(b, i, "data")) {
        if (i + 8 + size > b.length) return None // declared data truncated
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
    }
    fmt match {
      // bits must be a positive multiple of 8: a corrupt 1–7-bit field
      // would make the bytes-per-sample divisor zero.
      case Some((ch, rate, bits))
          if dataLen >= 0 && ch > 0 && bits >= 8 && bits % 8 == 0 =>
        Some(WavInfo(ch, rate, bits, dataLen / (ch.toLong * (bits / 8))))
      case _ => None
    }
  }

  /** (payload offset, payload size) of the RIFF `data` chunk — the ONE
    * shared walk behind [[pcmStats]] and [[audioFingerprint64]] (guards
    * in one place; callers gate on [[wavInfo]] first for format checks). */
  private def dataChunk(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 12
    while (i + 8 <= b.length && !tag(b, i, "data")) {
      val sz = le32(b, i + 4)
      if (sz < 0 || sz > b.length) return None
      i += 8 + sz + (sz & 1)
    }
    if (i + 8 > b.length) return None
    val size = le32(b, i + 4)
    if (size < 0 || i + 8 + size > b.length) return None
    Some((i + 8, size))
  }

  /** Exact integer statistics over a 16-bit PCM WAV's samples (all
    * channels interleaved): (count, Σ|s|, max|s|, Σs²) — the amplitude /
    * energy features an audio curation pipeline gates on (silence,
    * clipping, loudness), with no FP anywhere. None when [[wavInfo]]
    * rejects the stream or it isn't 16-bit. */
  def pcmStats(b: Array[Byte]): Option[(Long, Long, Long, Long)] =
    wavInfo(b).filter(_.bitsPerSample == 16).flatMap { _ =>
      dataChunk(b).map { case (base, size) =>
        var p = base
        val end = base + size
        var n = 0L; var sumAbs = 0L; var maxAbs = 0L; var sumSq = 0L
        while (p + 1 < end) {
          val s = ((b(p) & 0xff) | (b(p + 1) << 8)).toShort.toLong
          val a = math.abs(s)
          n += 1; sumAbs += a; sumSq += s * s
          if (a > maxAbs) maxAbs = a
          p += 2
        }
        (n, sumAbs, maxAbs, sumSq)
      }
    }

  /** Structurally-real PCM16 WAV builder (RIFF + fmt + an ignorable LIST
    * chunk so parsers must actually WALK chunks + data) — the audio
    * fixture twin of [[pngBytes]]/[[encodePng]]. */
  def wavBytes(sampleRate: Int, samples: Array[Short],
               channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val byteRate = sampleRate * channels * 2
    def le2(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le4(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    "RIFF".getBytes("US-ASCII") ++ le4(4 + 24 + 12 + 8 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le4(16) ++ le2(1) ++ le2(channels) ++
      le4(sampleRate) ++ le4(byteRate) ++ le2(channels * 2) ++ le2(16) ++
      "LIST".getBytes("US-ASCII") ++ le4(4) ++ "INFO".getBytes("US-ASCII") ++
      "data".getBytes("US-ASCII") ++ le4(dataLen) ++
      samples.flatMap(s => le2(s & 0xffff))
  }

  /** 64-bit audio fingerprint over a 16-bit PCM WAV: split the samples
    * into 65 equal windows (window j covers [⌊j·n/65⌋, ⌊(j+1)·n/65⌋)),
    * sum each window's energy Σs² exactly, and set bit p = j (MSB-first,
    * j = 0..63) iff energy(j) < energy(j+1) — the audio twin of
    * [[dhash64]]'s neighbor compare. VOLUME-INVARIANT by construction:
    * scaling every sample by a constant scales every window energy by
    * its square, so all comparisons — and the fingerprint — are
    * unchanged. All integer arithmetic; None when the stream is not
    * 16-bit PCM or has fewer than 65 samples. */
  def audioFingerprint64(b: Array[Byte]): Option[Long] =
    wavInfo(b).filter(w => w.bitsPerSample == 16 && w.nSamples >= 65).flatMap { _ =>
      val (base, size) = dataChunk(b) match {
        case Some(bs) => bs
        case None => return None
      }
      val n = size / 2
      val energies = new Array[Long](65)
      var j = 0
      while (j < 65) {
        var p = j * n / 65
        val end = (j + 1) * n / 65
        var e = 0L
        while (p < end) {
          val s = ((b(base + 2 * p) & 0xff) | (b(base + 2 * p + 1) << 8)).toShort.toLong
          e += s * s
          p += 1
        }
        energies(j) = e
        j += 1
      }
      var h = 0L
      var k = 0
      while (k < 64) {
        h = (h << 1) | (if (energies(k) < energies(k + 1)) 1L else 0L)
        k += 1
      }
      Some(h)
    }

  /** Trim-tolerant audio fingerprint SHINGLES over a 16-bit PCM WAV —
    * the landmark upgrade of [[audioFingerprint64]], whose 65
    * length-relative windows make it volume-invariant but NOT
    * trim-invariant (cutting samples moves every window boundary).
    * Here energies are summed over FIXED-SIZE windows (`win` samples,
    * spaced `hop` samples apart over the interleaved stream), the
    * neighbor-compare contour bits c_j = e_j < e_{j+1} pack into SLIDING
    * 64-bit shingles, and the recording is represented by its distinct
    * shingle set. Cutting k·hop samples off either end shifts the window
    * grid by whole hops, so every interior shingle survives verbatim and
    * [[TextDedup.containmentPairs]] over these sets catches trimmed
    * copies (spec-pinned); cuts that are NOT hop-aligned need a smaller
    * hop — the standard alignment/robustness trade, part of the
    * contract, not a bug. Volume-invariant like the aligned fingerprint
    * (energies scale by the square, comparisons are unchanged). All
    * integer arithmetic; None when the stream is not 16-bit PCM or has
    * fewer than 64 + win/hop windows (need ≥65 contour bits). */
  def audioShingles64(b: Array[Byte], win: Int = 1024, hop: Int = 256): Option[Array[Long]] = {
    require(win > 0 && hop > 0, s"win=$win hop=$hop must be positive")
    wavInfo(b).filter(_.bitsPerSample == 16).flatMap { _ =>
      dataChunk(b).flatMap { case (base, size) =>
        val n = size / 2
        val m = if (n < win) 0 else (n - win) / hop + 1
        if (m < 65) None else {
          val e = new Array[Long](m)
          var j = 0
          while (j < m) {
            var p = j * hop
            val end = p + win
            var acc = 0L
            while (p < end) {
              val s = ((b(base + 2 * p) & 0xff) | (b(base + 2 * p + 1) << 8)).toShort.toLong
              acc += s * s
              p += 1
            }
            e(j) = acc
            j += 1
          }
          val sh = new Array[Long](m - 64)
          var h = 0L
          var k = 0
          while (k < m - 1) {
            h = (h << 1) | (if (e(k) < e(k + 1)) 1L else 0L)
            if (k >= 63) sh(k - 63) = h // bits k-63 .. k (earlier bits shift out)
            k += 1
          }
          Some(sh.distinct)
        }
      }
    }
  }

  /** (id, distinct shingle set) for a media relation — feed to
    * [[TextDedup.containmentPairs]] for trim/volume-robust audio dedup. */
  final case class AudioShingles(id: Long, sh: Array[Long])

  /** Dataset[MediaRecord] → Dataset[AudioShingles]; records that are not
    * parseable 16-bit PCM (or are too short for one shingle) drop out. */
  def audioShingleSets(ds: Dataset[MediaRecord],
                       win: Int = 1024, hop: Int = 256): Dataset[AudioShingles] =
    ds.flatMap(r => audioShingles64(r.payload, win, hop)
      .map(sh => AudioShingles(r.id, sh)))(Encoders.product[AudioShingles])

  /** RESAMPLE-robust audio shingles: [[audioShingles64]] with the window
    * grid sized in TIME instead of samples — hop = sampleRate /
    * `hopsPerSec` samples (1/hopsPerSec seconds), window = `winHops`
    * hops — so two encodings of the same recording at DIFFERENT sample
    * rates aggregate energy over the SAME time windows. Fixed
    * sample-count windows provably lose a resampled copy (each window
    * then spans a different time slice of the signal; `MediaSpec` pins
    * the loss); time-normalized windows make the contour — hence the
    * shingle set — identical whenever the resampler preserves each
    * window's energy ORDER. That holds exactly for integer
    * decimation/duplication of window-constant content (the oracle
    * fixture: every energy scales by one constant factor, comparisons
    * untouched) and is what window-aggregated energies are FOR under
    * real resamplers (per-sample error cancels in Σs²; a flipped bit
    * needs two adjacent windows with nearly tied energy). Composes with
    * the trim contract: cuts must be whole hops — now 1/hopsPerSec
    * SECONDS, rate-independent. None when the payload is not 16-bit PCM
    * or `hopsPerSec` does not divide its sample rate (a window grid
    * that cannot align across rates would silently break the
    * invariance, so it refuses instead). */
  def audioShinglesRate(b: Array[Byte], hopsPerSec: Int = 4000,
                        winHops: Int = 1): Option[Array[Long]] = {
    require(hopsPerSec > 0 && winHops > 0, s"hopsPerSec=$hopsPerSec winHops=$winHops")
    wavInfo(b).flatMap { w =>
      if (w.sampleRate <= 0 || w.sampleRate % hopsPerSec != 0) None
      else {
        val hop = w.sampleRate / hopsPerSec
        audioShingles64(b, win = hop * winHops, hop = hop)
      }
    }
  }

  /** Dataset form of [[audioShinglesRate]] — feed to
    * [[TextDedup.containmentPairs]] for resample/trim/volume-robust
    * audio dedup. */
  def audioShingleSetsRate(ds: Dataset[MediaRecord], hopsPerSec: Int = 4000,
                           winHops: Int = 1): Dataset[AudioShingles] =
    ds.flatMap(r => audioShinglesRate(r.payload, hopsPerSec, winHops)
      .map(sh => AudioShingles(r.id, sh)))(Encoders.product[AudioShingles])

  /** CONTENT-DEFINED audio chunks over a 16-bit PCM WAV — the
    * arbitrary-trim upgrade of [[audioShingles64]], whose fixed window
    * GRID makes it robust only to hop-multiple cuts (a 37-sample trim
    * shifts every window off-grid and scrambles the contour; the
    * documented alignment trade). Here boundaries come from the CONTENT:
    * a Rabin-style rolling polynomial hash over the last `w` samples
    * (r = Σ u_{i−k}·B^k mod M, u = sample + 32768, maintained
    * incrementally with the B^w subtraction) cuts a chunk after sample i
    * whenever r ≡ 0 (mod `divisor`) — the text CDC chunker
    * (x_chunk_cdc) applied to the sample stream. A cut of ANY length at
    * either end leaves every interior boundary at the same content
    * position (the rolling hash sees only the last w samples), so all
    * interior chunks survive verbatim and
    * [[TextDedup.containmentPairs]] over the chunk-key sets catches
    * arbitrarily-trimmed copies; only the head/tail chunks are damaged.
    * No min/max chunk forcing — a forced cut would make boundaries
    * depend on the PREVIOUS boundary and break content-locality (the
    * property the operator exists for); expected chunk length is
    * `divisor` samples, stated not hidden. NOT volume-robust (keys hash
    * raw samples — volume robustness stays with the contour families;
    * each invariance is a separate named operator, by design).
    *
    * Chunk key = fingerprint·2^20 + min(len, 2^20−1), fingerprint =
    * fold (f·B2 + u) mod M over the chunk's samples — all exact integer
    * arithmetic below 2^62, replayed closed-form by the DuckDB twin
    * (M = 2^31−1; no wrap, no libm). None when the payload is not
    * 16-bit PCM or shorter than w samples. */
  def audioCdcChunks(b: Array[Byte], w: Int = 8, divisor: Int = 32,
                     base: Long = 1000003L, base2: Long = 1000033L,
                     mod: Long = 2147483647L): Option[Array[Long]] = {
    require(w >= 2 && divisor >= 2 && base > 1 && base2 > 1 && mod > 1)
    wavInfo(b).filter(_.bitsPerSample == 16).flatMap { _ =>
      dataChunk(b).flatMap { case (off, size) =>
        val n = size / 2
        if (n < w) None else {
          var bw = 1L
          var k = 0
          while (k < w) { bw = bw * base % mod; k += 1 }
          val ring = new Array[Long](w)
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          var r = 0L
          var f = 0L
          var len = 0L
          var i = 0
          while (i < n) {
            val s = ((b(off + 2 * i) & 0xff) | (b(off + 2 * i + 1) << 8)).toShort.toLong
            val u = s + 32768L
            val old = ring(i % w)
            ring(i % w) = u
            r = if (i < w) (r * base + u) % mod
                else Math.floorMod(r * base + u - old * bw, mod)
            f = (f * base2 + u) % mod
            len += 1
            if (i >= w - 1 && r % divisor == 0) {
              out += f * 1048576L + math.min(len, 1048575L)
              f = 0L; len = 0L
            }
            i += 1
          }
          if (len > 0) out += f * 1048576L + math.min(len, 1048575L)
          Some(out.distinct.toArray)
        }
      }
    }
  }

  /** Dataset form of [[audioCdcChunks]] — feed to
    * [[TextDedup.containmentPairs]] for arbitrary-trim audio dedup. */
  def audioCdcChunkSets(ds: Dataset[MediaRecord], w: Int = 8,
                        divisor: Int = 32): Dataset[AudioShingles] =
    ds.flatMap(r => audioCdcChunks(r.payload, w, divisor)
      .map(sh => AudioShingles(r.id, sh)))(Encoders.product[AudioShingles])

  /** Exact audio features for one record. `decoded=false` rows (not a
    * parseable PCM WAV) carry −1 format fields and zero sums. */
  final case class AudioFeatures(
      id: Long, channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, sumAbs: Long, maxAbs: Long, sumSq: Long, decoded: Boolean)

  /** Dataset[MediaRecord] → Dataset[AudioFeatures]: REAL RIFF chunk walk
    * + exact integer PCM statistics, per-partition, executor-side — the
    * audio twin of [[extractPixelFeatures]]. */
  def extractAudioFeatures(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] =
    ds.mapPartitions(_.map { r =>
      (wavInfo(r.payload), pcmStats(r.payload)) match {
        case (Some(w), Some((n, sumAbs, maxAbs, sumSq))) =>
          AudioFeatures(r.id, w.channels, w.sampleRate, w.bitsPerSample,
            n, sumAbs, maxAbs, sumSq, decoded = true)
        case _ =>
          AudioFeatures(r.id, -1, -1, -1, 0L, 0L, 0L, 0L, decoded = false)
      }
    })(Encoders.product[AudioFeatures])

  // ------------------------------------------------------------ video
  // AVI is RIFF-based, so the SAME chunk-walk machinery gives a REAL
  // video demux with no codec: LIST/hdrl carries the main header, the
  // LIST/movi sub-chunks carry one encoded frame each ('##dc'/'##db'),
  // and for MJPEG those frames are plain JPEGs our marker walk (or a
  // full ImageIO decode) already handles.

  /** Parsed AVI main header (`avih`): frame cadence + declared geometry. */
  final case class AviInfo(microSecPerFrame: Int, totalFrames: Int,
                           width: Int, height: Int)

  /** REAL AVI parse: RIFF/'AVI ' signature, walk the top-level chunks to
    * LIST/'hdrl', walk its sub-chunks to `avih`, read the header fields.
    * None for truncated/corrupt streams. */
  def aviInfo(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var i = 12
    while (i + 12 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > b.length) return None
      if (tag(b, i, "LIST") && tag(b, i + 8, "hdrl")) {
        var j = i + 12
        val end = math.min(i + 8 + size, b.length)
        while (j + 8 <= end) {
          val sz = le32(b, j + 4)
          if (sz < 0 || sz > b.length) return None
          if (tag(b, j, "avih")) {
            if (sz < 40 || j + 8 + 40 > b.length) return None
            return Some(AviInfo(le32(b, j + 8), le32(b, j + 8 + 16),
              le32(b, j + 8 + 32), le32(b, j + 8 + 36)))
          }
          j += 8 + sz + (sz & 1)
        }
        return None // hdrl without avih is corrupt
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  /** REAL video demux: walk to LIST/'movi' and return every video-stream
    * frame chunk ('##dc' compressed / '##db' uncompressed) in stream
    * order — for MJPEG each element is one complete JPEG. Non-video
    * sub-chunks (audio '##wb', index, JUNK) are skipped by declared
    * size. None when the container is not a parseable AVI. */
  def aviVideoFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var i = 12
    while (i + 12 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > b.length) return None
      if (tag(b, i, "LIST") && tag(b, i + 8, "movi")) {
        val frames = Vector.newBuilder[Array[Byte]]
        var j = i + 12
        val end = math.min(i + 8 + size, b.length)
        while (j + 8 <= end) {
          val sz = le32(b, j + 4)
          // `sz > b.length` must be checked FIRST: a declared size near
          // 2^31 would overflow `j + 8 + sz` negative and pass the
          // bounds check, then crash the copy instead of returning None.
          if (sz < 0 || sz > b.length || j + 8 + sz > b.length) return None
          val isDigits = Character.isDigit(b(j) & 0xff) && Character.isDigit(b(j + 1) & 0xff)
          val isVideo = isDigits && (b(j + 2) == 'd') &&
            (b(j + 3) == 'c' || b(j + 3) == 'b')
          if (isVideo) frames += java.util.Arrays.copyOfRange(b, j + 8, j + 8 + sz)
          j += 8 + sz + (sz & 1)
        }
        return Some(frames.result())
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  /** Structurally-real MJPEG AVI builder: RIFF('AVI ') + LIST(hdrl(avih))
    * + a JUNK chunk (so parsers must walk, not seek) + LIST(movi) with
    * one '00dc' chunk per frame (odd sizes padded per RIFF). */
  def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
               microSecPerFrame: Int = 33333): Array[Byte] = {
    def le4(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] =
      fourcc.getBytes("US-ASCII") ++ le4(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val avih = le4(microSecPerFrame) ++ le4(0) ++ le4(0) ++ le4(0) ++
      le4(frames.length) ++ le4(0) ++ le4(1) ++ le4(0) ++
      le4(w) ++ le4(h) ++ le4(0) ++ le4(0) ++ le4(0) ++ le4(0)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val junk = chunk("JUNK", Array.fill[Byte](5)(0x7f))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ junk ++ movi
    "RIFF".getBytes("US-ASCII") ++ le4(body.length) ++ body
  }

  /** One sampled "frame" of a video payload. */
  final case class Frame(id: Long, frameIdx: Int, payload: Array[Byte])

  /** One video's sorted distinct frame-digest set
    * ([[videoFrameDigestSets]]). */
  final case class FrameDigests(id: Long, sh: Seq[String])

  /** REAL every-k-th frame sampling over AVI payloads: demux each
    * record's container ([[aviVideoFrames]]), keep frames whose index ≡ 0
    * (mod `everyK`), emit (source id, frame index, frame bytes) — the
    * temporal-subsampling stage of a video pipeline with a genuine
    * demuxer in front. Records that are not parseable AVIs emit nothing
    * (route them via [[aviInfo]]'s None for accounting). */
  def sampleVideoFrames(ds: Dataset[MediaRecord], everyK: Int = 2): Dataset[Frame] = {
    require(everyK > 0, s"everyK=$everyK")
    ds.flatMap { r =>
      aviVideoFrames(r.payload).toSeq.flatMap(_.zipWithIndex.collect {
        case (bytes, idx) if idx % everyK == 0 => Frame(r.id, idx, bytes)
      })
    }(Encoders.product[Frame])
  }

  /** Distinct per-video frame digests, shaped for the
    * [[TextDedup]] set operators ((id, sh) like `shingleRelation`):
    * demux each AVI for real, md5 every frame's exact bytes, emit the
    * sorted distinct digest set. VIDEO-LEVEL exact-frame dedup rides
    * this: re-containerized copies (same frames, different muxing /
    * fps / chunk layout) and trimmed cuts share byte-identical frames,
    * so `containmentPairs` over these sets flags them — the container
    * never matters, only the demuxed frame bytes do. Pure per-row
    * projection (no shuffle); unparseable payloads emit an empty set
    * and can never become pair candidates. */
  def videoFrameDigestSets(ds: Dataset[MediaRecord]): Dataset[FrameDigests] =
    ds.map { r =>
      val fs = aviVideoFrames(r.payload).getOrElse(Vector.empty)
      val md = MessageDigest.getInstance("MD5")
      FrameDigests(r.id,
        fs.map(f => md.digest(f).map("%02x".format(_)).mkString).distinct.sorted)
    }(Encoders.product[FrameDigests])

  /** Distinct per-video PERCEPTUAL frame digests — the re-encode-robust
    * upgrade of [[videoFrameDigestSets]]: demux each AVI for real, fully
    * DECODE each MJPEG frame and take its 64-bit [[dhash64]] (as a 16-hex
    * token, a bijection of the long), emit the sorted distinct set.
    * Byte digests break under ANY lossy re-encode — the most common
    * transformation in crawled video — because re-compressed frames
    * share zero bytes with the originals; the dHash of the DECODED
    * pixels survives it (dHash compares block-average luma, and codec
    * error is far below real images' cell contrast), so
    * `containmentPairs` over these sets catches re-encoded copies and
    * hop-frame trims alike. Same scale shape as the byte variant: a pure
    * per-row projection (decode cost rides the scan, no shuffle);
    * undecodable frames are skipped, unparseable payloads emit an empty
    * set and can never become pair candidates. */
  def videoPerceptualDigestSets(ds: Dataset[MediaRecord]): Dataset[FrameDigests] =
    ds.map { r =>
      val fs = aviVideoFrames(r.payload).getOrElse(Vector.empty)
      FrameDigests(r.id,
        fs.flatMap(dhash64(_)).map(h => f"$h%016x").distinct.sorted)
    }(Encoders.product[FrameDigests])

  /** Raw-payload frame sampling: treat the payload as FIXED-SIZE frames
    * and keep every `everyK`-th — for headerless raw formats (planar
    * YUV dumps, fixed-stride sensor captures) where the frame length IS
    * the format contract. For CONTAINERIZED video use
    * [[sampleVideoFrames]], which demuxes the AVI chunk structure for
    * real. Output rows carry (source id, frame index) so downstream
    * stages can re-associate. */
  def frameSample(ds: Dataset[MediaRecord], frameBytes: Int = FrameBytes,
                  everyK: Int = 2): Dataset[Frame] = {
    require(frameBytes > 0 && everyK > 0, s"frameBytes=$frameBytes everyK=$everyK")
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, idx) if idx % everyK == 0 => Frame(r.id, idx, bytes)
      }
    }(Encoders.product[Frame])
  }

  /** MAGIC-BYTE content-type sniffing over a BINARY payload expr — the
    * trust-nothing step a real crawl needs before routing payloads
    * (Content-Type headers mislabel constantly; CommonCrawl publishes
    * a detected type NEXT TO the served one for the same reason).
    * Pinned signature subset, first match wins:
    * PNG (89504E47…), JPEG (FFD8FF), GIF (GIF8), PDF (%PDF),
    * gzip (1F8B), zip (PK..), RIFF (wav/avi container), and HTML by
    * prefix sniff — the first 64 bytes decoded as latin-1 (total, can
    * never fail), left-trimmed, lowercased, starting with `<!doctype`
    * or `<html` (the WHATWG-ish core). Anything else →
    * `application/octet-stream` (never a guess). One codegen
    * projection; `hex` is uppercase in both engines (the pinned
    * cross-engine convention); requires the graft functions
    * (`charset_decode`) registered on the session. */
  def mimeSniffSql(b: String): String =
    s"""CASE
       |  WHEN startswith(hex(substring($b, 1, 4)), '89504E47') THEN 'image/png'
       |  WHEN startswith(hex(substring($b, 1, 3)), 'FFD8FF') THEN 'image/jpeg'
       |  WHEN startswith(hex(substring($b, 1, 4)), '47494638') THEN 'image/gif'
       |  WHEN startswith(hex(substring($b, 1, 4)), '25504446') THEN 'application/pdf'
       |  WHEN startswith(hex(substring($b, 1, 2)), '1F8B') THEN 'application/gzip'
       |  WHEN startswith(hex(substring($b, 1, 4)), '504B0304') THEN 'application/zip'
       |  WHEN startswith(hex(substring($b, 1, 4)), '52494646') THEN 'audio/x-riff'
       |  WHEN startswith(ltrim(lower(charset_decode(substring($b, 1, 64),
       |         'iso-8859-1'))), '<!doctype') THEN 'text/html'
       |  WHEN startswith(ltrim(lower(charset_decode(substring($b, 1, 64),
       |         'iso-8859-1'))), '<html') THEN 'text/html'
       |  ELSE 'application/octet-stream'
       |END""".stripMargin
}
