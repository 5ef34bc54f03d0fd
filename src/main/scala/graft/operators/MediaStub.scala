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
  * Dimension extraction is REAL: [[MediaStub.headerDimensions]] walks
  * JPEG markers to the SOF frame header and reads PNG IHDR / GIF logical
  * screen descriptors — pure-JVM byte-walking over the binary column, no
  * codec dependency. Full pixel decode/resize remains a clearly-marked
  * deterministic FAKE (the container ships no codecs). Everything around
  * it is the real Spark plumbing a codec-backed version would use
  * unchanged:
  *   - `mapPartitions` so a native decoder is initialized once per
  *     partition (not per row) and rows stream through in batches;
  *   - typed `Dataset[MediaRecord] → Dataset[MediaFeatures]` with product
  *     encoders (schema is explicit and stable);
  *   - all work executor-side; nothing is collected to the driver.
  *
  * At 100 TB: payloads dominate I/O, so the stage before this one should
  * project only (id, format, payload) — column pruning keeps sidecar
  * metadata out of the shuffle — and `spark.sql.files.maxPartitionBytes`
  * bounds decoder memory per task.
  */
object MediaStub {

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
    * data starts with big-endian width and height. */
  def pngDimensions(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

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

  /** FAKE decode for payloads with no parseable header: a real pipeline
    * would route these to a codec or a quarantine; the stub derives
    * deterministic pseudo-dimensions from the content hash so tests and
    * the oracle can pin outputs. */
  private def fakeDecode(sha: Array[Byte]): (Int, Int) =
    (64 + (sha(0) & 0xff), 64 + (sha(1) & 0xff))

  /** Per-partition batch decode — the shape a native codec needs (init
    * once, stream rows). Dimensions come from the REAL header parse when
    * the payload carries a recognized container, else the deterministic
    * fake. */
  def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // (a real decoder would be constructed here, once per partition)
    records.map { r =>
      val sha = MessageDigest.getInstance("SHA-256").digest(r.payload)
      val (w, h) = headerDimensions(r.payload).getOrElse(fakeDecode(sha))
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
      (Array[Byte](8) ++ be2(h) ++ be2(w) ++ Array[Byte](1, 0x11, 0)) ++
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

  /** FAKE resize: a real implementation re-encodes via the codec; the
    * stub emits a deterministic payload of the target "pixel" budget so
    * downstream schema/partitioning/size behavior is realistic. */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    ds.mapPartitions(_.map { r =>
      val sha = MessageDigest.getInstance("SHA-256").digest(r.payload)
      val out = new Array[Byte](math.max(1, w * h / 64))
      var i = 0
      while (i < out.length) { out(i) = sha(i % 32); i += 1 }
      r.copy(payload = out)
    })(Encoders.product[MediaRecord])

  /** One sampled "frame" of a video payload. */
  final case class Frame(id: Long, frameIdx: Int, payload: Array[Byte])

  /** Video frame sampling: treat the payload as fixed-size frames and keep
    * every `everyK`-th — the temporal-subsampling stage of a video
    * pipeline. The frame split is a FAKE for a demuxer, but the flatMap
    * fan-out (one row in, 0..n frames out, executor-side, no driver
    * round-trip) is exactly the real operator's shape; output rows carry
    * (source id, frame index) so downstream stages can re-associate. */
  def frameSample(ds: Dataset[MediaRecord], frameBytes: Int = FrameBytes,
                  everyK: Int = 2): Dataset[Frame] = {
    require(frameBytes > 0 && everyK > 0, s"frameBytes=$frameBytes everyK=$everyK")
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, idx) if idx % everyK == 0 => Frame(r.id, idx, bytes)
      }
    }(Encoders.product[Frame])
  }
}
