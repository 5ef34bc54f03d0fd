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
  * The container ships no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic FAKE (dimensions derived from the content
  * hash). Everything around it is the real Spark plumbing a codec-backed
  * version would use unchanged:
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

  /** FAKE decode: a real implementation would hand `payload` to a codec.
    * Deterministic so tests and the oracle can pin outputs. */
  private def fakeDecode(payload: Array[Byte]): (Array[Byte], Int, Int) = {
    val sha = MessageDigest.getInstance("SHA-256").digest(payload)
    val width = 64 + (sha(0) & 0xff)
    val height = 64 + (sha(1) & 0xff)
    (sha, width, height)
  }

  /** Per-partition batch decode — the shape a native codec needs (init
    * once, stream rows). */
  def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // (a real decoder would be constructed here, once per partition)
    records.map { r =>
      val (sha, w, h) = fakeDecode(r.payload)
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
