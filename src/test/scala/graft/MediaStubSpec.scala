package graft

import graft.operators.{MediaRecord, MediaStub}

class MediaStubSpec extends SparkSpec {

  test("typed media pipeline: Dataset[MediaRecord] -> Dataset[MediaFeatures]") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "jpeg", "hello-media-bytes".getBytes("UTF-8")),
      MediaRecord(2L, "png", Array.fill[Byte](64)(7))))
    val out = MediaStub.extractFeatures(ds).collect().sortBy(_.id)
    assert(out.length == 2)
    val a = out(0)
    assert(a.byteLen == 17)
    assert(a.sha256.length == 64 && a.sha256.matches("[0-9a-f]+"))
    assert(a.width >= 64 && a.width < 320 && a.height >= 64 && a.height < 320)
    assert(a.frameSample.length == MediaStub.FrameBytes)
    // deterministic fake decode: same payload → same dims.
    val again = MediaStub.extractFeatures(ds).collect().sortBy(_.id)
    assert(again(0).width == a.width && again(0).height == a.height)
  }

  test("decode runs per-partition (mapPartitions), preserving distribution") {
    import spark.implicits._
    val ds = spark.createDataset(
      (1L to 100L).map(i => MediaRecord(i, "webp", Array.fill[Byte](8)(i.toByte))))
      .repartition(4)
    val out = MediaStub.extractFeatures(ds)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == 100)
  }

  test("frameSample keeps every k-th fixed-size frame with its index") {
    import spark.implicits._
    // 40-byte payload, 8-byte frames -> indices 0..4; everyK=2 -> 0,2,4.
    val payload = Array.tabulate(40)(_.toByte)
    val ds = spark.createDataset(Seq(MediaRecord(7L, "mp4", payload)))
    val frames = MediaStub.frameSample(ds, frameBytes = 8, everyK = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.id == 7L))
    assert(frames(1).payload.toSeq == payload.slice(16, 24).toSeq)
  }
}
