package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Stream

/** Exactly-once through restart: the checkpoint (offset + commit log)
  * replaces the reference's manual offset management (`commit()`, the
  * 60 s commit timer, per-context offset merging — SURVEY.md §1.4). A
  * query stopped mid-stream and restarted from the same checkpoint must
  * neither lose nor duplicate records in a file sink. */
class CheckpointRecoverySpec extends SparkSpec {

  private def msg(json: String, tsMillis: Long, offset: Long): KMsg =
    KMsg("t", 0, offset, new Timestamp(tsMillis), null, json.getBytes("UTF-8"))

  test("file sink resumes from checkpoint without loss or duplication") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString

    val ms = MemoryStream[KMsg]
    val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    val q1 = s.df.select(col("value.v").as("v"), col("metadata.offset").as("off"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    ms.addData(msg("""{"v":1}""", 1000L, 0), msg("""{"v":2}""", 2000L, 1))
    q1.processAllAvailable()
    q1.stop()

    // restart over the SAME source + checkpoint; only new data flows.
    ms.addData(msg("""{"v":3}""", 3000L, 2))
    val q2 = s.df.select(col("value.v").as("v"), col("metadata.offset").as("off"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).select("v")
      .collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(1, 2, 3), s"expected exactly-once, got ${rows.toSeq}")
  }

  test("forEachBatch resumes from checkpoint: processed batches don't replay") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-feb-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])]

    val ms = MemoryStream[KMsg]
    def mkStream = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
    def apply(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      seen.synchronized {
        seen += id -> batch.select(col("value.v")).as[Int].collect().toSeq.sorted
      }

    val q1 = mkStream.forEachBatch(apply, checkpoint = Some(ckpt))
    ms.addData(msg("""{"v":1}""", 1000L, 0), msg("""{"v":2}""", 2000L, 1))
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = seen.flatMap(_._2).sorted.toSeq
    assert(afterFirst == Seq(1, 2), seen)

    // restart from the same checkpoint: the committed batch must NOT
    // re-deliver; only new offsets flow, with a fresh batch id — the
    // contract an idempotent/transactional MERGE keys on.
    ms.addData(msg("""{"v":3}""", 3000L, 2))
    val q2 = mkStream.forEachBatch(apply, checkpoint = Some(ckpt))
    q2.processAllAvailable()
    q2.stop()
    val values = seen.flatMap(_._2).sorted.toSeq
    assert(values == Seq(1, 2, 3), s"loss or replay across restart: $seen")
    assert(seen.map(_._1).distinct.size == seen.size, s"batch id reused: $seen")
  }
}
