package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata. The container has no image/audio codecs,
  * so "decode" is a deterministic fake (dimensions derived from the
  * content hash — see [[graft.operators.MediaStub]] for the typed
  * mapPartitions pipeline); everything Spark-side (schema, batching,
  * partitioning, the metadata projection below) is real.
  *
  * Per-row projection only — no shuffle, scales linearly; the sha256 is
  * computed on executors next to the data, never on the driver.
  */
object Multimodal {

  val all: Seq[Q] = Seq(
    Q("x_multimodal_meta", (s, d) => {
      fanOut(documents(s, d))
        // the opaque payload: utf-8 bytes of text standing in for media.
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("sha", sha2(col("payload"), 256))
        .select(
          col("doc_id"),
          expr("octet_length(payload)").as("byte_len"),
          col("sha"),
          // fake container format, deterministic per doc.
          expr("element_at(array('jpeg', 'png', 'webp'), CAST(doc_id % 3 AS INT) + 1)")
            .as("format"),
          // fake decoded dimensions from the first hash bytes.
          expr("64 + CAST(conv(substring(sha, 1, 2), 16, 10) AS INT)").as("width"),
          expr("64 + CAST(conv(substring(sha, 3, 2), 16, 10) AS INT)").as("height"),
          // "frame sample": a fixed-offset slice of the payload.
          expr("substring(text, 1, 16)").as("frame_sample"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, text, sha256(text) AS sha FROM documents)
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             sha,
             ['jpeg', 'png', 'webp'][CAST(doc_id % 3 AS INT) + 1] AS format,
             64 + (instr('0123456789abcdef', substr(sha, 1, 1)) - 1) * 16
                + (instr('0123456789abcdef', substr(sha, 2, 1)) - 1) AS width,
             64 + (instr('0123456789abcdef', substr(sha, 3, 1)) - 1) * 16
                + (instr('0123456789abcdef', substr(sha, 4, 1)) - 1) AS height,
             substr(text, 1, 16) AS frame_sample
      FROM t ORDER BY doc_id"""))
  )
}
