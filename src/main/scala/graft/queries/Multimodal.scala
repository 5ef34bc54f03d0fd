package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{MediaRecord, MediaStub}
import graft.sources.Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata.
  *
  * Dimension extraction is REAL ([[graft.operators.MediaStub]]): JPEG
  * marker-walking to SOF, PNG IHDR, GIF logical screen descriptor — pure
  * byte-walking, no codec. The oracle design makes the parse load-bearing:
  * payloads are synthesized with KNOWN dimensions embedded in real
  * container headers, the engine must parse them back out of the bytes,
  * and the DuckDB oracle states the ground-truth arithmetic — any parsing
  * bug hash-mismatches. Full pixel decode stays a documented fake (no
  * codecs in the container).
  *
  * Scale shape: per-row projection / typed mapPartitions only — no
  * shuffle, linear, executor-side.
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
            case 0 => MediaRecord(id, "jpeg", MediaStub.jpegBytes(w, h))
            case 1 => MediaRecord(id, "png", MediaStub.pngBytes(w, h))
            case _ => MediaRecord(id, "gif", MediaStub.gifBytes(w, h))
          }
        }
      MediaStub.extractFeatures(recs)
        .select(col("id").as("doc_id"), col("format"),
          col("width"), col("height"), col("byteLen").as("byte_len"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id,
             ['jpeg', 'png', 'gif'][CAST(doc_id % 3 AS INT) + 1] AS format,
             CAST(100 + doc_id % 200 AS INT) AS width,
             CAST(100 + (doc_id * 7) % 300 AS INT) AS height,
             CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN ${MediaStub.jpegBytes(1, 1).length}
               WHEN 1 THEN ${MediaStub.pngBytes(1, 1).length}
               ELSE ${MediaStub.gifBytes(1, 1).length} END AS INT) AS byte_len
      FROM documents ORDER BY doc_id"""))
  )
}
