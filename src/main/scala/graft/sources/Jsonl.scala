package graft.sources

import org.apache.spark.sql.DataFrame

/** JSONL (newline-delimited JSON) egress + ingest — the interchange format
  * LLM corpora actually ship in (one JSON object per line, typically gzip:
  * the reference's wire format is exactly gzip'd JSON messages,
  * /root/reference/src/stream.ts:291-300 encode / context.ts:139-147
  * decode).
  *
  * Scale contract:
  *  - ALWAYS pass an explicit schema on read ([[roundTrip]] reuses the
  *    writer's). Schema inference is a full extra pass over the corpus
  *    before the real scan — at 100 TB that doubles ingest cost.
  *  - gzip is NOT splittable: one scan task per FILE, so the output file
  *    count IS the downstream ingest parallelism. [[roundTrip]] takes it
  *    explicitly; at scale write ≥ executors × cores files (or use bzip2,
  *    which splits, at ~5× the CPU). Parquet remains the at-rest format —
  *    JSONL is for interchange boundaries only.
  *  - Correctness of the round trip is exact: Spark's JSON writer escapes
  *    control characters / quotes / non-BMP text losslessly, and binary
  *    columns ride base64 (see streaming.ImageIngest), so digests match
  *    bitwise after the trip. `x_source_jsonl` pins this against the
  *    parquet original.
  */
object Jsonl {

  /** Write `df` as gzip JSONL under `path` in `files` files, then read it
    * back with `df`'s own schema. The write is eager (same discipline as
    * [[Tables.stage]]); the returned frame scans the JSONL copy. */
  def roundTrip(df: DataFrame, path: String, files: Int): DataFrame = {
    require(files > 0, s"files=$files must be positive")
    df.repartition(files).write.mode("overwrite")
      .option("compression", "gzip").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }
}
