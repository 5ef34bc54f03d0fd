package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC-archive ingest — the FILE-source front end of the crawl gates:
  * real crawls land as `.warc.gz` segments in a directory (one file
  * per fetch batch, the CommonCrawl delivery shape), Structured
  * Streaming's file source picks each new segment up exactly once, and
  * the parsed `response` records flow into the SAME curation gates the
  * Kafka-shaped streams feed (WebIngest / FrontierIngest /
  * LinkGraphIngest take any [[Stream]]).
  *
  * Pinned projection ([[pages]]):
  *  - only `WARC-Type: response` records with HTTP status 200 and a
  *    `text/html` payload content type surface as pages (the archive
  *    curation convention — 404s, redirects, and binary payloads are
  *    someone else's pipeline; they stay in the archive);
  *  - `doc_id` = hash60 of the WARC record id (the engine's md5-hash60
  *    convention: first 15 md5 hex digits as a non-negative 60-bit
  *    long) — archives carry no integer ids, and the record id is the
  *    one field WARC guarantees unique per record, so the derived id
  *    is replay-stable across any re-read of the same archive;
  *  - `html` = the payload body through the PINNED DECODE LAYER
  *    ([[Warc.withDecodedText]]): gzip Content-Encoding decoded,
  *    charset resolved Content-Type param → meta sniff → UTF-8,
  *    damaged sequences → U+FFFD, undecodable transfer encodings →
  *    NULL (dropped here — an undecodable payload is not a page).
  *
  * Scale: parse parallelism = segment count per micro-batch (one task
  * per file — the gzip contract); the projection is per-row codegen on
  * the parsed relation; everything downstream is the gates' own
  * contract. */
object WarcIngest {

  /** The streaming (doc_id, url, html) page view over a growing WARC
    * directory. */
  def pages(spark: SparkSession, dir: String): DataFrame =
    Warc.withDecodedText(
      Warc.readStream(spark, dir)
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html")),
      outCol = "html")
      .filter(col("html").isNotNull)
      .select(
        expr("CAST(conv(substr(md5(record_id), 1, 15), 16, 10) AS BIGINT)")
          .as("doc_id"),
        col("target_uri").as("url"),
        col("html"))

  /** The streaming (from_url, to_url) REDIRECT-ALIAS view over the
    * same archive: 3xx responses with a `Location` header,
    * canonicalized and resolved ([[FrontierIngest.aliasLinks]] —
    * relative Locations resolve against the record's own uri). Feed
    * [[LinkGraphIngest]]'s alias fold so pages fetched via redirected
    * spellings collapse with their canonical twins. */
  def aliases(spark: SparkSession, dir: String): DataFrame =
    FrontierIngest.aliasLinks(
      Warc.readStream(spark, dir)
        .filter(col("warc_type") === "response" &&
          col("http_status").between(300, 399)),
      "target_uri", "http_location")

  /** [[pages]] wrapped as a [[Stream]] — plug into WebIngest /
    * FrontierIngest / LinkGraphIngest directly. */
  def stream(spark: SparkSession, dir: String): Stream =
    Stream.fromDataFrame(spark, pages(spark, dir))
}
