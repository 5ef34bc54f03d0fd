package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._
import QueryDsl._

/** The reference's own operator surface (SURVEY.md §2.1), re-expressed as
  * declarative Spark plans over the `events` stream table. Streaming-mode
  * semantics (watermark/grace, union racing, sinks) are exercised by the
  * [[graft.operators.Stream]] façade specs; these batch twins are what the
  * DuckDB oracle can hash-check.
  *
  * Reference citations per query: createStream `src/stream.ts:273-276`,
  * map `src/stream.ts:38-56`, filter `src/stream.ts:57-77`,
  * explode `src/stream.ts:78-90`, window `src/stream.ts:130-200`,
  * union `src/stream.ts:201-230`.
  */
object Parity {

  val all: Seq[Q] = Seq(
    // source scan (createStream): projection reaches the parquet footer —
    // ReadSchema lists exactly these columns; nothing else is decoded.
    Q("p_source_scan", (s, d) => {
      events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id""")),

    // map: per-record scalar transform (reference map, arbitrary closure →
    // here a codegen'd expression; IEEE ops are bit-deterministic).
    Q("p_map_project", (s, d) => {
      events(s, d).select(
        col("event_id"),
        (col("value") * 2.0d + 1.0d).as("v2"),
        upper(col("event_type")).as("et_up"),
        (col("user_id") % 10).as("uid_mod"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, value * 2.0 + 1.0 AS v2, UPPER(event_type) AS et_up,
             user_id % 10 AS uid_mod
      FROM events ORDER BY event_id""")),

    // filter: predicate pushed to the scan (PushedFilters in explain).
    Q("p_filter_predicate", (s, d) => {
      events(s, d)
        .filter(col("event_type") === "click" && col("value") > 5.0d)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, value
      FROM events WHERE event_type = 'click' AND value > 5.0
      ORDER BY event_id""")),

    // explode: one array-valued record → N records, parent key copied
    // (reference `[meta,[1,2]] → [meta,1],[meta,2]`). posexplode keeps the
    // within-array position so ordering is total.
    Q("p_explode_flatten", (s, d) => {
      documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "token")
        .orderBy(col("doc_id"), col("pos"))
    }, Some("""
      SELECT doc_id, pos, token FROM (
        SELECT doc_id,
               unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 50)
      ORDER BY doc_id, pos""")),

    // tumbling event-time window + whole-window aggregate (reference
    // window.collect): epoch-aligned 1h buckets == DuckDB time_bucket.
    // Partial agg runs map-side; only 720 groups/month shuffle.
    Q("p_window_tumbling", (s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("window.start").as("w_start"), col("n"), col("total"))
        .orderBy(col("w_start"))
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1 ORDER BY w_start"""), headline = true),

    // keyed tumbling window — the scale-correct form of the reference's
    // un-keyed window (SURVEY.md §7 "hard parts"): group by (window, key).
    Q("p_window_keyed", (s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("w_start"), col("event_type"))
    }, Some("""
      SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // union (UNION ALL semantics, no dedup — reference races two sources).
    Q("p_union_all", (s, d) => {
      val ev = events(s, d)
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("event_type"), col("value"))
        .unionByName(ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("event_type"), col("value")))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
      ORDER BY event_id""")),

    // distinct (dedup set-op the reference lacks; exact, hash-shuffle on
    // the full row — at 100 TB prefer dedup_exact's key-hash variant).
    Q("p_distinct", (s, d) => {
      events(s, d).select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type"))
    }, Some("""
      SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))
  )
}
