package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** End-to-end training-data curation pipeline — the composition every
  * individual operator in this engine exists for, as ONE oracle-checked
  * query:
  *
  *   1. language gate (stopword lang-ID = 'en')          — per-row, no shuffle
  *   2. quality gate (length + lexical-diversity floors)  — per-row, no shuffle
  *   3. exact dedup (keep smallest doc_id per digest)     — 1 shuffle (digest)
  *   4. near-dup removal (MinHash+LSH pairs → drop the
  *      larger id of every verified pair)                 — band join on survivors
  *   5. emit curated ids + quality features               — final order only
  *
  * Plan shape at 100 TB: stages 1–2 fuse into the scan projection
  * (whole-stage codegen, linear); stage 3 shuffles 16-byte digests, never
  * text; stage 4 runs on the post-gate survivor set (already a fraction of
  * the corpus) through the staged signature relation and short-key band
  * join; nothing ever pairs the full corpus quadratically.
  */
object Pipeline {

  private val stopEn = "'the','a','and','of','to','is'"
  private val stopEs = "'el','la','de','los','y','en'"
  private val stopFr = "'le','les','des','et','un','une'"
  private val stopDe = "'der','die','das','und','ein','zu'"

  val all: Seq[Q] = Seq(
    Q("x_pipeline_curate", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      // stages 1+2: per-row gates, fused into the scan projection.
      val scored = fanOut(documents(s, d))
        .withColumn("toks", expr("split(lower(text), ' ')"))
        .withColumn("s_en", expr(s"size(filter(toks, t -> t IN ($stopEn)))"))
        .withColumn("s_es", expr(s"size(filter(toks, t -> t IN ($stopEs)))"))
        .withColumn("s_fr", expr(s"size(filter(toks, t -> t IN ($stopFr)))"))
        .withColumn("s_de", expr(s"size(filter(toks, t -> t IN ($stopDe)))"))
        .withColumn("n_tokens", expr("size(toks)"))
        .withColumn("ttr",
          expr("CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)"))
        .filter(expr("s_en >= greatest(s_es, s_fr, s_de)")) // lang gate
        .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3) // quality gate
      // stage 3: exact dedup — only the digest shuffles.
      val canon = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"), col("n_tokens"), col("ttr"))
      // stage 4: near-dup removal among survivors (keep the smaller id of
      // every verified pair — anti-join against the db side).
      val sh = graft.operators.TextDedup
        .shingleRelation(canon.select(col("doc_id"), col("text")), "doc_id", "text", n = 3)
      val dupIds = graft.operators.TextDedup
        .minhashLshPairs(sh, k = 12, bands = 4, threshold = 0.5)
        .select(col("db")).distinct()
      // near-dup ids are by-contract sparse (≪ survivors): broadcast the
      // anti-join's tiny side or the planner SMJs two stats-less staged
      // relations and shuffles every survivor.
      canon.join(broadcast(dupIds), canon("doc_id") === dupIds("db"), "left_anti")
        .select(col("doc_id"), col("n_tokens"), col("ttr"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (
        SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
      sc AS (
        SELECT doc_id, text, toks,
               len(list_filter(toks, x -> x IN ($stopEn))) AS s_en,
               len(list_filter(toks, x -> x IN ($stopEs))) AS s_es,
               len(list_filter(toks, x -> x IN ($stopFr))) AS s_fr,
               len(list_filter(toks, x -> x IN ($stopDe))) AS s_de,
               len(toks) AS n_tokens,
               CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        FROM t),
      gated AS (
        SELECT * FROM sc
        WHERE s_en >= greatest(s_es, s_fr, s_de)
          AND n_tokens >= 20 AND ttr >= 0.3),
      canon AS (
        SELECT doc_id, text, toks, n_tokens, ttr FROM gated
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> array_to_string(toks[i:i+2], ' '))) AS sh
        FROM canon),
      sg AS (SELECT doc_id, sh,
               list_transform(range(0, 12),
                 i -> list_min(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || '|' || s)))) AS sig
             FROM d),
      bd AS (SELECT doc_id,
               unnest(list_transform(range(0, 4),
                 b -> md5(CAST(b AS VARCHAR) || '|' || sig[3*b+1] || sig[3*b+2] || sig[3*b+3]))) AS band_key
             FROM sg),
      cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
               FROM bd a JOIN bd b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      v AS (SELECT da, db,
              len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS inter,
              len(sa.sh) AS na, len(sb.sh) AS nb
            FROM cand JOIN d sa ON da = sa.doc_id JOIN d sb ON db = sb.doc_id),
      dup AS (SELECT DISTINCT db FROM v
              WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5)
      SELECT doc_id, n_tokens, ttr FROM canon
      WHERE doc_id NOT IN (SELECT db FROM dup)
      ORDER BY doc_id""")),

    // ------------------------------------------- JSONL interchange source
    // The corpus round-trips through gzip JSONL (the format LLM corpora
    // ship in; also the reference's gzip-JSON wire format) and every field
    // is verified against the parquet original via a null-safe equi-join —
    // a lossy escape/decode anywhere emits 0s and hash-mismatches. The
    // digest column ties the check to actual content. Four output files =
    // four scan tasks on re-ingest (gzip is non-splittable; the file count
    // IS the ingest parallelism — sources/Jsonl.scala contract).
    Q("x_source_jsonl", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Jsonl.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("j"), col("o.doc_id") === col("j.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> j.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> j.lang AND o.source <=> j.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> j.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(j.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // ------------------------------------------- CSV interchange (egress)
    // RFC-4180 CSV round trip over the HARD case — free text with commas,
    // quotes, and (potentially) newlines — same losslessness design as
    // x_source_jsonl: the round-tripped copy JOINS back to the parquet
    // original, per-column <=> flags make any write/read loss a hash
    // mismatch, and the oracle states flags = 1 from the original alone.
    // The query keeps its parquet scan via the original side of the join.
    Q("x_source_csv", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Csv.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("c"), col("o.doc_id") === col("c.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> c.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> c.lang AND o.source <=> c.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> c.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(c.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id""")),

    // --------------------------------------- ORC interchange (columnar)
    // The columnar egress for Hive/Trino-stack neighbors: typed,
    // splittable, pushdown-preserving (sources/Orc contract;
    // SourceFormatsSpec pins the pushed filter on re-ingest). Same
    // losslessness design as the text formats — the round-tripped copy
    // joins back to the parquet original with null-safe flags.
    Q("x_source_orc", (s, d) => {
      val docs = documents(s, d)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_stage/${new java.io.File(d).getName}"
      val back = graft.sources.Orc.roundTrip(docs, tmp, files = 4)
      docs.alias("o").join(back.alias("c"), col("o.doc_id") === col("c.doc_id"))
        .select(col("o.doc_id").as("doc_id"),
          expr("CAST(CASE WHEN o.text <=> c.text THEN 1 ELSE 0 END AS BIGINT)").as("text_ok"),
          expr("CAST(CASE WHEN o.lang <=> c.lang AND o.source <=> c.source THEN 1 ELSE 0 END AS BIGINT)").as("meta_ok"),
          expr("CAST(CASE WHEN o.n_chars <=> c.n_chars THEN 1 ELSE 0 END AS BIGINT)").as("chars_ok"),
          expr("md5(c.text)").as("digest"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, CAST(1 AS BIGINT) AS text_ok, CAST(1 AS BIGINT) AS meta_ok,
             CAST(1 AS BIGINT) AS chars_ok, md5(text) AS digest
      FROM documents ORDER BY doc_id"""))
  )
}
