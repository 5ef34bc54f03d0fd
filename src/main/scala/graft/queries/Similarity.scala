package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths:
  *  - brute-force exact cosine top-k — the correctness baseline; scales as
  *    a broadcast of the (small) query set against a full scan of the
  *    corpus, ranked with a per-query top-k (never a global sort);
  *  - sign-random-hyperplane LSH — the 100 TB path: each vector maps to a
  *    16-bit signature, banded into 4 keys; candidate generation is an
  *    equi-join on band keys, exact cosine re-ranks candidates only.
  *
  * Determinism across engines: dot products and hyperplane projections are
  * sequential left-folds in array order (Spark `aggregate` ≡ DuckDB
  * `list_reduce(list_prepend(0.0, …))`), so every double is bitwise
  * identical and ranking ties are broken by vec_id.
  */
object Similarity {

  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** 16-bit sign-hyperplane signature; hyperplane weights are ±1 derived
    * from md5(h_d) so both engines rebuild the identical matrix. At 100 TB
    * the weight matrix would be materialized once and broadcast instead of
    * recomputed per row. */
  private val sparkSig =
    """concat_ws('', transform(sequence(0, 15), h ->
      |  CASE WHEN aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, dd) ->
      |         acc + CASE WHEN substring(md5(concat(CAST(h AS STRING), '_', CAST(dd AS STRING))), 1, 1) >= '8'
      |                    THEN CAST(element_at(embedding, dd) AS DOUBLE)
      |                    ELSE -CAST(element_at(embedding, dd) AS DOUBLE) END) > 0
      |  THEN '1' ELSE '0' END))""".stripMargin

  private val duckSig =
    """array_to_string(list_transform(range(0, 16), h ->
      |  CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |         list_transform(range(1, 65), dd ->
      |           CASE WHEN substr(md5(CAST(h AS VARCHAR) || '_' || CAST(dd AS VARCHAR)), 1, 1) >= '8'
      |                THEN CAST(embedding[dd] AS DOUBLE)
      |                ELSE -CAST(embedding[dd] AS DOUBLE) END)),
      |         (acc, v) -> acc + v) > 0
      |  THEN '1' ELSE '0' END), '')""".stripMargin

  val all: Seq[Q] = Seq(
    // ------------------------------------------------ brute-force top-k ANN
    // Queries (vec_id < 10) × corpus (vec_id >= 10), exact cosine, top-10
    // per query. The query side is tiny → broadcast; the corpus is scanned
    // once; rank is a per-group top-k (window + filter), not a global sort.
    Q("x_ann_brute_topk", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = fanOut(embeddings(s, d)).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val c = e.filter(col("vec_id") >= 10)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      broadcast(q).crossJoin(c)
        // native codegen'd Expression — same FP sequence as the fold, ~10×
        // faster (see graft.functions.CosineSimilarity).
        .withColumn("cos", expr("cosine_sim(qe, embedding)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }, Some(s"""
      WITH e AS (
        SELECT vec_id, embedding, sqrt(${duckDot("embedding", "embedding")}) AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               ${duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
        FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10),
      ranked AS (
        SELECT q_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT q_id, rank, neighbor_id, cos FROM ranked WHERE rank <= 10
      ORDER BY q_id, rank"""), headline = true),

    // --------------------------------------------------- LSH-bucketed ANN
    // Candidates share ≥1 of 4 signature bands (equi-join on short keys);
    // exact cosine re-ranks candidates only. Approximate by construction,
    // but fully deterministic, so the oracle checks it exactly.
    Q("x_ann_lsh", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = fanOut(embeddings(s, d))
        .select(col("vec_id"), col("embedding"))
        .withColumn("sig", expr(sparkSig))
      // Staged (Tables.stage): the band relation feeds both the query and
      // corpus sides of the candidate join; without materialization the
      // 16×64-mult hyperplane projection would run twice per vector.
      val bands = stage(e.select(col("vec_id"),
        explode(expr("""transform(sequence(0, 3),
          b -> concat(CAST(b AS STRING), ':', substring(sig, 4*b + 1, 4)))"""))
          .as("band")))
      val qb = bands.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("band"))
      val cb = bands.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("c_id"), col("band"))
      val cand = qb.join(cb, "band").select(col("q_id"), col("c_id")).distinct()
      val qv = e.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val cv = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("c_id").asc)
      cand.join(qv, "q_id").join(cv, "c_id")
        .withColumn("cos", expr("cosine_sim(qe, ce)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }, Some(s"""
      WITH e AS (
        SELECT vec_id, embedding, sqrt(${duckDot("embedding", "embedding")}) AS nrm,
               ${duckSig} AS sig
        FROM embeddings),
      bands AS (
        SELECT vec_id,
               unnest(list_transform(range(0, 4),
                 b -> CAST(b AS VARCHAR) || ':' || substr(sig, 4*b + 1, 4))) AS band
        FROM e),
      cand AS (
        SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
        FROM bands q JOIN bands c ON q.band = c.band
        WHERE q.vec_id < 10 AND c.vec_id >= 10),
      scored AS (
        SELECT cand.q_id, cand.c_id,
               ${duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
        FROM cand JOIN e q ON cand.q_id = q.vec_id JOIN e c ON cand.c_id = c.vec_id),
      ranked AS (
        SELECT q_id, c_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
        FROM scored)
      SELECT q_id, rank, c_id AS neighbor_id, cos FROM ranked WHERE rank <= 10
      ORDER BY q_id, rank""")),

    // ------------------------------------------------------------ IVF ANN
    // Inverted-file variant: vectors are assigned to their nearest
    // "centroid" (deterministic stand-in: the first 8 corpus vectors —
    // a real pipeline trains centroids offline with k-means and
    // broadcasts them); each query probes its nprobe=2 nearest lists and
    // re-ranks only those candidates exactly. The probe-list join is the
    // scale story: corpus is PARTITIONED BY list id, a query touches
    // nprobe partitions instead of all of them.
    Q("x_ann_ivf", (s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = fanOut(embeddings(s, d)).select(col("vec_id"), col("embedding"))
      val cents = e.filter(col("vec_id") >= 10 && col("vec_id") < 18)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      // nearest centroid per corpus vector (rank over 8 centroids).
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id").asc)
      val assigned = e.filter(col("vec_id") >= 10)
        .crossJoin(broadcast(cents))
        .withColumn("ccos", expr("cosine_sim(embedding, ce)"))
        .withColumn("crn", row_number().over(wAssign))
        .filter(col("crn") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id"))
      // nprobe=2 lists per query.
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("qcos").desc, col("cent_id").asc)
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("qcos", expr("cosine_sim(qe, ce)"))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= 2)
        .select(col("q_id"), col("qe"), col("cent_id"))
      // candidates = corpus vectors in the probed lists; exact re-rank.
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      probes.join(assigned, "cent_id")
        .withColumn("cos", expr("cosine_sim(qe, embedding)"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }, Some(s"""
      WITH e AS (
        SELECT vec_id, embedding, sqrt(${duckDot("embedding", "embedding")}) AS nrm
        FROM embeddings),
      cents AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cnrm
        FROM e WHERE vec_id >= 10 AND vec_id < 18),
      assigned AS (
        SELECT vec_id, embedding, nrm, cent_id FROM (
          SELECT v.vec_id, v.embedding, v.nrm, c.cent_id,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cnrm) DESC,
                            c.cent_id ASC) AS crn
          FROM e v CROSS JOIN cents c WHERE v.vec_id >= 10)
        WHERE crn = 1),
      probes AS (
        SELECT q_id, qe, qnrm, cent_id FROM (
          SELECT q.vec_id AS q_id, q.embedding AS qe, q.nrm AS qnrm, c.cent_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${duckDot("q.embedding", "c.ce")} / (q.nrm * c.cnrm) DESC,
                            c.cent_id ASC) AS prn
          FROM e q CROSS JOIN cents c WHERE q.vec_id < 10)
        WHERE prn <= 2),
      ranked AS (
        SELECT q_id, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, vec_id ASC) AS rank
        FROM (SELECT p.q_id, a.vec_id,
                     ${duckDot("p.qe", "a.embedding")} / (p.qnrm * a.nrm) AS cos
              FROM probes p JOIN assigned a ON p.cent_id = a.cent_id))
      SELECT q_id, rank, vec_id AS neighbor_id, cos FROM ranked WHERE rank <= 10
      ORDER BY q_id, rank"""))
  )
}
