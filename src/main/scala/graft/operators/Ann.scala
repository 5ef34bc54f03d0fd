package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables.stage

/** Reusable approximate-nearest-neighbor operators over embedding columns —
  * the library surface behind the `x_ann_*` registry queries
  * (graft.queries.Similarity), parameterized for pipeline use.
  *
  * Inputs are (id, embedding) relations: `queries` is assumed small
  * relative to `corpus` (the top-k-per-query shape), embeddings are
  * `array<float>` of a fixed dimension.
  *
  * Scale design:
  *  - cosine is the native codegen'd `cosine_sim` Expression (one fused
  *    loop, FP-order-identical to a sequential fold);
  *  - ranking is per-query-group row_number + filter — never a global sort;
  *  - brute force broadcasts the query set and scans the corpus once: the
  *    exact baseline, linear in |corpus|;
  *  - LSH maps each vector to a sign-hyperplane signature banded into
  *    short keys; candidates come from an equi-join on band keys (staged —
  *    it feeds both sides), exact cosine re-ranks candidates only;
  *  - IVF partitions the corpus by nearest centroid; a query probes its
  *    `nprobe` nearest lists. Centroids are trained offline (k-means) and
  *    broadcast — at 100 TB the probe join touches nprobe lists per query
  *    instead of the whole corpus.
  */
object Ann {

  private def ensure(df: DataFrame): Unit =
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)

  /** Exact top-`k` by cosine per query row (the correctness baseline).
    * Output: (q_id, rank, neighbor_id, cos). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    ensure(queries)
    val q = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("c_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    broadcast(q).crossJoin(c)
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos"))
  }

  /** Sign-hyperplane signature SQL for `bits` hyperplanes over `dim`
    * dimensions; ±1 weights derived from md5 so the "matrix" is
    * reproducible anywhere. (A production pipeline materializes trained
    * hyperplanes once and broadcasts them instead.) */
  def hyperplaneSigSql(bits: Int, dim: Int, embeddingCol: String): String =
    s"""concat_ws('', transform(sequence(0, ${bits - 1}), h ->
       |  CASE WHEN aggregate(sequence(1, $dim), CAST(0 AS DOUBLE), (acc, dd) ->
       |         acc + CASE WHEN substring(md5(concat(CAST(h AS STRING), '_', CAST(dd AS STRING))), 1, 1) >= '8'
       |                    THEN CAST(element_at($embeddingCol, dd) AS DOUBLE)
       |                    ELSE -CAST(element_at($embeddingCol, dd) AS DOUBLE) END) > 0
       |  THEN '1' ELSE '0' END))""".stripMargin

  /** LSH-bucketed top-`k`: candidates share ≥1 of `bands` signature bands,
    * exact cosine re-ranks candidates only. Approximate by construction but
    * fully deterministic. Output: (q_id, rank, neighbor_id, cos). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    ensure(queries)
    def banded(df: DataFrame, idAlias: String): DataFrame =
      stage(df
        .withColumn("sig", expr(hyperplaneSigSql(bits, dim, "embedding")))
        .select(col("id").as(idAlias),
          explode(expr(
            s"""transform(sequence(0, ${bands - 1}),
               |  b -> concat(CAST(b AS STRING), ':', substring(sig, $width*b + 1, $width)))""".stripMargin))
            .as("band")))
    val qb = banded(queries, "q_id")
    val cb = banded(corpus, "c_id")
    val cand = qb.join(cb, "band").select(col("q_id"), col("c_id")).distinct()
    val qv = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
    val cv = corpus.select(col("id").as("c_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    cand.join(qv, "q_id").join(cv, "c_id")
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos"))
  }

  /** IVF top-`k`: corpus vectors are assigned to their nearest centroid;
    * each query probes its `nprobe` nearest lists and re-ranks exactly.
    * `centroids` is an (id, embedding) relation, small enough to broadcast
    * (trained offline in a real pipeline).
    * Output: (q_id, rank, neighbor_id, cos). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2): DataFrame = {
    ensure(queries)
    val cents = centroids.select(col("id").as("cent_id"), col("embedding").as("ce"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    val assigned = corpus.select(col("id").as("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("cent_id").asc)
    val probes = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qcos", expr("cosine_sim(qe, ce)"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("q_id"), col("qe"), col("cent_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(assigned, "cent_id")
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
  }
}
