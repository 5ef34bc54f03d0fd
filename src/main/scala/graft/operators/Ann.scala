package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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
  *  - ranking is two-phase top-k (map-side per-partition heaps merged as
  *    k-row buffers — [[TopKNeighbors]]), never a global sort and never a
  *    rank window that lands one query's whole score vector on a single
  *    reducer;
  *  - brute force broadcasts the query set and scans the corpus once: the
  *    exact baseline, linear in |corpus|;
  *  - LSH maps each vector to a sign-hyperplane signature banded into
  *    short keys; candidates come from an equi-join on band keys, exact
  *    cosine re-ranks candidates only;
  *  - IVF partitions the corpus by nearest centroid; a query probes its
  *    `nprobe` nearest lists. Centroids are trained offline (k-means) and
  *    broadcast as a literal — assignment is a shuffle-free per-row
  *    argmax projection, so at 100 TB the corpus never moves to be
  *    assigned, and the probe join touches nprobe lists per query.
  */
object Ann {

  private def ensure(df: DataFrame): Unit =
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)

  /** One (neighbor, score) pair flowing into the top-k aggregation. */
  final case class ScoredNeighbor(c_id: Long, cos: Double)

  /** Aggregation buffer/result: the current best-k, sorted (cos DESC,
    * c_id ASC) — the same total order the old rank window used. */
  final case class NeighborList(items: List[ScoredNeighbor])

  /** Two-phase exact top-k: Spark runs this as a partial (map-side)
    * aggregate — each input partition reduces to a ≤k-element buffer, and
    * only those k·P rows cross the shuffle to be merged. The rank-window
    * formulation (`row_number() OVER (PARTITION BY q_id)`) instead ships
    * EVERY scored row to one reducer per query — a skew/memory killer when
    * a query's score vector is the whole corpus.
    *
    * Deterministic under any partitioning/merge order: (cos, c_id) is a
    * total order (c_id is distinct), and insertion keeps the exact best-k
    * under it. */
  final class TopKNeighbors(k: Int)
      extends Aggregator[ScoredNeighbor, NeighborList, NeighborList] {
    require(k > 0, s"k=$k must be positive")
    private def beats(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.c_id < b.c_id)
    private def insert(items: List[ScoredNeighbor], a: ScoredNeighbor): List[ScoredNeighbor] =
      if (items.lengthCompare(k) >= 0 && !beats(a, items.last)) items
      else {
        val (pre, post) = items.span(beats(_, a))
        (pre ::: (a :: post)).take(k)
      }
    override def zero: NeighborList = NeighborList(Nil)
    override def reduce(b: NeighborList, a: ScoredNeighbor): NeighborList =
      NeighborList(insert(b.items, a))
    override def merge(x: NeighborList, y: NeighborList): NeighborList =
      NeighborList(y.items.foldLeft(x.items)(insert))
    override def finish(b: NeighborList): NeighborList = b
    override def bufferEncoder = Encoders.product[NeighborList]
    override def outputEncoder = Encoders.product[NeighborList]
  }

  /** Rank a scored (q_id, c_id, cos) relation to per-query top-k rows
    * (q_id, rank, neighbor_id, cos) via [[TopKNeighbors]] — public so
    * any scorer (BM25 term scores, fused lists) reuses the two-phase
    * map-side-k-heap shape instead of a rank window. */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKNeighbors(k), Encoders.product[ScoredNeighbor])
    scored.groupBy(col("q_id"))
      .agg(topk(col("c_id"), col("cos")).as("top"))
      .select(col("q_id"), posexplode(col("top.items")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.c_id").as("neighbor_id"), col("col.cos").as("cos"))
  }

  /** Exact top-`k` by cosine per query row (the correctness baseline).
    * Output: (q_id, rank, neighbor_id, cos). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    ensure(queries)
    val q = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("c_id"), col("embedding").as("ce"))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** ±1 hyperplane weight for (hyperplane `h`, 1-based dim `d`): the sign
    * convention is `first hex digit of md5("h_d") >= '8'` — the exact rule
    * the DuckDB oracle twin recomputes per row, evaluated HERE once on the
    * driver. */
  def hyperplaneWeight(h: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${h}_${d}".getBytes("UTF-8"))
    // first hex char >= '8'  ⇔  high nibble of byte 0 >= 8.
    if (((digest(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  /** The flat ±1 weight matrix for ([[hyperplaneWeight]]), indexed
    * h·dim + (d−1) with 1-based d — attach with `typedlit` and feed the
    * column name to [[hyperplaneSigSql]]. */
  def hyperplaneWeights(bits: Int, dim: Int): Seq[Double] =
    (0 until bits).flatMap(h => (1 to dim).map(d => hyperplaneWeight(h, d)))

  /** Sign-hyperplane signature SQL for `bits` hyperplanes over `dim`
    * dimensions. `weightsCol` must hold [[hyperplaneWeights]] attached as
    * `typedlit(...)` — a true Literal. Materializing the matrix once on
    * the driver replaces an md5 per row × bit × dim inside the projection
    * (~1000× more hashing than arithmetic); it must enter the plan via
    * typedlit because an `array(...)` SQL literal inside a higher-order-
    * function lambda is NOT constant-folded — Spark rebuilds the bits·dim
    * array per element access, which measured ~150× SLOWER than the md5
    * form at bits=64. Bit-identical to the md5-in-SQL form the oracle
    * uses: the weights are the same ±1 values, `w*x` with w = ±1.0 is an
    * exact IEEE sign flip / identity, and the fold order over dims is
    * unchanged. */
  def hyperplaneSigSql(bits: Int, dim: Int, embeddingCol: String,
                       weightsCol: String): String =
    s"""concat_ws('', transform(sequence(0, ${bits - 1}), h ->
       |  CASE WHEN aggregate(sequence(1, $dim), CAST(0 AS DOUBLE), (acc, dd) ->
       |         acc + element_at($weightsCol, h * $dim + dd)
       |               * CAST(element_at($embeddingCol, dd) AS DOUBLE)) > 0
       |  THEN '1' ELSE '0' END))""".stripMargin

  /** LSH-bucketed top-`k`: candidates share ≥1 of `bands` signature bands,
    * exact cosine re-ranks candidates only. Approximate by construction but
    * fully deterministic. Output: (q_id, rank, neighbor_id, cos).
    *
    * Parameter guidance (measured — see `graft.AnnRecall` and README's
    * recall table): band width `bits/bands` sets per-band collision
    * selectivity (~2^-width for unrelated vectors), `bands` multiplies
    * chances for true neighbors. The defaults (64, 16) clear recall@10 ≈
    * 0.9 on ISOTROPIC RANDOM vectors — the worst-case geometry, where any
    * sub-exhaustive method is near its information bound and candidate
    * volume is ~64% of exhaustive. Real embedding corpora are far more
    * clustered: the same defaults prune much harder at higher recall
    * (AnnRecallSpec pins ≥0.95 recall at a fraction of exhaustive cost on
    * a clustered fixture). Tune DOWN (fewer/wider bands) only with
    * measured recall on your corpus.
    *
    * Each banded relation is consumed exactly once by the candidate join,
    * so signatures are computed once per side with no staging needed (the
    * self-join reuse concern only applies when one relation feeds both
    * sides — see graft.operators.TextDedup.minhashLshPairs). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 64, bands: Int = 16, dim: Int = 64): DataFrame = {
    ensure(queries)
    // embeddings RIDE the band relation (same move as simhashPairs' words):
    // each side is scanned ONCE, candidates score immediately on the raw
    // band join, and the dedup distinct runs on the NARROW scored rows
    // (two ids + a double — a multi-band duplicate pair produces an
    // identical cosine, so distinct-after-score ≡ distinct-before-join).
    // The alternative (distinct candidate ids, then join both vector
    // relations back) costs a second full scan of each side; recomputing
    // a ≤`bands`× duplicated 64-dim dot product is far cheaper.
    val qb = bandedRelation(queries, "q_id", "qe", bits, bands, dim)
    val cb = bandedRelation(corpus, "c_id", "ce", bits, bands, dim)
    val scored = qb.join(cb, "band")
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
      .distinct()
    rankTopK(scored, k)
  }

  /** The banded-signature projection for one side of an LSH join:
    * (idAlias, vecAlias, band), `bands` rows per input vector. Exposed so
    * a CORPUS side can be computed once, staged, and probed repeatedly
    * ([[lshTopKAgainstIndex]] / graft.streaming.AnnIngest). */
  def bandedRelation(df: DataFrame, idAlias: String, vecAlias: String,
                     bits: Int = 64, bands: Int = 16, dim: Int = 64): DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    ensure(df)
    df.withColumn("__w", typedlit(hyperplaneWeights(bits, dim)))
      .withColumn("sig", expr(hyperplaneSigSql(bits, dim, "embedding", "__w")))
      .select(col("id").as(idAlias), col("embedding").as(vecAlias),
        explode(expr(
          s"""transform(sequence(0, ${bands - 1}),
             |  b -> concat(CAST(b AS STRING), ':', substring(sig, $width*b + 1, $width)))""".stripMargin))
          .as("band"))
  }

  /** QUERY-side banded relation with MULTI-PROBE expansion (Lv et al.
    * 2007): per band, the exact key plus all `width` single-bit-flip
    * perturbations — a true neighbor differing from the query in exactly
    * one bit of a band still collides there, so recall rises WITHOUT
    * growing the index (more hash tables = more index storage + a bigger
    * build; more probes = more candidate volume per query, paid only by
    * the small probing side). Candidate volume is bounded by
    * (width + 1)× the single-probe volume and in practice far less (the
    * flipped keys are sparser buckets). The CORPUS side stays
    * [[bandedRelation]] — index and probe must share (bits, bands, dim).
    * The probe set CONTAINS the exact keys, so multi-probe candidates
    * are a superset of single-probe's — recall can only rise
    * (spec-pinned). */
  def multiProbeBandedRelation(df: DataFrame, idAlias: String, vecAlias: String,
                               bits: Int = 64, bands: Int = 16,
                               dim: Int = 64): DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    ensure(df)
    df.withColumn("__w", typedlit(hyperplaneWeights(bits, dim)))
      .withColumn("sig", expr(hyperplaneSigSql(bits, dim, "embedding", "__w")))
      .select(col("id").as(idAlias), col("embedding").as(vecAlias),
        explode(expr(
          s"""flatten(transform(sequence(0, ${bands - 1}), b ->
             |  transform(sequence(0, $width), i ->
             |    concat(CAST(b AS STRING), ':',
             |      IF(i = 0, substring(sig, $width*b + 1, $width),
             |        concat(substring(sig, $width*b + 1, i - 1),
             |               IF(substring(sig, $width*b + i, 1) = '1', '0', '1'),
             |               substring(sig, $width*b + i + 1, $width - i)))))))""".stripMargin))
          .as("band"))
    // no dedup needed, BY CONSTRUCTION: within a band the exact key and
    // the w single-bit flips are pairwise distinct, and the 'b:' prefix
    // isolates bands — a distinct here would add a shuffle (with the
    // embeddings riding) right before the broadcast, for nothing.
  }

  /** [[lshTopK]] with multi-probe queries: same candidate join and exact
    * re-rank, query side expanded per [[multiProbeBandedRelation]]. */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
                        bits: Int = 64, bands: Int = 16,
                        dim: Int = 64): DataFrame = {
    ensure(queries)
    val qb = multiProbeBandedRelation(queries, "q_id", "qe", bits, bands, dim)
    val cb = bandedRelation(corpus, "c_id", "ce", bits, bands, dim)
    val scored = qb.join(cb, "band")
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
      .distinct()
    rankTopK(scored, k)
  }

  /** [[lshTopKAgainstIndex]] with multi-probe queries — the ingest shape
    * at higher recall for the SAME persisted index: only the broadcast
    * probe side grows (≤ (width+1)×), the corpus band relation is
    * byte-identical to the single-probe one. */
  def lshTopKMultiProbeAgainstIndex(queries: DataFrame, corpusBanded: DataFrame,
                                    k: Int, bits: Int = 64, bands: Int = 16,
                                    dim: Int = 64): DataFrame = {
    val qb = multiProbeBandedRelation(queries, "q_id", "qe", bits, bands, dim)
    val scored = broadcast(qb).join(corpusBanded, "band")
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
      .distinct()
    rankTopK(scored, k)
  }

  /** [[lshTopK]] against a PREBUILT corpus band relation — the ingest
    * shape: `corpusBanded` is [[bandedRelation]]`(corpus, "c_id", "ce")`
    * staged once per corpus version, and each (small) query batch pays
    * only its own banding. The batch side is explicitly BROADCAST onto
    * the persisted index, so the corpus relation never shuffles and the
    * only exchange is the per-query top-k merge over the batch's scored
    * rows. Same parameters must be used for index and probe (signatures
    * must land in the same key space). */
  def lshTopKAgainstIndex(queries: DataFrame, corpusBanded: DataFrame, k: Int,
                          bits: Int = 64, bands: Int = 16, dim: Int = 64): DataFrame = {
    val qb = bandedRelation(queries, "q_id", "qe", bits, bands, dim)
    val scored = broadcast(qb).join(corpusBanded, "band")
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
      .distinct()
    rankTopK(scored, k)
  }

  /** Near-duplicate vector pairs within ONE corpus — the LSH scale path
    * for embedding self-dedup (`x_dedup_embedding`'s all-pairs cosine is
    * the oracle baseline; THIS is what runs at 100 TB). Candidates are
    * generated by the banded sign-hyperplane self-join, exact cosine
    * verifies candidates only, and the result is every candidate pair
    * with cosine ≥ `threshold` (va < vb). Approximate by construction —
    * a true near-dup pair colliding in no band is missed (the defaults
    * give ~0.95 candidate recall at cos 0.45 even on isotropic vectors,
    * higher on real clustered corpora; measured in graft.AnnRecall) —
    * but fully deterministic, so a SQL twin recomputes it exactly.
    *
    * Scale shape (TextDedup's staged self-join discipline): the
    * signature pass is STAGED — one relation feeds both sides of the
    * candidate join, and Spark has no subplan reuse across self-join
    * sides, so unstaged the bits·dim dot products would run twice per
    * vector. Embeddings ride the band relation (each side scanned once,
    * candidates score on the raw join output), verification precedes the
    * distinct so the dedup exchange carries only narrow surviving rows
    * (two ids + a double), and the join itself is a short-key equi-join —
    * never an all-pairs product. */
  def lshSelfPairs(corpus: DataFrame, threshold: Double,
                   bits: Int = 64, bands: Int = 16, dim: Int = 64): DataFrame = {
    val banded = stagedBandedSides(corpus, bits, bands, dim)
    banded("va", "ea").join(banded("vb", "eb"), Seq("band"))
      .filter(col("va") < col("vb"))
      .withColumn("cos", expr("cosine_sim(ea, eb)"))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
      .distinct()
  }

  /** Staged banded projection factory for SELF-joins: the signature pass
    * runs once (Tables.stage — no subplan reuse across self-join sides),
    * each returned side re-aliases the same staged relation. */
  private def stagedBandedSides(corpus: DataFrame, bits: Int, bands: Int,
                                dim: Int): (String, String) => DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    ensure(corpus)
    val sigRel = graft.sources.Tables.stage(
      corpus.withColumn("__w", typedlit(hyperplaneWeights(bits, dim)))
        .withColumn("sig", expr(hyperplaneSigSql(bits, dim, "embedding", "__w")))
        .select(col("id"), col("embedding"), col("sig")))
    (idAlias: String, vecAlias: String) =>
      sigRel.select(col("id").as(idAlias), col("embedding").as(vecAlias),
        explode(expr(
          s"""transform(sequence(0, ${bands - 1}),
             |  b -> concat(CAST(b AS STRING), ':', substring(sig, $width*b + 1, $width)))""".stripMargin))
          .as("band"))
  }

  /** Approximate k-NN GRAPH over one corpus — every vector gets its top-k
    * LSH-candidate neighbors (directed edges; cosine re-ranks exactly).
    * The primitive under semantic clustering, graph-based dedup
    * (pairs → [[Graph]] components), and RAG link building — the
    * self-join twin of [[lshTopK]]: same staged banding discipline as
    * [[lshSelfPairs]], same two-phase typed top-k as every ANN path
    * (map-side k-heaps — no rank window, no global sort). A vector whose
    * true neighbor collides in no band misses it (same measured recall
    * story as lshTopK); deterministic, so a SQL twin replays it exactly.
    * Output: (q_id, rank, neighbor_id, cos). */
  def knnGraph(corpus: DataFrame, k: Int, bits: Int = 64, bands: Int = 16,
               dim: Int = 64): DataFrame = {
    val banded = stagedBandedSides(corpus, bits, bands, dim)
    val scored = banded("q_id", "qe").join(banded("c_id", "ce"), Seq("band"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .select(col("q_id"), col("c_id"), col("cos"))
      .distinct()
    rankTopK(scored, k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication scoped to k-means clusters — the published scale path
    * that replaces the O(n²) embedding all-pairs with per-cluster
    * comparisons. A vector is DROPPED iff some same-cluster vector with a
    * smaller id has cosine ≥ `threshold` (the deterministic stand-in for
    * the paper's keep-one-per-similar-group rule; min-id is the same
    * canonical-representative convention the exact-dedup operators use).
    *
    * Plan shape:
    *  - assignment is [[assignToCentroids]]: a shuffle-free map-side
    *    argmax over the broadcast centroid literal — the corpus never
    *    moves to be clustered;
    *  - the assigned relation feeds both sides of the within-cluster pair
    *    join → staged once ([[graft.sources.Tables.stage]]);
    *  - the pair join is an equi-join on cent_id. Its parallelism equals
    *    the centroid count: production runs k ≈ |corpus| / target-cluster
    *    size (the paper uses 50k clusters for 100M docs), so cluster
    *    fan-in stays bounded and the per-cluster quadratic term is the
    *    budget the operator deliberately pays — k is the knob;
    *  - the dropped-id relation joins back by vec_id (uniform key) to
    *    flag every corpus row.
    *
    * Output: (vec_id, cent_id, kept 0/1) for EVERY corpus vector.
    * Centroids come in as (id, embedding) — trained offline via
    * [[trainCentroids]] in production; tests/oracles pin determinism with
    * fixed corpus vectors. */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double): DataFrame = {
    val assigned = graft.sources.Tables.stage(assignToCentroids(corpus, centroids))
    def side(idAlias: String, vecAlias: String): DataFrame =
      assigned.select(col("vec_id").as(idAlias), col("embedding").as(vecAlias),
        col("cent_id"))
    val dropped = side("a_id", "a_emb").join(side("b_id", "b_emb"), Seq("cent_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(expr("cosine_sim(a_emb, b_emb)") >= threshold)
      .select(col("b_id").as("vec_id"))
      .distinct()
    assigned
      .join(dropped.withColumn("__drop", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        when(col("__drop").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** The ingest form of [[semanticDedup]]: flag each BATCH vector that is
    * semantically redundant with the EXISTING corpus — some same-cluster
    * corpus vector has cosine ≥ `threshold`. `corpusAssigned` is the
    * staged [[assignToCentroids]] output (one staging per corpus version,
    * the caller-owned-index discipline of the whole ingest-gate family);
    * the batch assigns itself with the same broadcast-centroid argmax
    * (pure projection) and BROADCASTS onto the index join, so the corpus
    * relation is scanned once per batch and never shuffles — only the
    * (batch-bounded) similar-pair survivors shuffle into the per-vector
    * aggregate. Output, one row per batch vector: (vec_id, cent_id,
    * n_similar, witness_id) — witness = smallest similar corpus id, NULL
    * when the vector is novel. */
  def semanticFlagAgainst(batch: DataFrame, corpusAssigned: DataFrame,
                          centroids: DataFrame, threshold: Double): DataFrame = {
    val b = assignToCentroids(batch, centroids)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("cent_id"))
    val hits = broadcast(b)
      .join(corpusAssigned.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb"), col("cent_id")), Seq("cent_id"))
      .filter(expr("cosine_sim(b_emb, c_emb)") >= threshold)
      .groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_similar"), min(col("c_id")).as("witness_id"))
    b.join(hits, Seq("b_id"), "left")
      .select(col("b_id").as("vec_id"), col("cent_id"),
        coalesce(col("n_similar"), lit(0L)).as("n_similar"), col("witness_id"))
  }

  /** Collect the (small, by contract) centroid relation and inline it as a
    * literal `array<struct<cent_id, ce>>` column, sorted by cent_id. This
    * is the "broadcast the offline-trained centroids" step: the list rides
    * inside the plan, so scoring against it never joins or shuffles. */
  private def centroidLiteral(centroids: DataFrame): Column =
    typedlit(collectCentroids(centroids))

  private def collectCentroids(centroids: DataFrame): Seq[(Long, Seq[Float])] =
    centroids
      .select(col("id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1)
      .toSeq

  /** Scored centroid list for one vector column: ordered (cent_id ASC)
    * structs of (cid, cos). Runs entirely inside a projection. */
  private def centScores(vecCol: String): String =
    s"transform(cents, c -> named_struct('cid', c._1, 'cos', cosine_sim($vecCol, c._2)))"

  /** Nearest-centroid assignment as a shuffle-free map-side argmax: one
    * projection per row folds over the broadcast centroid literal with a
    * strict `>` (list is cent_id-ascending, so first max wins — the same
    * (cos DESC, cent_id ASC) tie-break as a rank-window formulation, with
    * zero Exchanges instead of shuffling |corpus|×|centroids| scored rows).
    * Output: (vec_id, embedding, cent_id). */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    ensure(vectors)
    vectors.select(col("id").as("vec_id"), col("embedding"))
      .withColumn("cents", centroidLiteral(centroids))
      .withColumn("cent_id", expr(
        s"""aggregate(${centScores("embedding")},
           |  named_struct('cid', CAST(-1 AS BIGINT), 'cos', CAST('-Infinity' AS DOUBLE)),
           |  (acc, x) -> IF(x.cos > acc.cos, x, acc)).cid""".stripMargin))
      .select(col("vec_id"), col("embedding"), col("cent_id"))
  }

  /** Aggregation input/buffer shells for [[VecMean]] (product encoders
    * need a case class around the Seq). */
  final case class VecIn(v: Seq[Float])
  final case class VecBuf(n: Long, s: Seq[Double])

  /** Element-wise vector mean as a typed Aggregator: map-side partial
    * (count, Σ) buffers, only k·P small buffers cross the shuffle — the
    * scale-correct centroid update (collect_list of a cluster's vectors
    * would land a whole cluster in one task). Partial-sum merge order is
    * runtime-dependent, so centroid doubles can differ in the last ulp
    * across runs — inherent to any parallel mean; k-means is robust to it
    * and this operator has no bitwise oracle. */
  final class VecMean(dim: Int) extends Aggregator[VecIn, VecBuf, VecIn] {
    override def zero: VecBuf = VecBuf(0L, Seq.fill(dim)(0.0))
    override def reduce(b: VecBuf, a: VecIn): VecBuf =
      VecBuf(b.n + 1, b.s.lazyZip(a.v).map((s, x) => s + x))
    override def merge(x: VecBuf, y: VecBuf): VecBuf =
      VecBuf(x.n + y.n, x.s.lazyZip(y.s).map(_ + _))
    override def finish(b: VecBuf): VecIn =
      if (b.n == 0L) VecIn(Seq.fill(dim)(0.0f))
      else VecIn(b.s.map(s => (s / b.n).toFloat))
    override def bufferEncoder = Encoders.product[VecBuf]
    override def outputEncoder = Encoders.product[VecIn]
  }

  /** Offline centroid training for [[ivfTopK]]: deterministic-init Lloyd
    * iterations. Init = the k smallest-id corpus vectors; each iteration
    * runs the shuffle-free argmax assignment against the current broadcast
    * centroid list, then updates every centroid to its cluster's mean via
    * [[VecMean]] (k tiny rows collected per iteration — the same
    * driver-side footprint as broadcasting them). Empty clusters keep
    * their previous centroid. Returns an (id, embedding) relation shaped
    * for `ivfTopK(centroids = ...)`. */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 5): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    ensure(corpus)
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents = collectCentroids(
      corpus.select(col("id"), col("embedding")).orderBy(col("id")).limit(k))
    require(cents.nonEmpty, "corpus has no vectors to train on")
    val dim = cents.head._2.size
    val vm = udaf(new VecMean(dim), Encoders.product[VecIn])
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(corpus, cents.toDF("id", "embedding"))
      val means = assigned.groupBy(col("cent_id"))
        .agg(vm(col("embedding")).as("m"))
        .select(col("cent_id"), col("m.v").as("me"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
        .toMap
      cents = cents.map { case (id, e) => (id, means.getOrElse(id, e)) }
    }
    cents.toDF("id", "embedding")
  }

  /** IVF top-`k`: corpus vectors are assigned to their nearest centroid;
    * each query probes its `nprobe` nearest lists and re-ranks exactly.
    * `centroids` is an (id, embedding) relation, small enough to broadcast
    * (trained offline in a real pipeline). Assignment and probe selection
    * are both per-row projections over the centroid literal — the corpus
    * is never shuffled to be assigned. Output: (q_id, rank, neighbor_id, cos).
    *
    * Retrieval quality is GEOMETRY-DEPENDENT by construction: IVF prunes
    * by cluster locality, so on isotropic random vectors recall ≈ the
    * fraction of the corpus probed (nprobe/centroids — no better than
    * random pruning; measured in `graft.AnnRecall`), while on clustered
    * corpora (the regime real embeddings live in) recall at the defaults
    * is near-1 at nprobe/centroids of the cost (AnnRecallSpec pins it on
    * a clustered fixture). If recall matters and the corpus may lack
    * cluster structure, use [[lshTopK]] or raise nprobe. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2): DataFrame = {
    ensure(queries)
    val assigned = assignToCentroids(corpus, centroids)
    val probes = ivfProbes(queries, centroids, nprobe)
    val scored = broadcast(probes).join(assigned, "cent_id")
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .select(col("q_id"), col("vec_id").as("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** Top-`nprobe` centroid lists per query: sort the per-row scored list
    * with an explicit (cos DESC, cid ASC) comparator, slice, explode — a
    * pure projection over the broadcast centroid literal. Output:
    * (q_id, qe, cent_id), one row per probed list. */
  def ivfProbes(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    ensure(queries)
    queries.select(col("id").as("q_id"), col("embedding").as("qe"))
      .withColumn("cents", centroidLiteral(centroids))
      .withColumn("cent_id", explode(expr(
        s"""transform(slice(array_sort(${centScores("qe")},
           |  (l, r) -> CASE WHEN l.cos > r.cos THEN -1 WHEN l.cos < r.cos THEN 1
           |                 WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1
           |                 ELSE 0 END),
           |  1, $nprobe), s -> s.cid)""".stripMargin)))
      .select(col("q_id"), col("qe"), col("cent_id"))
  }

  /** Per-query recall of an approximate top-k result against the exact
    * one: |approx ∩ exact| / |exact| over neighbor ids, per q_id. Both
    * inputs are (q_id, rank, neighbor_id, cos) relations as produced by
    * [[bruteTopK]]/[[lshTopK]]/[[ivfTopK]]. Queries the approximate path
    * missed entirely still appear (recall 0). Output: (q_id, hits, k,
    * recall) — a distributed semi-join + count, no collect.
    *
    * This is the measurement the hash oracle cannot make: LSH/IVF are
    * deterministic, so the driver gate proves they compute their own
    * definition — only recall against [[bruteTopK]] proves the definition
    * retrieves anything. At 100 TB brute force is off the table, so the
    * approximate paths ARE the product; see AnnRecallSpec for the asserted
    * floor at the documented defaults and README for the parameter sweep. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("q_id"), col("neighbor_id"))
    val e = exact.select(col("q_id"), col("neighbor_id"))
    val hits = a.join(e, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    e.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("hits"), lit(0L)).as("hits"), col("k"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("k")).as("recall"))
  }

  /** Mean of [[recallAtK]] over all queries — the single sweep/gate
    * number. */
  def meanRecall(approx: DataFrame, exact: DataFrame): Double =
    recallAtK(approx, exact).agg(avg(col("recall"))).head().getDouble(0)

  /** Squared-L2 between `sd`-wide slices of vector columns `a` and `b` at
    * element offset `off` (an expression, e.g. `j*8`), as an ORDERED
    * sequential fold — per-dim subtract/multiply then left-to-right adds,
    * so any engine reproduces the double bitwise (same discipline as
    * `cosine_sim`). Lambda variables are suffixed `2` so the expression
    * can nest inside an outer HOF without name collisions. */
  private def l2sqSql(a: String, b: String, off: String, sd: Int): String =
    s"""aggregate(transform(sequence(1, $sd), i2 ->
       |    (CAST(element_at($a, $off + i2) AS DOUBLE)
       |       - CAST(element_at($b, $off + i2) AS DOUBLE))
       |    * (CAST(element_at($a, $off + i2) AS DOUBLE)
       |       - CAST(element_at($b, $off + i2) AS DOUBLE))),
       |  CAST(0.0 AS DOUBLE), (a2, z2) -> a2 + z2)""".stripMargin

  /** Exact top-`k` by squared-L2 distance per query row — the correctness
    * baseline for the metric [[pqTopK]] approximates (cosine ranks
    * differently on unnormalized vectors, so PQ recall must be measured
    * against ITS OWN metric's exact ranking). Same shape as [[bruteTopK]]:
    * queries broadcast over the corpus scan, ordered zip-fold distance
    * (bitwise-portable), typed two-phase top-k. Output: (q_id, rank,
    * neighbor_id, dist), rank by (dist ASC, id ASC). */
  def bruteTopKL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("c_id"), col("embedding").as("ce"))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("cos", expr(
        """-aggregate(zip_with(qe, ce, (x, y) ->
          |    (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
          |    * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)""".stripMargin))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        (-col("cos")).as("dist"))
  }

  /** Product-quantization codes (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    * vector into `m` subspaces and store, per subspace, the POSITION of
    * the nearest codebook entry's slice (squared-L2, ties to the smaller
    * position). `codebook` is a small (id, embedding) relation of FULL
    * vectors — subspace j's codebook is their j-th slices (a real
    * pipeline trains per-subspace k-means offline; positions index the
    * id-ASCENDING order, the contract [[pqTopK]] decodes against).
    *
    * The encode is a shuffle-free map-side projection over the broadcast
    * codebook literal — the corpus never shuffles, mirroring
    * [[assignToCentroids]]. Output: (vec_id, codes array<int> of length
    * `m`). At 100 TB the point is MEMORY: m bytes-ish per vector instead
    * of 4·dim — the compressed codes relation is what a scan-heavy ANN
    * serving layer keeps hot. */
  def pqCodes(vectors: DataFrame, codebook: DataFrame, m: Int = 8): DataFrame = {
    val cents = collectCentroids(codebook)
    require(cents.nonEmpty, "codebook has no vectors")
    val dim = cents.head._2.size
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    val kk = cents.size
    vectors.select(col("id").as("vec_id"), col("embedding"))
      .withColumn("cbs", typedlit(cents))
      .withColumn("codes", expr(pqEncodeSql("embedding", m, kk, sd)))
      .select(col("vec_id"), col("codes"))
  }

  /** The per-row PQ encode expression over a broadcast codebook literal in
    * column `cbs`: per subspace j, the position of the nearest codebook
    * slice (squared-L2, ties to the smaller position) — shared by
    * [[pqCodes]] (raw vectors) and [[ivfPqCodes]] (residuals). */
  private def pqEncodeSql(vecCol: String, m: Int, kk: Int, sd: Int): String =
    s"""transform(sequence(0, ${m - 1}), j ->
       |  aggregate(
       |    transform(sequence(0, ${kk - 1}), c ->
       |      named_struct('pos', c,
       |        'd', ${l2sqSql(vecCol, "element_at(cbs, c+1)._2", s"j*$sd", sd)})),
       |    named_struct('pos', -1, 'd', CAST('Infinity' AS DOUBLE)),
       |    (acc, x) -> IF(x.d < acc.d, x, acc)).pos)""".stripMargin

  /** The assigned centroid's vector, looked up by `cent_id` in the
    * broadcast literal in column `cents` — a ≤|centroids| scan once per
    * row, never a join. */
  private val centVecSql =
    "element_at(filter(cents, c3 -> c3._1 = cent_id), 1)._2"

  /** Residual (vector − assigned centroid) as array<double>: per-dim exact
    * IEEE double subtraction, so any engine reproduces it bitwise. `cvec`
    * must hold the assigned centroid's vector ([[centVecSql]]). */
  private def residualSql(vecCol: String, dim: Int): String =
    s"""transform(sequence(1, $dim), i3 ->
       |  CAST(element_at($vecCol, i3) AS DOUBLE)
       |  - CAST(element_at(cvec, i3) AS DOUBLE))""".stripMargin

  /** IVFADC encode (Jégou, Douze & Schmid, TPAMI 2011 §V): assign each
    * corpus vector to its nearest centroid ([[assignToCentroids]]) and
    * product-quantize the RESIDUAL (vector − centroid) against `codebook`
    * — residuals concentrate around 0 once the cluster offset is removed,
    * so the same codebook budget quantizes far more accurately than coding
    * raw vectors (measured in graft.AnnRecall). The output carries the
    * cell id, which is the whole point: an ADC scan joins on `cent_id` and
    * prices only the probed lists ([[ivfPqTopKAgainstCodes]]).
    *
    * Pure shuffle-free projection over broadcast centroid/codebook
    * literals — the corpus never moves to be encoded. In production the
    * output is written PARTITIONED BY cent_id, so probe-time partition
    * pruning skips unprobed lists at the scan. Codebook semantics match
    * [[pqCodes]] (full vectors whose slices form per-subspace codebooks;
    * train on [[residualRelation]] output). Output: (vec_id, cent_id,
    * codes array<int> of length `m`). */
  def ivfPqCodes(corpus: DataFrame, centroids: DataFrame,
                 codebook: DataFrame, m: Int = 8): DataFrame = {
    val cb = collectCentroids(codebook)
    require(cb.nonEmpty, "codebook has no vectors")
    val dim = cb.head._2.size
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    val kk = cb.size
    assignToCentroids(corpus, centroids)
      .withColumn("cents", centroidLiteral(centroids))
      .withColumn("cvec", expr(centVecSql))
      .withColumn("res", expr(residualSql("embedding", dim)))
      .withColumn("cbs", typedlit(cb))
      .withColumn("codes", expr(pqEncodeSql("res", m, kk, sd)))
      .select(col("vec_id"), col("cent_id"), col("codes"))
  }

  /** Residual vectors (float) for codebook training: (id, embedding) where
    * embedding = vector − its assigned centroid, narrowed back to float so
    * [[trainCentroids]] consumes it directly. Training-side only — the
    * exact-double residual the encode/ADC paths share is recomputed there. */
  def residualRelation(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assignToCentroids(vectors, centroids)
      .withColumn("cents", centroidLiteral(centroids))
      .withColumn("cvec", expr(centVecSql))
      .select(col("vec_id").as("id"),
        expr("""zip_with(embedding, cvec, (x3, y3) ->
               |  CAST(CAST(x3 AS DOUBLE) - CAST(y3 AS DOUBLE) AS FLOAT))""".stripMargin)
          .as("embedding"))

  /** IVFADC serving: IVF pruning composed with residual-PQ ADC — each
    * query probes its `nprobe` nearest cells ([[ivfProbes]]) and
    * ADC-scans ONLY those cells' codes, so the scored volume is
    * ~nprobe/|centroids| of the code relation instead of all of it (the
    * composition [[pqTopKAgainstCodes]]' whitelisted full scan lacks).
    * Encodes the corpus inline; the production split is
    * [[ivfPqTopKAgainstCodes]] over staged [[ivfPqCodes]] output. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                codebook: DataFrame, k: Int, nprobe: Int = 2,
                m: Int = 8): DataFrame =
    ivfPqTopKAgainstCodes(queries, ivfPqCodes(corpus, centroids, codebook, m),
      centroids, codebook, k, nprobe, m)

  /** [[ivfPqTopK]] against a PRE-ENCODED (vec_id, cent_id, codes) relation
    * ([[ivfPqCodes]] under the SAME centroids/codebook/`m` — encode once
    * per corpus version, probe many).
    *
    * Plan shape: the probe side carries, per (query, probed cell), the
    * ADC lookup table for the QUERY'S RESIDUAL in that cell (r_q = q −
    * centroid; both the LUT fold and the per-dim subtraction are ordered
    * double arithmetic — bitwise-portable). That whole relation is
    * nq·nprobe rows and BROADCASTS onto an equi-join with the codes
    * relation on cent_id — a BroadcastHashJoin, never a cartesian: a code
    * row outside every probed cell is dropped by the hash probe before
    * any ADC arithmetic runs, and when the codes relation is stored
    * partitioned by cent_id the caller can additionally pre-filter to
    * `cent_id IN (probed cells)` (a by-contract-tiny driver list) so
    * partition pruning skips unprobed lists at the scan itself. The
    * per-pair sum is the same unrolled static m-term expression as
    * [[pqTopKAgainstCodes]] (HOFs run interpreted — kept out of the hot
    * path). Output: (q_id, rank, neighbor_id, adc), rank by (adc ASC,
    * id ASC). */
  def ivfPqTopKAgainstCodes(queries: DataFrame, codes: DataFrame,
                            centroids: DataFrame, codebook: DataFrame,
                            k: Int, nprobe: Int = 2, m: Int = 8): DataFrame = {
    val cb = collectCentroids(codebook)
    require(cb.nonEmpty, "codebook has no vectors")
    val dim = cb.head._2.size
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    val kk = cb.size
    val lut = ivfProbes(queries, centroids, nprobe)
      .withColumn("cents", centroidLiteral(centroids))
      .withColumn("cvec", expr(centVecSql))
      .withColumn("qr", expr(residualSql("qe", dim)))
      .withColumn("cbs", typedlit(cb))
      .withColumn("dts", expr(
        s"""transform(sequence(0, ${m - 1}), j ->
           |  transform(sequence(0, ${kk - 1}), c ->
           |    ${l2sqSql("qr", "element_at(cbs, c+1)._2", s"j*$sd", sd)}))""".stripMargin))
      .select(col("q_id"), col("cent_id"), col("dts"))
    val adcTerms = (0 until m).map(j =>
      s"element_at(element_at(dts, ${j + 1}), element_at(codes, ${j + 1}) + 1)")
      .mkString(" + ")
    val scored = broadcast(lut).join(codes, Seq("cent_id"))
      // negate so the shared (score DESC, id ASC) top-k aggregator ranks
      // by distance ASC; negation of a finite double is exact.
      .withColumn("cos", expr(s"-($adcTerms)"))
      .select(col("q_id"), col("vec_id").as("c_id"), col("cos"))
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        (-col("cos")).as("adc"))
  }

  /** PQ top-`k` by asymmetric distance (ADC): corpus vectors are encoded
    * with [[pqCodes]]; each query scores a corpus row by summing, over
    * subspaces, the exact squared-L2 from the query's slice to the slice
    * of the CODEBOOK entry the row's code names — an ordered fold over
    * j = 0..m−1, bitwise-portable. Scoring reads only (vec_id, codes):
    * the scan that at 100 TB touches m small ints per row instead of the
    * 4·dim-byte embedding (the whole point of PQ — the approximation
    * quality is bounded by quantization error, measured like IVF/LSH via
    * [[recallAtK]]). Queries broadcast onto the codes relation exactly
    * like [[bruteTopK]]; top-k is the typed map-side-heap aggregator.
    * Output: (q_id, rank, neighbor_id, adc), rank by (adc ASC, id ASC). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
             k: Int, m: Int = 8): DataFrame = {
    val cents = collectCentroids(codebook)
    require(cents.nonEmpty, "codebook has no vectors")
    val dim = cents.head._2.size
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    require(sd > 0, s"m=$m must not exceed dim=$dim")
    pqTopKAgainstCodes(queries, pqCodes(corpus, codebook, m), codebook, k, m)
  }

  /** [[pqTopK]] against a PRE-ENCODED codes relation — the production
    * split: encode once per corpus version ([[pqCodes]], staged by the
    * caller), scan many. `codes` is a (vec_id, codes) relation as
    * produced by [[pqCodes]] under the SAME codebook and `m`. */
  def pqTopKAgainstCodes(queries: DataFrame, codes: DataFrame,
                         codebook: DataFrame, k: Int, m: Int = 8): DataFrame = {
    val cents = collectCentroids(codebook)
    require(cents.nonEmpty, "codebook has no vectors")
    val dim = cents.head._2.size
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    val kk = cents.size
    // The ADC lookup table — dist(query slice j, codebook entry c slice j)
    // for all (j, c) — is computed ONCE PER QUERY on the broadcast side
    // (m·kk folds per query row). The corpus-row expression is then m
    // array lookups + m adds, not m slice folds: the arithmetic-density
    // inversion that makes the code scan memory-bound, which is the whole
    // PQ deal. Values are bitwise-unchanged vs inlining (the same fold
    // runs either way, just hoisted), so the DuckDB twin may state it
    // inline.
    val q = queries.select(col("id").as("q_id"), col("embedding").as("qe"))
      .withColumn("cbs", typedlit(cents))
      .withColumn("dts", expr(
        s"""transform(sequence(0, ${m - 1}), j ->
           |  transform(sequence(0, ${kk - 1}), c ->
           |    ${l2sqSql("qe", "element_at(cbs, c+1)._2", s"j*$sd", sd)}))""".stripMargin))
      .select(col("q_id"), col("dts"))
    // The per-pair sum is UNROLLED into a static m-term expression rather
    // than an `aggregate` HOF: higher-order functions drop out of
    // whole-stage codegen into interpreted eval, which would make the hot
    // scan pay lambda dispatch per pair. Left-to-right + is the same
    // summation order as the fold (bitwise-identical, starting from the
    // first term instead of +0.0 — adding 0.0 to a finite double is
    // exact).
    val adcTerms = (0 until m).map(j =>
      s"element_at(element_at(dts, ${j + 1}), element_at(codes, ${j + 1}) + 1)")
      .mkString(" + ")
    val scored = broadcast(q).crossJoin(codes)
      // negate so the shared (score DESC, id ASC) top-k aggregator ranks
      // by distance ASC; negation of a finite double is exact.
      .withColumn("cos", expr(s"-($adcTerms)"))
      .select(col("q_id"), col("vec_id").as("c_id"), col("cos"))
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        (-col("cos")).as("adc"))
  }
}
