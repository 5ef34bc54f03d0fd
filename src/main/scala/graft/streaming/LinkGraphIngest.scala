package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Tables

/** Streaming hyperlink-graph maintenance — the companion of
  * [[FrontierIngest]] (the frontier decides what to fetch next; this
  * gate keeps the directed graph of what HAS been fetched): each
  * micro-batch of fetched pages appends its canonical URL → page-id
  * mapping, its resolvable outlinks become edges, and — the part a
  * naive design loses — outlinks whose target was NOT yet fetched wait
  * in a PENDING root and resolve RETROACTIVELY the moment a later
  * batch fetches the target.
  *
  * State = four grown roots under one batch id per fold:
  *  - `urls`    (url, id): canonical page URL → page id;
  *  - `edges`   (s, d):    resolved directed edges;
  *  - `pending` (url, ref_id): links whose target URL is unfetched;
  *  - `consumed` (url, ref_id): pending rows that HAVE resolved —
  *    the tombstone side of pending (grown roots are append-only;
  *    live pending = pending ANTI consumed, the retire discipline).
  *
  * Pinned contract:
  *  - link resolution rules are [[FrontierIngest.outlinks]]'s — the
  *    full RFC 3986 §5 pinned subset of [[graft.operators.Web.resolveRefSql]]
  *    (absolute http(s), protocol-relative, root-relative, and
  *    path-relative with bounded dot-segment removal; other schemes,
  *    fragment-only, and empty hrefs drop);
  *  - a URL fetched more than once resolves to the SMALLEST page id
  *    (min over the live map — deterministic under any fold order);
  *  - each batch resolves (live pending ∪ batch outlinks) against
  *    (live map ∪ batch pages), so fetch-then-link and link-then-fetch
  *    both produce the edge — order-independence is the point;
  *  - self-loops drop; the emitted relation per batch is the NEWLY
  *    resolved edge set, deduplicated against the live edge root
  *    (exactly-once edge emission across the stream), settled ONCE
  *    driver-side (batch-link-bounded by contract + retro-resolutions
  *    bounded by the pending rows the batch's pages satisfy);
  *  - the replay fence skips re-delivered batches; growDir appends are
  *    replay-overwrite, so a crash mid-fold re-runs idempotently.
  *
  * Scale: every join is an equi-join on a canonical URL string or a
  * page id; page bodies never shuffle; the pending root carries only
  * (url, ref_id) pairs — the dangling-link set, bounded by crawl
  * breadth. Ranking on demand = [[graft.operators.Graph.pageRankDirected]]
  * over the live edge view. Requires parquet staging mode. */
object LinkGraphIngest {

  /** Growing link-graph state: live views + the four roots. */
  final case class LinkGraphState(urls: DataFrame, edges: DataFrame,
                                  pending: DataFrame,
                                  urlsPath: String, edgesPath: String,
                                  pendingPath: String, consumedPath: String,
                                  version: Long, foldedBatch: Long = -1L)
    extends Gate.Folded

  private def liveViews(spark: org.apache.spark.sql.SparkSession,
                        st: LinkGraphState): LinkGraphState = {
    val pendingLive = Gate.readGrown(spark, st.pendingPath)
      .join(Gate.readGrown(spark, st.consumedPath),
        Seq("url", "ref_id"), "left_anti")
    st.copy(urls = Gate.readGrown(spark, st.urlsPath),
      edges = Gate.readGrown(spark, st.edgesPath).distinct(),
      pending = pendingLive)
  }

  /** Seed from an already-fetched corpus ONCE: its URL map, its
    * internally-resolvable edges, and its dangling outlinks as the
    * initial pending set. */
  def buildLinkGraph(corpus: DataFrame, idCol: String, urlCol: String,
                     htmlCol: String, version: Long = 0L): LinkGraphState = {
    val spark = corpus.sparkSession
    val pages = Tables.stageTracked(
      FrontierIngest.pageUrls(corpus, idCol, urlCol)
        .groupBy(col("curl").as("url")).agg(min(col("id")).as("id")))
    val links = Tables.stageTracked(
      FrontierIngest.outlinks(corpus, idCol, urlCol, htmlCol)
        .select(col("curl").as("url"), col("ref_id")))
    require(pages.path.isDefined && links.path.isDefined,
      "buildLinkGraph requires parquet staging mode (set graft.stage.dir)")
    val resolved = links.df.join(pages.df, Seq("url"))
      .filter(col("ref_id") =!= col("id"))
      .select(col("ref_id").as("s"), col("id").as("d")).distinct()
    val dangling = links.df.join(pages.df.select(col("url")),
      Seq("url"), "left_anti")
    val ed = Tables.stageTracked(resolved)
    val pd = Tables.stageTracked(dangling)
    val cd = Tables.stageTracked(
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("ref_id",
            org.apache.spark.sql.types.LongType)))))
    val st = LinkGraphState(null, null, null, pages.path.get, ed.path.get,
      pd.path.get, cd.path.get, version)
    liveViews(spark, st)
  }

  /** Restore from the four roots (prunes folds past the fence). */
  def restoreLinkGraph(spark: org.apache.spark.sql.SparkSession,
                       urlsPath: String, edgesPath: String,
                       pendingPath: String, consumedPath: String,
                       version: Long = 0L,
                       foldedBatch: Long = -1L): LinkGraphState = {
    Seq(urlsPath, edgesPath, pendingPath, consumedPath)
      .foreach(Gate.pruneGrown(spark, _, foldedBatch))
    liveViews(spark, LinkGraphState(null, null, null, urlsPath, edgesPath,
      pendingPath, consumedPath, version, foldedBatch))
  }

  /** RESOLVE-THEN-FOLD: `onBatch` receives the batch's newly resolved
    * edges (s, d, url) — including RETRO-resolutions of earlier
    * batches' dangling links the batch's pages satisfy. */
  def startLinkGraph(stream: Stream, state: AtomicReference[LinkGraphState],
                     idCol: String, urlCol: String, htmlCol: String,
                     checkpoint: Option[String] = None)(
                     onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val bp = FrontierIngest.pageUrls(batch, idCol, urlCol)
        .select(col("curl").as("url"), col("id"))
      val bl = FrontierIngest.outlinks(batch, idCol, urlCol, htmlCol)
        .select(col("curl").as("url"), col("ref_id"))
      // the map AS OF this batch: grown rows + the batch's own pages,
      // min id per url (re-fetches resolve deterministically).
      val fullMap = st.urls.unionByName(bp)
        .groupBy(col("url")).agg(min(col("id")).as("id"))
      val cand = st.pending.unionByName(bl).distinct()
      val resolvedAll = cand.join(fullMap, Seq("url"))
        .filter(col("ref_id") =!= col("id"))
        .select(col("ref_id").as("s"), col("id").as("d"), col("url"))
      // settle ONCE driver-side: emission, edge append, and pending
      // consumption must agree (batch-link + satisfied-pending bounded).
      val newEdges = resolvedAll
        .join(st.edges, Seq("s", "d"), "left_anti")
        .distinct()
        .as[(Long, Long, String)].collect().toSeq
      val newEdgesDf = newEdges.toDF("s", "d", "url")
      // tombstone only LIVE pending rows that resolved this batch —
      // batch links that resolve immediately never enter the pending
      // root (stillPending anti-joins the map), so tombstoning them
      // would grow consumed O(all resolved links) instead of
      // O(retro-resolved).
      val consumed = st.pending
        .join(fullMap.select(col("url")), Seq("url"))
        .select(col("url"), col("ref_id")).distinct()
        .as[(String, Long)].collect().toSeq
      val stillPending = bl
        .join(fullMap.select(col("url")), Seq("url"), "left_anti")
        .select(col("url"), col("ref_id"))
      Gate.growDir(bp, st.urlsPath, batchId)
      Gate.growDir(newEdgesDf.select(col("s"), col("d")), st.edgesPath, batchId)
      Gate.growDir(stillPending, st.pendingPath, batchId)
      Gate.growDir(consumed.toDF("url", "ref_id"), st.consumedPath, batchId)
      (newEdgesDf, liveViews(spark,
        st.copy(version = st.version + 1, foldedBatch = batchId)))
    }(onBatch)
}
