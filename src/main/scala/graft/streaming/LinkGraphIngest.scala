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

  /** Growing link-graph state: live views + the six roots. The ALIAS
    * roots carry redirect edges (from_url, to_url) whose target is not
    * yet fetched — the pending/consumed discipline applied to 3xx
    * `Location` aliases: when a later batch fetches `to_url`, the
    * alias RESOLVES into a url-map row (from_url → id(to_url)), so a
    * page reached via the redirected spelling collapses with its
    * canonical twin retroactively. Alias CHAINS (A→B→C with B never
    * fetched directly) resolve one level per batch fold — the same
    * retro cadence as pending links (stated). */
  final case class LinkGraphState(urls: DataFrame, edges: DataFrame,
                                  pending: DataFrame, aliases: DataFrame,
                                  urlsPath: String, edgesPath: String,
                                  pendingPath: String, consumedPath: String,
                                  aliasesPath: String,
                                  aliasConsumedPath: String,
                                  version: Long, foldedBatch: Long = -1L)
    extends Gate.Folded

  private def liveViews(spark: org.apache.spark.sql.SparkSession,
                        st: LinkGraphState): LinkGraphState = {
    val pendingLive = Gate.readGrown(spark, st.pendingPath)
      .join(Gate.readGrown(spark, st.consumedPath),
        Seq("url", "ref_id"), "left_anti")
    val aliasLive = Gate.readGrown(spark, st.aliasesPath)
      .join(Gate.readGrown(spark, st.aliasConsumedPath),
        Seq("from_url", "to_url"), "left_anti")
    st.copy(urls = Gate.readGrown(spark, st.urlsPath),
      edges = Gate.readGrown(spark, st.edgesPath).distinct(),
      pending = pendingLive, aliases = aliasLive)
  }

  private def emptyRel(spark: org.apache.spark.sql.SparkSession,
                       a: String, b: String,
                       bType: org.apache.spark.sql.types.DataType)
      : DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(a,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(b, bType))))

  /** Seed from an already-fetched corpus ONCE: its URL map, its
    * internally-resolvable edges, and its dangling outlinks as the
    * initial pending set. `aliases` (optional) is a CANONICAL
    * (from_url, to_url) redirect relation ([[FrontierIngest.aliasLinks]]
    * output): entries whose target is in the corpus resolve into the
    * url map now; the rest seed the alias root and resolve
    * retroactively. */
  def buildLinkGraph(corpus: DataFrame, idCol: String, urlCol: String,
                     htmlCol: String, version: Long = 0L,
                     aliases: Option[DataFrame] = None): LinkGraphState = {
    val spark = corpus.sparkSession
    val al = aliases.map(_.select(col("from_url"), col("to_url")).distinct())
      .getOrElse(emptyRel(spark, "from_url", "to_url",
        org.apache.spark.sql.types.StringType))
    val direct = FrontierIngest.pageUrls(corpus, idCol, urlCol)
      .groupBy(col("curl").as("url")).agg(min(col("id")).as("id"))
    val aliasResolved = al
      .join(direct.select(col("url").as("to_url"), col("id")), Seq("to_url"))
      .select(col("from_url").as("url"), col("id"))
    val pages = Tables.stageTracked(direct.unionByName(aliasResolved)
      .groupBy(col("url")).agg(min(col("id")).as("id")))
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
    val aliasWaiting = al.join(
      direct.select(col("url").as("to_url")), Seq("to_url"), "left_anti")
      .select(col("from_url"), col("to_url"))
    val ed = Tables.stageTracked(resolved)
    val pd = Tables.stageTracked(dangling)
    val cd = Tables.stageTracked(emptyRel(spark, "url", "ref_id",
      org.apache.spark.sql.types.LongType))
    val ad = Tables.stageTracked(aliasWaiting)
    val acd = Tables.stageTracked(emptyRel(spark, "from_url", "to_url",
      org.apache.spark.sql.types.StringType))
    val st = LinkGraphState(null, null, null, null, pages.path.get,
      ed.path.get, pd.path.get, cd.path.get, ad.path.get, acd.path.get,
      version)
    liveViews(spark, st)
  }

  /** Restore from the six roots (prunes folds past the fence). */
  def restoreLinkGraph(spark: org.apache.spark.sql.SparkSession,
                       urlsPath: String, edgesPath: String,
                       pendingPath: String, consumedPath: String,
                       aliasesPath: String, aliasConsumedPath: String,
                       version: Long = 0L,
                       foldedBatch: Long = -1L): LinkGraphState = {
    Seq(urlsPath, edgesPath, pendingPath, consumedPath, aliasesPath,
      aliasConsumedPath)
      .foreach(Gate.pruneGrown(spark, _, foldedBatch))
    liveViews(spark, LinkGraphState(null, null, null, null, urlsPath,
      edgesPath, pendingPath, consumedPath, aliasesPath, aliasConsumedPath,
      version, foldedBatch))
  }

  /** COMPACTION — the OPTIMIZE step of the growing lifecycle (the
    * ContainmentIngest.compactGrowing discipline): fresh staged roots
    * from the LIVE views — the url map consolidates to min id per url
    * (re-fetch duplicate rows purge), edges dedup, pending/alias
    * roots purge their tombstones, and both tombstone roots reset
    * empty. Version bumps; the replay fence carries. A crash
    * mid-compaction leaves the OLD roots untouched — re-run and swap
    * atomically (the caller owns the swap; old roots reclaim after). */
  def compactState(spark: org.apache.spark.sql.SparkSession,
                   st: LinkGraphState): LinkGraphState = {
    val urls = Tables.stageTracked(
      st.urls.groupBy(col("url")).agg(min(col("id")).as("id")))
    val edges = Tables.stageTracked(st.edges)
    val pend = Tables.stageTracked(
      st.pending.select(col("url"), col("ref_id")))
    val cons = Tables.stageTracked(emptyRel(spark, "url", "ref_id",
      org.apache.spark.sql.types.LongType))
    val ad = Tables.stageTracked(
      st.aliases.select(col("from_url"), col("to_url")))
    val acd = Tables.stageTracked(emptyRel(spark, "from_url", "to_url",
      org.apache.spark.sql.types.StringType))
    require(urls.path.isDefined,
      "compactState requires parquet staging mode (set graft.stage.dir)")
    liveViews(spark, LinkGraphState(null, null, null, null, urls.path.get,
      edges.path.get, pend.path.get, cons.path.get, ad.path.get,
      acd.path.get, st.version + 1, st.foldedBatch))
  }

  /** RESOLVE-THEN-FOLD: `onBatch` receives the batch's newly resolved
    * edges (s, d, url) — including RETRO-resolutions of earlier
    * batches' dangling links the batch's pages satisfy.
    *
    * `aliasCols` (optional) names a (fromCol, toCol) RAW-url column
    * pair in the batch: rows whose to-column is non-null/non-empty are
    * REDIRECT rows (3xx + `Location` — what a WARC-fed fetch layer
    * delivers beside pages), not pages; they carry no extractable
    * html and never enter pageUrls/outlinks. Their canonical alias
    * edge ([[FrontierIngest.aliasLinks]]) resolves against the map AS
    * OF the batch — immediately when the target is already fetched
    * (the alias map row joins this batch's own link resolution, so a
    * pending link to the redirected spelling collapses in the SAME
    * fold), retroactively via the alias root otherwise. */
  def startLinkGraph(stream: Stream, state: AtomicReference[LinkGraphState],
                     idCol: String, urlCol: String, htmlCol: String,
                     checkpoint: Option[String] = None,
                     aliasCols: Option[(String, String)] = None)(
                     onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val isAlias = aliasCols.map { case (_, t) =>
        col(t).isNotNull && col(t) =!= "" }.getOrElse(lit(false))
      val pagesRows = batch.filter(!isAlias)
      val ba = aliasCols.map { case (f, t) =>
        FrontierIngest.aliasLinks(batch.filter(isAlias), f, t)
      }.getOrElse(emptyRel(spark, "from_url", "to_url",
        org.apache.spark.sql.types.StringType))
      val bp = FrontierIngest.pageUrls(pagesRows, idCol, urlCol)
        .select(col("curl").as("url"), col("id"))
      val bl = FrontierIngest.outlinks(pagesRows, idCol, urlCol, htmlCol)
        .select(col("curl").as("url"), col("ref_id"))
      // the DIRECT map AS OF this batch: grown rows (incl. previously
      // resolved alias entries) + the batch's own pages, min id per
      // url (re-fetches resolve deterministically).
      val directMap = st.urls.unionByName(bp)
        .groupBy(col("url")).agg(min(col("id")).as("id"))
      // alias resolution BEFORE link resolution: an alias whose target
      // is (now) fetched becomes a url-map row this same fold.
      val aliasCand = st.aliases.unionByName(ba).distinct()
      val aliasResolved = aliasCand
        .join(directMap.select(col("url").as("to_url"), col("id")),
          Seq("to_url"))
        .select(col("from_url").as("url"), col("id"))
      val fullMap = directMap.unionByName(aliasResolved)
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
      // O(retro-resolved). Aliases follow the same discipline.
      val consumed = st.pending
        .join(fullMap.select(col("url")), Seq("url"))
        .select(col("url"), col("ref_id")).distinct()
        .as[(String, Long)].collect().toSeq
      val stillPending = bl
        .join(fullMap.select(col("url")), Seq("url"), "left_anti")
        .select(col("url"), col("ref_id"))
      val aliasConsumed = st.aliases
        .join(directMap.select(col("url").as("to_url")), Seq("to_url"))
        .select(col("from_url"), col("to_url")).distinct()
        .as[(String, String)].collect().toSeq
      val stillAlias = ba
        .join(directMap.select(col("url").as("to_url")), Seq("to_url"),
          "left_anti")
        .select(col("from_url"), col("to_url"))
      // the urls root grows the batch pages AND this fold's resolved
      // alias entries — later batches' directMap then carries them.
      Gate.growDir(bp.unionByName(aliasResolved.select(col("url"), col("id"))),
        st.urlsPath, batchId)
      Gate.growDir(newEdgesDf.select(col("s"), col("d")), st.edgesPath, batchId)
      Gate.growDir(stillPending, st.pendingPath, batchId)
      Gate.growDir(consumed.toDF("url", "ref_id"), st.consumedPath, batchId)
      Gate.growDir(stillAlias, st.aliasesPath, batchId)
      Gate.growDir(aliasConsumed.toDF("from_url", "to_url"),
        st.aliasConsumedPath, batchId)
      (newEdgesDf, liveViews(spark,
        st.copy(version = st.version + 1, foldedBatch = batchId)))
    }(onBatch)
}
