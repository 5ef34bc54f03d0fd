package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Html, Web}
import graft.sources.Tables

/** Streaming crawl-frontier DISCOVERY — the loop that feeds a crawler's
  * fetch queue: each micro-batch of fetched pages has its outlinks
  * extracted ([[Html.extractLinks]], clean-first), resolved and
  * canonicalized ([[Web.withCanonicalUrl]]), and probed against the
  * growing SEEN set; URLs never seen before emit as the batch's newly
  * discovered frontier, then the batch's own page URLs AND its
  * discoveries fold in.
  *
  * Pinned contract:
  *  - link resolution = [[Web.resolveRefSql]]'s RFC 3986 §5 subset:
  *    absolute `http(s)://…`, protocol-relative `//…` (page scheme),
  *    root-relative `/…`, and PATH-RELATIVE hrefs (merged against the
  *    page's canonical base directory, dot segments removed by the
  *    bounded [[Web.dotNormSql]] chain); other schemes (`mailto:` …),
  *    empty, and fragment-only hrefs DROP — stated;
  *  - gate-then-fold (the [[DomainIngest]] discipline): novelty is
  *    judged against the PRE-batch seen set, with SET semantics within
  *    a batch — per canonical URL the batch emits ONE row, `discoverer`
  *    = the smallest referring page id (deterministic canonical pick)
  *    and `n_refs` = referring pages in the batch (links counted once
  *    per (page, url) — a page linking the same target five times
  *    discovers it once);
  *  - a URL both FETCHED and discovered in the same batch is not novel
  *    (fetching beats discovery — it is already past the queue);
  *  - the fold appends the batch's fetched canonical URLs and its novel
  *    discoveries under the batch id (replay-overwrite idempotent); the
  *    replay fence skips re-delivered batches, so a crash-replayed
  *    batch neither double-emits nor double-folds.
  *
  * Scale: the seen set is one grown root of canonical-URL strings
  * (equi-joined by left-anti on the canonical — never page bodies);
  * extraction/canonicalization are per-row codegen projections; the
  * per-batch novel relation is batch-link-bounded BY CONTRACT and is
  * settled ONCE driver-side so the emission and the fold agree (the
  * CurateIngest verdict discipline). Requires parquet staging mode. */
object FrontierIngest {

  /** Driver-side md5 hex (lowercase) — identical to both engines'
    * `md5()` string form; the quota's deterministic tie-break. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Growing frontier state: the live seen-URL view + its root. */
  final case class FrontierState(seen: DataFrame, seenPath: String,
                                 version: Long, foldedBatch: Long = -1L)
    extends Gate.Folded

  /** Canonical page URLs of a fetched batch:
    * (id, curl, scheme, host, path) — path is the canonical
    * path-without-query, the base [[Web.resolveRefSql]] resolves
    * relative hrefs against. */
  def pageUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    Web.withCanonicalUrl(
      df.select(col(idCol).cast("long").as("id"), col(urlCol).as("url")),
      "url", "__c")
      .select(col("id"), col("__c").as("curl"),
        expr("split_part(__c, '://', 1)").as("scheme"),
        col("__c_host").as("host"),
        expr("""split_part(substring(__c,
          |  length(split_part(__c, '://', 1)) + 4 + length(__c_host)),
          |  '?', 1)""".stripMargin).as("path"))

  /** Resolved + canonicalized outlinks of a fetched batch:
    * (curl, ref_id) — one row per (page, distinct target). Resolution
    * = [[Web.resolveRefSql]]'s RFC 3986 §5 subset: absolute http(s),
    * protocol-relative, root-relative, and PATH-RELATIVE hrefs (merged
    * against the page's base directory, dot segments removed); other
    * schemes / empty / fragment-only drop. */
  def outlinks(df: DataFrame, idCol: String, urlCol: String,
               htmlCol: String): DataFrame = {
    val pages = df.select(col(idCol).cast("long").as("id"),
      col(urlCol).as("url"), col(htmlCol).as("__h"))
    val ctx = pageUrls(pages, "id", "url").select(col("id"), col("scheme"),
      col("host"), col("path"))
    val resolved = Html.extractLinks(pages, "id", "__h")
      .join(ctx, col("doc_id") === col("id"))
      .withColumn("__abs", expr(
        Web.resolveRefSql("href", "scheme", "host", "path", duck = false)))
      .filter(col("__abs").isNotNull)
    Web.withCanonicalUrl(resolved, "__abs", "__c")
      .select(col("__c").as("curl"), col("id").as("ref_id"))
      .distinct()
  }

  /** Canonical REDIRECT ALIAS rows of a batch: (from_url, to_url),
    * both canonical — the 3xx + `Location` edges a real crawl records
    * (a page fetched via a redirected spelling never collapses with
    * its canonical twin unless these fold into the url→id map —
    * [[LinkGraphIngest]]'s alias discipline). `toCol` may be RELATIVE
    * (RFC 9110 §10.2.2 allows it): it resolves against the from-url's
    * canonical base via the same RFC 3986 §5 subset as hrefs;
    * unresolvable (other-scheme / empty) and self-aliases drop. */
  def aliasLinks(df: DataFrame, fromCol: String, toCol: String): DataFrame = {
    val src = df.select(col(fromCol).cast("string").as("__au"),
        col(toCol).cast("string").as("__loc"))
      .filter(col("__au").isNotNull && col("__loc").isNotNull &&
        col("__loc") =!= "")
      .distinct()
    // canonical context JOINED back (the [[outlinks]] shape — the join
    // keeps resolveRefSql's many scheme/host/path references plain
    // ATTRIBUTES; inlining the canonical projection chain per
    // reference explodes the expression tree exponentially, the
    // chained-withColumns trap).
    val ctx = Web.withCanonicalUrl(
      src.select(col("__au")).distinct(), "__au", "__c")
      .select(col("__au").as("__cu"), col("__c"),
        expr("split_part(__c, '://', 1)").as("__scheme"),
        col("__c_host").as("__host"),
        expr("""split_part(substring(__c,
          |  length(split_part(__c, '://', 1)) + 4 + length(__c_host)),
          |  '?', 1)""".stripMargin).as("__path"))
    val resolved = src.join(ctx, col("__au") === col("__cu"))
      .withColumn("__abs", expr(
        Web.resolveRefSql("__loc", "__scheme", "__host", "__path",
          duck = false)))
      .filter(col("__abs").isNotNull)
    Web.withCanonicalUrl(resolved, "__abs", "__t")
      .select(col("__c").as("from_url"), col("__t").as("to_url"))
      .filter(col("from_url") =!= col("to_url"))
      .distinct()
  }

  /** Seed the seen set from an already-fetched corpus ONCE (tracked
    * staging — the growing-root contract; pass an empty relation to
    * start from nothing). */
  def buildFrontier(corpus: DataFrame, urlCol: String,
                    version: Long = 0L): FrontierState = {
    val spark = corpus.sparkSession
    val seed = Tables.stageTracked(
      corpus.select(col(urlCol).as("url"))
        .transform(Web.withCanonicalUrl(_, "url", "__c"))
        .select(col("__c").as("url")).distinct())
    require(seed.path.isDefined,
      "buildFrontier requires parquet staging mode (set graft.stage.dir): " +
        "the frontier gate folds by appending to the persisted seen root")
    val st = FrontierState(null, seed.path.get, version)
    st.copy(seen = Gate.readGrown(spark, st.seenPath))
  }

  /** Restore from a persisted seen root (prunes folds past the fence —
    * the crash-repair path). */
  def restoreFrontier(spark: org.apache.spark.sql.SparkSession,
                      seenPath: String, version: Long = 0L,
                      foldedBatch: Long = -1L): FrontierState = {
    Gate.pruneGrown(spark, seenPath, foldedBatch)
    FrontierState(Gate.readGrown(spark, seenPath), seenPath, version,
      foldedBatch)
  }

  /** DISCOVER-THEN-FOLD: `onBatch` receives the batch's novel frontier
    * (url, discoverer, n_refs), judged against the PRE-batch seen set;
    * then the batch's page URLs + discoveries fold in.
    *
    * `robots` (optional) is a FROZEN (host, prefix) Disallow relation
    * — [[Web.filterRobotsAllowed]]'s pinned literal-prefix subset,
    * applied to the batch's resolved outlinks BEFORE the novelty
    * probe: a disallowed url is never emitted novel and never folds
    * into seen via discovery (rules can change between deployments —
    * an unblocked url must still be discoverable later). Fetched pages
    * fold regardless: fetching is the caller's decision, the gate
    * curates DISCOVERIES. The frozen-probe discipline: the relation is
    * fixed for the query's lifetime, broadcast per batch.
    *
    * `robotsRfc` (optional) is the RFC 9309 upgrade — a FROZEN
    * (host, pattern, allow) relation through
    * [[Web.filterRobotsAllowedRfc]] (`*`/`$` wildcards, `Allow:`
    * longest-match precedence), same placement and same
    * never-folds-disallowed semantics. Both gates may be passed; they
    * compose (each is a filter).
    *
    * `domainCap` (optional) is the DISCOVERY BUDGET — the politeness
    * quota a real frontier runs under: the seen set is bounded to
    * `cap` urls per REGISTRABLE DOMAIN. Fetched pages always fold
    * (the bandwidth-accounting stance); a batch's novel discoveries
    * fill only their domain's remaining quota, smallest
    * md5('fq:'||url) first (deterministic on any engine/replay — the
    * salted-hash sampling discipline); over-quota discoveries drop
    * UN-FOLDED, so a later compaction/raise of the cap can still
    * discover them. The per-domain priors come from ONE scan of the
    * grown seen root semi-joined to the batch's (batch-bounded)
    * domain set; the quota itself settles driver-side with the novel
    * set. */
  def startFrontier(stream: Stream, state: AtomicReference[FrontierState],
                    idCol: String, urlCol: String, htmlCol: String,
                    checkpoint: Option[String] = None,
                    robots: Option[DataFrame] = None,
                    domainCap: Option[Long] = None,
                    robotsRfc: Option[DataFrame] = None)(
                    onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val pages = pageUrls(batch, idCol, urlCol)
      val links = outlinks(batch, idCol, urlCol, htmlCol)
      val afterLiteral = robots.map(Web.filterRobotsAllowed(links, "curl", _))
        .getOrElse(links)
      val allowed = robotsRfc
        .map(Web.filterRobotsAllowedRfc(afterLiteral, "curl", _))
        .getOrElse(afterLiteral)
      val cand = allowed
        .groupBy(col("curl"))
        .agg(min(col("ref_id")).as("discoverer"),
          count(lit(1)).cast("long").as("n_refs"))
      // settle the novel set ONCE driver-side (batch-link-bounded by
      // contract) — the emitted relation and the fold must agree.
      val novRel = cand
        .join(st.seen.select(col("url").as("curl")), Seq("curl"), "left_anti")
        .join(pages.select(col("curl")).distinct(), Seq("curl"), "left_anti")
      val novel: Seq[(String, Long, Long)] = domainCap match {
        case None =>
          novRel.select(col("curl").as("url"), col("discoverer"),
            col("n_refs")).as[(String, Long, Long)].collect().toSeq
        case Some(cap) =>
          val cands = Web.withRegistrableDomain(
            novRel.withColumn("__h", expr(Web.canonicalHostSql("curl"))),
            "__h", "__dom")
            .select(col("curl").as("url"), col("discoverer"), col("n_refs"),
              col("__dom"))
            .as[(String, Long, Long, String)].collect().toSeq
          val domRel = cands.map(_._4).distinct.toDF("__dom")
          // countDistinct, not count: a root restored from an older
          // deployment may carry duplicate URL rows (pre-r16 folds
          // appended a fetched URL even when discovery had already
          // folded it) — the quota prior must count URLs, not rows.
          val prior = Web.withRegistrableDomain(
            st.seen.withColumn("__h", expr(Web.canonicalHostSql("url"))),
            "__h", "__dom")
            .join(broadcast(domRel), Seq("__dom"))
            .groupBy(col("__dom")).agg(countDistinct(col("url")).as("n"))
            .as[(String, Long)].collect().toMap
          cands.groupBy(_._4).toSeq.flatMap { case (dm, rows) =>
            val left = math.max(0L, cap - prior.getOrElse(dm, 0L))
            rows.sortBy(r => (md5hex("fq:" + r._1), r._1))
              .take(math.min(left, Int.MaxValue.toLong).toInt)
          }.map(r => (r._1, r._2, r._3)).sortBy(_._1)
      }
      val novelDf = novel.toDF("url", "discoverer", "n_refs")
      // Fold only URLs genuinely new to the root: a fetched page whose
      // URL was discovered in an earlier batch is already seen — the
      // anti-join keeps the grown root duplicate-free, so row counts
      // over it stay URL counts (the domainCap prior depends on it).
      Gate.growDir(
        pages.select(col("curl").as("url")).distinct()
          .join(st.seen.select(col("url")), Seq("url"), "left_anti")
          .unionByName(novelDf.select(col("url"))).distinct(),
        st.seenPath, batchId)
      (novelDf, st.copy(seen = Gate.readGrown(spark, st.seenPath),
        version = st.version + 1, foldedBatch = batchId))
    }(onBatch)
}
