package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Web
import graft.sources.Tables

/** Streaming CRAWL-TRAP accounting — the ingest half of
  * [[Web.trapScores]] (the batch scorer): a FOLDING gate over the
  * distinct (host, content-digest, url-digest) triple set, so the
  * crawler notices a host minting unbounded url spellings over a
  * bounded content set WHILE fetching it, not in a nightly sweep.
  *
  * Gate-then-fold (the [[DomainIngest]] discipline): every batch row is
  * flagged against the PRE-batch per-host score — `prior_x100` =
  * distinct urls per distinct content ×100 over everything fetched
  * before this batch (100, the neutral 1:1, for unseen hosts),
  * `trapped` = prior ≥ the threshold — then the batch's triples merge
  * in. SET semantics within a batch (all rows of one host see the same
  * prior — pinned).
  *
  * The foldable core is a SET, not counts: triples dedup on
  * (host, md5(text), md5(canonical url)), so the union fold is
  * IDEMPOTENT — re-fetching a url with unchanged content is absorbed,
  * which is exactly the wanted semantics (a polite re-crawl must not
  * inflate a trap score). Fold ≡ a fresh [[buildState]] over everything
  * seen, bitwise (set union is order-free); the replay fence therefore
  * guards EMISSION dedup only (the HLL-novelty contrast to the
  * count-folding gates, where double-folding corrupts state — stated).
  *
  * Scale: the triple relation is crawl-sized (one row per distinct
  * url×content — the [[LinkGraphIngest]] url-map scale), staged
  * parquet, NEVER broadcast; the per-batch probe semi-joins the grown
  * root down to the batch's hosts first (the FrontierIngest
  * quota-prior discipline: ONE scan of the root per batch, scores
  * computed over the pruned slice, then broadcast — batch-host-bounded
  * by contract). Canonicalization runs INSIDE the gate projection.
  */
object TrapIngest {

  /** FOLDING trap state: the staged distinct triple relation. */
  final case class TrapState(pairs: Tables.Staged, thresholdX100: Long,
                             version: Long, foldedBatch: Long = -1L,
                             superseded: Seq[Tables.Staged] = Nil)
    extends Gate.Folded {
    /** Drop the superseded state dirs — the next fold's backstop. */
    def reclaim(): Unit = superseded.foreach(_.drop())
  }

  /** The shared (id, host, dg, uh) projection: canonical host,
    * content digest, canonical-url digest. Pure codegen — text leaves
    * the plan here. */
  def pairs(df: DataFrame, idCol: String, urlCol: String,
            textCol: String): DataFrame =
    Web.withCanonicalUrl(
      df.select(col(idCol).cast("long").as("id"), col(urlCol).as("url"),
        col(textCol).as("__t")),
      "url", "__c")
      .select(col("id"), col("__c_host").as("host"),
        md5(col("__t")).as("dg"), md5(col("__c")).as("uh"))

  /** Per-host scores over a (host, dg, uh) DISTINCT triple relation —
    * the [[Web.trapScores]] cascade (triples are distinct, so the
    * per-(host, dg) url count is a plain count): (host, n_urls,
    * n_content, urls_per_content_x100). */
  def scoresOf(triples: DataFrame): DataFrame =
    triples
      .groupBy(col("host"), col("dg"))
      .agg(count(lit(1)).cast("long").as("__nu"))
      .groupBy(col("host"))
      .agg(sum(col("__nu")).cast("long").as("n_urls"),
        count(lit(1)).as("n_content"))
      .select(col("host"), col("n_urls"), col("n_content"),
        expr("n_urls * 100 div n_content").as("urls_per_content_x100"))

  /** Stage the initial corpus' distinct triples ONCE (tracked staging,
    * so grown versions can reclaim their predecessors). */
  def buildState(corpus: DataFrame, idCol: String, urlCol: String,
                 textCol: String, thresholdX100: Long,
                 version: Long = 0L): TrapState = {
    require(thresholdX100 > 100, s"thresholdX100=$thresholdX100")
    TrapState(
      Tables.stageTracked(pairs(corpus, idCol, urlCol, textCol)
        .select(col("host"), col("dg"), col("uh")).distinct()),
      thresholdX100, version)
  }

  /** GATE-THEN-FOLD trap accounting: `onBatch` receives
    * (id, host, prior_x100, trapped) for every batch row — against the
    * PRE-batch state — then the batch's triples fold in (set union).
    * The pre-batch staged relation stays on disk until the NEXT fold's
    * backstop reclaim, so the in-flight flagged relation is always
    * readable. */
  def startTrapGate(stream: Stream, state: AtomicReference[TrapState],
                    idCol: String, urlCol: String, textCol: String,
                    checkpoint: Option[String] = None)(
                    onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      st.reclaim() // predecessor's dirs — durable-record window closed
      val bp = pairs(batch, idCol, urlCol, textCol)
      val bhosts = bp.select(col("host")).distinct()
      val pre = scoresOf(
          st.pairs.df.join(broadcast(bhosts), Seq("host"), "left_semi"))
        .select(col("host"), col("urls_per_content_x100").as("__r"))
      val flagged = bp.select(col("id"), col("host"))
        .join(broadcast(pre), Seq("host"), "left")
        .select(col("id"), col("host"),
          coalesce(col("__r"), lit(100L)).as("prior_x100"),
          (coalesce(col("__r"), lit(100L)) >= st.thresholdX100)
            .as("trapped"))
      val merged = st.pairs.df
        .unionByName(bp.select(col("host"), col("dg"), col("uh")))
        .distinct()
      (flagged, TrapState(Tables.stageTracked(merged), st.thresholdX100,
        st.version + 1, batchId, superseded = Seq(st.pairs)))
    }(onBatch)
}
