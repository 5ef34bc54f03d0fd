package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Web
import graft.sources.Tables

/** Streaming per-domain arrival accounting — the INGEST half of the
  * per-domain cap ([[Web.capPerDomain]] is the batch sampler; at ingest
  * time the question is "how much of this registrable domain has the
  * corpus already taken?"): a FOLDING gate over (domain, cnt) counts.
  *
  * Gate-then-fold (the quantile/LM discipline): every batch row is
  * flagged against the PRE-batch counts — `prior` = documents ingested
  * from its domain before this batch, `saturated` = prior ≥ cap — then
  * the batch's domain counts merge in. Counts are pure integer multiset
  * sums, so a fold is EXACTLY a fresh [[buildCounts]] over everything
  * seen (spec-pinned bitwise) and the replay fence is load-bearing
  * (double-folding doubles counts). SET SEMANTICS within a batch
  * (pinned): all rows of one domain in one micro-batch see the SAME
  * prior — intra-batch admission order is the caller's policy; the
  * state answers the cross-batch question. The deliberate CONTRAST with
  * [[Web.capPerDomain]] is stated, not hidden: the batch operator keeps
  * a deterministic hash-min-k SAMPLE (re-runnable, order-free); an
  * ingest gate sees arrival order and can only account it — a caller
  * wanting sample semantics at ingest runs the batch cap over the
  * accounted corpus in a nightly sweep.
  *
  * The count relation is REGISTRABLE-DOMAIN-sized (the web has ~100M —
  * an executor-droppable broadcast at one (string, long) row each, the
  * [[ScoreIngest]] vocabulary contract); the state stages like the
  * folding LM: tracked staging dirs, superseded-dir reclaim one fold
  * later, replay fence.
  */
object DomainIngest {

  /** FOLDING per-domain count state. */
  final case class DomainCounts(counts: Tables.Staged, cap: Long,
                                version: Long, foldedBatch: Long = -1L,
                                superseded: Seq[Tables.Staged] = Nil)
    extends Gate.Folded {
    /** Drop the superseded state dirs — the next fold's backstop. */
    def reclaim(): Unit = superseded.foreach(_.drop())
  }

  /** The shared (id, domain) projection: canonicalize + registrable
    * domain (pinned [[Web.MultiSuffixes]] path; a PSL deployment swaps
    * the four-arg overload in here). Pure codegen — micro-batches
    * project without a staging write. */
  def domains(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    Web.withRegistrableDomain(
      Web.withCanonicalUrl(
        df.select(col(idCol).cast("long").as("id"), col(urlCol).as("url")),
        "url", "__c"),
      "__c_host", "domain")
      .select(col("id"), col("domain"))

  /** Count the initial corpus' domains ONCE (tracked staging, so grown
    * versions can reclaim their predecessors). */
  def buildCounts(corpus: DataFrame, idCol: String, urlCol: String,
                  cap: Long, version: Long = 0L): DomainCounts = {
    require(cap >= 1, s"cap=$cap")
    DomainCounts(
      Tables.stageTracked(domains(corpus, idCol, urlCol)
        .groupBy(col("domain")).agg(count(lit(1)).cast("long").as("cnt"))),
      cap, version)
  }

  /** GATE-THEN-FOLD domain accounting: `onBatch` receives
    * (id, domain, prior, saturated) for every batch row — prior/
    * saturated against the PRE-batch counts — then the batch folds in.
    * The pre-batch staged relation stays on disk until the NEXT fold's
    * backstop reclaim, so the in-flight flagged relation is always
    * readable. */
  def startDomainGate(stream: Stream, state: AtomicReference[DomainCounts],
                      idCol: String, urlCol: String,
                      checkpoint: Option[String] = None)(
                      onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      st.reclaim() // predecessor's dirs — durable-record window closed
      val bd = domains(batch, idCol, urlCol)
      val flagged = bd
        .join(broadcast(st.counts.df), Seq("domain"), "left")
        .select(col("id"), col("domain"),
          coalesce(col("cnt"), lit(0L)).as("prior"),
          (coalesce(col("cnt"), lit(0L)) >= st.cap).as("saturated"))
      val merged = st.counts.df
        .unionByName(bd.groupBy(col("domain"))
          .agg(count(lit(1)).cast("long").as("cnt")))
        .groupBy(col("domain")).agg(sum(col("cnt")).cast("long").as("cnt"))
      (flagged, DomainCounts(Tables.stageTracked(merged), st.cap,
        st.version + 1, batchId, superseded = Seq(st.counts)))
    }(onBatch)
}
