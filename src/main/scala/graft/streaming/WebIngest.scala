package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Html, Ranking}
import graft.sources.Tables

/** The COMPOSED crawl-ingest loop — the streaming twin of
  * `x_pipeline_crawl`, second composed member of the gate family
  * beside [[CurateIngest]]: every micro-batch of RAW PAGES
  * (id, url, html) runs the full web-curation path in one
  * foreachBatch body,
  *
  *   1. EXTRACT: [[Html.extractText]] + the structure gate
  *      (n_kept ≥ `minBlocks`) — chrome, boilerplate, and entity refs
  *      are gone before anything downstream sees text — then
  *      [[graft.operators.Pii]] redaction on the survivors (the
  *      x_pipeline_crawl order: the LM and the digest both see
  *      REDACTED text, so two copies differing only in planted PII
  *      collapse; on PII-free text the scrub is exactly the identity);
  *   2. LM QUALITY GATE: [[Ranking.scoreAgainstLm]] against the FROZEN
  *      reference LM ([[ScoreIngest.CorpusLm]] — CCNet's
  *      train-on-reference deployment); keep iff
  *      cost_bits·100 ≤ n_grams·threshPct;
  *   3. DOMAIN ACCOUNTING + FOLD: every batch row (kept or not —
  *      fetch bandwidth was spent either way, the pinned accounting
  *      choice) lands on its registrable domain's count
  *      ([[DomainIngest]] arithmetic); priors/saturation are
  *      PRE-batch;
  *   4. EXACT DEDUP vs the GROWING extracted-digest corpus: LM
  *      survivors' digests probe the grown root, novel canonicals
  *      append — dedup-after-extraction IN STREAMING: a batch-N+1
  *      replica of batch-N content under different chrome collapses
  *      because only extracted text is digested. Within one batch the
  *      smallest id is canonical (the batch pipeline's min-id rule).
  *
  * `onBatch` receives ONE manifest relation with every batch row and
  * why it survived or didn't: (doc_id, domain, prior, saturated,
  * n_blocks, n_kept, kept_structure, n_pii, cost_bits, n_grams,
  * kept_lm, digest, dup_of, kept) — cost/digest columns NULL where an earlier
  * gate already dropped the row; `dup_of` = the canonical owner's id
  * (NULL when this row IS canonical or never reached dedup); `kept` =
  * survived everything and is canonical.
  *
  * Composition contract (the [[CurateIngest]] discipline): the frozen
  * LM rotates independently of the folding state; ONE [[Gate.Folded]]
  * fence governs the whole body — a checkpoint-replayed batch neither
  * re-folds the counts, re-appends digests (growDir overwrite makes
  * the append itself replay-idempotent too), nor re-emits. Requires
  * parquet staging mode (the growing-root contract). */
object WebIngest {

  /** The folding half of the composed state: per-domain counts (staged,
    * tracked) + the grown extracted-digest root. */
  final case class WebState(counts: Tables.Staged, digestsPath: String,
                            cap: Long, version: Long,
                            foldedBatch: Long = -1L,
                            superseded: Seq[Tables.Staged] = Nil)
    extends Gate.Folded {
    def reclaim(): Unit = superseded.foreach(_.drop())
  }

  /** Seed the folding state from already-accepted documents:
    * (id, url, text) — counts from the urls, the digest root from
    * md5(text) with the id as canonical owner. The loop digests
    * post-PII text, so the seed text runs through [[graft.operators.Pii]]
    * redaction HERE (a raw-text seed would never collapse against
    * streamed copies whose only difference was masked; redaction is
    * idempotent on already-redacted text — PiiSpec — so a caller that
    * pre-redacted is unaffected). Pass an empty relation to start
    * from nothing. */
  def buildState(accepted: DataFrame, idCol: String, urlCol: String,
                 textCol: String, cap: Long, version: Long = 0L): WebState = {
    require(cap >= 1, s"cap=$cap")
    val counts = Tables.stageTracked(
      DomainIngest.domains(accepted, idCol, urlCol)
        .groupBy(col("domain")).agg(count(lit(1)).cast("long").as("cnt")))
    val dg = Tables.stageTracked(accepted.select(
      md5(expr(graft.operators.Pii.redactSql(textCol, duck = false)))
        .as("digest"),
      col(idCol).cast("long").as("owner")))
    require(counts.path.isDefined && dg.path.isDefined,
      "WebIngest.buildState requires parquet staging mode (set graft.stage.dir)")
    WebState(counts, dg.path.get, cap, version)
  }

  /** Compact the folding state's GROWN digest root into one
    * consolidated staged dir ([[Gate.compactGrown]]) — the counts side
    * is already a single staged relation per version, so only the
    * append-per-batch root accretes files. Fence and counts carry;
    * version bumps; the old root is untouched until the caller swaps +
    * deletes (crash repair = re-run from the old state — the
    * [[ContainmentIngest.compactGrowing]] contract). */
  def compactState(st: WebState): WebState = {
    val spark = st.counts.df.sparkSession
    val (_, path) = Gate.compactGrown(spark, st.digestsPath)
    st.copy(digestsPath = path, version = st.version + 1)
  }

  /** Start the composed loop over a raw-page stream. */
  def start(stream: Stream, state: AtomicReference[WebState],
            lm: AtomicReference[ScoreIngest.CorpusLm],
            idCol: String, urlCol: String, htmlCol: String,
            minBlocks: Long = 2L, threshPct: Long = 420L,
            minChars: Int = 10, maxDensityPct: Int = 34,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      st.reclaim()
      val m = lm.get()
      val spark = batch.sparkSession
      val pages = batch.select(col(idCol).cast("long").as("doc_id"),
        col(urlCol).as("url"), col(htmlCol).as("html"))
      // 1. extract + structure gate (ext is batch-sized; unstaged —
      // the micro-batch contract).
      val ext = Html.extractText(pages, "doc_id", "html", minChars,
        maxDensityPct)
      // 1b. PII redaction on the structure survivors (the
      // x_pipeline_crawl order: scrub BEFORE the LM and the digest —
      // on PII-free text the scrub is exactly the identity, so batches
      // without PII behave as before).
      val k1 = graft.operators.Pii.withRedacted(
        ext.filter(col("n_kept") >= minBlocks), "text", out = "rtext")
        .withColumn("n_pii", graft.operators.Pii.Classes.map(c => col(c._3))
          .reduce(_ + _))
      // 2. LM score the redacted survivors against the frozen model.
      val scores = Ranking.scoreAgainstLm(
        Ranking.ngramFrequencies(k1, "doc_id", "rtext", m.n),
        m.lm, m.cx, m.tot, n = m.n)
        .withColumn("kept_lm",
          expr(s"cost_bits * 100 <= n_grams * ${threshPct}L"))
      // 3. domain accounting for EVERY fetched row, PRE-batch priors.
      val dm = DomainIngest.domains(pages, "doc_id", "url")
        .withColumnRenamed("id", "doc_id")
      val flags = dm.join(broadcast(st.counts.df), Seq("domain"), "left")
        .select(col("doc_id"), col("domain"),
          coalesce(col("cnt"), lit(0L)).as("prior"),
          (coalesce(col("cnt"), lit(0L)) >= st.cap).as("saturated"))
      // 4. exact dedup of LM survivors on EXTRACTED text, vs the grown
      // corpus then within-batch (min id canonical).
      val dg = k1.join(scores.filter(col("kept_lm"))
          .select(col("doc_id")), "doc_id")
        .select(col("doc_id"), md5(col("rtext")).as("digest"))
      val wmin = dg.groupBy(col("digest"))
        .agg(min(col("doc_id")).as("__canon"))
      // probe the GROWN side with a broadcast of the batch digests
      // (one scan of the grown root, no shuffle of it), then left-join
      // the batch against the batch-sized hit relation — the
      // DedupIngest settle discipline.
      val grown = Gate.readGrown(spark, st.digestsPath)
      val hits = grown
        .join(broadcast(dg.select(col("digest")).distinct()), Seq("digest"))
        .groupBy(col("digest")).agg(min(col("owner")).as("__owner"))
      val dup = dg
        .join(wmin, Seq("digest"))
        .join(broadcast(hits), Seq("digest"), "left")
        .select(col("doc_id"), col("digest"),
          coalesce(col("__owner"),
            when(col("__canon") < col("doc_id"), col("__canon"))).as("dup_of"))
      // the manifest: every batch row, every verdict, settled ONCE
      // (batch-sized by contract) so the fold below and the emission
      // agree exactly.
      val manifest = flags
        .join(ext.select(col("doc_id"), col("n_blocks"), col("n_kept")),
          Seq("doc_id"), "left")
        .join(k1.select(col("doc_id"), col("n_pii")), Seq("doc_id"), "left")
        .join(scores.select(col("doc_id"), col("cost_bits"), col("n_grams"),
          col("kept_lm")), Seq("doc_id"), "left")
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("domain"), col("prior"), col("saturated"),
          col("n_blocks"), col("n_kept"),
          (coalesce(col("n_kept"), lit(0L)) >= minBlocks).as("kept_structure"),
          col("n_pii"), col("cost_bits"), col("n_grams"),
          coalesce(col("kept_lm"), lit(false)).as("kept_lm"),
          col("digest"), col("dup_of"))
        .withColumn("kept",
          col("kept_structure") && col("kept_lm") && col("dup_of").isNull)
      val rows = manifest.collect().toSeq
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), manifest.schema)
      // FOLD: novel canonical digests append; ALL fetched rows count.
      Gate.growDir(local.filter(col("kept"))
        .select(col("digest"), col("doc_id").as("owner")),
        st.digestsPath, batchId)
      val merged = st.counts.df
        .unionByName(local.groupBy(col("domain"))
          .agg(count(lit(1)).cast("long").as("cnt")))
        .groupBy(col("domain")).agg(sum(col("cnt")).cast("long").as("cnt"))
      (local, WebState(Tables.stageTracked(merged), st.digestsPath, st.cap,
        st.version + 1, batchId, superseded = Seq(st.counts)))
    }(onBatch)
}
