package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ranking

/** Streaming importance-scoring ingest — the data-SELECTION member of the
  * [[Gate]] family: every incoming document is scored against DSIR-style
  * bucket weights learned ONCE from the current corpus
  * ([[Ranking.importanceScores]]' weights), so the ingest loop can keep /
  * downweight documents by similarity to the target distribution as they
  * arrive, not in a nightly sweep. Gate specifics on top of the family
  * contract: staging the ≤16^hexDigits-row weight relation TRUNCATES the
  * corpus-scan lineage (left lazy, every micro-batch's broadcast would
  * re-run the full corpus tokenize/aggregate), and novel vocabulary in a
  * batch scores 0 weight but still counts toward length normalization
  * ([[Ranking.scoreAgainstWeights]]'s left join) — so streamed scores are
  * EXACTLY what the batch operator would emit for the same rows.
  */
object ScoreIngest {

  /** One corpus version's staged bucket-weight relation. */
  final case class CorpusWeights(weights: DataFrame, hexDigits: Int,
                                 scale: Long, version: Long) extends Gate.Versioned

  /** Learn and stage the per-bucket importance weights ONCE (per corpus
    * version). `corpus` is a document relation; `isTarget` selects the
    * target-distribution subset (e.g. `col("lang") === "en"`). */
  def buildWeights(corpus: DataFrame, idCol: String, textCol: String,
                   isTarget: Column, hexDigits: Int = 3,
                   scale: Long = 1000000L, version: Long = 0L): CorpusWeights =
    CorpusWeights(
      graft.sources.Tables.stage(Ranking.bucketWeights(
        Ranking.importanceRelation(corpus, idCol, textCol, isTarget, hexDigits),
        scale)),
      hexDigits, scale, version)

  /** Start the per-batch scoring loop: each micro-batch's documents are
    * scored against the frozen weights and `onBatch` receives the
    * (doc_id, raw, n_tokens, avg_w) relation plus (corpusVersion,
    * batchId). `idCol`/`textCol` address the stream's payload (e.g.
    * `value.doc_id`, `value.text` for a JSON Kafka stream). */
  def start(stream: Stream, state: AtomicReference[CorpusWeights],
            idCol: String, textCol: String,
            checkpoint: Option[String] = None)(
            onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      // target flag is irrelevant at probe time (weights are frozen).
      Ranking.scoreAgainstWeights(
        Ranking.importanceRelation(docs, "doc_id", "text", lit(false), st.hexDigits),
        st.weights)
    }(onBatch)

  /** One corpus version's staged CLASSIFIER weight relation
    * ([[Ranking.classifierWeights]] over uni+bigram feature buckets). */
  final case class ClassifierWeights(weights: DataFrame, hexDigits: Int,
                                     scale: Long, version: Long)
    extends Gate.Versioned

  /** Train and stage the linear quality-classifier weights ONCE (per
    * corpus version); `isPositive` labels the curated reference subset. */
  def buildClassifier(corpus: DataFrame, idCol: String, textCol: String,
                      isPositive: Column, hexDigits: Int = 3,
                      scale: Long = 1000000L, version: Long = 0L): ClassifierWeights =
    ClassifierWeights(
      graft.sources.Tables.stage(Ranking.classifierWeights(
        // pre-aggregate to the bounded (bk, pos) space before the
        // two-pass weight builder — one corpus-feature pass instead of
        // two, same integers (the qualityClassifier discipline).
        graft.sources.Tables.stage(
          Ranking.classifierRelation(corpus, idCol, textCol, isPositive,
            hexDigits)
            .groupBy(col("bk"), col("pos"))
            .agg(sum(col("tf")).cast("long").as("tf"))),
        scale)),
      hexDigits, scale, version)

  /** Per-batch keep/drop gate ([[Ranking.classifyAgainstWeights]]):
    * `onBatch` receives (doc_id, score, n_feats, keep) for every batch
    * document — the fastText-style quality filter applied AT INGEST
    * rather than in a nightly sweep. Novel batch vocabulary contributes
    * 0 weight but still counts toward n_feats, so streamed verdicts are
    * exactly the batch operator's. */
  def startClassifierGate(stream: Stream, state: AtomicReference[ClassifierWeights],
                          idCol: String, textCol: String,
                          checkpoint: Option[String] = None)(
                          onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      // the label is irrelevant at probe time (weights are frozen).
      Ranking.classifyAgainstWeights(
        Ranking.classifierRelation(docs, "doc_id", "text", lit(false), st.hexDigits),
        st.weights)
    }(onBatch)

  /** One corpus version's staged bigram LANGUAGE MODEL: the (ng, cnt)
    * model, (prev, ctx) context counts, and one-row total — ALL staged
    * (the corpus-scan lineage truncation the other two modes rely on;
    * cx/tot additionally stage so no per-batch broadcast re-runs a
    * vocabulary rollup). */
  final case class CorpusLm(lm: DataFrame, cx: DataFrame, tot: DataFrame,
                            version: Long, n: Int = 2) extends Gate.Versioned

  /** Train and stage the bigram LM ONCE (per corpus version) from the
    * curated reference corpus — the CCNet deployment shape
    * ([[Ranking.scoreAgainstLm]]'s discriminative half): candidates pay
    * the OOV floor for text the reference never produced. */
  def buildLm(corpus: DataFrame, idCol: String, textCol: String,
              version: Long = 0L, n: Int = 2): CorpusLm = {
    val tf = graft.sources.Tables.stage(
      Ranking.ngramFrequencies(corpus, idCol, textCol, n))
    // the RAW vocab rollup — this builder owns the staging itself
    // (ngramLm now stages internally; staging twice would double-write).
    val lm = graft.sources.Tables.stage(Ranking.ngramCounts(tf))
    // context/total roll up from the STAGED model relation (vocab-sized),
    // never the corpus-sized tf, and stage themselves.
    val cx = graft.sources.Tables.stage(
      lm.withColumn("prev", expr(Ranking.lmPrefixSql(n)))
        .groupBy(col("prev")).agg(sum(col("cnt")).cast("long").as("ctx")))
    val tot = graft.sources.Tables.stage(
      lm.agg(sum(col("cnt")).cast("long").as("total")))
    CorpusLm(lm, cx, tot, version, n)
  }

  /** Per-batch LM perplexity-proxy scoring ([[Ranking.scoreAgainstLm]]):
    * `onBatch` receives (doc_id, cost_bits, n_grams, bits_per_gram)
    * for every batch document with ≥ 2 tokens — unseen bigrams pay the
    * deterministic OOV floor, so streamed scores are exactly what the
    * batch operator emits for the same rows against the same frozen
    * model. */
  def startLmGate(stream: Stream, state: AtomicReference[CorpusLm],
                  idCol: String, textCol: String,
                  checkpoint: Option[String] = None)(
                  onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      Ranking.scoreAgainstLm(
        Ranking.ngramFrequencies(docs, "doc_id", "text", st.n),
        st.lm, st.cx, st.tot, n = st.n)
    }(onBatch)

  /** FOLDING bigram-LM state: the staged (ng, cnt) model + its context/
    * total rollups, growing with the stream — the LM family's other
    * half beside the frozen [[CorpusLm]] gate (a reference corpus that
    * itself accretes: each batch is scored against the PRE-batch model,
    * then its bigram counts fold in — the quantile gate's gate-then-fold
    * discipline). Counts are pure multiset sums, so a fold is EXACTLY a
    * fresh [[buildLm]] over everything seen (spec-pinned bitwise);
    * text novel in batch N stops paying the OOV floor at batch N+1.
    * Deferred reclaim + replay fence per the [[GraphIngest.KCoreState]]
    * contract. */
  final case class FoldingLmState(lm: graft.sources.Tables.Staged,
                                  cx: graft.sources.Tables.Staged,
                                  tot: graft.sources.Tables.Staged,
                                  version: Long, foldedBatch: Long = -1L,
                                  superseded: Seq[graft.sources.Tables.Staged] = Nil,
                                  n: Int = 2)
    extends Gate.Folded {
    /** Drop the superseded state dirs — the next fold's backstop. */
    def reclaim(): Unit = superseded.foreach(_.drop())
  }

  /** Train the initial foldable LM (tracked staging, so superseded
    * versions can be reclaimed as the model grows). */
  def buildFoldingLm(corpus: DataFrame, idCol: String, textCol: String,
                     version: Long = 0L, n: Int = 2): FoldingLmState = {
    val tf = graft.sources.Tables.stage(
      Ranking.ngramFrequencies(corpus, idCol, textCol, n))
    // the RAW vocab rollup — stageLmRollups stages it TRACKED itself.
    stageLmRollups(Ranking.ngramCounts(tf), version,
      foldedBatch = -1L, superseded = Nil, n = n)
  }

  private def stageLmRollups(lm0: DataFrame, version: Long,
                             foldedBatch: Long,
                             superseded: Seq[graft.sources.Tables.Staged],
                             n: Int): FoldingLmState = {
    val lm = graft.sources.Tables.stageTracked(lm0)
    val cx = graft.sources.Tables.stageTracked(
      lm.df.withColumn("prev", expr(Ranking.lmPrefixSql(n)))
        .groupBy(col("prev")).agg(sum(col("cnt")).cast("long").as("ctx")))
    val tot = graft.sources.Tables.stageTracked(
      lm.df.agg(sum(col("cnt")).cast("long").as("total")))
    FoldingLmState(lm, cx, tot, version, foldedBatch, superseded, n)
  }

  /** GATE-THEN-FOLD LM scoring: each micro-batch scores against the
    * PRE-batch model (exactly [[startLmGate]]'s arithmetic), then its
    * bigram counts merge in (integer sums — the grown model is bitwise
    * a fresh build over the union). The pre-batch staged relations stay
    * on disk until the NEXT fold's backstop reclaim, so the in-flight
    * score relation is always readable. */
  def startLmFolding(stream: Stream, state: AtomicReference[FoldingLmState],
                     idCol: String, textCol: String,
                     checkpoint: Option[String] = None)(
                     onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      st.reclaim() // predecessor's dirs — durable-record window closed
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      val btf = Ranking.ngramFrequencies(docs, "doc_id", "text", st.n)
      val scores = Ranking.scoreAgainstLm(btf, st.lm.df, st.cx.df, st.tot.df,
        n = st.n)
      val merged = st.lm.df.select(col("ng"), col("cnt"))
        .unionByName(btf.groupBy(col("ng"))
          .agg(sum(col("tf")).cast("long").as("cnt")))
        .groupBy(col("ng")).agg(sum(col("cnt")).cast("long").as("cnt"))
      (scores, stageLmRollups(merged, st.version + 1, batchId,
        superseded = Seq(st.lm, st.cx, st.tot), n = st.n))
    }(onBatch)

  // ------------------------------------------- language-ID gates (#33)

  /** One corpus version's staged DENSE lang-id weight relation
    * ([[Ranking.langWeights]] over char-n-gram buckets). `langs` is the
    * class list, settled ONCE at build (r17 advice: without it,
    * classifyLangs runs a distinct-collect driver job per MICRO-BATCH
    * against the weight relation). */
  final case class LangWeights(weights: DataFrame, langs: Seq[String],
                               n: Int, hexDigits: Int,
                               scale: Long, version: Long)
    extends Gate.Versioned

  /** Train and stage the multi-class lang-id weights ONCE (per corpus
    * version); `labelCol` carries the language label on the curated
    * reference rows, null elsewhere. */
  def buildLangWeights(corpus: DataFrame, idCol: String, textCol: String,
                       labelCol: Column, n: Int = 3, hexDigits: Int = 3,
                       scale: Long = 1000000L, version: Long = 0L): LangWeights = {
    // pre-aggregate the labeled mass to the bounded (lang, bucket)
    // space before the four-rollup weight builder — one corpus
    // pass instead of four, same integers (the langId discipline).
    val counts = graft.sources.Tables.stage(Ranking.langFeatureRelation(
      corpus, idCol, textCol, labelCol, n, hexDigits)
      .filter(col("lang").isNotNull)
      .groupBy(col("lang"), col("bk"))
      .agg(sum(col("tf")).cast("long").as("tf")))
    LangWeights(
      graft.sources.Tables.stage(Ranking.langWeights(counts, scale)),
      counts.select(col("lang")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq,
      n, hexDigits, scale, version)
  }

  /** Per-batch LANGUAGE ROUTING ([[Ranking.classifyLangs]]): `onBatch`
    * receives (doc_id, lang_pred, score) for every batch document with
    * ≥ n chars — the lang-id every per-language downstream gate (CCNet
    * buckets, per-lang quality thresholds) consumes at ingest. Batch
    * grams outside the trained bucket set contribute to NO class, so
    * streamed verdicts are exactly the batch operator's; docs sharing
    * no trained bucket emit nothing (no evidence — pinned). */
  def startLangGate(stream: Stream, state: AtomicReference[LangWeights],
                    idCol: String, textCol: String,
                    checkpoint: Option[String] = None)(
                    onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.start(stream, state, checkpoint) { (batch, st) =>
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      // the label is irrelevant at probe time (weights are frozen).
      Ranking.classifyLangs(
        Ranking.langFeatureRelation(docs, "doc_id", "text",
          lit(null).cast("string"), st.n, st.hexDigits)
          .select(col("doc_id"), col("bk"), col("tf")),
        st.weights, Some(st.langs))
    }(onBatch)

  /** FOLDING lang-id state: the staged LABELED (lang, bk, cnt) counts
    * are the foldable core (multiset sums — a fold is bitwise a fresh
    * count build over the union), the dense weight relation recomputes
    * from them per fold (≤ |langs|·16^hexDigits rows — cheap by
    * construction). Deferred reclaim + replay fence per the
    * [[FoldingLmState]] contract. */
  final case class FoldingLangState(counts: graft.sources.Tables.Staged,
                                    weights: graft.sources.Tables.Staged,
                                    langs: Seq[String],
                                    n: Int, hexDigits: Int, scale: Long,
                                    version: Long, foldedBatch: Long = -1L,
                                    superseded: Seq[graft.sources.Tables.Staged] = Nil)
    extends Gate.Folded {
    def reclaim(): Unit = superseded.foreach(_.drop())
  }

  /** Train the initial foldable lang-id (tracked staging). */
  def buildFoldingLang(corpus: DataFrame, idCol: String, textCol: String,
                       labelCol: Column, n: Int = 3, hexDigits: Int = 3,
                       scale: Long = 1000000L,
                       version: Long = 0L): FoldingLangState = {
    val labeled = Ranking.langFeatureRelation(
      corpus, idCol, textCol, labelCol, n, hexDigits)
      .filter(col("lang").isNotNull)
      .groupBy(col("lang"), col("bk"))
      .agg(sum(col("tf")).cast("long").as("cnt"))
    stageLangRollups(labeled, n, hexDigits, scale, version,
      foldedBatch = -1L, superseded = Nil)
  }

  private def stageLangRollups(counts0: DataFrame, n: Int, hexDigits: Int,
                               scale: Long, version: Long, foldedBatch: Long,
                               superseded: Seq[graft.sources.Tables.Staged]): FoldingLangState = {
    val counts = graft.sources.Tables.stageTracked(counts0)
    val weights = graft.sources.Tables.stageTracked(
      Ranking.langWeights(
        counts.df.select(col("lang"), col("bk"), col("cnt").as("tf")),
        scale))
    // class list settles at fold time (one tiny job over the staged
    // bounded counts) so the per-batch probe never runs a driver
    // collect against the weight relation (r17 advice).
    val langs = counts.df.select(col("lang")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    FoldingLangState(counts, weights, langs, n, hexDigits, scale, version,
      foldedBatch, superseded)
  }

  /** GATE-THEN-FOLD lang-id: each micro-batch classifies against the
    * PRE-batch weights (exactly [[startLangGate]]'s arithmetic), then
    * its LABELED rows (`labelCol` non-null in the payload — the
    * editorially tagged subset) fold into the counts; the dense
    * weights rebuild from the folded counts, bitwise a fresh
    * [[buildFoldingLang]] over the union (spec-pinned). A batch-N
    * novel language starts classifying at batch N+1 — the quantile
    * discipline. */
  def startLangFolding(stream: Stream, state: AtomicReference[FoldingLangState],
                       idCol: String, textCol: String, labelCol: String,
                       checkpoint: Option[String] = None)(
                       onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      st.reclaim() // predecessor's dirs — durable-record window closed
      val docs = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"), col(labelCol).cast("string").as("lbl"))
      val feats = Ranking.langFeatureRelation(docs, "doc_id", "text",
        col("lbl"), st.n, st.hexDigits)
      val preds = Ranking.classifyLangs(
        feats.select(col("doc_id"), col("bk"), col("tf")),
        st.weights.df, Some(st.langs))
      val merged = st.counts.df
        .unionByName(feats.filter(col("lang").isNotNull)
          .groupBy(col("lang"), col("bk"))
          .agg(sum(col("tf")).cast("long").as("cnt")))
        .groupBy(col("lang"), col("bk"))
        .agg(sum(col("cnt")).cast("long").as("cnt"))
      (preds, stageLangRollups(merged, st.n, st.hexDigits, st.scale,
        st.version + 1, batchId,
        superseded = Seq(st.counts, st.weights)))
    }(onBatch)
}
