package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** The shared skeleton of the streaming ingest-gate family —
  * [[DedupIngest]] (exact/bloom/LSH text dedup), [[AnnIngest]] (vector
  * retrieval, SemDeDup, PQ), [[ImageIngest]] (perceptual dHash),
  * [[ScoreIngest]] (DSIR importance selection). Seven gates, one contract,
  * stated once here and spec-pinned per gate in the `Streaming*Spec`s:
  *
  *  - the corpus-side INDEX is built and staged ONCE per corpus version
  *    (`Tables.stage` truncates the corpus-scan lineage, so in
  *    `graft.stage.dir` mode micro-batches scan a persisted parquet table
  *    and recompute zero corpus state);
  *  - each micro-batch pays only its own (tiny, deliberately UNSTAGED)
  *    projection, BROADCAST onto the index join — the corpus never
  *    shuffles and no per-batch staging dir is ever written (a staged
  *    batch side would write one parquet dir per micro-batch for zero
  *    reuse);
  *  - corpus versions ROTATE atomically between batches via an
  *    [[AtomicReference]]: build the next version OUTSIDE the stream, then
  *    `state.set(next)` — foreachBatch bodies run sequentially and
  *    [[start]] reads the reference exactly once at batch start, so every
  *    batch sees one consistent index and the swap lands at a batch
  *    boundary; rebuild cost is paid per corpus version, never per batch;
  *  - driver-small relations a probe re-collects into plan literals
  *    (centroids, codebooks) are LOCALIZED at build time
  *    ([[localizedVectors]]) so per-batch collects read driver memory, not
  *    the source scan;
  *  - exactly-once: the batch id rides into `onBatch` and the stream
  *    checkpoint replays unacknowledged batches — an idempotent sink
  *    (e.g. overwrite-by-batch-id) completes the guarantee.
  *
  * Streamed results are bitwise-identical to the batch operators they
  * delegate to: every gate's probe IS the batch operator's
  * `*AgainstIndex`/`*Against*` form, fed the same staged index.
  */
object Gate {

  /** Gate state: one immutable per-corpus-version index. Implementations
    * carry the staged relation(s) plus the parameters they were built
    * under (probe projections must land in the same key space). */
  trait Versioned { def version: Long }

  /** The rotation + probe loop every gate runs: read the state once at
    * batch start, run the batch through `probe` (the batch operator's
    * against-index form), hand the result to `onBatch` with the corpus
    * version it was computed against and the micro-batch id.
    *
    * `R` is the probe result type — a single relation for most gates, an
    * (exactPairs, nearPairs) pair for [[DedupIngest.startGated]]. */
  def start[S <: Versioned, R](stream: Stream, state: AtomicReference[S],
                               checkpoint: Option[String])(
                               probe: (DataFrame, S) => R)(
                               onBatch: (R, Long, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val st = state.get()
      onBatch(probe(batch, st), st.version, batchId)
    }, checkpoint)

  /** Folding-gate state: a [[Versioned]] index that also records the
    * HIGHEST batch id already folded into it — the replay fence below. */
  trait Folded extends Versioned { def foldedBatch: Long }

  /** FOLDING variant of [[start]] for gates whose state EVOLVES with
    * every batch (graph maintenance, a growing dedup corpus) rather than
    * staying frozen per corpus version: `step` computes both the batch
    * result and the NEXT state, and the reference is advanced before
    * `onBatch` runs — foreachBatch bodies execute sequentially, so the
    * fold is race-free and each batch sees exactly the state its
    * predecessor produced.
    *
    * Exactly-once across restarts: the stream checkpoint REPLAYS
    * unacknowledged batches, and a fold is not idempotent (the state may
    * already contain a replayed batch's rows). States therefore record
    * the last folded batch id ([[Folded.foldedBatch]], persisted by the
    * caller alongside the state's staged relations); a replayed batch at
    * or below it is SKIPPED here — no re-fold, no duplicate emission —
    * and an idempotent sink (overwrite-by-batch-id) completes the
    * guarantee for the result side, exactly as with the frozen gates.
    * External rotation still works (swap the reference between batches
    * with a freshly rebuilt state); `step` owns the version bump and the
    * foldedBatch stamp so rotated and folded versions stay
    * distinguishable. */
  def startFolding[S <: Folded, R](stream: Stream, state: AtomicReference[S],
                                   checkpoint: Option[String])(
                                   step: (DataFrame, S, Long) => (R, S))(
                                   onBatch: (R, Long, Long) => Unit): StreamingQuery =
    stream.forEachBatch({ (batch, batchId) =>
      val st = state.get()
      if (batchId > st.foldedBatch) {
        val (r, next) = step(batch, st, batchId)
        state.set(next)
        onBatch(r, next.version, batchId)
      }
    }, checkpoint)

  /** Append a batch's index projection to a growing staged directory —
    * written as an OVERWRITE of the per-batch subdirectory
    * `<root>/batch_<id>`, so a checkpoint replay of a crashed mid-fold
    * batch overwrites its partial attempt instead of duplicating rows
    * (plain append-mode writes are not transactional; this layout is the
    * idempotent equivalent, and maps onto a transactional table format's
    * batchId-keyed appends at cluster scale). */
  def growDir(projection: DataFrame, root: String, batchId: Long): Unit =
    projection.write.mode("overwrite").parquet(s"$root/batch_$batchId")

  /** Re-open a grown directory: the initial staged files at the root
    * plus every `batch_*` subdirectory ([[growDir]]'s layout) via a
    * recursive file lookup (no partition inference). */
  def readGrown(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(root)

  /** DELETE orphaned `batch_<id>` subdirectories with id ABOVE the
    * persisted replay fence — the restart-repair step every growing
    * gate's `restore*` must run before building its live views. A crash
    * between [[growDir]]'s appends and the caller durably recording the
    * new `foldedBatch` leaves the batch's subdirs on disk while the fence
    * still points below them; restored unpruned, the checkpoint-replayed
    * batch would probe an index already containing its OWN rows — every
    * row exact-matches itself, the batch folds as all-duplicate, and the
    * overwrite leaves EMPTY subdirs (the rows silently vanish from the
    * corpus). Deleting the orphans restores the exact pre-fold snapshot;
    * the replay then re-runs the fold and rewrites them. Returns the
    * pruned batch ids (normally empty — only a mid-fold crash leaves
    * any). Tombstone directories are NOT pruned by restores: retire tags
    * are caller-chosen, not batch-fenced. */
  def pruneGrown(spark: org.apache.spark.sql.SparkSession, root: String,
                 maxBatch: Long): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).flatMap { s =>
      val nm = s.getPath.getName
      if (!nm.startsWith("batch_")) None
      else scala.util.Try(nm.stripPrefix("batch_").toLong).toOption
        .filter(_ > maxBatch)
        .map { id => fs.delete(s.getPath, true); id }
    }.sorted
  }

  /** COMPACT a grown directory into a fresh consolidated staged relation
    * — the OPTIMIZE step of the growing gates: folds accumulate one
    * small-file subdirectory per batch, and at scale the FILE COUNT (not
    * the data) eventually dominates scan planning and listing. Run it
    * between batches under the usual rotation discipline (build outside
    * the stream, swap the state reference at a batch boundary); the
    * superseded root can be deleted once no live state references it.
    * Returns the consolidated relation and its new directory. */
  def compactGrown(spark: org.apache.spark.sql.SparkSession,
                   root: String): (DataFrame, String) = {
    val consolidated = graft.sources.Tables.stageTracked(readGrown(spark, root))
    require(consolidated.path.isDefined,
      "compactGrown requires parquet staging mode (set graft.stage.dir)")
    (consolidated.df, consolidated.path.get)
  }

  /** Materialize an (id, embedding) relation to a DRIVER-LOCAL relation
    * (LocalTableScan). Gate state holds centroid/codebook relations that
    * every micro-batch re-collects into a plan literal — left as a view
    * over the source, that collect re-runs the source scan per batch;
    * localized once at build time it reads driver memory. By-contract
    * tiny (centroids/codebook, not the corpus). */
  def localizedVectors(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val rows = df.select(col("id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    import s.implicits._
    rows.toDF("id", "embedding")
  }
}
