package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextDedup
import graft.sources.Tables

/** SELF-GROWING set-containment index — the probe-then-grow half of the
  * containment dedup gates, generic over MODALITY: the caller supplies
  * the (id, sh) shingle projection (audio CDC chunk keys
  * [[graft.operators.Media.audioCdcChunks]], video frame digests
  * [[graft.operators.Media.videoFrameDigestSets]], image keypoints
  * [[ImageIngest.keypoints]], text shingles — anything
  * [[TextDedup.containmentPairs]] consumes), and ONE state + loop owns
  * the lifecycle: per micro-batch, probe the batch against everything
  * ingested so far ([[TextDedup.containmentPairsAgainstIndex]] — batch
  * side broadcasts, the grown corpus never shuffles), then APPEND the
  * batch's keys to the persisted index. The frozen-probe gates
  * ([[AudioIngest]], [[VideoIngest]], [[ImageIngest.startKeypointGate]])
  * stay the right tool for a CURATED corpus; this loop is for the
  * arrive-and-grow corpus the ANN/image/dedup growing gates serve.
  *
  * Index shape: TWO grown roots — the (id, sh) set relation (the verify
  * side) and its exploded (id, s) inverted index (the candidate side) —
  * because the probe needs both and re-deriving the exploded form per
  * batch would explode the whole grown corpus every micro-batch.
  * Payloads are parsed ONCE, at the batch that ingests them; only keys
  * persist. Replay safety via [[Gate.Folded]]'s batch-id fence; both
  * roots append under the same batch id, so [[Gate.pruneGrown]] with the
  * recorded fence repairs EITHER half-appended root after a crash
  * (restore prunes both).
  */
object ContainmentIngest {

  /** Growing containment state: live (tombstone-filtered) views of the
    * two grown roots + their paths. Requires parquet staging mode
    * (`graft.stage.dir`) — the growing-gate contract. */
  final case class GrowingContainmentIndex(shingled: DataFrame, ex: DataFrame,
                                           shPath: String, exPath: String,
                                           tombstonesPath: String,
                                           version: Long,
                                           foldedBatch: Long = -1L)
    extends Gate.Folded

  /** Shingle the initial corpus once (via the caller's projection) and
    * capture the two index directories fold appends go to, plus an empty
    * tombstone relation for [[retire]]. `shingled0` is the (id, sh)
    * relation of the initial corpus — pass an empty one to start from
    * nothing. */
  def buildGrowing(shingled0: DataFrame, version: Long = 0L): GrowingContainmentIndex = {
    val spark = shingled0.sparkSession
    val sh = Tables.stageTracked(shingled0)
    val ex = Tables.stageTracked(
      sh.df.select(col("id"), explode(col("sh")).as("s")))
    val tb = Tables.stageTracked(
      spark.createDataset(Seq.empty[Long])(Encoders.scalaLong).toDF("id"))
    require(sh.path.isDefined && ex.path.isDefined && tb.path.isDefined,
      "buildGrowing requires parquet staging mode (set graft.stage.dir): " +
        "the growing gate folds by appending to the persisted index dirs")
    val st = GrowingContainmentIndex(null, null, sh.path.get, ex.path.get,
      tb.path.get, version)
    withLiveViews(spark, st)
  }

  /** Re-read the grown roots minus tombstoned ids (the tiny retired-id
    * relation broadcasts onto both views). */
  private def withLiveViews(spark: org.apache.spark.sql.SparkSession,
                            st: GrowingContainmentIndex): GrowingContainmentIndex = {
    def live(path: String): DataFrame =
      Gate.readGrown(spark, path)
        .join(broadcast(Gate.readGrown(spark, st.tombstonesPath)),
          Seq("id"), "left_anti")
    st.copy(shingled = live(st.shPath), ex = live(st.exPath))
  }

  /** PROBE-THEN-GROW containment dedup: each micro-batch is shingled by
    * `shingleFn` (must produce (id, sh) — e.g.
    * `b => ImageIngest.keypoints(b, "value.img_id", "value.payload", 4)`),
    * probed against everything ingested so far, then appended — a
    * re-upload/crop/trim of an EARLIER batch's content is flagged by the
    * next batch. `onBatch` receives (da = batch id, db = ingested id,
    * c_ab, c_ba) pairs plus (version, batchId). */
  def startGrowing(stream: Stream,
                   state: AtomicReference[GrowingContainmentIndex],
                   shingleFn: DataFrame => DataFrame, threshold: Double,
                   checkpoint: Option[String] = None)(
                   onBatch: (DataFrame, Long, Long) => Unit): StreamingQuery =
    Gate.startFolding(stream, state, checkpoint) { (batch, st, batchId) =>
      val bsh = shingleFn(batch)
      val pairs = TextDedup.containmentPairsAgainstIndex(
        bsh, st.shingled, st.ex, threshold)
      // append both roots under the SAME batch id (pre-append snapshots
      // keep the in-flight probe consistent; growDir is replay-overwrite).
      Gate.growDir(bsh, st.shPath, batchId)
      Gate.growDir(bsh.select(col("id"), explode(col("sh")).as("s")),
        st.exPath, batchId)
      (pairs, withLiveViews(batch.sparkSession,
        st.copy(version = st.version + 1, foldedBatch = batchId)))
    }(onBatch)

  /** RETIRE content (takedowns): tombstoned ids stop pairing
    * immediately on both views, no index rewrite; re-ingested retired
    * content folds as novel under its new id. `tag` must be unique per
    * retire on this state lineage. */
  def retire(st: GrowingContainmentIndex, ids: DataFrame,
             tag: Long): GrowingContainmentIndex = {
    Gate.growDir(ids.select(col(ids.columns.head).cast("long").as("id")),
      st.tombstonesPath, tag)
    withLiveViews(ids.sparkSession, st.copy(version = st.version + 1))
  }

  /** Compact BOTH grown roots into fresh consolidated staged
    * directories ([[Gate.compactGrown]] semantics via the live views) —
    * the periodic maintenance a long-running growing gate needs before
    * per-batch subdirectories dominate file listing. The LIVE views
    * materialize, so tombstoned rows drop out of storage for good and
    * the tombstones reset empty; the replay fence and version lineage
    * carry over (version bumps). Run OFFLINE between batches; swap the
    * returned state in; delete the superseded roots once nothing
    * references them. A crash ANYWHERE inside the compaction is
    * repairable without the fence: the consolidations write FRESH
    * staged dirs and the old roots are untouched until the caller
    * swaps + deletes, so the repair is simply re-running the whole
    * compaction from the old state. Probe results are bitwise-identical
    * before and after (spec-pinned). */
  def compactGrowing(st: GrowingContainmentIndex): GrowingContainmentIndex = {
    val spark = st.shingled.sparkSession
    val sh = Tables.stageTracked(st.shingled)
    val ex = Tables.stageTracked(st.ex)
    val tb = Tables.stageTracked(
      spark.createDataset(Seq.empty[Long])(Encoders.scalaLong).toDF("id"))
    require(sh.path.isDefined && ex.path.isDefined && tb.path.isDefined,
      "compactGrowing requires parquet staging mode (set graft.stage.dir)")
    withLiveViews(spark, GrowingContainmentIndex(null, null, sh.path.get,
      ex.path.get, tb.path.get, st.version + 1, st.foldedBatch))
  }

  /** Retention ([[Gate.expireGrown]] over the paired roots): consolidate
    * every fold ≤ `keepAfter` of BOTH index roots (and the tombstone
    * root once it has folded) into one `expired_<horizon>` segment each
    * — time travel below the horizon refuses by name, the live index is
    * unchanged. The two roots fold under the SAME batch ids, so one
    * horizon is meaningful for both; a crash between the two expiries
    * leaves one root expired and one not, and the repair is re-running
    * at the SAME horizon (each [[Gate.expireGrown]] crash window is
    * re-runnable; the already-expired root passes through idempotently).
    * Tombstones stay retroactively current — the consolidation carries
    * every retired id. Callers MUST swap to the returned state (the old
    * views reference deleted per-fold files). */
  def expireGrowing(spark: org.apache.spark.sql.SparkSession,
                    st: GrowingContainmentIndex,
                    keepAfter: Long): GrowingContainmentIndex = {
    Seq(st.shPath, st.exPath, st.tombstonesPath)
      .filter(Gate.manifestExists(spark, _)) // a never-folded root has no
                                             // history to expire
      .foreach(Gate.expireGrown(spark, _, keepAfter))
    withLiveViews(spark, st)
  }

  /** Reconstruct a [[GrowingContainmentIndex]] after a restart: prune
    * BOTH grown roots to the recorded fence (a crash between the two
    * appends leaves exactly one root ahead — pruning repairs it), then
    * rebuild the live views. */
  def restoreGrowing(spark: org.apache.spark.sql.SparkSession,
                     shPath: String, exPath: String, tombstonesPath: String,
                     version: Long = 0L,
                     foldedBatch: Long = -1L): GrowingContainmentIndex = {
    Gate.pruneGrown(spark, shPath, foldedBatch)
    Gate.pruneGrown(spark, exPath, foldedBatch)
    withLiveViews(spark, GrowingContainmentIndex(null, null, shPath, exPath,
      tombstonesPath, version, foldedBatch))
  }
}
