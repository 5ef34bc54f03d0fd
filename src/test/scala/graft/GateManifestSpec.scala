package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.streaming.Gate

/** The growing-directory MANIFEST (round-11): Gate.growDir records each
  * fold's files in the root's `_spark_metadata` sink log — Spark's own
  * FileStreamSinkLog — so probes plan from the log
  * (MetadataLogFileIndex) instead of one listStatus per batch
  * subdirectory. Pinned here: reads identical to the listing path, the
  * log (not listing) is what the reader consults, crash repair
  * (pruneGrown) across the log's own compaction boundary, and the
  * fail-fast on un-pruned replays. */
class GateManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val root = Files.createTempDirectory("graft-grown").toString
    // the initial staged relation lives at the root top level.
    Seq((0L, "seed0"), (1L, "seed1")).toDF("id", "v")
      .write.mode("overwrite").parquet(root)
    root
  }

  private def rows(root: String): Set[(Long, String)] =
    Gate.readGrown(spark, root).as[(Long, String)].collect().toSet

  private def batchDf(b: Long) = Seq((10 * b, s"b$b")).toDF("id", "v")

  test("manifested reads ≡ listing reads; the plan uses the metadata log") {
    val root = freshRoot()
    assert(!Gate.manifestExists(spark, root))
    val preManifest = rows(root) // recursive-listing path
    assert(preManifest == Set((0L, "seed0"), (1L, "seed1")))

    (0L to 3L).foreach(b => Gate.growDir(batchDf(b), root, b))
    assert(Gate.manifestExists(spark, root))
    val expected = preManifest ++ (0L to 3L).map(b => (10 * b, s"b$b"))
    assert(rows(root) == expected)

    // the reader's file index IS the log, not a directory listing.
    val scans = Gate.readGrown(spark, root).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation
    }
    assert(scans.nonEmpty)
    scans.foreach { case r: HadoopFsRelation =>
      assert(r.location.getClass.getSimpleName == "MetadataLogFileIndex",
        s"expected MetadataLogFileIndex, got ${r.location.getClass}")
    }
  }

  test("the reader consults the log, not the directory tree: unlogged orphans are invisible") {
    val root = freshRoot()
    (0L to 1L).foreach(b => Gate.growDir(batchDf(b), root, b))
    // a crash BETWEEN the data write and the log add leaves an unlogged
    // subdir — exactly what a listing-based reader would wrongly surface.
    Seq((999L, "orphan")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$root/batch_7")
    assert(!rows(root).contains((999L, "orphan")))
    // restore-repair deletes it (above the fence) and the log survives.
    assert(Gate.pruneGrown(spark, root, maxBatch = 1L) == Seq(7L))
    assert(rows(root) == Set((0L, "seed0"), (1L, "seed1"), (0L, "b0"), (10L, "b1")))
  }

  test("crash replay: pruneGrown repairs the log at the fence; the re-fold re-adds") {
    val root = freshRoot()
    (0L to 2L).foreach(b => Gate.growDir(batchDf(b), root, b))
    // crash after batch 2's fold, fence persisted at 1 → batch 2 is an
    // orphan: dir deleted AND log rebuilt at the fence.
    assert(Gate.pruneGrown(spark, root, maxBatch = 1L) == Seq(2L))
    assert(Gate.manifestExists(spark, root))
    assert(rows(root) ==
      Set((0L, "seed0"), (1L, "seed1"), (0L, "b0"), (10L, "b1")))
    // the checkpoint replay re-folds batch 2 — with DIFFERENT file
    // contents than the crashed attempt; the log must pick up the rewrite.
    Gate.growDir(Seq((20L, "b2-replayed")).toDF("id", "v"), root, 2L)
    assert(rows(root) ==
      Set((0L, "seed0"), (1L, "seed1"), (0L, "b0"), (10L, "b1"), (20L, "b2-replayed")))
  }

  test("replaying a logged batch without pruning fails fast") {
    val root = freshRoot()
    Gate.growDir(batchDf(0), root, 0L)
    val e = intercept[IllegalArgumentException] {
      Gate.growDir(batchDf(0), root, 0L)
    }
    assert(e.getMessage.contains("pruneGrown"))
  }

  test("repair works across the log's own compaction boundary") {
    val root = freshRoot()
    // default fileSink.log.compactInterval = 10 → the log compacts at
    // batch 9; fold past it, then fence BELOW the compaction.
    (0L to 11L).foreach(b => Gate.growDir(batchDf(b), root, b))
    val expected = Set((0L, "seed0"), (1L, "seed1")) ++
      (0L to 11L).map(b => (10 * b, s"b$b"))
    assert(rows(root) == expected)
    assert(Gate.pruneGrown(spark, root, maxBatch = 5L) == (6L to 11L))
    assert(rows(root) ==
      Set((0L, "seed0"), (1L, "seed1")) ++ (0L to 5L).map(b => (10 * b, s"b$b")))
    // and the rebuilt log keeps accepting folds above the fence.
    Gate.growDir(batchDf(6), root, 6L)
    assert(rows(root).contains((60L, "b6")))
  }

  test("time travel: readGrownAsOf reconstructs every historical snapshot from the log") {
    val root = freshRoot()
    (0L to 3L).foreach(b => Gate.growDir(batchDf(b), root, b))
    val seed = Set((0L, "seed0"), (1L, "seed1"))
    assert(Gate.grownFolds(spark, root) == (0L to 3L))
    // every fold boundary is a readable snapshot; -1 = the pre-fold seed.
    assert(Gate.readGrownAsOf(spark, root, -1L)
      .as[(Long, String)].collect().toSet == seed)
    (0L to 3L).foreach { b =>
      val expected = seed ++ (0L to b).map(i => (10 * i, s"b$i"))
      assert(Gate.readGrownAsOf(spark, root, b)
        .as[(Long, String)].collect().toSet == expected,
        s"snapshot as of fold $b")
    }
    // an as-of beyond the newest fold is just "now".
    assert(Gate.readGrownAsOf(spark, root, 99L)
      .as[(Long, String)].collect().toSet == rows(root))
  }

  test("time travel requires a manifest; survives the pruneGrown log rebuild") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      Gate.readGrownAsOf(spark, root, 0L)
    }
    assert(e.getMessage.contains("manifest"))
    assert(Gate.grownFolds(spark, root).isEmpty)

    (0L to 2L).foreach(b => Gate.growDir(batchDf(b), root, b))
    // crash repair rebuilds the log whole — the re-seeded entries keep
    // their batch_<id> paths, so history below the fence stays readable.
    assert(Gate.pruneGrown(spark, root, maxBatch = 1L) == Seq(2L))
    assert(Gate.grownFolds(spark, root) == (0L to 1L))
    assert(Gate.readGrownAsOf(spark, root, 0L)
      .as[(Long, String)].collect().toSet ==
      Set((0L, "seed0"), (1L, "seed1"), (0L, "b0")))
  }

  test("compactGrownOrdered: rows identical, band probes prune by scan metrics") {
    def rowsReadByScan(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      plan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    val stageDir = Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", stageDir)
    try {
      val root = Files.createTempDirectory("graft-grown-ord").toString
      // folds arrive in TIME order but carry SCATTERED keys — the
      // growing-index reality that makes arrival-order files unprunable.
      // key = (id·40847 + 1) mod n is a bijection (gcd(40847, n) = 1), so
      // each fold's quarter of ids maps to keys spanning the whole
      // domain (spark.range alone is monotonic — its files would be
      // key-sorted already and the fixture would prove nothing).
      val n = 40000L
      def part(b: Long) = spark.range(n).filter(col("id") % 4 === b)
        .select((((col("id") * 40847L) + 1L) % n).as("id"),
          concat(lit("v"), col("id")).as("v"))
      part(0L).write.mode("overwrite").parquet(root)
      (1L to 3L).foreach(b => Gate.growDir(part(b), root, b))
      val before = Gate.readGrown(spark, root).as[(Long, String)].collect().toSet
      val (ordered, path) = Gate.compactGrownOrdered(spark, root, Seq("id"), shards = 16)
      // same rows, consolidated + ordered files…
      assert(ordered.as[(Long, String)].collect().toSet == before)
      // …and a key band now prunes: arrival-order files each span the
      // whole id domain (every fold carries all residues), so the
      // un-ordered read must scan ~everything; the ordered layout reads
      // little more than the band.
      val band = col("id") >= 1000 && col("id") < 3000
      val readOrdered = rowsReadByScan(spark.read.parquet(path).filter(band))
      val readArrival = rowsReadByScan(Gate.readGrown(spark, root).filter(band))
      assert(readArrival >= n / 2,
        s"arrival-order read $readArrival of $n — fixture broken")
      assert(readOrdered <= readArrival / 4,
        s"ordered compaction read $readOrdered vs arrival $readArrival — no pruning")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("compactGrownMorton/Hilbert: per-AXIS probes prune after compaction") {
    def rowsReadByScan(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      plan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    val stageDir = Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", stageDir)
    try {
      // 2-D state keys (x, y) ∈ [0, 200)², scattered across folds via the
      // multiplicative permutation (gcd(40847, 40000) = 1 — spark.range
      // alone is monotonic and would prove nothing).
      val n = 40000L
      def part(b: Long) = spark.range(n).filter(col("id") % 4 === b)
        .select((((col("id") * 40847L) + 1L) % n).as("k"))
        .select(expr("k div 200").as("x"), (col("k") % 200L).as("y"),
          concat(lit("v"), col("k")).as("v"))
      val dims = Seq(("x", 200L), ("y", 200L))
      for ((name, compact) <- Seq[(String, String => (org.apache.spark.sql.DataFrame, String))](
        "morton" -> (r => Gate.compactGrownMorton(spark, r, dims, shards = 128)),
        "hilbert" -> (r => Gate.compactGrownHilbert(spark, r, dims, shards = 128)))) {
        val root = Files.createTempDirectory(s"graft-grown-$name").toString
        part(0L).write.mode("overwrite").parquet(root)
        (1L to 3L).foreach(b => Gate.growDir(part(b), root, b))
        val before = Gate.readGrown(spark, root)
          .as[(Long, Long, String)].collect().toSet
        val (compacted, path) = compact(root)
        assert(compacted.as[(Long, Long, String)].collect().toSet == before,
          s"$name compaction changed the rows")
        // a lexicographic (x, y) sort would serve only the x probe; the
        // space-filling layout must prune BOTH single-axis bands.
        for (axis <- Seq("x", "y")) {
          val band = col(axis) >= 40 && col(axis) < 60 // 10% of the domain
          val readLaid = rowsReadByScan(spark.read.parquet(path).filter(band))
          val readArrival = rowsReadByScan(Gate.readGrown(spark, root).filter(band))
          assert(readArrival >= n / 2,
            s"$name/$axis arrival read $readArrival of $n — fixture broken")
          // 128 files tile the plane ~16×8; a 10%-wide band overlaps ≤3
          // strips of the finer axis (≤2 of the coarser) plus the
          // range-boundary slop of sampled shard bounds — well under 2/5.
          assert(readLaid <= readArrival * 2 / 5,
            s"$name/$axis read $readLaid vs arrival $readArrival — axis not pruned")
        }
      }
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("expireGrown: expired snapshots refuse by horizon; later folds still plan exactly") {
    val root = freshRoot()
    (0L to 3L).foreach(b => Gate.growDir(batchDf(b), root, b))
    val seed = Set((0L, "seed0"), (1L, "seed1"))
    val full = seed ++ (0L to 3L).map(b => (10 * b, s"b$b"))

    val dir = Gate.expireGrown(spark, root, keepAfter = 1L)
    assert(dir.endsWith("expired_1"))
    // "now" and every snapshot at/after the horizon are bitwise intact…
    assert(rows(root) == full)
    assert(Gate.readGrownAsOf(spark, root, 1L).as[(Long, String)]
      .collect().toSet == seed ++ Seq((0L, "b0"), (10L, "b1")))
    (2L to 3L).foreach { b =>
      assert(Gate.readGrownAsOf(spark, root, b).as[(Long, String)]
        .collect().toSet == seed ++ (0L to b).map(i => (10 * i, s"b$i")))
    }
    // …pre-horizon snapshots refuse with the horizon named…
    for (asOf <- Seq(-1L, 0L)) {
      val e = intercept[IllegalArgumentException] {
        Gate.readGrownAsOf(spark, root, asOf)
      }
      assert(e.getMessage.contains("EXPIRED") && e.getMessage.contains("asOf=1"))
    }
    // …the consolidated prefix physically superseded its originals…
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "batch_0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "batch_1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "batch_2")))
    assert(Gate.grownFolds(spark, root) == Seq(2L, 3L))
    // …growth continues, and a SECOND expiry at a later horizon folds the
    // first consolidation in (the older expired_<h> dir is swept).
    Gate.growDir(batchDf(4), root, 4L)
    Gate.expireGrown(spark, root, keepAfter = 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "expired_1")))
    assert(rows(root) == full + ((40L, "b4")))
    assert(Gate.readGrownAsOf(spark, root, 3L).as[(Long, String)]
      .collect().toSet == full)
    intercept[IllegalArgumentException] { Gate.readGrownAsOf(spark, root, 1L) }
    // an expiry below the standing horizon refuses.
    intercept[IllegalArgumentException] { Gate.expireGrown(spark, root, 0L) }
    // rerun at the SAME horizon is the completed-expiry no-op sweep.
    Gate.expireGrown(spark, root, keepAfter = 2L)
    assert(rows(root) == full + ((40L, "b4")))
  }

  test("expireGrown crash repair: a log-less root with a complete consolidation re-seeds") {
    val root = freshRoot()
    (0L to 2L).foreach(b => Gate.growDir(batchDf(b), root, b))
    Gate.expireGrown(spark, root, keepAfter = 0L)
    val full = Set((0L, "seed0"), (1L, "seed1")) ++
      (0L to 2L).map(b => (10 * b, s"b$b"))
    assert(rows(root) == full)
    // simulate the step-2 crash window: the log is gone, the
    // consolidation and every fold dir are on disk.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_spark_metadata"), true)
    assert(!Gate.manifestExists(spark, root))
    Gate.expireGrown(spark, root, keepAfter = 0L) // the rerun repairs
    assert(Gate.manifestExists(spark, root))
    assert(rows(root) == full)
    assert(Gate.readGrownAsOf(spark, root, 2L).as[(Long, String)]
      .collect().toSet == full)
    intercept[IllegalArgumentException] { Gate.readGrownAsOf(spark, root, -1L) }
    // a log-less root WITHOUT a consolidation at the horizon is misuse,
    // not a crash state — refuse.
    val fresh = freshRoot()
    val e = intercept[IllegalArgumentException] {
      Gate.expireGrown(spark, fresh, keepAfter = 0L)
    }
    assert(e.getMessage.contains("manifest"))
  }

  test("fence below every fold re-seeds the log to the bare root; replay from 0 works") {
    val root = freshRoot()
    (0L to 1L).foreach(b => Gate.growDir(batchDf(b), root, b))
    assert(Gate.pruneGrown(spark, root, maxBatch = -1L) == Seq(0L, 1L))
    assert(Gate.manifestExists(spark, root))
    assert(rows(root) == Set((0L, "seed0"), (1L, "seed1")))
    Gate.growDir(batchDf(0), root, 0L)
    assert(rows(root) == Set((0L, "seed0"), (1L, "seed1"), (0L, "b0")))
  }
}
