package graft

import graft.sources.Tables

/** Staging-table lifecycle guards (Tables.Staged): the recursive delete in
  * drop() must only ever aim at the session's current graft.stage.dir. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut memo key tracks file-layout rewrites (scan signature)") {
    // the memoized partition count must not survive a staging-dir rewrite
    // within one JVM: the key folds in the root's child file count, total
    // length, and mtimes — so a rewrite changes the key EVEN within one
    // local-FS mtime tick (no sleep needed; same-second rewrites were the
    // stale-memo hole when the key was the root dir's mtime alone).
    val dir = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(dir)
    val sig1 = Tables.scanSignature(spark.read.parquet(dir))
    assert(sig1 != 0L)
    assert(Tables.scanSignature(spark.read.parquet(dir)) == sig1,
      "signature must be stable while the layout is unchanged")
    spark.range(100).repartition(4).write.mode("overwrite").parquet(dir)
    val sig2 = Tables.scanSignature(spark.read.parquet(dir))
    assert(sig2 != sig1, "rewritten dir must change the fanOut memo key")
    // same file count, different content length — still a new key.
    spark.range(200).repartition(4).write.mode("overwrite").parquet(dir)
    val sig3 = Tables.scanSignature(spark.read.parquet(dir))
    assert(sig3 != sig2, "same-count rewrite must change the fanOut memo key")
    // non-file plans have no signature (memo keyed on plan hash alone).
    import spark.implicits._
    assert(Tables.scanSignature(Seq(1, 2).toDF("x")) == 0L)
  }

  test("Staged.drop refuses paths outside the current stage dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val victim = java.nio.file.Files.createTempDirectory("graft-victim")
    java.nio.file.Files.writeString(victim.resolve("keep.txt"), "do not delete")
    spark.conf.set("graft.stage.dir", dir)
    try {
      // a handle whose path escaped the stage dir (conf drift, bad caller).
      val rogue = Tables.Staged(Seq(1).toDF("x"), Some(victim.toString))
      intercept[IllegalArgumentException] { rogue.drop() }
      assert(java.nio.file.Files.exists(victim.resolve("keep.txt")))

      // a genuine handle still drops fine.
      val real = Tables.stageTracked(Seq(1, 2, 3).toDF("x"))
      assert(real.path.exists(_.startsWith(dir)))
      assert(real.df.count() == 3)
      real.drop()
      assert(!real.path.exists(p => new java.io.File(p).exists()))
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("Staged.drop refuses when the stage dir is no longer configured") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    val staged =
      try Tables.stageTracked(Seq(1).toDF("x"))
      finally spark.conf.unset("graft.stage.dir")
    intercept[IllegalArgumentException] { staged.drop() }
    assert(staged.path.exists(p => new java.io.File(p).exists()))
  }

  test("localCheckpoint mode: drop() is a no-op with no path to guard") {
    val staged = Tables.stageTracked(Seq(1).toDF("x"))
    assert(staged.path.isEmpty)
    staged.drop() // must not throw
    assert(staged.df.count() == 1)
  }
}
