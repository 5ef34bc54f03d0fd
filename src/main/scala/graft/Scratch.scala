package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiments (round 9):
  *  1. STREAMING GATE COST — steady-state per-micro-batch wall of
  *     DedupIngest.gateBatch (bloom pre-gate → exact settle → LSH on
  *     survivors) against a 20×-sf0.1 corpus (~100k docs), split by
  *     stage, plus the once-per-version buildState cost. Recorded in
  *     README §streaming gate / SURVEY §8.
  *  2. VERIFY-JOIN SKEW — a deliberately skewed corpus (one hot
  *     duplicate cluster alongside sf0.1) drives minhashLshPairs'
  *     band join + verify; per-task durations of the longest stage
  *     are captured with a listener to show whether AQE's skew split
  *     keeps the hot cluster off a single task, and how the wall
  *     responds with skew handling on vs off.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ------------------------------------------------------------------
    // Experiment 1: streaming gate steady-state per-batch cost.
    // ------------------------------------------------------------------
    val base = documents(spark, d)
    val n = base.count()
    val reps = 20
    val bigPath = "/tmp/graft_scale_docs"
    base.crossJoin(spark.range(reps).select(col("id").as("__r")))
      .select(
        (col("doc_id") + col("__r") * lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" "),
          expr("concat_ws(' ', transform(sequence(1, 8), " +
            "i -> substring(md5(concat(CAST(doc_id AS STRING), ':', " +
            "CAST(__r AS STRING), ':', CAST(i AS STRING))), 1, 12)))"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$bigPath/documents.parquet")
    val big = documents(spark, bigPath)
    println(s"[scratch] gate corpus: ${big.count()} docs (${reps}x sf0.1)")

    val stageDir = "/tmp/graft_gate_stage"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(stageDir), true)
    spark.conf.set("graft.stage.dir", stageDir)
    val (state, buildSec) = timed(
      graft.streaming.DedupIngest.buildState(big, "doc_id", "text"))
    println(f"[scratch] buildState (once per corpus version): $buildSec%.2f s")

    // a micro-batch arrives as driver-local rows (like a Kafka poll):
    // 200 exact copies of corpus docs, 300 near-dup variants (one extra
    // token), 500 genuinely-new synthetic docs.
    import spark.implicits._
    val corpusSlice = big.orderBy(col("doc_id")).limit(500)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    println("| batch | bloom s | settle s | lsh s | total s | exact pairs | near pairs |")
    println("|---|---|---|---|---|---|---|")
    for (b <- 1 to 5) {
      val rows =
        corpusSlice.take(200).map { case (id, t) => (id + 50000000L + b * 10000L, t) } ++
        corpusSlice.slice(200, 500).map { case (id, t) =>
          (id + 60000000L + b * 10000L, t + s" extra_token_$b") } ++
        (1 to 500).map { i =>
          (70000000L + b * 10000L + i,
           (1 to 40).map(j => s"fresh_${b}_${i}_$j").mkString(" ")) }
      val batch = rows.toSeq.toDF("doc_id", "text")
      // components (each driven separately to attribute cost)...
      val withDigest = batch.withColumn("__digest", md5(col("text")))
      val (_, bloomSec) = timed(
        graft.operators.BloomDedup.probe(withDigest, "__digest", state.exactFilter).count())
      val (_, settleSec) = timed {
        broadcast(graft.operators.BloomDedup
            .probe(withDigest, "__digest", state.exactFilter)
            .select(col("doc_id").as("da"), col("__digest")))
          .join(state.digests, "__digest").select(col("da"), col("db")).collect()
      }
      // ...then the REAL composed per-batch path, end to end.
      val ((ne, nn), totalSec) = timed {
        val (exact, near) = graft.streaming.DedupIngest.gateBatch(
          batch, state, "doc_id", "text")
        val ep = exact.count()
        val np = near.count()
        (ep, np)
      }
      val lshSec = totalSec - bloomSec - settleSec
      println(f"| $b | $bloomSec%.2f | $settleSec%.2f | ~$lshSec%.2f | $totalSec%.2f | $ne | $nn |")
    }
    spark.conf.unset("graft.stage.dir")

    // ------------------------------------------------------------------
    // Experiment 2: verify-join skew — one hot duplicate cluster.
    // ------------------------------------------------------------------
    val hotSize = 5000
    val hotBase = (1 to 60).map(j => s"hot_cluster_token_$j").mkString(" ")
    val hot = spark.range(hotSize).select(
      (col("id") + 90000000L).as("doc_id"),
      concat(lit(hotBase), lit(" "),
        expr("concat('v_', CAST(id AS STRING))")).as("text"))
    val skewed = base.select(col("doc_id"), col("text")).unionByName(hot)

    // task-duration listener: max vs median task ms of the heaviest
    // stage. Events arrive on the listener-bus thread AFTER the driving
    // action returns, so (a) appends are synchronized and (b) a settle
    // sleep runs before each read/clear — otherwise run N+1's cleared
    // map can swallow run N's stragglers and the sorted read can race
    // an in-flight append.
    val taskMs = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskMs.synchronized {
          taskMs.getOrElseUpdate(te.stageId,
            scala.collection.mutable.ArrayBuffer.empty[Long]) += te.taskInfo.duration
        }
    })
    println("| skew handling | wall s | pairs | heaviest stage max task s | median task s | tasks |")
    println("|---|---|---|---|---|---|")
    for ((label, conf) <- Seq(
        ("AQE skew ON", "true"), ("AQE skew OFF", "false"))) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", conf)
      Thread.sleep(1000) // drain stragglers from the previous run
      taskMs.synchronized { taskMs.clear() }
      val (np, wall) = timed {
        graft.operators.TextDedup.minhashLshPairs(
          graft.operators.TextDedup.shingleRelation(
            fanOut(skewed), "doc_id", "text", 3),
          12, 4, 0.5, bandCap = None).count()
      }
      Thread.sleep(1000) // let the listener bus deliver this run's tail
      val sorted = taskMs.synchronized {
        taskMs.values.maxBy(ts => ts.max).sorted.toIndexedSeq
      }
      println(f"| $label | $wall%.1f | $np | ${sorted.last / 1e3}%.1f " +
        f"| ${sorted(sorted.size / 2) / 1e3}%.2f | ${sorted.size} |")
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
  }
}
