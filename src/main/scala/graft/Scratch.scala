package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 13): the two-round x_cc_components drift the r12
  * verdict flagged (+18% r11→r12 in its reading of the driver bench).
  * Decomposes the query into its two stages — simhashPairs candidate
  * generation and the CC contraction loop — and times each plus the
  * end-to-end wall over repeated runs, so plan drift (a changed stage)
  * separates from harness noise (same stages, wider spread).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.OFF)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val d = "/root/testdata/sf0.1"
    import graft.sources.Tables

    def docs = Tables.fanOut(Tables.documents(spark, d))

    // warmup (JIT + codegen caches) — untimed.
    graft.SparkEntry.queries("x_cc_components")(spark, d)
      .write.format("noop").mode("overwrite").save()

    for (i <- 1 to 5) {
      // stage 1: candidate pairs alone.
      val (_, tPairs) = timed {
        graft.operators.TextDedup
          .simhashPairs(docs, "doc_id", "text", maxHamming = 7)
          .write.format("noop").mode("overwrite").save()
      }
      // stage 2: CC on PRE-STAGED pairs (isolates the contraction loop).
      val pairs = Tables.stage(graft.operators.TextDedup
        .simhashPairs(docs, "doc_id", "text", maxHamming = 7))
      val (_, tCc) = timed {
        graft.operators.Graph
          .componentsForVertices(Tables.documents(spark, d), "doc_id",
            pairs, "da", "db")
          .write.format("noop").mode("overwrite").save()
      }
      // end-to-end, exactly the registered query (bench discipline).
      val (_, tAll) = timed {
        graft.SparkEntry.queries("x_cc_components")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[cc-probe] run $i: pairs=$tPairs%.2f cc_on_staged=$tCc%.2f end_to_end=$tAll%.2f")
    }

    // ---- round-13 scale rehearsal: the r12 newcomers under the 20×
    // replica stress (the README §replica-stress convention: the first
    // 10% of docs replicated 20× under fresh ids → 14,500 docs).
    val base = Tables.documents(spark, d)
    val nBase = base.count()
    val stress = Tables.fanOut(Tables.stage(base.unionByName(
      base.filter(col("doc_id") < nBase / 10)
        .crossJoin(spark.range(1, 20).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + lit(1000000L) * col("rep"))
        .drop("rep"))))
    val nStress = stress.count()
    println(s"[stress] base=$nBase stress=$nStress docs")

    def warmTimed(label: String)(f: => Unit): Unit = {
      f // warmup
      val (_, t) = timed(f)
      println(f"[stress] $label: $t%.2f s")
    }

    // softDedup: 1× vs 20%×20 (only (id, digest) rides the window shuffle).
    warmTimed("soft_dedup 1x")(graft.operators.TextDedup
      .softDedup(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    warmTimed("soft_dedup 20%x20")(graft.operators.TextDedup
      .softDedup(stress, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())

    // trainBpe: replicas add FREQUENCY, not words — the per-round
    // aggregates run over the same dictionary, so wall should grow by
    // the one corpus tokenize only (the dictionary discipline's claim).
    {
      val (r1, t1) = timed(graft.operators.Subword.trainBpe(docs, "text", k = 4))
      r1._2.write.format("noop").mode("overwrite").save()
      val (r2, t2) = timed(graft.operators.Subword.trainBpe(stress, "text", k = 4))
      r2._2.write.format("noop").mode("overwrite").save()
      println(f"[stress] train_bpe k=4 1x: $t1%.2f s   20%%x20: $t2%.2f s   " +
        s"merges equal: ${r1._1 == r2._1}")
    }

    // editDistancePairs (title field, the short-derived-field contract)
    // with the cellCap guard: replicas make every replicated title a hot
    // (block, length-bucket) cell.
    def titled(src: org.apache.spark.sql.DataFrame) = src.select(col("doc_id"),
      col("lang"),
      expr("concat_ws(' ', slice(split(text, ' '), 1, 3), CAST(doc_id % 5 AS STRING))")
        .as("title"))
    for ((label, cap) <- Seq("cap=256" -> Some(256), "uncapped" -> None)) {
      warmTimed(s"edit_pairs 1x $label")(graft.operators.TextDedup
        .editDistancePairs(titled(docs), "doc_id", "title", maxDist = 2,
          blockCols = Seq("lang"), cellCap = cap)
        .write.format("noop").mode("overwrite").save())
      warmTimed(s"edit_pairs 20%x20 $label")(graft.operators.TextDedup
        .editDistancePairs(titled(stress), "doc_id", "title", maxDist = 2,
          blockCols = Seq("lang"), cellCap = cap)
        .write.format("noop").mode("overwrite").save())
    }

    // multi-probe LSH vs single probe, same staged index, 1× and 8×
    // corpus (probe-side growth is the multi-probe price; the index is
    // byte-identical across modes).
    {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val queries = e.filter(col("id") < 100)
      def corpusTimes(times: Int): org.apache.spark.sql.DataFrame =
        if (times == 1) e.filter(col("id") >= 100)
        else e.filter(col("id") >= 100).crossJoin(
          spark.range(times).select(col("id").as("rep")))
          .withColumn("id", col("id") + lit(1000000L) * col("rep")).drop("rep")
      for (times <- Seq(1, 8)) {
        val idx = Tables.stage(graft.operators.Ann.bandedRelation(
          Tables.fanOut(corpusTimes(times)), "c_id", "ce", 128, 16, 64))
        warmTimed(s"ann ${times}x single-probe")(graft.operators.Ann
          .lshTopKAgainstIndex(queries, idx, 10, 128, 16, 64)
          .write.format("noop").mode("overwrite").save())
        warmTimed(s"ann ${times}x multi-probe")(graft.operators.Ann
          .lshTopKMultiProbeAgainstIndex(queries, idx, 10, 128, 16, 64)
          .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
