package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-32s min ${runs.min}%.3f s  med ${runs.sorted.apply(2)}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val l = lineitem(spark, d)
    time("warmup")(noop(l.select("l_quantity")))

    // ---- q1: does fanning the single-task scan out pay? -------------------
    time("q1 (current, 1-task agg)")(noop(SparkEntry.queries("q1_agg")(spark, d)))
    locally {
      import graft.queries.QueryDsl._
      val p1 = s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"
      val p2 = s"($p1) * (100 + ${centsSql("l_tax")})"
      val aggs: Seq[org.apache.spark.sql.Column] =
        Seq(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price")) ++
          splitSumAggs("dp", p1, 1000000L) ++
          splitSumAggs("ch", p2, 1000000000L) ++
          Seq(davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
      time("q1 fanOut before agg")(noop(
        fanOut(l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(aggs.head, aggs.tail: _*)
          .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
            col("sum_base_price"),
            splitSumValue("dp", 1000000L, 10000L).as("sum_disc_price"),
            splitSumValue("ch", 1000000000L, 1000000L).as("sum_charge"),
            col("avg_qty"), col("avg_disc"), col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))))
    }

    // ---- token counting: quadratic distinct×filter vs sorted run-length ---
    // Long synthetic docs are where the O(distinct·len) pattern cliffs: the
    // per-document cost is distinct×len string comparisons on ONE task.
    locally {
      val docs = graft.sources.Tables.stage(
        spark.range(200).select(col("id").as("doc_id"),
          expr("""concat_ws(' ', transform(sequence(1, 8192),
                 |  i -> concat('w', CAST(pmod(xxhash64(id, i), 1024) AS STRING))))""".stripMargin)
            .as("text")))
      time("tf long-docs quadratic (old)")(noop(docs
        .withColumn("__toks", expr("split(lower(text), ' ')"))
        .select(col("doc_id"), explode(expr(
          """transform(array_distinct(__toks),
            |  t -> named_struct('token', t,
            |                    'tf', size(filter(__toks, x -> x = t))))""".stripMargin)).as("tt"))))
      time("tf long-docs run-length (new)")(noop(
        graft.operators.Ranking.termFrequencies(docs, "doc_id", "text")))
    }

    // ---- minhash: stage cost vs join cost ---------------------------------
    locally {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val docs = fanOut(documents(spark, d))
      time("minhash shingles only") {
        noop(graft.operators.TextDedup.shingleRelation(docs, "doc_id", "text"))
      }
      time("minhash full (current)")(noop(SparkEntry.queries("x_dedup_minhash_lsh")(spark, d)))
      time("text_stats (current)")(noop(SparkEntry.queries("x_text_stats")(spark, d)))
    }
    spark.stop()
  }
}
