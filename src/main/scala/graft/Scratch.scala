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
    val o = orders(spark, d)
    val c = customer(spark, d)
    time("warmup")(noop(l.select("l_quantity")))

    // ---- q3 decomposition -------------------------------------------------
    time("scan lineitem(4col)+filter")(noop(
      l.filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")))
    time("scan orders(3col)+filter")(noop(
      o.filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")))
    time("scan customer(2col)+filter")(noop(
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")))
    time("q3 full (current)")(noop(SparkEntry.queries("q3_shuffle_join")(spark, d)))
    locally {
      import graft.queries.QueryDsl._
      val cf = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val of = o.filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val lf = l.filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val p1 = s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"
      val revAggs = splitSumAggs("rev", p1, 1000000L)
      time("q3 broadcast c,o")(noop(
        broadcast(cf).join(of, col("c_custkey") === col("o_custkey"))
          .join(lf, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(revAggs.head, revAggs.tail: _*)
          .select(col("o_orderkey"), col("o_orderdate"),
            splitSumValue("rev", 1000000L, 10000L).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey")).limit(20)))
      time("q3 bcast co-side join l")(noop(
        broadcast(broadcast(cf).join(of, col("c_custkey") === col("o_custkey")))
          .join(lf, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(revAggs.head, revAggs.tail: _*)
          .select(col("o_orderkey"), col("o_orderdate"),
            splitSumValue("rev", 1000000L, 10000L).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey")).limit(20)))
      time("q3 fanOut lineitem")(noop(
        broadcast(cf.join(of, col("c_custkey") === col("o_custkey")))
          .join(fanOut(lf), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(revAggs.head, revAggs.tail: _*)
          .select(col("o_orderkey"), col("o_orderdate"),
            splitSumValue("rev", 1000000L, 10000L).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey")).limit(20)))
    }

    // ---- window rank decomposition ----------------------------------------
    time("q_window_rank (current)")(noop(SparkEntry.queries("q_window_rank")(spark, d)))
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.QueryDsl._
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val base = fanOut(o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"))
      time("q_window_rank fanOut")(noop(
        base.select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(byDate).as("rn"),
          rank().over(byPrice).as("price_rank"),
          lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
          sum(decM(col("o_totalprice")))
            .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
          .orderBy(col("o_custkey"), col("rn"))))
      time("q_window_rank no-final-sort")(noop(
        o.select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(byDate).as("rn"),
          rank().over(byPrice).as("price_rank"),
          lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
          sum(decM(col("o_totalprice")))
            .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))))
    }

    // ---- staged-signature variants ----------------------------------------
    locally {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      time("minhash_lsh (current)")(noop(SparkEntry.queries("x_dedup_minhash_lsh")(spark, d)))
      val shingles3 =
        """array_distinct(transform(
          |  sequence(1, greatest(size(toks) - 2, 1)),
          |  i -> concat_ws(' ', slice(toks, i, 3))))""".stripMargin
      time("minhash_lsh staged") {
        val sh = stage(fanOut(documents(spark, d))
          .withColumn("toks", expr("split(lower(text), ' ')"))
          .withColumn("sh", expr(shingles3))
          .select(col("doc_id"), col("sh")))
        val sig = sh.withColumn("sig", expr("minhash_sig(sh, 12)"))
        val bands = stage(sig.select(col("doc_id"),
          explode(expr("""transform(sequence(0, 3),
            b -> md5(concat(CAST(b AS STRING), '|', element_at(sig, 3*b+1),
                            element_at(sig, 3*b+2), element_at(sig, 3*b+3))))"""))
            .as("band_key")))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
        noop(cand
          .join(sh.as("sa"), col("da") === col("sa.doc_id"))
          .join(sh.as("sb"), col("db") === col("sb.doc_id"))
          .withColumn("inter", expr("size(filter(sa.sh, x -> array_contains(sb.sh, x)))"))
          .withColumn("jaccard",
            expr("CAST(inter AS DOUBLE) / (size(sa.sh) + size(sb.sh) - inter)"))
          .filter(col("jaccard") >= 0.5)
          .select(col("da"), col("db"), col("jaccard"))
          .orderBy(col("da"), col("db")))
      }
      time("ngram_jaccard (current)")(noop(SparkEntry.queries("x_dedup_ngram_jaccard")(spark, d)))
      time("ngram_jaccard staged") {
        val sh = stage(fanOut(documents(spark, d))
          .withColumn("toks", expr("split(lower(text), ' ')"))
          .withColumn("sh", expr(shingles3))
          .select(col("doc_id"), col("sh")))
        val sizes = sh.select(col("doc_id"), expr("size(sh)").as("n"))
        val ex = stage(sh.select(col("doc_id"), explode(col("sh")).as("s")))
        val inter = ex.as("a")
          .join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("inter"))
        noop(inter
          .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
          .withColumn("jaccard",
            expr("CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)"))
          .filter(col("jaccard") >= 0.5)
          .select(col("da"), col("db"), col("jaccard"))
          .orderBy(col("da"), col("db")))
      }
      time("ann_lsh (current)")(noop(SparkEntry.queries("x_ann_lsh")(spark, d)))
    }
    spark.stop()
  }
}
