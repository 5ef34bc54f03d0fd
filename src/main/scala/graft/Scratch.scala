package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
      println(f"[scratch] $name%-28s min ${runs.min}%.3f s  med ${runs.sorted.apply(2)}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val l = lineitem(spark, d)
    time("warmup scan")(noop(l.select("l_quantity")))
    time("scan all cols")(noop(l))
    time("double sums")(noop(
      l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          avg(col("l_quantity")), count(lit(1)))))
    time("decimal(12,4) sums")(noop(
      l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(12, 4))),
          sum(col("l_extendedprice").cast(DecimalType(12, 4))),
          sum(col("l_extendedprice").cast(DecimalType(12, 4))
            * (lit(1) - col("l_discount").cast(DecimalType(6, 4)))),
          count(lit(1)))))
    time("q1 full (current)")(noop(SparkEntry.queries("q1_agg")(spark, d)))
    time("q1 full again")(noop(SparkEntry.queries("q1_agg")(spark, d)))
    // single-row-group parquet = single-task scan+partial-agg; does an
    // explicit fan-out after the unsplittable scan pay for itself?
    import graft.queries.QueryDsl._
    def q1body(src: org.apache.spark.sql.DataFrame) = src
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .repartition(32)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(decM(col("l_extendedprice")) * (lit(1) - decR(col("l_discount")))), 4)
          .cast("double").as("sum_disc_price"),
        round(sum(decM(col("l_extendedprice")) * (lit(1) - decR(col("l_discount")))
          * (lit(1) + decR(col("l_tax")))), 4).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    time("q1 + repartition(32)")(noop(q1body(l)))
    // bucketed co-located join: shuffle paid once at write, absent at read.
    graft.sources.Bucketing.writeBucketed(
      orders(spark, d).select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 16)
    graft.sources.Bucketing.writeBucketed(
      lineitem(spark, d).select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 16)
    val bjoin = spark.table("orders_b").hint("merge")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")))
    println(s"[scratch] bucketed join exchanges: " +
      bjoin.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange hashpartitioning")))
    time("bucketed join")(noop(bjoin))
    time("ann_brute (native expr)")(noop(SparkEntry.queries("x_ann_brute_topk")(spark, d)))
    time("dedup_embedding (native)")(noop(SparkEntry.queries("x_dedup_embedding")(spark, d)))
    time("ann_lsh")(noop(SparkEntry.queries("x_ann_lsh")(spark, d)))
    time("minhash_lsh")(noop(SparkEntry.queries("x_dedup_minhash_lsh")(spark, d)))
    time("simhash")(noop(SparkEntry.queries("x_dedup_simhash")(spark, d)))
    spark.stop()
  }
}
