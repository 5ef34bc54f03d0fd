package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 9, late continuation): TRIANGLE-COUNT SCALE —
  * the degree-orientation wedge bound of `Graph.triangleCounts` measured
  * against the naive id-orientation on a hot-hub graph (the shape a
  * replica-heavy near-dup corpus produces), plus the registry shape at
  * sf0.1. Recorded in README §triangle scale / SURVEY §8.
  *
  * Prior recorded experiments (substring-span scale, span-index gate
  * steady state, streaming gate cost split, verify-join skew) live in git
  * history of this file; their numbers stand in README.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    import spark.implicits._

    // ------------------------------------------------------------------
    // Fixtures.
    //  hub-star : node 0 joined to 1..50000, leaves chained i—(i+1) — the
    //             worst case for id-orientation (hub has the SMALLEST id,
    //             so lo→hi orientation gives it out-degree 50k and
    //             C(50k,2) = 1.25e9 wedges); degree orientation points
    //             every star edge INTO the hub → ~0 hub wedges.
    //  random   : G(n=200k, m=1M) seeded uniform — the organic-pair regime.
    //  sf0.1    : the registry's simhash near-dup graph at bench scale.
    // ------------------------------------------------------------------
    val hub = spark.range(1, 50001).select(lit(0L).as("a"), col("id").as("b"))
      .unionByName(spark.range(1, 50000)
        .select(col("id").as("a"), (col("id") + 1).as("b")))
    val rnd = spark.range(1000000).select(
      (xxhash64(col("id")) % 200000).as("a"),
      (xxhash64(col("id"), lit(1)) % 200000).as("b"))
      .select(abs(col("a")).as("a"), abs(col("b")).as("b"))
    val sf01 = graft.operators.TextDedup.simhashPairs(
      fanOut(documents(spark, "/root/testdata/sf0.1")), "doc_id", "text",
      maxHamming = 7).select(col("da").as("a"), col("db").as("b"))

    // wedge volume under each orientation: Σ_u C(outdeg(u), 2).
    def wedgeCounts(edges: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val e = edges.select(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi"))
        .filter(col("lo") < col("hi")).distinct()
      val idW = e.groupBy(col("lo")).agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L))).as[Long].head()
      val deg = e.select(explode(array(col("lo"), col("hi"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("degree"))
      val o = e.join(deg.select(col("n").as("lo"), col("degree").as("dlo")), "lo")
        .join(deg.select(col("n").as("hi"), col("degree").as("dhi")), "hi")
        .select(when(col("dlo") <= col("dhi"), col("lo")).otherwise(col("hi")).as("u"))
      val degW = o.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L))).as[Long].head()
      (idW, degW)
    }

    println("| graph | edges | wedges id-orient | wedges deg-orient | triangles | wall s |")
    println("|---|---|---|---|---|---|")
    for ((label, edges) <- Seq(("hub-star 50k", hub), ("random 200k/1M", rnd),
                               ("sf0.1 simhash pairs", sf01))) {
      val staged = graft.sources.Tables.stage(
        edges.select(col("a").cast("long"), col("b").cast("long")))
      val nE = staged.select(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi"))
        .filter(col("lo") < col("hi")).distinct().count()
      val (idW, degW) = wedgeCounts(staged)
      val (nTri, wall) = timed {
        graft.operators.Graph.triangleCounts(staged, "a", "b")
          .agg(coalesce(sum(col("n_tri")), lit(0L))).as[Long].head() / 3
      }
      println(f"| $label | $nE | $idW | $degW | $nTri | $wall%.2f |")
    }
    spark.stop()
  }
}
