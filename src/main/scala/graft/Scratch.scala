package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-profiling harness — rewritten per investigation.
  *
  * CURRENT PROBE (round 13, session 2): scale rehearsal for this
  * session's newcomers under the README §replica-stress convention
  * (first 10% of sf0.1 docs replicated 20× under fresh ids):
  *  - lmQualityScores: replicas add bigram FREQUENCY, not vocabulary —
  *    the LM/context rollups and their broadcasts are unchanged, so wall
  *    should grow like the corpus tokenize (linear in volume), never
  *    like the vocab joins;
  *  - labelPropagation on the sf0.1 simhash pair graph (the pageRank
  *    graph, avg degree ~66): the staged-round wall of 4 LPA rounds vs
  *    the 3-iteration pageRank baseline on the same graph;
  *  - keypointPairs volume growth on synthetic PNG groups (decode is
  *    the linear map-side cost; the containment join rides short keys).
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
    def warmTimed(label: String)(f: => Unit): Unit = {
      f // warmup
      val (_, t) = timed(f)
      println(f"[stress] $label: $t%.2f s")
    }
    val d = "/root/testdata/sf0.1"
    import graft.sources.Tables

    def docs = Tables.fanOut(Tables.documents(spark, d))
    val base = Tables.documents(spark, d)
    val nBase = base.count()
    val stress = Tables.fanOut(Tables.stage(base.unionByName(
      base.filter(col("doc_id") < nBase / 10)
        .crossJoin(spark.range(1, 20).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + lit(1000000L) * col("rep"))
        .drop("rep"))))
    val nStress = stress.count()
    println(s"[stress] base=$nBase stress=$nStress docs")

    // lmQualityScores: 1× vs 20%×20. Also report the vocab sizes, to
    // show the broadcasted model does NOT grow with the replicas.
    warmTimed("lm_quality 1x")(graft.operators.Ranking
      .lmQualityScores(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    warmTimed("lm_quality 20%x20")(graft.operators.Ranking
      .lmQualityScores(stress, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    val v1 = graft.operators.Ranking
      .bigramFrequencies(docs, "doc_id", "text").select("ng").distinct().count()
    val v2 = graft.operators.Ranking
      .bigramFrequencies(stress, "doc_id", "text").select("ng").distinct().count()
    println(s"[stress] lm vocab 1x=$v1 20%x20=$v2 (must be equal)")

    // LPA vs pageRank on the same sf0.1 simhash pair graph.
    {
      val pairs = Tables.stage(graft.operators.TextDedup
        .simhashPairs(docs, "doc_id", "text", maxHamming = 7))
      warmTimed("lpa it=4 simhash graph")(graft.operators.Graph
        .labelPropagation(pairs, "da", "db", iterations = 4)
        .write.format("noop").mode("overwrite").save())
      warmTimed("pagerank it=3 simhash graph")(graft.operators.Graph
        .pageRank(Tables.documents(spark, d), "doc_id", pairs, "da", "db",
          iterations = 3, scale = 1000000000L)
        .write.format("noop").mode("overwrite").save())
      val nCommunities = graft.operators.Graph
        .labelPropagation(pairs, "da", "db", iterations = 4)
        .select("lbl").distinct().count()
      println(s"[stress] lpa communities on simhash graph: $nCommunities")
    }

    // keypointPairs: 1× vs 4× image volume (fresh groups, same geometry
    // as x_dedup_image_keypoint's fixture).
    {
      import org.apache.spark.sql.Encoders
      import graft.operators.{Media, MediaRecord}
      def recs(mult: Int) = Tables.fanOut(spark.range(nBase * mult).toDF())
        .select(col("id")).as[Long](Encoders.scalaLong)
        .map { id =>
          val gBase = id / 3
          val v = (id % 3).toInt
          def cell(tag: String, cx: Int, cy: Int): Int = {
            val md = java.security.MessageDigest.getInstance("MD5")
            md.digest(s"$tag:$gBase:$cx:$cy".getBytes("US-ASCII"))(0) & 0xff
          }
          val (w, h) = v match {
            case 0 => (28, 24); case 1 => (23, 21); case _ => (31, 25)
          }
          MediaRecord(id, "png", Media.encodePng(w, h, (x, y) => {
            val g =
              if (v == 1) cell("i", x + 3, y + 2)
              else if (v == 2 && (x < 3 || y < 1)) cell("p", x, y)
              else if (v == 2) cell("i", x - 3, y - 1)
              else cell("i", x, y)
            (g << 16) | (g << 8) | g
          }))
        }(Encoders.product[MediaRecord])
      for (mult <- Seq(1, 4))
        warmTimed(s"keypoint_pairs ${mult}x")(graft.operators.ImageDedup
          .keypointPairs(recs(mult), threshold = 0.9)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
