package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current experiment (round 9, continuation): SUBSTRING-SPAN DEDUP SCALE
  * — how `TextDedup.repeatedSpans`' wall decomposes as duplicated VOLUME
  * grows (clean corpus / +10 % docs replicated 20× / whole corpus ×2),
  * and the span-index gate's per-batch steady-state cost
  * (`spanIndex` once + `spansAgainstIndex` per batch). Recorded in
  * README §substring-span scale / SURVEY §8.
  *
  * Prior recorded experiments (streaming gate cost split, verify-join
  * skew with the hot-cluster listener) live at git history of this file;
  * their numbers stand in README §streaming gate / §verify-join skew.
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
    import spark.implicits._

    val base = documents(spark, d).select(col("doc_id"), col("text"))
    val k = 8

    // ------------------------------------------------------------------
    // Experiment 1: repeatedSpans wall vs duplicated volume.
    //  clean    = sf0.1 as-is (organic duplication only);
    //  frac20x  = + the 10% of docs with doc_id%10=0, replicated 19 more
    //             times under fresh ids (duplicated volume ~20x on that
    //             slice, the rest untouched);
    //  all2x    = every document exactly twice (100% duplicated volume).
    // ------------------------------------------------------------------
    def replicas(src: org.apache.spark.sql.DataFrame, copies: Int, idBase: Long) =
      src.crossJoin(spark.range(copies).select(col("id").as("__r")))
        .select((col("doc_id") + lit(idBase) + col("__r") * lit(1000000L)).as("doc_id"),
          col("text"))
    val corpora = Seq(
      ("clean 1x (cold)", base),
      ("+10% docs 20x", base.unionByName(
        replicas(base.filter(col("doc_id") % 10 === 0), 19, 10000000L))),
      ("all docs 2x", base.unionByName(replicas(base, 1, 50000000L))),
      // warm repeat of the clean corpus: the first row pays JIT/staging
      // warmup; this one is the comparable steady-state number.
      ("clean 1x (warm)", base))
    println("| corpus | docs | windows | marked | spans | wall s |")
    println("|---|---|---|---|---|---|")
    for ((label, docs) <- corpora) {
      val nDocs = docs.count()
      val wins = graft.operators.TextDedup
        .windowProjection(docs, "doc_id", "text", k).count()
      val (res, wall) = timed {
        val sp = graft.operators.TextDedup
          .repeatedSpans(docs, "doc_id", "text", k)
        sp.agg(count(lit(1)), coalesce(sum(col("n_windows")), lit(0L)))
          .as[(Long, Long)].head()
      }
      println(f"| $label | $nDocs | $wins | ${res._2} | ${res._1} | $wall%.2f |")
    }

    // ------------------------------------------------------------------
    // Experiment 2: span-index gate steady state — index once, probe per
    // 1000-doc batch (500 copied-from-corpus + 500 fresh).
    // ------------------------------------------------------------------
    val (idx, idxSec) = timed {
      val i = graft.operators.TextDedup.spanIndex(base, "doc_id", "text", k)
      i.count(); i
    }
    println(f"[scratch] spanIndex over sf0.1 (once per corpus version): $idxSec%.2f s")
    val corpusSlice = base.orderBy(col("doc_id")).limit(500)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    println("| batch | spans | probe wall s |")
    println("|---|---|---|")
    for (b <- 1 to 5) {
      val rows =
        corpusSlice.map { case (id, t) => (id + 80000000L + b * 10000L, t) } ++
        (1 to 500).map { i =>
          (90000000L + b * 10000L + i,
           (1 to 40).map(j => s"fresh_${b}_${i}_$j").mkString(" ")) }
      val batch = rows.toSeq.toDF("doc_id", "text")
      val (ns, wall) = timed(graft.operators.TextDedup
        .spansAgainstIndex(batch, idx, "doc_id", "text", k).count())
      println(f"| $b | $ns | $wall%.2f |")
    }
    spark.stop()
  }
}
