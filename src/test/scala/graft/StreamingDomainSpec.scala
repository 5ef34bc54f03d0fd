package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{DomainIngest, Stream}

/** Folding per-domain arrival-accounting gate
  * (graft.streaming.DomainIngest — gate family #29). Asserts the
  * family contract plus the gate's own pins:
  *  1. gate-then-fold: batch rows are flagged against the PRE-batch
  *     counts (novel domains prior = 0), with SET semantics inside a
  *     batch (all rows of one domain see the same prior);
  *  2. the canonicalization chain runs inside the gate projection
  *     (shouting host + :443 + utm param land on the clean domain);
  *  3. fold ≡ a fresh buildCounts over everything seen, BITWISE;
  *  4. saturation flips exactly when prior crosses the cap;
  *  5. the replay fence skips re-delivered batches (double-folding
  *     would double counts — NOT idempotent). */
class StreamingDomainSpec extends SparkSpec {
  import spark.implicits._

  test("domain gate: pre-batch priors, set semantics, fold ≡ fresh, fence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      def u(host: String, p: Long) = s"https://$host/d/$p"
      val corpus = Seq(
        (1L, u("a.example.com", 1)), (2L, u("b.example.com", 2)),
        (3L, u("example.com", 3)), (4L, u("news.other.co.uk", 4)),
        (5L, u("other.co.uk", 5))).toDF("doc_id", "url")
      val state = new java.util.concurrent.atomic.AtomicReference(
        DomainIngest.buildCounts(corpus, "doc_id", "url", cap = 4L))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Boolean)]]
      val q = DomainIngest.startDomainGate(s, state, "value.doc_id", "value.url") {
        (flagged, _, _) =>
          got += flagged.as[(Long, String, Long, Boolean)].collect().toSeq.sortBy(_._1)
      }
      def send(rows: Seq[(Long, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url")
          .select(to_json(struct(col("doc_id"), col("url"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // b1: two example.com arrivals (messy spellings — canonicalization
      // must fold them onto the domain the corpus counted) + one novel
      // domain. SET semantics: both example.com rows see prior = 3.
      val b1 = Seq(
        (10L, "https://WWW.Example.COM:443/x?utm_source=f"),
        (11L, u("cdn.example.com", 11)),
        (12L, u("fresh.zz", 12)))
      send(b1)
      assert(got(0) == Seq(
        (10L, "example.com", 3L, false),
        (11L, "example.com", 3L, false),
        (12L, "fresh.zz", 0L, false)), s"b1 flags: ${got(0)}")

      // fold ≡ fresh: the grown counts equal a fresh build over
      // corpus ∪ b1, bitwise.
      val fresh = DomainIngest.buildCounts(
        corpus.unionByName(b1.toDF("doc_id", "url")), "doc_id", "url", 4L)
      def cnts(st: DomainIngest.DomainCounts) =
        st.counts.df.as[(String, Long)].collect().toSet
      assert(cnts(state.get()) == cnts(fresh),
        "fold must equal a fresh count build over everything seen")

      // b2: example.com is now at 5 ≥ cap 4 → saturated; other.co.uk
      // at 2 stays open.
      send(Seq((20L, u("example.com", 20)), (21L, u("x.other.co.uk", 21))))
      assert(got(1) == Seq(
        (20L, "example.com", 5L, true),
        (21L, "other.co.uk", 2L, false)), s"b2 flags: ${got(1)}")

      // replay fence: a re-delivered batch neither flags nor re-folds.
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      val before = got.size
      send(b1)
      assert(got.size == before && (state.get() eq fenced),
        "fenced batch must neither fold nor emit")
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }
}
