package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{Stream, TrapIngest}

/** Folding crawl-trap accounting gate (graft.streaming.TrapIngest —
  * gate family #34). Asserts the family contract plus the gate's own
  * pins:
  *  1. gate-then-fold: batch rows are flagged against the PRE-batch
  *     per-host score (unseen hosts read the neutral 100), with SET
  *     semantics inside a batch;
  *  2. canonicalization runs inside the gate projection — url
  *     spellings differing only by tracking params/case/port collapse
  *     BEFORE counting, so they never read as a trap;
  *  3. fold ≡ a fresh buildState over everything seen, BITWISE;
  *  4. the fold is IDEMPOTENT (set union): re-fetching a url with
  *     unchanged content does not inflate the score — the deliberate
  *     contrast to the count-folding gates;
  *  5. the replay fence still guards EMISSION dedup. */
class StreamingTrapSpec extends SparkSpec {
  import spark.implicits._

  test("trap gate: pre-batch scores, canonical collapse, idempotent fold ≡ fresh, fence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      // corpus: trap.com mints 4 urls over 1 body (ratio 400);
      // ok.com is 1:1 (ratio 100).
      val corpus = Seq(
        (1L, "https://www.trap.com/d/1/a", "body t"),
        (2L, "https://www.trap.com/d/1/b", "body t"),
        (3L, "https://www.trap.com/d/1/c", "body t"),
        (4L, "https://www.trap.com/d/1/d", "body t"),
        (5L, "https://www.ok.com/d/1", "body 1"),
        (6L, "https://www.ok.com/d/2", "body 2")).toDF("doc_id", "url", "text")
      val state = new java.util.concurrent.atomic.AtomicReference(
        TrapIngest.buildState(corpus, "doc_id", "url", "text",
          thresholdX100 = 300L))

      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("url", StringType),
        StructField("text", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, Long, Boolean)]]
      val q = TrapIngest.startTrapGate(s, state,
        "value.doc_id", "value.url", "value.text") { (flagged, _, _) =>
        got += flagged.as[(Long, String, Long, Boolean)]
          .collect().toSeq.sortBy(_._1)
      }
      def send(rows: Seq[(Long, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url", "text")
          .select(to_json(struct(col("doc_id"), col("url"), col("text"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null,
            j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      // b1: a trap.com fetch (prior 400 → trapped), an ok.com fetch
      // whose SPELLING is messy (utm + case + :443 — canonicalization
      // collapses it onto the corpus url: same uh, same dg), and a
      // novel host (neutral prior 100). SET semantics: both trap.com
      // rows see the same prior.
      val b1 = Seq(
        (10L, "https://www.trap.com/d/1/e", "body t"),
        (11L, "https://www.trap.com/d/1/f", "body t"),
        (12L, "https://WWW.OK.COM:443/d/1?utm_source=x", "body 1"),
        (13L, "https://www.new.zz/p", "body n"))
      send(b1)
      assert(got(0) == Seq(
        (10L, "www.trap.com", 400L, true),
        (11L, "www.trap.com", 400L, true),
        (12L, "www.ok.com", 100L, false),
        (13L, "www.new.zz", 100L, false)), s"b1 flags: ${got(0)}")

      // fold ≡ fresh over corpus ∪ b1, bitwise; the canonical-collapsed
      // ok.com re-fetch added NOTHING (set absorption).
      def triples(st: TrapIngest.TrapState) =
        st.pairs.df.as[(String, String, String)].collect().toSet
      val fresh = TrapIngest.buildState(
        corpus.unionByName(b1.toDF("doc_id", "url", "text")),
        "doc_id", "url", "text", 300L)
      assert(triples(state.get()) == triples(fresh),
        "fold must equal a fresh triple-set build over everything seen")
      assert(triples(state.get())
        .count { case (h, _, _) => h == "www.ok.com" } == 2,
        "the collapsed re-fetch must not mint a third ok.com triple")

      // b2: re-deliver b1's CONTENT as a new batch (same urls, same
      // bodies) — the idempotent fold absorbs every triple; scores
      // move only by b1's own fold (trap.com now 6 urls / 1 body).
      val stBefore = triples(state.get())
      send(b1.map { case (id, u, t) => (id + 100L, u, t) })
      assert(got(1).map(r => (r._2, r._3, r._4)).distinct == Seq(
        ("www.trap.com", 600L, true),
        ("www.ok.com", 100L, false),
        ("www.new.zz", 100L, false)), s"b2 flags: ${got(1)}")
      assert(triples(state.get()) == stBefore,
        "re-fetched unchanged content must not grow the triple set")

      // replay fence: a re-delivered BATCH ID neither flags nor folds.
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
