package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{Gate, ScoreIngest, Stream, WebIngest}

/** The composed crawl-ingest loop (graft.streaming.WebIngest — the
  * streaming twin of x_pipeline_crawl). Asserts the composition, not
  * the per-operator arithmetic (each stage's exact math is pinned by
  * its own spec/oracle):
  *  1. per-row manifest verdicts: structure gate, frozen-LM gate
  *     (fluent vs all-OOV margins), domain priors with PRE-batch
  *     semantics and saturation at the cap;
  *  2. dedup-after-extraction IN STREAMING: a batch-N+1 replica of
  *     batch-N content under DIFFERENT chrome collapses (raw bytes
  *     differ, extracted digests match), and within one batch the
  *     smallest id is canonical;
  *  3. only canonical survivors' digests grow the corpus root; domain
  *     counts fold for EVERY fetched row (bandwidth accounting);
  *  4. the replay fence governs the whole composed body. */
class StreamingWebSpec extends SparkSpec {
  import spark.implicits._

  private def page(title: String, bodies: String*): String =
    s"<html><head><title>$title</title></head><body>" +
      bodies.map(b => s"<p>$b</p>").mkString + "</body></html>"

  test("composed web ingest: gates, cross-batch dedup, domain accounting, fence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val ref = Seq((1L, "the cat sat on the mat"),
        (2L, "the cat ran to the mat"),
        (3L, "the dog sat on a mat")).toDF("doc_id", "text")
      val lm = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLm(ref, "doc_id", "text"))
      val state = new java.util.concurrent.atomic.AtomicReference(
        WebIngest.buildState(
          Seq.empty[(Long, String, String)].toDF("doc_id", "url", "text"),
          "doc_id", "url", "text", cap = 2L))

      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("url", StringType), StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, Long, Boolean, Option[Long], Option[Long],
          Boolean, Boolean, Option[Long], Boolean)]]
      val q = WebIngest.start(s, state, lm, "value.doc_id", "value.url",
        "value.html", minBlocks = 2L, threshPct = 300L) { (m, _, _) =>
        got += m.select(col("doc_id"), col("domain"), col("prior"),
          col("saturated"), col("n_kept"), col("cost_bits"),
          col("kept_structure"), col("kept_lm"), col("dup_of"), col("kept"))
          .as[(Long, String, Long, Boolean, Option[Long], Option[Long],
            Boolean, Boolean, Option[Long], Boolean)]
          .collect().toSeq.sortBy(_._1)
      }
      def send(rows: Seq[(Long, String, String)]): Unit = {
        val payloads = rows.toDF("doc_id", "url", "html")
          .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
          .as[String].collect()
        ms.addData(payloads.zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      val fluent = page("Chrome1",  // < minChars: titles must NOT join the digest
        "the cat sat on the mat", "the cat ran to the mat")
      val b1 = Seq(
        (10L, "https://a.example.com/1", fluent),
        (11L, "https://b.example.com/2",
          page("G", "zzqq wwxx yyvv uuoo ppnn", "qqzz xxww vvyy oojj kkhh")),
        (12L, "https://c.other.zz/3", "<html><body><p>tiny</p></body></html>"))
      send(b1)
      val m1 = got(0)
      // fluent page: all gates green, canonical.
      assert(m1(0)._1 == 10L && m1(0)._2 == "example.com" &&
        m1(0)._3 == 0L && !m1(0)._4 && m1(0)._7 && m1(0)._8 &&
        m1(0)._9.isEmpty && m1(0)._10, s"page 10: ${m1(0)}")
      // gibberish: structure ok, LM drops it (all-OOV pays the floor).
      assert(m1(1)._1 == 11L && m1(1)._7 && !m1(1)._8 && !m1(1)._10,
        s"page 11: ${m1(1)}")
      // tiny: structure gate drops it before the LM ever sees it.
      assert(m1(2)._1 == 12L && !m1(2)._7 && m1(2)._6.isEmpty && !m1(2)._10,
        s"page 12: ${m1(2)}")

      // only the canonical survivor's digest grew the corpus root.
      val grown1 = graft.streaming.Gate.readGrown(spark, state.get().digestsPath)
        .select(col("owner")).as[Long].collect().toSet
      assert(grown1 == Set(10L), s"grown owners after b1: $grown1")

      // b2: a replica of page 10's CONTENT under different chrome on a
      // SATURATED domain; a fresh fluent page + its same-batch copy.
      val fresh = page("Fresh",
        "the dog sat on a mat", "the cat sat on the mat")
      send(Seq(
        (20L, "https://z.example.com/4",
          page("NewChrome",
            "the cat sat on the mat", "the cat ran to the mat") +
            "<div><a href='/'>Home</a></div>"),
        (21L, "https://d.other.zz/5", fresh),
        (22L, "https://e.other.zz/6", fresh)))
      val m2 = got(1)
      // PRE-batch priors: example.com fetched 2 in b1 (cap 2 ⇒
      // saturated); other.zz fetched 1.
      assert(m2(0)._1 == 20L && m2(0)._3 == 2L && m2(0)._4, s"20: ${m2(0)}")
      assert(m2(1)._3 == 1L && !m2(1)._4, s"21: ${m2(1)}")
      // cross-batch dedup AFTER extraction: different chrome, same
      // extracted text ⇒ dup of batch-1's page 10.
      assert(m2(0)._9.contains(10L) && !m2(0)._10, s"20 dup: ${m2(0)}")
      // within-batch: min id canonical, the copy points at it.
      assert(m2(1)._9.isEmpty && m2(1)._10, s"21: ${m2(1)}")
      assert(m2(2)._9.contains(21L) && !m2(2)._10, s"22: ${m2(2)}")

      // folds: digests grew by the ONE new canonical; counts carry
      // every fetched row.
      val grown2 = graft.streaming.Gate.readGrown(spark, state.get().digestsPath)
        .select(col("owner")).as[Long].collect().toSet
      assert(grown2 == Set(10L, 21L), s"grown owners after b2: $grown2")
      val counts = state.get().counts.df.as[(String, Long)].collect().toSet
      assert(counts == Set(("example.com", 3L), ("other.zz", 3L)),
        s"folded counts: $counts")

      // compaction: the digest root consolidates; the dedup answer for
      // a replica of already-grown content is unchanged; fence carries.
      val compacted = WebIngest.compactState(state.get())
      assert(compacted.digestsPath != state.get().digestsPath &&
        compacted.foldedBatch == state.get().foldedBatch)
      val grownC = graft.streaming.Gate.readGrown(spark, compacted.digestsPath)
        .select(col("owner")).as[Long].collect().toSet
      assert(grownC == grown2, s"compacted owners: $grownC")

      // replay fence over the COMPOSED body.
      val fenced = state.get().copy(foldedBatch = Long.MaxValue)
      state.set(fenced)
      val before = got.size
      send(b1)
      assert(got.size == before && (state.get() eq fenced),
        "fenced batch must neither fold nor emit")
      q.stop()
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("composed web ingest: PII-divergent copies collapse after redaction; n_pii counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val ref = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
      val lm = new java.util.concurrent.atomic.AtomicReference(
        ScoreIngest.buildLm(ref, "doc_id", "text"))
      val state = new java.util.concurrent.atomic.AtomicReference(
        WebIngest.buildState(
          Seq.empty[(Long, String, String)].toDF("doc_id", "url", "text"),
          "doc_id", "url", "text", cap = 10L))
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("url", StringType), StructField("html", StringType)))
      val ms = MemoryStream[KMsg]
      val s = Stream.fromKafkaShaped(spark, ms.toDF(), schema)
      val got = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, Option[Long], Option[Long], Boolean)]]
      // the LM gate is held open (threshPct huge): this test pins the
      // PII/dedup interaction, not the LM.
      val q = WebIngest.start(s, state, lm, "value.doc_id", "value.url",
        "value.html", minBlocks = 2L, threshPct = 100000L) { (m, _, _) =>
        got += m.select(col("doc_id"), col("n_pii"), col("dup_of"), col("kept"))
          .as[(Long, Option[Long], Option[Long], Boolean)]
          .collect().toSeq.sortBy(_._1)
      }
      // 30 and 31 differ ONLY in the planted email + phone — their raw
      // digests differ, the REDACTED digests match; 32 carries no PII.
      def piiPage(email: String, phone: String): String = page("T",
        "the cat sat on the mat", s"mail $email or call $phone today")
      ms.addData(Seq(
        (30L, "https://a.x.com/1", piiPage("bob@x.example.com", "+14155550101")),
        (31L, "https://b.x.com/2", piiPage("eve@y.example.org", "415-555-0102")),
        (32L, "https://c.x.com/3", page("T",
          "the cat sat on the mat", "the cat ran to the mat")))
        .toDF("doc_id", "url", "html")
        .select(to_json(struct(col("doc_id"), col("url"), col("html"))).as("j"))
        .as[String].collect().zipWithIndex.map { case (j, i) =>
          KMsg("t", 0, i.toLong, new Timestamp(1000L + i), null, j.getBytes("UTF-8"))
        }.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()
      val m = got(0)
      assert(m(0) == ((30L, Some(2L), None, true)), s"30: ${m(0)}")
      assert(m(1) == ((31L, Some(2L), Some(30L), false)),
        s"31 must collapse onto 30 post-redaction: ${m(1)}")
      assert(m(2) == ((32L, Some(0L), None, true)), s"32: ${m(2)}")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("buildState redacts the seed text itself: a raw-text seed and a pre-redacted seed build identical digest roots") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("graft.stage.dir", dir)
    try {
      val raw = Seq(
        (1L, "https://a.x.com/1", "mail bob@x.example.com or call +14155550101"),
        (2L, "https://b.x.com/2", "no pii here at all"))
        .toDF("doc_id", "url", "text")
      val pre = raw.withColumn("text",
        expr(graft.operators.Pii.redactSql("text", duck = false)))
      val stRaw = WebIngest.buildState(raw, "doc_id", "url", "text", cap = 10L)
      val stPre = WebIngest.buildState(pre, "doc_id", "url", "text", cap = 10L)
      def digs(st: WebIngest.WebState): Set[(String, Long)] =
        Gate.readGrown(spark, st.digestsPath).as[(String, Long)].collect().toSet
      val a = digs(stRaw)
      assert(a == digs(stPre), "raw-text seed must digest post-redaction")
      // and the digests genuinely reflect the REDACTED text
      val want = pre.select(md5(col("text")), col("doc_id"))
        .as[(String, Long)].collect().toSet
      assert(a == want, s"$a vs $want")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
