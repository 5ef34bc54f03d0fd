package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Trained multi-class language identification (Ranking.langId) —
  * pins the contract on a-priori fixtures: dense prior-centered
  * weights, exact-integer argmax, the smallest-lang tie-break, and the
  * no-evidence exclusion (docs sharing no trained bucket never
  * classify). */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) = {
    val docs = rows.toDF("doc_id", "text", "lbl")
    Ranking.langId(docs, "doc_id", "text", col("lbl"))
      .select(col("doc_id"), col("lang_pred"))
      .as[(Long, String)].collect().toMap
  }

  test("lang-id: disjoint char distributions separate perfectly") {
    val train = Seq(
      (1L, "aaa aab aba baa", "aa"),
      (2L, "xxx xxy xyx yxx", "xx"))
    val score = Seq(
      (10L, "aab aba aab", null.asInstanceOf[String]),
      (11L, "xxy xyx", null.asInstanceOf[String]))
    val got = run(train ++ score)
    assert(got(10L) == "aa" && got(11L) == "xx")
    // the labeled rows classify too (they are also corpus rows)
    assert(got(1L) == "aa" && got(2L) == "xx")
  }

  test("lang-id: exact tie breaks to the smallest lang") {
    // identical feature mass for both classes -> every weight row is
    // symmetric, every score ties, the min-struct picks 'aa' < 'bb'.
    val got = run(Seq(
      (1L, "qqq qqq", "aa"),
      (2L, "qqq qqq", "bb"),
      (9L, "qqq", null.asInstanceOf[String])))
    assert(got(9L) == "aa")
  }

  test("lang-id: docs with no trained bucket never classify") {
    val got = run(Seq(
      (1L, "aaa aaa", "aa"),
      (9L, "zzz www", null.asInstanceOf[String])))
    assert(got.contains(1L) && !got.contains(9L),
      s"no-evidence doc must be absent: $got")
  }

  test("lang-id: driver-settle ≡ staged-counts fallback, bitwise") {
    // the settle path (counts collected to a local relation) and the
    // wide-bucket-space fallback (counts staged) must emit identical
    // rows — grouped sums of grouped sums either way (r18).
    val rows = Seq(
      (1L, "aaa aab aba baa", "aa"),
      (2L, "xxx xxy xyx yxx", "xx"),
      (3L, "mmm nnn ooo ppp", "mm"),
      (10L, "aab aba aab", null.asInstanceOf[String]),
      (11L, "xxy xyx", null.asInstanceOf[String]))
    val docs = rows.toDF("doc_id", "text", "lbl")
    def all(maxSettle: Int) =
      Ranking.langId(docs, "doc_id", "text", col("lbl"),
        maxSettleHexDigits = maxSettle)
        .orderBy(col("doc_id"))
        .as[(Long, String, Long)].collect().toSeq
    assert(all(Ranking.DefaultMaxSettleHexDigits) == all(0))
  }

  test("lang-id: driver settle refuses past the bound, loudly") {
    val grouped = Seq(("aa", "0f1", 3L), ("bb", "0f1", 2L), ("bb", "aa2", 1L))
      .toDF("lang", "bk", "tf")
    val e = intercept[IllegalArgumentException] {
      Ranking.settleBounded(grouped, maxRows = 2, what = "spec")
    }
    assert(e.getMessage.contains("driver-settle bound"), e.getMessage)
  }

  test("classifyLangs: non-dense weights fail loudly, never mis-rank") {
    // a missing (lang, bk) weight row would NULL one class's sum and
    // least() would crown it (NULL struct fields sort first) — the
    // pivot path must refuse instead (r17 advice).
    val rel = Seq((9L, "0f1", 2L)).toDF("doc_id", "bk", "tf")
    val sparse = Seq(("aa", "0f1", 5L)) // no ("bb", "0f1") row
      .toDF("lang", "bk", "w")
    val e = intercept[Exception] {
      Ranking.classifyLangs(rel, sparse, Some(Seq("aa", "bb"))).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-dense"),
      s"expected the density guard, got: $e")
  }

  test("lang-id: rare gram beats shared mass (prior centering)") {
    // both classes share 'mm m' grams heavily; class 'bb' additionally
    // owns the rare 'zz' grams. A doc of shared + rare grams must go
    // to 'bb': the shared buckets center near zero for both classes
    // while the rare bucket carries 'bb''s full positive ratio.
    val got = run(Seq(
      (1L, "mmmm mmmm mmmm", "aa"),
      (2L, "mmmm mmmm mmmm zz", "bb"),
      (9L, "mmmm zz", null.asInstanceOf[String])))
    assert(got(9L) == "bb", s"got $got")
  }
}
