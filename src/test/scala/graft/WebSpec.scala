package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** URL curation primitives (graft.operators.Web): each pinned
  * canonicalization rule on an a-priori case, the messy ≡ clean
  * equivalence the operator exists for, registrable-domain extraction,
  * and the plan shape (projection only; the cap is window-free). */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String, String)] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    Web.withRegistrableDomain(
      Web.withCanonicalUrl(df, "url", "c"), "c_host", "dom")
      .orderBy(col("id"))
      .select(col("c"), col("c_host"), col("dom"))
      .as[(String, String, String)].collect().toSeq
  }

  test("each canonicalization rule, on an a-priori case") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?z=1&a=2&utm_campaign=x#sec") ==
      Seq(("https://www.example.com/A/b?a=2&z=1", "www.example.com", "example.com")))
    // path case preserved; host case folded.
    assert(canon("http://Host.Org/CaseSensitive/Path") ==
      Seq(("http://host.org/CaseSensitive/Path", "host.org", "host.org")))
    // default port dropped only under its own scheme.
    assert(canon("http://a.com:80/x").head._1 == "http://a.com/x")
    assert(canon("https://a.com:80/x").head._1 == "https://a.com:80/x")
    assert(canon("http://a.com:8080/x").head._1 == "http://a.com:8080/x")
    // bare slash ≡ empty path; emptied query drops its '?'.
    assert(canon("http://a.com/").head._1 == "http://a.com")
    assert(canon("http://a.com/x?utm_source=s&fbclid=z").head._1 ==
      "http://a.com/x")
    // multi-label public suffix takes three labels; plain com takes two;
    // a two-label host is its own domain; ports never reach the domain.
    assert(canon("http://news.bbc.co.uk/x").head._3 == "bbc.co.uk")
    assert(canon("http://a.b.c.example.com/x").head._3 == "example.com")
    assert(canon("http://example.com/x").head._3 == "example.com")
    assert(canon("http://sub.example.com:8080/x").head._3 == "example.com")
  }

  test("four messy spellings of one resource canonicalize equal") {
    val forms = Seq(
      "https://WWW.Site.COM:443/a/b/?id=7&utm_source=feed",
      "https://www.site.com/a/b?id=7",
      "https://www.Site.com/a/b?id=7#frag",
      "https://www.site.com:443/a/b/?utm_medium=m&id=7")
    assert(canon(forms: _*).map(_._1).distinct ==
      Seq("https://www.site.com/a/b?id=7"))
  }

  test("canonicalization is a pure projection; capPerDomain is window-free") {
    val df = spark.range(100).select(col("id"),
      concat(lit("http://s"), (col("id") % 5).cast("string"),
        lit(".example.com/p"), col("id").cast("string")).as("url"))
    val plan = Web.withCanonicalUrl(df, "url", "c")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"canonicalize must not shuffle:\n$plan")
    val capped = Web.capPerDomain(df, "url", "id", cap = 3)
    val cplan = capped.queryExecution.executedPlan.toString
    assert(!cplan.contains("Window"), s"cap must be the min-k, not a window:\n$cplan")
    // exactly 3 ids per domain, deterministically (min md5 hashes).
    val got = capped.as[(String, Long)].collect().groupBy(_._1)
    assert(got.keySet == Set("example.com"))
    assert(got("example.com").length == 3)
  }
}
