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

  test("percent-encoding: unreserved escapes decode, reserved uppercase") {
    // %7E → '~' and %41 → 'A' (unreserved decode, hex case-insensitive);
    // %2F / %2C keep their escape with UPPERCASED hex (reserved).
    assert(canon("http://a.com/%7efoo%2fbar?x=%41%2c").head._1 ==
      "http://a.com/~foo%2Fbar?x=A%2C")
    // a '%' not followed by two hex digits passes through verbatim;
    // params still sort.
    assert(canon("http://a.com/100%25x?b=%zz&a=50%").head._1 ==
      "http://a.com/100%25x?a=50%&b=%zz")
  }

  test("loadable PSL: longest match, default rule, host == suffix, ports") {
    val psl = Seq("com", "uk", "co.uk", "au", "edu.au", "act.edu.au")
      .toDF("suffix")
    val hosts = Seq(
      (1L, "shop.example.act.edu.au"), // 3-label suffix absent from the
      (2L, "a.b.example.edu.au"),      //   pinned MultiSuffixes set
      (3L, "www.site.com"),
      (4L, "news.example.co.uk"),
      (5L, "weird.example.zz"),        // no entry → the '*' default rule
      (6L, "edu.au"),                  // host IS a suffix → its own domain
      (7L, "host.com:8080")).toDF("id", "h")
    val out = Web.withRegistrableDomain(hosts, "h", "dom", psl)
    assert(out.orderBy(col("id")).select(col("dom")).as[String].collect()
      .toSeq == Seq("example.act.edu.au", "example.edu.au", "site.com",
      "example.co.uk", "example.zz", "edu.au", "host.com"))
    // every suffix lookup is a broadcast join; the corpus never shuffles.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    // one broadcast lookup per candidate length 2..MaxSuffixLabels (a
    // 1-label match is indistinguishable from the '*' default — never
    // joined).
    assert("BroadcastHashJoin".r.findAllIn(plan).size ==
      Web.MaxSuffixLabels - 1, plan)
    // duplicate PSL entries must not duplicate corpus rows (distinct is
    // load-bearing on the build side of a left join).
    val dup = psl.unionByName(psl)
    assert(Web.withRegistrableDomain(hosts, "h", "dom", dup).count() == 7L)
  }

  private def resolve(cases: (String, String, String, String)*): Seq[Option[String]] = {
    val df = cases.zipWithIndex.map { case ((h, s, ho, p), i) =>
      (i.toLong, h, s, ho, p) }.toDF("id", "h", "sch", "hst", "pth")
    df.orderBy(col("id"))
      .select(expr(Web.resolveRefSql("h", "sch", "hst", "pth", duck = false)))
      .as[Option[String]].collect().toSeq
  }

  test("resolveRefSql: every RFC 3986 §5 rule of the pinned subset") {
    val got = resolve(
      ("https://x.org/a", "http", "h.com", "/d/5"),   // absolute passes
      ("//cdn.x.org/a", "https", "h.com", "/d/5"),    // protocol-relative
      ("/top", "http", "h.com", "/d/5"),              // root-relative
      ("other.html", "http", "h.com", "/d/5"),        // path-relative
      ("../up/x", "http", "h.com", "/a/b/c"),         // dot segments
      ("sub/./y/../z", "http", "h.com", "/d/5"),      // mixed dots
      ("../../../etc", "http", "h.com", "/a/b"),      // clamps at root
      ("q.html?x=1", "http", "h.com", "/d/5"),        // query preserved
      ("rel", "http", "h.com", ""),                   // empty page path = '/'
      ("mailto:a@b.c", "http", "h.com", "/d/5"),      // other scheme
      ("#frag", "http", "h.com", "/d/5"),             // fragment-only
      ("", "http", "h.com", "/d/5"))                  // empty
    assert(got == Seq(
      Some("https://x.org/a"),
      Some("https://cdn.x.org/a"),
      Some("http://h.com/top"),
      Some("http://h.com/d/other.html"),
      Some("http://h.com/a/up/x"),
      Some("http://h.com/d/sub/z"),
      Some("http://h.com/etc"),
      Some("http://h.com/d/q.html?x=1"),
      Some("http://h.com/rel"),
      None, None, None), got)
  }

  test("dotNormSql: bounded normalization, identical text in both dialects' regex subset") {
    val got = spark.sql(
      s"SELECT ${Web.dotNormSql("p", duck = false)} FROM VALUES " +
        "('/a/b/../c'), ('/a/./b'), ('/../x'), ('/a/b/c/../../d'), ('/a/..') AS t(p)")
      .as[String].collect().toSeq
    assert(got == Seq("/a/c", "/a/b", "/x", "/a/d", "/"), got)
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u)") {
    // a second pass over an already-canonical URL must change nothing —
    // the property that makes the canonical form a stable JOIN KEY
    // (unreserved decodes don't re-fire, uppercased escapes stay, sorted
    // params stay sorted, the stripped slash stays stripped).
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/A/%7eb/?z=1&a=%41&utm_campaign=x#sec",
      "http://a.com/100%25x?b=%zz&a=50%",
      "http://news.Example.CO.UK:80/x?b=2&a=1&fbclid=zz#frag",
      "http://site.com:8080/p%2fq?a=7")
    val once = canon(messy: _*).map(_._1)
    assert(canon(once: _*).map(_._1) == once, once)
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

  test("RFC 9309 robots gate: wildcards, $ anchor, Allow longest-match precedence, directory form") {
    val urls = Seq(
      // h1: Disallow /private, Allow /private/pub* (longer → wins inside)
      "https://h1.com/private/secret",   // blocked (only Disallow matches)
      "https://h1.com/private/pub/x",    // kept (Allow wins by length)
      "https://h1.com/open",             // kept (no rule matches)
      // h2: Disallow *.tmp$ (wildcard + anchor)
      "https://h2.com/a/file.tmp",       // blocked
      "https://h2.com/a/file.tmpx",      // kept ($ anchor)
      "https://h2.com/tmp/file.txt",     // kept (pattern needs .tmp at END)
      // h3: Disallow /dir/ (directory form — canonical drops the slash)
      "https://h3.com/dir",              // blocked (the directory itself)
      "https://h3.com/dir/sub",          // blocked (below it)
      "https://h3.com/directory",        // kept (NOT /dir + more chars)
      // h4: Disallow / (all paths incl. root) but Allow /ok*
      "https://h4.com",                  // blocked (root, canonical path '')
      "https://h4.com/x",                // blocked
      "https://h4.com/ok/y",             // kept (Allow longer)
      // h5: metachars in the pattern are literal
      "https://h5.com/a(1)+b.c",         // blocked (literal match)
      "https://h5.com/a(1)-b.c",         // kept
      // no rules for h6 at all
      "https://h6.com/anything").toDF("url")
    val canon = Web.withCanonicalUrl(urls, "url", "curl").select("curl")
    val rules = Seq(
      ("h1.com", "/private", false), ("h1.com", "/private/pub*", true),
      ("h2.com", "*.tmp$", false),
      ("h3.com", "/dir/", false),
      ("h4.com", "/", false), ("h4.com", "/ok*", true),
      ("h5.com", "/a(1)+b.c", false),
      // empty patterns drop at load (RFC: empty Disallow = no rule)
      ("h6.com", "", false)).toDF("host", "pattern", "allow")
    val kept = Web.filterRobotsAllowedRfc(canon, "curl", rules)
      .as[String].collect().toSet
    assert(kept == Set(
      "https://h1.com/private/pub/x", "https://h1.com/open",
      "https://h2.com/a/file.tmpx", "https://h2.com/tmp/file.txt",
      "https://h3.com/directory",
      "https://h4.com/ok/y",
      "https://h5.com/a(1)-b.c",
      "https://h6.com/anything"), kept)
  }

  test("RFC 9309 robots gate: Allow/Disallow exact-length tie → Allow wins; plan stays broadcast + shuffle-free") {
    val urls = Seq("https://t.com/abc", "https://t.com/abd").toDF("url")
    val canon = Web.withCanonicalUrl(urls, "url", "curl").select("curl")
    val rules = Seq(
      ("t.com", "/abc", false), ("t.com", "/ab*", true),  // tie at 4 → Allow
      ("t.com", "/abd$", false), ("t.com", "/a", true)    // len 5 > 4 → blocks
    ).toDF("host", "pattern", "allow")
    val gated = Web.filterRobotsAllowedRfc(canon, "curl", rules)
    assert(gated.as[String].collect().toSet == Set("https://t.com/abc"))
    // the CORPUS attaches by broadcast join — only the tiny rules
    // relation pays its per-host aggregation exchange.
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rules must broadcast onto the corpus:\n${plan.take(800)}")
  }

  test("extractSitemapUrls: entity decode in loc, missing lastmod → '', loc-less entry surfaces empty, null xml skips") {
    val xml = """<?xml version="1.0"?><urlset>""" +
      "<url><loc>https://a.example.com/p?x=1&amp;y=2</loc>" +
      "<lastmod>2026-01-02</lastmod></url>" +
      "<url><loc>https://a.example.com/q</loc></url>" +
      "<url><lastmod>2026-03-04</lastmod></url>" +
      "</urlset>"
    val out = Web.extractSitemapUrls(
      Seq((1L, xml), (2L, null.asInstanceOf[String])).toDF("id", "x"),
      "id", "x")
      .as[(Long, Long, String, String)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, 1L, "https://a.example.com/p?x=1&y=2", "2026-01-02"),
      (1L, 2L, "https://a.example.com/q", ""),
      (1L, 3L, "", "2026-03-04")), out)
  }

  test("robots gate normalizes the standard all-paths spelling: 'Disallow: /' blocks the site ROOT too") {
    val urls = Seq(
      "https://www.blocked.com",          // the root — canonical path ''
      "https://www.blocked.com/x/y",
      "https://www.open.com/x").toDF("url")
    val canon = Web.withCanonicalUrl(urls, "url", "curl").select("curl")
    val rules = Seq(("www.blocked.com", "/")).toDF("host", "prefix")
    val kept = Web.filterRobotsAllowed(canon, "curl", rules)
      .as[String].collect().toSet
    assert(kept == Set("https://www.open.com/x"),
      s"'/' must block every path INCLUDING the root: $kept")
  }

  test("extractSitemapIndex: <sitemap> entries only, urlset entries ignored (shape separation)") {
    val xml =
      """<sitemapindex><sitemap><loc>https://h.com/a.xml&amp;v=1</loc>
        |<lastmod>2026-01-02</lastmod></sitemap>
        |<sitemap><loc>https://h.com/b.xml</loc></sitemap></sitemapindex>
        |<urlset><url><loc>https://h.com/NOT-A-CHILD</loc></url></urlset>""".stripMargin
    val got = Web.extractSitemapIndex(
      Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")
      .orderBy(col("pos"))
      .select(col("pos"), col("loc"), col("lastmod"))
      .as[(Long, String, String)].collect().toSeq
    // entity decode on loc is load-bearing; missing lastmod → ''.
    assert(got == Seq((1L, "https://h.com/a.xml&v=1", "2026-01-02"),
      (2L, "https://h.com/b.xml", "")))
    // and the urlset extractor symmetrically ignores <sitemap> entries.
    val urls = Web.extractSitemapUrls(
      Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")
      .select(col("loc")).as[String].collect().toSeq
    assert(urls == Seq("https://h.com/NOT-A-CHILD"))
  }

  test("parseRobots: RFC 9309 group resolution — a-priori corner cases beyond the oracle fixture") {
    def parse(body: String, agent: String = "GraftBot"): Seq[(Long, String, Boolean)] =
      Web.parseRobots(Seq(("h.com", body)).toDF("host", "body"),
        "host", "body", agent)
        .orderBy(col("pos"))
        .select(col("pos"), col("pattern"), col("allow"))
        .as[(Long, String, Boolean)].collect().toSeq

    // NO matching group at all (no '*', agent not named) → zero rules:
    // the host allows everything, not "falls back to the nearest group".
    assert(parse("User-agent: otherbot\nDisallow: /\n").isEmpty)
    // null body rows skip (a host whose robots fetch failed).
    assert(Web.parseRobots(
      Seq(("h.com", null.asInstanceOf[String])).toDF("host", "body"),
      "host", "body", "GraftBot").count() == 0)
    // an empty body parses to zero rules, never throws.
    assert(parse("").isEmpty)
    // TWO exact groups merge, document order preserved across them.
    assert(parse(
      "User-agent: graftbot\nDisallow: /a\n\n" +
        "User-agent: *\nDisallow: /star\n\n" +
        "User-agent: GRAFTBOT\nAllow: /b\n") ==
      Seq((1L, "/a", false), (2L, "/b", true)))
    // a user-agent line AFTER rules starts a NEW group; the rule
    // between groups belongs to the FIRST.
    assert(parse(
      "User-agent: graftbot\nDisallow: /first\n" +
        "User-agent: other\nDisallow: /second\n") ==
      Seq((1L, "/first", false)))
    // unknown fields do NOT break a group (sitemap between UA and rule).
    assert(parse(
      "User-agent: graftbot\nSitemap: https://h.com/s.xml\nDisallow: /x\n") ==
      Seq((1L, "/x", false)))
    // exact token match, not substring: agent 'graft' does NOT match
    // a 'graftbot' group — it falls to '*'.
    assert(parse(
      "User-agent: graftbot\nDisallow: /exact\n\nUser-agent: *\nDisallow: /star\n",
      agent = "graft") == Seq((1L, "/star", false)))
    // parse → gate composition: the parsed relation feeds
    // filterRobotsAllowedRfc directly (drop pos), and the '*' group's
    // Disallow / never leaks into the selected graftbot rules.
    val rules = Web.parseRobots(
      Seq(("www.h.com",
        "User-agent: graftbot\nDisallow: /private*\n\nUser-agent: *\nDisallow: /\n"))
        .toDF("host", "body"), "host", "body", "GraftBot")
      .select(col("host"), col("pattern"), col("allow"))
    val kept = Web.filterRobotsAllowedRfc(
      Seq("https://www.h.com/ok", "https://www.h.com/private/x")
        .toDF("url"), "url", rules)
      .select(col("url")).as[String].collect().toSet
    assert(kept == Set("https://www.h.com/ok"))
  }

  test("extractRobotsSitemaps: group-independent, comment/case/space rules, empty value drops") {
    def sitemaps(body: String): Seq[(Long, String)] =
      Web.extractRobotsSitemaps(Seq(("h.com", body)).toDF("host", "body"),
        "host", "body")
        .orderBy(col("pos")).select(col("pos"), col("loc"))
        .as[(Long, String)].collect().toSeq

    // directives extract from ANYWHERE — before groups, inside a
    // group, after it (RFC 9309 §2.3: group-independent); the value's
    // https:// colon survives (first-colon split); case-insensitive
    // key with space before the colon; inline comment strips; empty
    // value drops; CRLF tolerated.
    assert(sitemaps(
      "Sitemap: https://h.com/a.xml\r\n" +
        "User-agent: *\n" +
        "sitemap : https://h.com/b.xml   # inline\n" +
        "Disallow: /x\n" +
        "Sitemap:\n" +
        "SITEMAP: https://h.com/c.xml\n") ==
      Seq((1L, "https://h.com/a.xml"), (2L, "https://h.com/b.xml"),
        (3L, "https://h.com/c.xml")))
    // no directive → no rows; null body skips.
    assert(sitemaps("User-agent: *\nDisallow: /\n").isEmpty)
    assert(Web.extractRobotsSitemaps(
      Seq(("h.com", null.asInstanceOf[String])).toDF("host", "body"),
      "host", "body").count() == 0)
  }

  test("parseCrawlDelay: group selection, first parseable line, digit gate, no-delay hosts absent") {
    def delay(body: String, agent: String = "GraftBot"): Option[Long] = {
      val r = Web.parseCrawlDelay(Seq(("h.com", body)).toDF("host", "body"),
        "host", "body", agent)
        .select(col("delay_s")).as[Long].collect()
      assert(r.length <= 1)
      r.headOption
    }
    // exact group beats '*'; first parseable line wins within the
    // merged selection (document order).
    assert(delay(
      "User-agent: graftbot\nCrawl-delay: 7\nCrawl-delay: 4\n\n" +
        "User-agent: *\nCrawl-delay: 2\n") == Some(7L))
    // '*' fallback when the agent has no exact group.
    assert(delay("User-agent: *\nCrawl-delay: 2\n", agent = "x") == Some(2L))
    // digits-only parseability: 'fast' and '10.5' are ignored LINES —
    // the later integer still wins (never DuckDB-rounded 11, never 0).
    assert(delay(
      "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 10.5\nCrawl-delay: 3\n")
      == Some(3L))
    // no parseable delay in the selected groups → NO row (not 0).
    assert(delay("User-agent: *\nCrawl-delay: soon\n").isEmpty)
    // rules-only group → no row; delay in an UNSELECTED group → no row.
    assert(delay("User-agent: *\nDisallow: /\n").isEmpty)
    assert(delay(
      "User-agent: otherbot\nCrawl-delay: 9\n").isEmpty)
  }

  test("trapScores: url-space explosion per content, canonical collapse first, no Expand") {
    val pages = Seq(
      // trap host: 3 distinct paths, one body
      ("https://www.trap.com/d/1/a", "same body"),
      ("https://www.trap.com/d/1/b", "same body"),
      ("https://www.trap.com/d/1/c", "same body"),
      // utm spellings collapse BEFORE counting → not a trap
      ("https://www.utm.com/d/1?utm_a=1", "body u"),
      ("https://www.utm.com/d/1?utm_a=2", "body u"),
      // healthy host: two pages, two bodies
      ("https://www.ok.com/d/1", "body 1"),
      ("https://www.ok.com/d/2", "body 2")).toDF("url", "text")
    val out = Web.trapScores(pages, "url", "text")
      .orderBy(col("host"))
      .select(col("host"), col("n_urls"), col("n_content"),
        col("urls_per_content_x100"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("www.ok.com", 2L, 2L, 100L),
      ("www.trap.com", 3L, 1L, 300L),
      ("www.utm.com", 1L, 1L, 100L)))
    // single-distinct cascade — the plan must carry NO Expand node
    // (a two-distinct agg would).
    val plan = Web.trapScores(pages, "url", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("scheduleFetches: per-host slots rank·delay, default delay, canonical dedup") {
    val delays = Seq(("www.a.com", 5L)).toDF("host", "delay_s")
    val batch = Seq(
      "https://WWW.A.COM:443/p2?utm_source=x", // messy spelling of /p2
      "https://www.a.com/p1",
      "https://www.a.com/p2",                  // dup after canonicalization
      "https://www.b.com/q1",
      "https://www.b.com/q0").toDF("url")
    val out = Web.scheduleFetches(batch, "url", delays, defaultDelayS = 1L)
      .orderBy(col("host"), col("slot_s"))
      .select(col("host"), col("url"), col("delay_s"), col("slot_s"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("www.a.com", "https://www.a.com/p1", 5L, 0L),
      ("www.a.com", "https://www.a.com/p2", 5L, 5L),
      ("www.b.com", "https://www.b.com/q0", 1L, 0L),
      ("www.b.com", "https://www.b.com/q1", 1L, 1L)))
  }
}
