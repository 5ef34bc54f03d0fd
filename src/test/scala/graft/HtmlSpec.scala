package graft

import org.apache.spark.sql.functions._

import graft.operators.Html

/** HTML → text extraction a-priori cases (the registry query
  * `x_text_html` oracle-checks the full chain against DuckDB's RE2 on
  * the corpus; these pin the CONTRACT claims on hand-built documents):
  * script/style/comment removal, the entity decode order, the
  * link-density and min-length gates, and order preservation. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 10,
                      maxDensityPct: Int = 34): (Long, Long, String) = {
    val r = Html.extractText(Seq((1L, html)).toDF("id", "h"), "id", "h",
      minChars, maxDensityPct)
      .as[(Long, Long, Long, String)].head()
    (r._2, r._3, r._4)
  }

  test("script/style/comments vanish, even with a bare '<' inside") {
    val (_, kept, text) = extract(
      "<p>real content stays right here</p>" +
        "<script>if (1 < 2) { alert('<p>fake</p>') }</script>" +
        "<style>p { color: red }</style><!-- note <p>also fake</p> -->")
    assert(kept == 1L && text == "real content stays right here", text)
  }

  test("entity decode order: &amp; last — &amp;lt; must NOT double-decode") {
    val (_, _, text) = extract(
      "<p>a &amp; b &lt;x&gt; &quot;q&quot; &#39;s&#39; &amp;lt; literal</p>")
    assert(text == "a & b <x> \"q\" 's' &lt; literal", text)
  }

  test("numeric character references: decimal, hex, 2/3/4-byte UTF-8") {
    val (_, _, text) = extract(
      "<p>it&#8217;s &#x2019; caf&#233; dash&#x2014;here grin &#128512; end</p>")
    assert(text == "it’s ’ café dash—here grin " +
      "😀 end", text)
  }

  test("named aliases ride the numeric pass: &mdash; &hellip; &rsquo; &apos;") {
    val (_, _, text) = extract(
      "<p>a &mdash; b &hellip; c&rsquo;s &apos;q&apos; end of line</p>")
    assert(text == "a — b … c’s 'q' end of line", text)
  }

  test("legal/currency aliases: &copy; &reg; &trade; &euro; &pound; &laquo;&raquo;") {
    val (_, _, text) = extract(
      "<p>&copy; 2026 corp&reg; mark&trade; 5&euro; 3&pound; &laquo;q&raquo; 20&deg; a&middot;b &bull; end</p>")
    assert(text == "© 2026 corp® mark™ 5€ 3£ «q» 20° a·b • end", text)
  }

  test("single-decode semantics: &#38; rewrites to &amp; — never cascades") {
    // &#38;lt; must yield the literal text '&lt;', exactly like &amp;lt;
    val (_, _, text) = extract(
      "<p>x &#38;lt; y &amp;#8217; z stays literal here</p>")
    assert(text == "x &lt; y &#8217; z stays literal here", text)
  }

  test("out-of-range and surrogate refs survive verbatim") {
    val (_, _, text) = extract(
      "<p>bad &#0; worse &#55296; huge &#9999999; all kept verbatim</p>")
    assert(text == "bad &#0; worse &#55296; huge &#9999999; all kept verbatim",
      text)
  }

  test("named &nbsp; is ASCII space; numeric &#160; is the literal U+00A0") {
    val (_, _, text) = extract("<p>a&nbsp;b and then c&#160;d stays</p>")
    assert(text == "a b and then c d stays", text)
  }

  test("link-density gate drops nav; min-length drops stubs; order preserved") {
    val html =
      "<div><a href='/'>Home</a> <a href='/a'>About</a> nav</div>" + // dense
        "<p>first real paragraph of the page</p>" +
        "<p>tiny</p>" + // < minChars
        "<p>second real paragraph follows the first</p>" +
        "<p><a href='/n'>continue reading here</a></p>" // pure link
    val (blocks, kept, text) = extract(html)
    assert(kept == 2L && blocks >= 5L, s"$blocks/$kept")
    assert(text == "first real paragraph of the page\n" +
      "second real paragraph follows the first", text)
  }

  test("density threshold is exact-integer: 100·anchor < pct·visible") {
    // visible = '0123456789 01234567890123456789' (31 chars — stripped
    // tags leave a joining space), anchor 10 chars → 1000 vs pct·31:
    // kept at pct=33 (1023), dropped at pct=32 (992 — strict <).
    val html = "<p><a href='/x'>0123456789</a>01234567890123456789</p>"
    assert(extract(html, maxDensityPct = 33)._2 == 1L)
    assert(extract(html, maxDensityPct = 32)._2 == 0L)
  }

  test("null html emits nothing (never a NULL-riddled row)") {
    val out = Html.extractText(
      Seq((1L, null.asInstanceOf[String]), (2L, "<p>kept real content</p>"))
        .toDF("id", "h"), "id", "h")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L), out)
  }

  test("extractLinks: clean-first, document order, entity decode in hrefs") {
    val html =
      "<script>var l = '<a href=\"/fake\">x</a>';</script>" +
        "<p><a class=\"n\" href=\"https://A.example.COM:443/p?x=1&amp;y=2\">one</a>" +
        " and <a href='/single-quoted-skipped'>two</a>" +
        " then <a href=\"/rel/path\">three</a></p>"
    val out = Html.extractLinks(Seq((7L, html)).toDF("id", "h"), "id", "h")
      .as[(Long, Long, String)].collect().toSeq.sorted
    // the script's fake link is cleaned away; the single-quoted href is
    // outside the pinned attribute subset; &amp; decodes inside the href.
    assert(out == Seq(
      (7L, 1L, "https://A.example.COM:443/p?x=1&y=2"),
      (7L, 2L, "/rel/path")), out)
  }

  test("extractLinks: no links / null html emit nothing; empty href survives") {
    val out = Html.extractLinks(Seq(
      (1L, "<p>plain text, no anchors at all</p>"),
      (2L, null.asInstanceOf[String]),
      (3L, "<p><a href=\"\">anchor with empty target</a></p>")).toDF("id", "h"),
      "id", "h").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((3L, 1L, "")), out)
  }

  test("extractLinksWithText: anchor text through the visibility transform") {
    val html = "<p><a href=\"/a\">Read &amp; enjoy</a> mid " +
      "<a class=\"z\" href=\"/b\"><b>bold</b> words</a>" +
      "<a href='/skip'>no href match</a></p>"
    val out = Html.extractLinksWithText(Seq((5L, html)).toDF("id", "h"),
      "id", "h").as[(Long, Long, String, String)].collect().toSeq.sorted
    // nested inline tags strip to spaces and collapse; entities decode;
    // the single-quoted anchor is outside the pinned subset.
    assert(out == Seq(
      (5L, 1L, "/a", "Read & enjoy"),
      (5L, 2L, "/b", "bold words")), out)
  }

  test("extractImages: clean-first, both attribute orders, missing alt → '', entity decode both fields") {
    val html =
      "<script>var f = '<img src=\"/fake.png\">';</script>" +
        "<p><img src=\"https://CDN.example.COM/i/1.png?a=1&amp;b=2\" " +
        "alt=\"Fig &amp; caption &#8212; deco\"/>" +
        " <img alt=\"alt first\" src=\"/rel/2.png\">" +
        " <img src=\"/noalt/3.png\">" +
        " <img alt='single-quoted src skipped' src='/skip.png'></p>"
    val out = Html.extractImages(Seq((9L, html)).toDF("id", "h"), "id", "h")
      .as[(Long, Long, String, String)].collect().toSeq.sorted
    assert(out == Seq(
      (9L, 1L, "https://CDN.example.COM/i/1.png?a=1&b=2", "Fig & caption — deco"),
      (9L, 2L, "/rel/2.png", "alt first"),
      (9L, 3L, "/noalt/3.png", "")), out)
  }

  test("extractImages: no images / null html emit nothing") {
    val out = Html.extractImages(Seq(
      (1L, "<p>plain text</p>"),
      (2L, null.asInstanceOf[String])).toDF("id", "h"), "id", "h")
      .collect().toSeq
    assert(out.isEmpty, out)
  }

  test("title becomes its own (short, dropped) block; <br> splits") {
    val (_, kept, text) = extract(
      "<html><head><title>T</title></head><body>" +
        "first half of the line<br>second half of the line</body></html>")
    assert(kept == 2L &&
      text == "first half of the line\nsecond half of the line", text)
  }
}
