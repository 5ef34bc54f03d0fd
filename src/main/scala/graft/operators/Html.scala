package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML → text extraction — the FIRST stage of every web-curation
  * pipeline (CCNet / RefinedWeb / Dolma all start from crawled HTML):
  * strip non-content machinery, split into visible text blocks, drop
  * boilerplate blocks by LINK DENSITY and minimum length (the
  * trafilatura/jusText heuristic restated exactly), and reassemble the
  * survivors in document order.
  *
  * The whole operator is ONE pinned chain of regex/string projections —
  * no parser state machine — so it runs inside a single codegen'd
  * projection at any scale AND replays verbatim in the DuckDB oracle
  * (the same chain spelled per dialect: `regexp_replace` takes a 'g'
  * flag there, string literals don't process backslashes, lists are
  * 1-indexed via `[i]`, codepoint→char is `chr()` there vs UTF-8 byte
  * synthesis through `decode(unhex(…))` here — same character out).
  * Patterns deliberately avoid backreferences and lookaheads (RE2 has
  * neither) and backslash classes (escaping differs); case-insensitivity
  * and dotall ride inline `(?i)`/`(?s)` flags, which both engines accept.
  *
  * Pinned contract (each rule replayed by the oracle):
  *  1. `<script>…</script>`, `<style>…</style>` blocks and `<!--…-->`
  *     comments are removed first (dotall, case-insensitive, non-greedy);
  *  2. the document splits into blocks at closing block-level tags:
  *     `</p> </li> </h1..6> </div> </title>` and `<br…>`;
  *  3. a block's VISIBLE text = remaining tags stripped to a space, then
  *     entities decoded in FOUR pinned passes:
  *     3a. common named entities rewrite to their numeric form
  *         (`&mdash;→&#8212;` etc — [[NamedAliases]]; safe before the
  *         `&amp;` pass: `&amp;mdash;` contains no `&mdash;`),
  *     3b. ONE numeric-reference pass: every `&#NNN;` (1-7 digits) /
  *         `&#xHH;` (1-6 hex digits) whose codepoint is a Unicode scalar
  *         value (1..0xD7FF or 0xE000..0x10FFFF) becomes that character;
  *         out-of-range and surrogate refs survive VERBATIM; code 38
  *         (`&`) rewrites to `&amp;` instead of decoding so the final
  *         `&amp;` rule fires exactly once for it — single-decode
  *         semantics throughout (`&#38;lt;` → literal `&lt;`, never `<`),
  *     3c. `&nbsp;` → ASCII space (the readability choice; a numeric
  *         `&#160;` yields the literal U+00A0), `&lt; &gt; &quot;`,
  *     3d. `&amp;` LAST — decoding it earlier would double-decode
  *         `&amp;lt;` to `<`;
  *     then space runs collapse and the result is trimmed;
  *  4. a block KEEPS iff visible length ≥ `minChars` AND
  *     100·len(anchor visible text) < `maxDensityPct`·len(visible) —
  *     the exact-integer link-density gate (anchor text = every
  *     `<a …>…</a>` inner, same visibility transform);
  *  5. output text = kept blocks joined by newline, in input order.
  */
object Html {

  /** Numeric character reference pattern. Bounded repetition (RE2 ∩
    * Java) caps the value: ≤ 7 decimal digits (< 10^7) / ≤ 6 hex digits
    * (< 2^24) — both fit a BIGINT with room, so the parse can't
    * overflow before the scalar-range check rejects it. */
  val NumRefPattern: String = "&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};"

  /** Step-3a named-entity → numeric-reference aliases (the refs the
    * common crawl actually carries beyond the XML five — punctuation,
    * legal marks, currency). Decoded by the numeric pass, so there is
    * exactly ONE codepoint→char code path; adding an entity is one
    * (name, codepoint) row, never new decode logic. */
  val NamedAliases: Seq[(String, String)] = Seq(
    "&mdash;" -> "&#8212;", "&ndash;" -> "&#8211;",
    "&hellip;" -> "&#8230;", "&rsquo;" -> "&#8217;",
    "&lsquo;" -> "&#8216;", "&ldquo;" -> "&#8220;",
    "&rdquo;" -> "&#8221;", "&apos;" -> "&#39;",
    "&copy;" -> "&#169;", "&reg;" -> "&#174;",
    "&trade;" -> "&#8482;", "&deg;" -> "&#176;",
    "&middot;" -> "&#183;", "&laquo;" -> "&#171;",
    "&raquo;" -> "&#187;", "&bull;" -> "&#8226;",
    "&euro;" -> "&#8364;", "&pound;" -> "&#163;")

  /** regexp_replace with the global flag spelled per dialect (Spark
    * replaces all matches by default; DuckDB needs 'g'). */
  private def rre(duck: Boolean)(x: String, p: String, r: String): String =
    if (duck) s"regexp_replace($x, '$p', '$r', 'g')"
    else s"regexp_replace($x, '$p', '$r')"

  /** SQL for step 1: script/style/comment removal over html expr `h`. */
  def cleanSql(h: String, duck: Boolean): String = {
    val r = rre(duck) _
    r(r(r(h, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
  }

  /** SQL for step 2: the block list of a CLEANED html expr. */
  def blocksSql(cleaned: String, duck: Boolean): String = {
    val pat = "(?i)</p>|</li>|</h[1-6]>|</div>|</title>|<br[^>]*>"
    if (duck) s"string_split_regex($cleaned, '$pat')"
    else s"split($cleaned, '$pat')"
  }

  /** The codepoint of a numeric-reference expr `r` (`&#39;` /
    * `&#x2019;`), BIGINT. Hex parse: Spark `conv(h, 16, 10)`, DuckDB
    * `CAST('0x'||h …)`. */
  private def refCodeSql(r: String, duck: Boolean): String = {
    val hexDigits = s"substring($r, 4, length($r) - 4)"
    val decDigits = s"substring($r, 3, length($r) - 3)"
    val hexVal =
      if (duck) s"CAST(concat('0x', $hexDigits) AS BIGINT)"
      else s"CAST(conv($hexDigits, 16, 10) AS BIGINT)"
    s"""(CASE WHEN substring($r, 3, 1) IN ('x', 'X') THEN $hexVal
       |      ELSE CAST($decDigits AS BIGINT) END)""".stripMargin
  }

  /** The character of codepoint expr `c`: DuckDB `chr`, Spark UTF-8
    * byte synthesis (Spark's `chr` is ASCII-only) — the same string
    * out of both. `c` must already be a valid scalar value. */
  private def codeCharSql(c: String, duck: Boolean): String =
    if (duck) s"chr(CAST($c AS INT))"
    else {
      def b(e: String) = s"lpad(conv($e, 10, 16), 2, '0')"
      s"""decode(unhex(CASE
         |  WHEN $c < 128 THEN ${b(c)}
         |  WHEN $c < 2048 THEN concat(${b(s"192 + $c div 64")},
         |    ${b(s"128 + $c % 64")})
         |  WHEN $c < 65536 THEN concat(${b(s"224 + $c div 4096")},
         |    ${b(s"128 + ($c div 64) % 64")}, ${b(s"128 + $c % 64")})
         |  ELSE concat(${b(s"240 + $c div 262144")},
         |    ${b(s"128 + ($c div 4096) % 64")},
         |    ${b(s"128 + ($c div 64) % 64")}, ${b(s"128 + $c % 64")})
         |END), 'UTF-8')""".stripMargin
    }

  /** Step-3b decode of ONE numeric reference expr `r`: the codepoint's
    * character for scalar values, `&amp;` for code 38, `r` verbatim
    * otherwise. */
  private def decodeRefSql(r: String, duck: Boolean): String = {
    val c = refCodeSql(r, duck)
    s"""(CASE WHEN $c = 38 THEN '&amp;'
       |      WHEN ($c BETWEEN 1 AND 55295) OR ($c BETWEEN 57344 AND 1114111)
       |        THEN ${codeCharSql(c, duck)}
       |      ELSE $r END)""".stripMargin
  }

  /** Step-3b over a whole string expr `x`: split at numeric refs (both
    * engines keep trailing empty segments, so segments = refs + 1
    * always), decode each ref, reassemble. Spark's indexed transform
    * avoids the `sequence(1, 0)` descending trap; DuckDB's `range(1,1)`
    * is genuinely empty. */
  // NOTE: these templates are interpolated into OUTER stripMargin
  // templates (extractText / duckExtractItems / oracle queries) — no
  // generated line may START with '|' (a line-leading '||' loses its
  // first pipe to the outer stripMargin), so '||' always trails a line.
  private def numericSql(x: String, duck: Boolean): String =
    if (duck)
      s"(string_split_regex($x, '$NumRefPattern')[1] || COALESCE(" +
        "array_to_string(list_transform(" +
        s"range(1, len(regexp_extract_all($x, '$NumRefPattern')) + 1), ej -> " +
        decodeRefSql(s"regexp_extract_all($x, '$NumRefPattern')[ej]",
          duck = true) +
        s" || string_split_regex($x, '$NumRefPattern')[ej + 1]), ''), ''))"
    else
      s"""concat(element_at(split($x, '$NumRefPattern'), 1),
         | array_join(transform(regexp_extract_all($x, '$NumRefPattern', 0),
         |   (er, ej) -> concat(${decodeRefSql("er", duck = false)},
         |     element_at(split($x, '$NumRefPattern'), ej + 2))), ''))""".stripMargin

  /** Steps 3-pre: tags → space and the step-3a alias rewrite, over a
    * block expr. Split from [[finishSql]] so [[extractText]] can stage
    * the expensive tag-strip regex ONCE per block (the numeric pass
    * references its input three times). */
  def prepSql(x: String, duck: Boolean): String =
    NamedAliases.foldLeft(rre(duck)(x, "(?s)<[^>]*>", " ")) {
      case (e, (k, v)) => s"replace($e, '$k', '$v')"
    }

  /** Steps 3b-3d + collapse/trim over a PREPPED expr (cheap to
    * reference — pass an array element or column, not a regex chain). */
  def finishSql(x: String, duck: Boolean): String = {
    // GUARDED numeric pass: on a block with no '&#' anywhere the pass
    // is the identity (the pattern can only match at a '&#'), so the
    // two regex walks + per-ref re-splits are skipped behind one cheap
    // instr — most real blocks carry no numeric refs (the r15 bisect:
    // the unguarded pass was x_text_html's +34% r13→r14 raw
    // regression; the guard reclaims it). Same CASE text per dialect.
    val num = s"CASE WHEN instr($x, '&#') = 0 THEN $x" +
      s" ELSE ${numericSql(x, duck)} END"
    val named = s"replace(replace(replace(replace($num," +
      " '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')"
    s"trim(${rre(duck)(s"replace($named, '&amp;', '&')", "  *", " ")})"
  }

  /** SQL for the full step-3 visibility transform of a block expr —
    * the contract form ([[extractText]] stages [[prepSql]] /
    * [[finishSql]] separately for plan economy; this composition is
    * what the spec pins). */
  def visibleSql(x: String, duck: Boolean): String =
    finishSql(prepSql(x, duck), duck)

  /** SQL for the anchor-inner concatenation of a block expr. DuckDB's
    * `array_to_string([])` is NULL where Spark's `array_join([])` is ''
    * — COALESCE pins the Spark semantics. */
  def anchorsSql(x: String, duck: Boolean): String = {
    val ex = s"regexp_extract_all($x, '(?is)<a[^>]*>(.*?)</a>', 1)"
    if (duck) s"COALESCE(array_to_string($ex, ' '), '')"
    else s"array_join($ex, ' ')"
  }

  /** Extract text from an (id, html) relation: (doc_id, n_blocks,
    * n_kept, text) — one codegen-friendly projection chain per row, no
    * shuffle (the higher-order filter/transform run per document, the
    * unit of work). The per-block visible/anchor texts are computed
    * ONCE into arrays and the keep gate + output read the arrays — the
    * gate and the join never re-run the regex chains. `maxDensityPct`
    * = 100·max link density (e.g. 33 = drop blocks whose text is
    * ≥ 1/3 anchor text). */
  def extractText(df: DataFrame, idCol: String, htmlCol: String,
                  minChars: Int = 10, maxDensityPct: Int = 34): DataFrame = {
    require(minChars >= 1 && maxDensityPct >= 1 && maxDensityPct <= 100,
      s"minChars=$minChars maxDensityPct=$maxDensityPct out of range")
    df
      // null html emits nothing (the bigramFrequencies convention) —
      // unfiltered it would ride NULL through the whole chain.
      .filter(col(htmlCol).isNotNull)
      .withColumn("__bl", expr(blocksSql(cleanSql(htmlCol, duck = false),
        duck = false)))
      .withColumn("__vis", expr(
        s"""transform(transform(__bl, bb -> ${prepSql("bb", duck = false)}),
           |  yy -> ${finishSql("yy", duck = false)})""".stripMargin))
      .withColumn("__va", expr(
        s"""transform(transform(__bl,
           |    bb -> ${prepSql(anchorsSql("bb", duck = false), duck = false)}),
           |  yy -> ${finishSql("yy", duck = false)})""".stripMargin))
      .withColumn("__ki", expr(
        s"""filter(sequence(1, size(__bl)),
           |  i -> length(element_at(__vis, i)) >= $minChars AND
           |       100 * length(element_at(__va, i)) <
           |         $maxDensityPct * length(element_at(__vis, i)))""".stripMargin))
      .select(
        col(idCol).cast("long").as("doc_id"),
        expr("CAST(size(__bl) AS BIGINT)").as("n_blocks"),
        expr("CAST(size(__ki) AS BIGINT)").as("n_kept"),
        expr("array_join(transform(__ki, i -> element_at(__vis, i)), '\\n')")
          .as("text"))
  }

  /** Head-metadata extraction: (doc_id, title, description) — the
    * crawl-metadata stage beside [[extractText]] (titles feed dedup
    * keys and quality features; descriptions feed retrieval snippets).
    * Pinned contract: step-1 cleaning runs FIRST (a `<script>` may
    * contain a fake `<title>`), `title` = the first
    * `<title …>…</title>` inner, `description` = the first
    * `<meta … name="description" … content="…">` value — the
    * `name`-before-`content`, double-quoted attribute subset (stated:
    * single-quoted/reordered attributes are NOT matched — the
    * RE2 ∩ Java no-backref discipline keeps the pattern replayable),
    * both through the full step-3 visibility transform (entity decode
    * + space collapse + trim). Missing title/meta → ''. One codegen
    * projection; null html emits nothing. */
  def extractTitle(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val titlePat = "(?is)<title[^>]*>(.*?)</title>"
    val metaPat = "(?is)<meta[^>]*name=\"description\"[^>]*content=\"([^\"]*)\""
    def item(pat: String) = visibleSql(
      s"regexp_extract(${cleanSql(htmlCol, duck = false)}, '$pat', 1)",
      duck = false)
    df.filter(col(htmlCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        expr(item(titlePat)).as("title"),
        expr(item(metaPat)).as("description"))
  }

  /** DuckDB twin of [[extractTitle]]'s items over an html expr. DuckDB
    * `regexp_extract(x, p, 1)` returns '' (not NULL) on no match —
    * same as Spark. */
  def duckTitleItems(h: String): String = {
    val titlePat = "(?is)<title[^>]*>(.*?)</title>"
    val metaPat = "(?is)<meta[^>]*name=\"description\"[^>]*content=\"([^\"]*)\""
    def item(pat: String) = visibleSql(
      s"regexp_extract(${cleanSql(h, duck = true)}, '$pat', 1)", duck = true)
    s"${item(titlePat)} AS title, ${item(metaPat)} AS description"
  }

  /** The hyperlink pattern: group 1 = the href value of the pinned
    * double-quoted attribute subset `<a … href="…" …>` (single-quoted /
    * unquoted attributes are NOT matched — the same RE2 ∩ Java
    * no-backref discipline [[extractTitle]]'s meta pattern states). */
  val HrefPattern: String = "(?is)<a[^>]*href=\"([^\"]*)\""

  /** Hyperlink extraction: (doc_id, pos, href) — one row per matched
    * `<a href="…">`, in document order (`pos` 1-based) — the outlink
    * feed of a crawl frontier and the edge source of the hyperlink
    * graph (Brin & Page 1998; modern curation ranks domains by link
    * centrality before fetching).
    *
    * Pinned contract: step-1 cleaning runs FIRST (a `<script>` may
    * carry a fake link — same clean-first rule as [[extractTitle]]);
    * hrefs match [[HrefPattern]]; each value passes the FULL step-3
    * visibility transform (real pages escape `&` as `&amp;` inside
    * query strings per the HTML spec, so entity decode is load-bearing;
    * the tag-strip leg cannot fire inside an attribute value — no `<`
    * survives the match). Empty hrefs survive as `''` rows; docs with
    * no links (and null-html docs) emit nothing. One codegen projection
    * + posexplode — no shuffle, no UDF. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.filter(col(htmlCol).isNotNull)
      .withColumn("__lk", expr(
        s"transform(regexp_extract_all(${cleanSql(htmlCol, duck = false)}, " +
          s"'$HrefPattern', 1), hh -> ${visibleSql("hh", duck = false)})"))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(col("__lk")).as(Seq("__p", "href")))
      .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
        col("href"))

  /** The full-anchor pattern: every `<a … href="…" …>…</a>` element
    * (double-quoted href subset, non-greedy inner — nested inline tags
    * stay inside the match and are stripped by the visibility
    * transform). */
  val AnchorPattern: String = "(?is)<a[^>]*href=\"[^\"]*\"[^>]*>.*?</a>"

  /** [[extractLinks]] + the ANCHOR TEXT: (doc_id, pos, href, anchor) —
    * anchor text is the web-IR signal that describes the TARGET (the
    * original PageRank paper indexes it on the linked page). Same
    * pinned rules: clean-first, double-quoted href subset, both fields
    * through the step-3 visibility transform (the whole `<a …>…</a>`
    * match runs the transform for `anchor` — its own tags strip to
    * spaces, entities decode, spaces collapse). Anchors without an
    * href (or single-quoted) are NOT matched. */
  def extractLinksWithText(df: DataFrame, idCol: String,
                           htmlCol: String): DataFrame =
    df.filter(col(htmlCol).isNotNull)
      .withColumn("__am", expr(
        s"regexp_extract_all(${cleanSql(htmlCol, duck = false)}, " +
          s"'$AnchorPattern', 0)"))
      .withColumn("__lk", expr(
        s"transform(__am, mm -> named_struct(" +
          s"'href', ${visibleSql(s"regexp_extract(mm, '$HrefPattern', 1)", duck = false)}, " +
          s"'anchor', ${visibleSql("mm", duck = false)}))"))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(col("__lk")).as(Seq("__p", "__s")))
      .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
        col("__s.href").as("href"), col("__s.anchor").as("anchor"))

  /** Every `<img …>` element carrying a double-quoted `src` — attribute
    * ORDER is free (`alt` may precede `src`); the tag must not span `>`
    * (no `>` inside attribute values — stated, same subset rule as
    * [[HrefPattern]]); self-closing `/>` matches (`/` ∈ `[^>]`). */
  val ImgPattern: String = "(?is)<img[^>]*src=\"[^\"]*\"[^>]*>"

  /** The src / alt attribute values inside a matched `<img>` tag. */
  val SrcAttr: String = "(?is)src=\"([^\"]*)\""
  val AltAttr: String = "(?is)alt=\"([^\"]*)\""

  /** Image-reference extraction: (doc_id, pos, src, alt) — one row per
    * matched `<img src="…">` in document order. This is the assembly
    * step of multimodal (image, caption) dataset curation (LAION-style:
    * pages yield candidate pairs of image URL + alt text; the image side
    * then dedups via [[ImageDedup]] and the pair survives on the
    * canonical copy).
    *
    * Pinned contract (the [[extractLinksWithText]] rules): step-1
    * cleaning runs FIRST (a `<script>` may carry a fake `<img>` string);
    * tags match [[ImgPattern]] (double-quoted src, either attribute
    * order); BOTH `src` and `alt` pass the full step-3 visibility
    * transform (alt text is prose — entities decode, spaces collapse;
    * srcs escape `&` as `&amp;` inside query strings per the HTML
    * spec); a missing/unquoted `alt` yields `''` (both engines'
    * no-match `regexp_extract`). One codegen projection + posexplode —
    * no shuffle, no UDF. */
  def extractImages(df: DataFrame, idCol: String,
                    htmlCol: String): DataFrame =
    df.filter(col(htmlCol).isNotNull)
      .withColumn("__im", expr(
        s"regexp_extract_all(${cleanSql(htmlCol, duck = false)}, " +
          s"'$ImgPattern', 0)"))
      .withColumn("__iv", expr(
        s"transform(__im, mm -> named_struct(" +
          s"'src', ${visibleSql(s"regexp_extract(mm, '$SrcAttr', 1)", duck = false)}, " +
          s"'alt', ${visibleSql(s"regexp_extract(mm, '$AltAttr', 1)", duck = false)}))"))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(col("__iv")).as(Seq("__p", "__s")))
      .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
        col("__s.src").as("src"), col("__s.alt").as("alt"))

  /** DuckDB twin of [[extractImages]] over a relation exposing
    * (doc_id, h) named `__img_src`: (doc_id, pos, src, alt),
    * zip-unnested. */
  def duckImageItems(h: String): String = {
    val ex = s"regexp_extract_all(${cleanSql(h, duck = true)}, " +
      s"'$ImgPattern')"
    val srcOf = visibleSql(s"regexp_extract(mm, '$SrcAttr', 1)", duck = true)
    val altOf = visibleSql(s"regexp_extract(mm, '$AltAttr', 1)", duck = true)
    s"""SELECT doc_id,
       |       unnest(range(1, len(sl) + 1)) AS pos,
       |       unnest(sl) AS src,
       |       unnest(al) AS alt
       |FROM (SELECT doc_id,
       |        list_transform(im, mm -> $srcOf) AS sl,
       |        list_transform(im, mm -> $altOf) AS al
       |      FROM (SELECT doc_id, $ex AS im FROM __img_src))""".stripMargin
  }

  /** DuckDB twin of [[extractLinksWithText]] over a relation exposing
    * (doc_id, h): (doc_id, pos, href, anchor), zip-unnested. */
  def duckLinkTextItems(h: String): String = {
    val ex = s"regexp_extract_all(${cleanSql(h, duck = true)}, " +
      s"'$AnchorPattern')"
    val hrefOf = visibleSql(s"regexp_extract(mm, '$HrefPattern', 1)",
      duck = true)
    val anchorOf = visibleSql("mm", duck = true)
    s"""SELECT doc_id,
       |       unnest(range(1, len(hl) + 1)) AS pos,
       |       unnest(hl) AS href,
       |       unnest(al) AS anchor
       |FROM (SELECT doc_id,
       |        list_transform(am, mm -> $hrefOf) AS hl,
       |        list_transform(am, mm -> $anchorOf) AS al
       |      FROM (SELECT doc_id, $ex AS am FROM __link_src))""".stripMargin
  }

  /** DuckDB twin of [[extractLinks]] over a relation exposing
    * (doc_id, h): the per-doc href LIST (same clean + extract +
    * visibility chain), zip-unnested with its 1-based positions
    * (DuckDB parallel unnests in one SELECT zip by position). Splice
    * as `SELECT … FROM (${duckLinkItems("h")}) z`. */
  def duckLinkItems(h: String): String = {
    val ex = s"regexp_extract_all(${cleanSql(h, duck = true)}, " +
      s"'$HrefPattern', 1)"
    s"""SELECT doc_id,
       |       unnest(range(1, len(l) + 1)) AS pos,
       |       unnest(l) AS href
       |FROM (SELECT doc_id,
       |        list_transform($ex, hh -> ${visibleSql("hh", duck = true)}) AS l
       |      FROM __link_src)""".stripMargin
  }

  /** The DuckDB twin of [[extractText]]'s projection as SELECT items
    * over an html expr (splice into the oracle query): returns the
    * (n_blocks, n_kept, text) item list. Same staged shape: prepped
    * arrays → visible arrays → keep indexes. */
  def duckExtractItems(h: String, minChars: Int, maxDensityPct: Int): String = {
    val bl = blocksSql(cleanSql(h, duck = true), duck = true)
    s"""CAST(len(bl) AS BIGINT) AS n_blocks,
       |CAST(len(ki) AS BIGINT) AS n_kept,
       |COALESCE(array_to_string(list_transform(ki, i -> vis[i]), chr(10)),
       |         '') AS text
       |FROM (SELECT doc_id, bl, vis,
       |        list_filter(range(1, len(bl) + 1), i ->
       |          length(vis[i]) >= $minChars AND
       |          100 * length(va[i]) < $maxDensityPct * length(vis[i])) AS ki
       |      FROM (SELECT doc_id, bl,
       |              list_transform(p, yy -> ${finishSql("yy", duck = true)}) AS vis,
       |              list_transform(pa, yy -> ${finishSql("yy", duck = true)}) AS va
       |            FROM (SELECT doc_id, bl,
       |                    list_transform(bl, bb -> ${prepSql("bb", duck = true)}) AS p,
       |                    list_transform(bl,
       |                      bb -> ${prepSql(anchorsSql("bb", duck = true), duck = true)}) AS pa
       |                  FROM (SELECT doc_id, $bl AS bl FROM __html_src))))""".stripMargin
  }
}
