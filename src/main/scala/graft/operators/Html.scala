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
  * 1-indexed via `[i]`). Patterns deliberately avoid backreferences and
  * lookaheads (RE2 has neither) and backslash classes (escaping
  * differs); case-insensitivity and dotall ride inline `(?i)`/`(?s)`
  * flags, which both engines accept.
  *
  * Pinned contract (each rule replayed by the oracle):
  *  1. `<script>…</script>`, `<style>…</style>` blocks and `<!--…-->`
  *     comments are removed first (dotall, case-insensitive, non-greedy);
  *  2. the document splits into blocks at closing block-level tags:
  *     `</p> </li> </h1..6> </div>` and `<br…>`;
  *  3. a block's VISIBLE text = remaining tags stripped to a space,
  *     entities decoded (`&nbsp; &lt; &gt; &quot; &#39;` then `&amp;`
  *     LAST — decoding `&amp;` earlier would double-decode
  *     `&amp;lt;` to `<`), space runs collapsed, trimmed;
  *  4. a block KEEPS iff visible length ≥ `minChars` AND
  *     100·len(anchor visible text) < `maxDensityPct`·len(visible) —
  *     the exact-integer link-density gate (anchor text = every
  *     `<a …>…</a>` inner, same visibility transform);
  *  5. output text = kept blocks joined by newline, in input order.
  */
object Html {

  /** regexp_replace with the global flag spelled per dialect (Spark
    * replaces all matches by default; DuckDB needs 'g'). */
  private def rre(duck: Boolean)(x: String, p: String, r: String): String =
    if (duck) s"regexp_replace($x, '$p', '$r', 'g')"
    else s"regexp_replace($x, '$p', '$r')"

  /** Entity decode — `&amp;` LAST (the double-decode trap). The
    * apostrophe replacement is spelled per dialect ('' doubling works in
    * both, but keep it explicit here). */
  private def entities(x: String): String =
    s"replace(replace(replace(replace(replace(replace($x," +
      " '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>')," +
      " '&quot;', '\"'), '&#39;', ''''), '&amp;', '&')"

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

  /** SQL for step 3: the visible text of a block expr (tags → space,
    * entities decoded, space runs collapsed, trimmed). */
  def visibleSql(x: String, duck: Boolean): String = {
    val r = rre(duck) _
    s"trim(${r(entities(r(x, "(?s)<[^>]*>", " ")), "  *", " ")})"
  }

  /** SQL for the anchor-inner concatenation of a block expr. DuckDB's
    * `array_to_string([])` is NULL where Spark's `array_join([])` is ''
    * — COALESCE pins the Spark semantics. */
  def anchorsSql(x: String, duck: Boolean): String = {
    val ex = s"regexp_extract_all($x, '(?is)<a[^>]*>(.*?)</a>', 1)"
    if (duck) s"COALESCE(array_to_string($ex, ' '), '')"
    else s"array_join($ex, ' ')"
  }

  /** SQL for step 4's keep predicate over a block expr. */
  def keepSql(x: String, minChars: Int, maxDensityPct: Int,
              duck: Boolean): String = {
    val v = visibleSql(x, duck)
    val a = visibleSql(anchorsSql(x, duck), duck)
    s"(length($v) >= $minChars AND " +
      s"100 * length($a) < $maxDensityPct * length($v))"
  }

  /** Extract text from an (id, html) relation: (doc_id, n_blocks,
    * n_kept, text) — one codegen-friendly projection chain per row, no
    * shuffle (the higher-order filter/transform run per document, the
    * unit of work). `maxDensityPct` = 100·max link density (e.g. 33 =
    * drop blocks whose text is ≥ 1/3 anchor text). */
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
      .withColumn("__ki", expr(
        s"""filter(sequence(1, size(__bl)),
           |  i -> ${keepSql("element_at(__bl, i)", minChars, maxDensityPct,
                             duck = false)})""".stripMargin))
      .select(
        col(idCol).cast("long").as("doc_id"),
        expr("CAST(size(__bl) AS BIGINT)").as("n_blocks"),
        expr("CAST(size(__ki) AS BIGINT)").as("n_kept"),
        expr(s"""array_join(transform(__ki,
                |  i -> ${visibleSql("element_at(__bl, i)", duck = false)}),
                |  '\\n')""".stripMargin).as("text"))
  }

  /** The DuckDB twin of [[extractText]]'s projection as SELECT items
    * over an html expr (splice into the oracle query): returns the
    * (n_blocks, n_kept, text) item list. */
  def duckExtractItems(h: String, minChars: Int, maxDensityPct: Int): String = {
    val bl = blocksSql(cleanSql(h, duck = true), duck = true)
    val keep = keepSql("bl[i]", minChars, maxDensityPct, duck = true)
    val vis = visibleSql("bl[i]", duck = true)
    s"""CAST(len(bl) AS BIGINT) AS n_blocks,
       |CAST(len(ki) AS BIGINT) AS n_kept,
       |COALESCE(array_to_string(list_transform(ki, i -> $vis), chr(10)),
       |         '') AS text
       |FROM (SELECT doc_id, bl,
       |             list_filter(range(1, len(bl) + 1), i -> $keep) AS ki
       |      FROM (SELECT doc_id, $bl AS bl FROM __html_src))""".stripMargin
  }
}
