package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL curation primitives — the web-crawl staples (CCNet/RefinedWeb
  * style): canonicalize URLs so trivially-distinct spellings of one
  * resource compare equal, extract the registrable domain, and cap
  * per-domain document counts so no single site dominates a mix.
  *
  * Everything here is a pure column PROJECTION (split_part/substr/
  * array ops — whole-stage codegen, no UDF, no shuffle); the cap is
  * the existing window-free [[Sampling.stratifiedSample]] min-k.
  *
  * Pinned canonicalization contract (each rule replayed exactly by the
  * DuckDB twin in the registry):
  *  - scheme and host lowercase; path/query case is PRESERVED (path
  *    case is significant per RFC 3986; hosts are not);
  *  - the fragment is dropped (never sent to the server);
  *  - default ports are dropped (`:80` under http, `:443` under
  *    https); other ports are kept — they address different servers;
  *  - ONE trailing slash is stripped from the path (so `/a/` ≡ `/a`
  *    and a bare `/` ≡ empty — the dedup-oriented choice, stated);
  *  - percent-encodings in the path+query normalize (RFC 3986 §6.2.2):
  *    a `%XX` of an UNRESERVED character (ALPHA / DIGIT / `-._~`)
  *    decodes to the character (`%7Efoo` ≡ `~foo`, `%41` ≡ `A`); any
  *    other `%XX` keeps its escape with the hex digits UPPERCASED
  *    (`%2f` ≡ `%2F` — decoding a reserved char would change the URL);
  *    a `%` not followed by two hex digits passes through verbatim;
  *  - tracking parameters are dropped (`utm_*` prefixes and the
  *    literal names below), remaining query params are SORTED (param
  *    order is almost never significant; sorting makes `?a=1&b=2` ≡
  *    `?b=2&a=1`), and an emptied query drops its `?`;
  *  - inputs must contain `://` and at most one `?` (crawler URLs do;
  *    anything stranger passes through the split rules verbatim —
  *    deterministic, just not specially handled).
  */
object Web {

  /** Percent-escape pattern (RE2 ∩ Java — bounded, no classes that
    * differ across engines). */
  val PctPattern: String = "%[0-9a-fA-F]{2}"

  /** Query parameters dropped by canonicalization: anything whose name
    * starts with `utm_`, plus these exact names. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")

  /** Multi-label public suffixes the registrable-domain rule knows —
    * deliberately a SMALL pinned set (the full PSL is a versioned
    * artifact a deployment loads the same way the tokenizer vocabs
    * are); suffixes here take three labels, everything else two. */
  val MultiSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br")

  /** SQL for percent-encoding normalization over expr `x` (the
    * path+query slice of a URL), spelled per dialect — the Html
    * numeric-reference machinery's shape: split at escapes (both
    * engines keep trailing empty segments, so segments = escapes + 1),
    * rewrite each escape, reassemble. Escapes of unreserved codepoints
    * (45 `-`, 46 `.`, 48-57 digits, 65-90 / 97-122 letters, 95 `_`,
    * 126 `~`) decode — all ASCII, so Spark's `chr` is safe; everything
    * else re-emits `%` + UPPERCASED hex. No generated line starts with
    * '|' (the outer-stripMargin trap). */
  def pctNormSql(x: String, duck: Boolean): String = {
    def unres(c: String) =
      s"($c = 45 OR $c = 46 OR ($c BETWEEN 48 AND 57) OR " +
        s"($c BETWEEN 65 AND 90) OR $c = 95 OR ($c BETWEEN 97 AND 122) OR " +
        s"$c = 126)"
    if (duck) {
      val ref = s"regexp_extract_all($x, '$PctPattern')[pj]"
      val c = s"CAST(concat('0x', substr($ref, 2, 2)) AS INT)"
      s"(string_split_regex($x, '$PctPattern')[1] || COALESCE(" +
        "array_to_string(list_transform(" +
        s"range(1, len(regexp_extract_all($x, '$PctPattern')) + 1), pj -> " +
        s"(CASE WHEN ${unres(c)} THEN chr($c) " +
        s"ELSE concat('%', upper(substr($ref, 2, 2))) END) " +
        s"|| string_split_regex($x, '$PctPattern')[pj + 1]), ''), ''))"
    } else {
      val c = "CAST(conv(substring(pe, 2, 2), 16, 10) AS INT)"
      s"concat(element_at(split($x, '$PctPattern'), 1), " +
        s"array_join(transform(regexp_extract_all($x, '$PctPattern', 0), " +
        s"(pe, pj) -> concat(CASE WHEN ${unres(c)} THEN chr($c) " +
        "ELSE concat('%', upper(substring(pe, 2, 2))) END, " +
        s"element_at(split($x, '$PctPattern'), pj + 2))), ''))"
    }
  }

  /** Append canonical-URL columns to `df`: `outCol` (the canonical
    * form) and `outCol_host` (the canonical lowercased port-stripped-
    * if-default host, the input to [[withRegistrableDomain]]). Chained
    * column definitions (the withHilbert discipline — Catalyst folds
    * them into one codegen projection; temp columns dropped). */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
                       outCol: String): DataFrame = {
    val tracking = TrackingParams.map(p => s"'$p'").mkString("(", ", ", ")")
    df
      .withColumn("__w_scheme", expr(s"lower(split_part($urlCol, '://', 1))"))
      .withColumn("__w_rest", expr(
        s"substring($urlCol, length(split_part($urlCol, '://', 1)) + 4)"))
      .withColumn("__w_nofrag", expr("split_part(__w_rest, '#', 1)"))
      .withColumn("__w_hostport", expr(
        "split_part(split_part(__w_nofrag, '?', 1), '/', 1)"))
      .withColumn(s"${outCol}_host", expr(
        """CASE WHEN __w_scheme = 'http' AND lower(__w_hostport) LIKE '%:80'
          |       THEN substring(lower(__w_hostport), 1, length(__w_hostport) - 3)
          |     WHEN __w_scheme = 'https' AND lower(__w_hostport) LIKE '%:443'
          |       THEN substring(lower(__w_hostport), 1, length(__w_hostport) - 4)
          |     ELSE lower(__w_hostport) END""".stripMargin))
      .withColumn("__w_pq", expr(
        "substring(__w_nofrag, length(__w_hostport) + 1)"))
      // percent-normalize the whole path+query at once — decoding
      // never produces '?' '&' '=' '/' (reserved chars keep their
      // escapes), so the splits below are unaffected by the ordering.
      .withColumn("__w_pqn", expr(pctNormSql("__w_pq", duck = false)))
      .withColumn("__w_path0", expr("split_part(__w_pqn, '?', 1)"))
      .withColumn("__w_path", expr(
        """CASE WHEN __w_path0 LIKE '%/'
          |       THEN substring(__w_path0, 1, length(__w_path0) - 1)
          |     ELSE __w_path0 END""".stripMargin))
      .withColumn("__w_q", expr(
        s"""array_join(array_sort(filter(
           |  split(CASE WHEN instr(__w_pqn, '?') > 0
           |             THEN split_part(__w_pqn, '?', 2) ELSE '' END, '&'),
           |  p -> p != '' AND NOT startswith(p, 'utm_')
           |       AND NOT split_part(p, '=', 1) IN $tracking)), '&')""".stripMargin))
      .withColumn(outCol, expr(
        s"""concat(__w_scheme, '://', ${outCol}_host, __w_path,
           |  CASE WHEN __w_q = '' THEN '' ELSE concat('?', __w_q) END)""".stripMargin))
      .drop("__w_scheme", "__w_rest", "__w_nofrag", "__w_hostport",
        "__w_pq", "__w_pqn", "__w_path0", "__w_path", "__w_q")
  }

  /** Append the registrable domain of `hostCol` (a canonical host,
    * possibly carrying a non-default port) as `outCol`: the last two
    * labels, or three when the last two form a known multi-label
    * public suffix ([[MultiSuffixes]]); a host of ≤2 labels is its own
    * registrable domain. */
  def withRegistrableDomain(df: DataFrame, hostCol: String,
                            outCol: String): DataFrame = {
    val multi = MultiSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")
    df
      .withColumn("__w_ls", expr(s"split(split_part($hostCol, ':', 1), '\\\\.')"))
      .withColumn("__w_n", expr("size(__w_ls)"))
      .withColumn(outCol, expr(
        s"""CASE WHEN __w_n <= 2 THEN split_part($hostCol, ':', 1)
           |     WHEN concat(element_at(__w_ls, __w_n - 1), '.',
           |                 element_at(__w_ls, __w_n)) IN $multi
           |          AND __w_n >= 3
           |       THEN concat(element_at(__w_ls, __w_n - 2), '.',
           |                   element_at(__w_ls, __w_n - 1), '.',
           |                   element_at(__w_ls, __w_n))
           |     ELSE concat(element_at(__w_ls, __w_n - 1), '.',
           |                 element_at(__w_ls, __w_n)) END""".stripMargin))
      .drop("__w_ls", "__w_n")
  }

  /** The loadable-PSL form of [[withRegistrableDomain]]: `psl` is a
    * relation with a `suffix` column (the public-suffix list, loaded
    * like a tokenizer vocab — a versioned deployment artifact; the
    * pinned [[MultiSuffixes]] two-arg overload is the no-artifact
    * fallback). Longest-match semantics over EXACT suffix entries of
    * 1..[[MaxSuffixLabels]] labels: the host's registrable domain is
    * its trailing (k+1) labels where k = the label count of the
    * longest matching suffix; no entry matches → the PSL default rule
    * `*` applies (last label is the public suffix, domain = last two
    * labels); a host that IS a suffix (or has ≤ k+1 labels) is its own
    * domain. Plan shape: one BROADCAST LEFT JOIN per candidate length
    * — the suffix relation is list-sized by contract; the corpus never
    * shuffles (wildcard `*.x` / exception `!y.x` PSL rules are not
    * modeled — state them as exact entries). */
  def withRegistrableDomain(df: DataFrame, hostCol: String, outCol: String,
                            psl: DataFrame): DataFrame = {
    val sfx = psl.select(col("suffix").cast("string").as("suffix")).distinct()
    var out = df
      .withColumn("__w_h", expr(s"split_part($hostCol, ':', 1)"))
      .withColumn("__w_ls", expr("split(__w_h, '\\\\.')"))
      .withColumn("__w_n", expr("size(__w_ls)"))
    // k = 1 is never joined: a 1-label match and a non-match both land
    // on the '*' default (kExpr's ELSE 1), so the lookup would be dead
    // weight (Catalyst would eliminate the unused left join anyway).
    for (k <- 2 to MaxSuffixLabels) {
      out = out
        .withColumn(s"__w_s$k", expr(
          s"IF(__w_n >= $k, concat_ws('.', slice(__w_ls, __w_n - $k + 1, $k)), NULL)"))
        .join(broadcast(sfx.select(col("suffix").as(s"__w_s$k"),
          lit(1).as(s"__w_m$k"))), Seq(s"__w_s$k"), "left")
    }
    val kExpr = (MaxSuffixLabels to 2 by -1)
      .map(k => s"WHEN __w_m$k = 1 THEN $k")
      .mkString("CASE ", " ", " ELSE 1 END") // ELSE 1 = the PSL '*' default
    out.withColumn("__w_k", expr(kExpr))
      .withColumn(outCol, expr(
        """IF(__w_n <= __w_k + 1, __w_h,
          |   concat_ws('.', slice(__w_ls, __w_n - __w_k, __w_k + 1)))""".stripMargin))
      .drop((Seq("__w_h", "__w_ls", "__w_n", "__w_k") ++
        (2 to MaxSuffixLabels).flatMap(k => Seq(s"__w_s$k", s"__w_m$k"))): _*)
  }

  /** Longest suffix entry the loadable-PSL join considers, in labels.
    * 4 covers every exact entry shape in the real PSL that matters for
    * grouping (`act.edu.au` is 3; a handful of 4s exist). */
  val MaxSuffixLabels: Int = 4

  /** SQL for the host of a CANONICAL url expr (scheme://host[/path]).
    * Identical text in both engines (split_part is 1-based in both). */
  def canonicalHostSql(c: String): String =
    s"split_part(split_part($c, '://', 2), '/', 1)"

  /** SQL for the path (query stripped) of a CANONICAL url expr. The
    * canonical form drops the trailing slash, so a ROOT url yields ''
    * (the all-paths robots rule is therefore the EMPTY prefix — every
    * path starts with ''). The `+ 4` covers '://' plus the 1-based
    * substring start (the pinned off-by-one, see [[resolveRefSql]]). */
  def canonicalPathSql(c: String): String =
    s"""split_part(substring($c,
       |  length(split_part($c, '://', 1)) + 4
       |  + length(${canonicalHostSql(c)})), '?', 1)""".stripMargin

  /** robots.txt Disallow gate over CANONICAL urls — the loadable-
    * relation discipline of [[withRegistrableDomain]]'s PSL overload:
    * `rules` is a two-column (host, prefix) relation stating the
    * crawler's parsed Disallow lines (a versioned deployment artifact,
    * loaded like a tokenizer vocab). A url DROPS iff some rule's host
    * equals its canonical host AND its canonical path starts with the
    * rule's prefix.
    *
    * Pinned subset (stated, the 1994 convention / RFC 9309 literal
    * core): literal path-prefix rules only — no `*`/`$` wildcards, no
    * `Allow:` overrides, no crawl-delay; hosts compare exactly (the
    * canonical host, port-normalized). The gate NORMALIZES the
    * standard all-paths spelling at load: a lone `/` prefix becomes
    * the EMPTY prefix (the canonical form drops the trailing slash,
    * so the root's canonical path is `''` — a literal `/` test would
    * silently let the site root through; every path starts with `''`,
    * so the normalized rule blocks the whole host as intended).
    * For `*`/`$` wildcards and `Allow:` longest-match precedence use
    * [[filterRobotsAllowedRfc]].
    *
    * Plan: rules broadcast; ONE hash LEFT ANTI join keyed on host with
    * the prefix test as the join residual — the corpus never shuffles,
    * a host with no rules passes untouched. */
  def filterRobotsAllowed(df: DataFrame, urlCol: String,
                          rules: DataFrame): DataFrame = {
    val r = rules.select(col(rules.columns(0)).cast("string").as("__rh"),
      when(col(rules.columns(1)) === "/", lit(""))
        .otherwise(col(rules.columns(1)).cast("string")).as("__rp"))
      .distinct()
    df.join(broadcast(r),
      expr(s"${canonicalHostSql(urlCol)} = __rh") &&
        expr(s"startswith(${canonicalPathSql(urlCol)}, __rp)"),
      "left_anti")
  }

  /** SQL building the anchored match regex for a robots.txt rule
    * pattern expr `p` — identical semantics in both engines (the
    * [[dotNormSql]] discipline: no backslashes anywhere; every escaped
    * metachar becomes a character CLASS, which is identical text in
    * both dialects' regex subset):
    *
    *  - a TRAILING `$` anchors the match at the path's end (RFC 9309
    *    §2.2.3); `$` elsewhere is literal;
    *  - `*` matches any character run (→ `.*`; the escape chain runs
    *    first, so the inserted `.` stays a wildcard);
    *  - a trailing `/` (after `$`-stripping) matches the directory
    *    itself OR anything below it (→ `(/|$)`): the canonical form
    *    drops trailing slashes, so `/foo/` must cover the canonical
    *    `/foo` and `/foo/bar` but NOT `/foobar`, and the all-paths
    *    rule `/` covers the root's canonical `''` too;
    *  - regex metachars in the pattern (`. + ( ) { } | ? [ $`) are
    *    literal. UNSUPPORTED in patterns (stated): `]`, `\`, and `^`
    *    — none occur in real robots path rules.
    *
    * The produced regex is applied with FIND semantics anchored by the
    * leading `^` (Spark `regexp_like` and DuckDB `regexp_matches` both
    * search; the explicit anchors make them agree). The emitted SQL is
    * ENGINE-NEUTRAL (one text for both dialects — the class-escape
    * discipline is what buys that), so there is no `duck` parameter. */
  def robotsRegexSql(p: String): String = {
    // strip ONE trailing '$' (the anchor), remember it.
    val anch = s"$p LIKE '%$$'"
    val body = s"CASE WHEN $anch THEN substring($p, 1, length($p) - 1) ELSE $p END"
    // strip ONE trailing '/' (the directory form), remember it.
    val dir = s"($body) LIKE '%/'"
    val body2 = s"CASE WHEN $dir THEN substring($body, 1, length($body) - 1) ELSE $body END"
    // escape chain: '[' FIRST (later inserts carry brackets), '*' LAST
    // (its inserted '.' must survive the '.' escape).
    val esc = Seq("[" -> "[[]", "." -> "[.]", "+" -> "[+]", "(" -> "[(]",
      ")" -> "[)]", "{" -> "[{]", "}" -> "[}]", "|" -> "[|]",
      "?" -> "[?]", "$" -> "[$]", "*" -> ".*")
      .foldLeft(s"($body2)") { case (e, (f, t)) =>
        s"replace($e, '$f', '$t')"
      }
    s"concat('^', $esc, CASE WHEN $anch THEN '$$' " +
      s"WHEN $dir THEN '(/|$$)' ELSE '' END)"
  }

  /** robots.txt gate with RFC 9309 MATCHING over CANONICAL urls —
    * the full-precedence upgrade of [[filterRobotsAllowed]]: `rules` is
    * a three-column (host, pattern, allow) relation of parsed
    * `Allow:`/`Disallow:` lines (allow = true for Allow). A url is
    * kept iff its host has no matching rule, or the MOST SPECIFIC
    * matching rule (longest raw pattern; Allow wins exact ties) is an
    * Allow. Pattern length is counted in CHARACTERS (both engines'
    * `length`), including a trailing `$` anchor — a stated convention:
    * RFC 9309 §2.2.2 says octets, which differs only for non-ASCII
    * rule patterns (pct-encoded in real robots files, so ASCII in
    * practice); the tie-break spec relies on `$` counting. Patterns support `*` and a
    * trailing `$` ([[robotsRegexSql]]); EMPTY patterns are dropped at
    * load (an empty Disallow means "disallow nothing" — RFC 9309
    * §2.2.3 — and an empty Allow is its vacuous mirror).
    *
    * Plan: rules aggregate per host into a broadcast array relation;
    * ONE broadcast LEFT join on the canonical host + a single integer
    * fold over that host's rules per row (precedence combo =
    * 2·len + allow; max over matches, keep iff odd or none) — the
    * corpus never shuffles, hosts without rules skip the fold (null
    * array → null verdict). The fold is an interpreted HOF, priced
    * per RULES-BEARING row only — robots relations are small by
    * contract (a deployment artifact, like a tokenizer vocab). */
  def filterRobotsAllowedRfc(df: DataFrame, urlCol: String,
                             rules: DataFrame): DataFrame = {
    val r = rules.select(col(rules.columns(0)).cast("string").as("__rh"),
      col(rules.columns(1)).cast("string").as("__rp"),
      col(rules.columns(2)).cast("boolean").as("__ra"))
      .filter(length(col("__rp")) > 0)
      .distinct()
      .withColumn("__rx", expr(robotsRegexSql("__rp")))
      .withColumn("__cmb", (length(col("__rp")) * 2 +
        when(col("__ra"), 1).otherwise(0)).cast("int"))
      .groupBy(col("__rh"))
      .agg(collect_list(struct(col("__rx").as("rx"), col("__cmb").as("cmb")))
        .as("__rules"))
    df.join(broadcast(r),
        expr(s"${canonicalHostSql(urlCol)} = __rh"), "left")
      .withColumn("__v", expr(
        s"""aggregate(__rules, -1,
           |  (acc9, rr) -> IF(regexp_like(${canonicalPathSql(urlCol)}, rr.rx),
           |                   greatest(acc9, rr.cmb), acc9))""".stripMargin))
      .filter(col("__v").isNull || col("__v") < 0 || col("__v") % 2 === 1)
      .drop("__rh", "__rules", "__v")
  }

  /** robots.txt BODY parser (RFC 9309 §2) — the step that turns raw
    * fetched robots.txt text into the (host, pattern, allow) relation
    * [[filterRobotsAllowedRfc]] consumes; without it the frontier's
    * robots input is a hand-maintained artifact. One engine-neutral
    * projection chain (replayed 1:1 by [[duckRobotsParseCtes]]), per
    * row over a (host, body) relation — robots bodies are small by
    * contract (RFC caps parsing at 500 KiB), so the O(lines²) prefix
    * sums inside the array transforms are irrelevant; no shuffle, no
    * UDF.
    *
    * Pinned parse (RFC 9309 §2.1-2.2.1):
    *  - lines split at LF; a trailing CR strips (CRLF files); a `#`
    *    starts a comment to end-of-line; fields are case-insensitive
    *    and space-tolerant (`Disallow : /x` parses);
    *  - only `user-agent` / `allow` / `disallow` lines are
    *    significant; anything else (`sitemap:`, `crawl-delay:`,
    *    garbage) is IGNORED and does not break a group (§2.2.4);
    *  - GROUPS: consecutive `user-agent` lines share one group; a
    *    `user-agent` line after a rule line starts a new group; rules
    *    before any `user-agent` line belong to no group and DROP;
    *  - GROUP SELECTION for `agent` (the crawler's product token):
    *    all groups carrying an EXACT case-insensitive `user-agent`
    *    token match are selected and their rules MERGE (§2.2.1
    *    "combine"); if none match, the `*` groups apply; if neither,
    *    the host emits no rules (everything allowed). Substring /
    *    prefix product-token matching is NOT modeled (stated — exact
    *    token or `*`, the conservative subset);
    *  - rules emit in document order with `pos` (1-based among
    *    selected rules); EMPTY patterns surface with `pattern = ''`
    *    faithfully — [[filterRobotsAllowedRfc]] drops them at load
    *    (empty Disallow = no rule), the parser does not editorialize.
    *
    * Output: (host, pos, pattern, allow). */
  def parseRobots(df: DataFrame, hostCol: String, bodyCol: String,
                  agent: String): DataFrame = {
    val ag = agent.toLowerCase.replace("'", "''")
    // PERF SHAPE (measured — 65 ms/row before, the round-8 HOF lesson
    // generalized): intermediates held in withColumn chains get
    // INLINED into their references, so every `element_at(sig, j)`
    // inside the O(lines²) lambdas re-ran the whole line tokenization
    // per element access. Each intermediate is therefore bound ONCE
    // as a LAMBDA VARIABLE via `transform(array(X), v -> …)` nesting
    // — a lambda variable is an evaluated value, inline-proof by
    // construction. Lambda variable names are all distinct (the
    // nested-HOF shadowing trap).
    val sig =
      s"""filter(transform(split($bodyCol, chr(10)),
         |  l0 -> named_struct(
         |    'k', lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
         |    'v', trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
         |           instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
         |    'c', instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
         |  s0 -> s0.c > 0 AND s0.k IN ('user-agent', 'allow', 'disallow'))""".stripMargin
    // sequence(1, 0) is DESCENDING [1, 0], not empty — guard (the
    // pinned Spark trap).
    def idx(sg: String) =
      s"IF(size($sg) < 1, array(), sequence(1, size($sg)))"
    def gid(sg: String) =
      s"""transform(${idx(sg)}, i9 -> size(filter(sequence(1, i9), j9 ->
         |  element_at($sg, j9).k = 'user-agent' AND
         |  (j9 = 1 OR element_at($sg, j9 - 1).k != 'user-agent'))))""".stripMargin
    def grp(sg: String, gd: String, iv: String, pred: String) =
      s"""array_distinct(transform(filter(${idx(sg)}, $iv ->
         |  element_at($sg, $iv).k = 'user-agent' AND $pred),
         |  $iv -> element_at($gd, $iv)))""".stripMargin
    def sel(sg: String, gd: String) = {
      val exact = grp(sg, gd, "i8", s"lower(element_at($sg, i8).v) = '$ag'")
      val star = grp(sg, gd, "i7", s"element_at($sg, i7).v = '*'")
      s"IF(size($exact) > 0, $exact, $star)"
    }
    def rules(sg: String, gd: String, sl: String) =
      s"""transform(filter(${idx(sg)}, i6 ->
         |  element_at($sg, i6).k != 'user-agent' AND
         |  array_contains($sl, element_at($gd, i6))),
         |  i6 -> named_struct('pattern', element_at($sg, i6).v,
         |                     'allow', element_at($sg, i6).k = 'allow'))""".stripMargin
    val full =
      s"""element_at(transform(array($sig), sg ->
         |  element_at(transform(array(${gid("sg")}), gd ->
         |    element_at(transform(array(${sel("sg", "gd")}), sl ->
         |      ${rules("sg", "gd", "sl")}), 1)), 1)), 1)""".stripMargin
    df.filter(col(bodyCol).isNotNull)
      .withColumn("__rb_rules", expr(full))
      .select(col(hostCol).as("host"),
        posexplode(col("__rb_rules")).as(Seq("__p", "__r")))
      .select(col("host"), (col("__p") + 1).cast("long").as("pos"),
        col("__r.pattern").as("pattern"), col("__r.allow").as("allow"))
  }

  /** DuckDB twin of [[parseRobots]] as chained CTEs over a relation
    * `src` exposing (host, body) — ends in CTE `<pre>r(host, pos,
    * pattern, allow)`. Each CTE replays one pinned rule 1:1; DuckDB
    * `range(a, b)` is EXCLUSIVE of `b` where Spark `sequence` is
    * inclusive — every bound below carries the `+ 1`. */
  def duckRobotsParseCtes(src: String, pre: String, agent: String): String = {
    val ag = agent.toLowerCase.replace("'", "''")
    s"""${pre}s AS (SELECT host,
       |    list_filter(list_transform(string_split(body, chr(10)),
       |      l0 -> struct_pack(
       |        k := lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
       |        v := trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
       |               instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
       |        c := instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
       |      s0 -> s0.c > 0 AND s0.k IN ('user-agent', 'allow', 'disallow')) AS sig
       |  FROM $src),
       |${pre}g AS (SELECT host, sig,
       |    list_transform(range(1, len(sig) + 1), i9 -> len(list_filter(range(1, i9 + 1),
       |      j9 -> sig[j9].k = 'user-agent' AND
       |            (j9 = 1 OR sig[j9 - 1].k != 'user-agent')))) AS gid
       |  FROM ${pre}s),
       |${pre}e AS (SELECT host, sig, gid,
       |    list_distinct(list_transform(list_filter(range(1, len(sig) + 1),
       |      i8 -> sig[i8].k = 'user-agent' AND lower(sig[i8].v) = '$ag'),
       |      i8 -> gid[i8])) AS exact,
       |    list_distinct(list_transform(list_filter(range(1, len(sig) + 1),
       |      i7 -> sig[i7].k = 'user-agent' AND sig[i7].v = '*'),
       |      i7 -> gid[i7])) AS star
       |  FROM ${pre}g),
       |${pre}u AS (SELECT host,
       |    list_transform(list_filter(range(1, len(sig) + 1),
       |      i6 -> sig[i6].k != 'user-agent' AND
       |            list_contains(CASE WHEN len(exact) > 0 THEN exact ELSE star END, gid[i6])),
       |      i6 -> struct_pack(pattern := sig[i6].v, allow := sig[i6].k = 'allow')) AS rules
       |  FROM ${pre}e),
       |${pre}r AS (SELECT host,
       |    unnest(range(1, len(rules) + 1)) AS pos,
       |    unnest(list_transform(rules, r0 -> r0.pattern)) AS pattern,
       |    unnest(list_transform(rules, r0 -> r0.allow)) AS allow
       |  FROM ${pre}u)""".stripMargin
  }

  /** `Sitemap:` directive extraction from raw robots.txt bodies — the
    * third crawl-seeding source beside link discovery and direct
    * sitemap URLs: RFC 9309 §2.3 / sitemaps.org define `Sitemap:`
    * lines as GROUP-INDEPENDENT (they apply regardless of user-agent
    * groups), so no group machinery runs — one line-split projection.
    * Same pinned line tokenization as [[parseRobots]] (CR strip, `#`
    * begins a comment ANYWHERE on the line — a fragment-carrying
    * sitemap URL truncates at `#`, which is the spec'd comment rule,
    * not a bug; key lowercased/trimmed/space-tolerant; value = the
    * rest after the FIRST colon, trimmed — `https://` colons survive).
    * Empty-value `Sitemap:` lines drop (no URL to fetch). The value
    * keeps its case (URLs are case-sensitive past the host) — feed it
    * through [[withCanonicalUrl]] like any discovery.
    *
    * Output: (host, pos, loc) — pos 1-based among the body's sitemap
    * lines in document order. One codegen projection + posexplode; no
    * shuffle, no UDF. */
  def extractRobotsSitemaps(df: DataFrame, hostCol: String,
                            bodyCol: String): DataFrame = {
    val sig =
      s"""filter(transform(split($bodyCol, chr(10)),
         |  l0 -> named_struct(
         |    'k', lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
         |    'v', trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
         |           instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
         |    'c', instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
         |  s0 -> s0.c > 0 AND s0.k = 'sitemap' AND s0.v != '')""".stripMargin
    df.filter(col(bodyCol).isNotNull)
      .withColumn("__rs", expr(sig))
      .select(col(hostCol).as("host"),
        posexplode(col("__rs")).as(Seq("__p", "__s")))
      .select(col("host"), (col("__p") + 1).cast("long").as("pos"),
        col("__s.v").as("loc"))
  }

  /** DuckDB twin of [[extractRobotsSitemaps]] over a relation `src`
    * exposing (host, body) — ends in CTE `<pre>r(host, pos, loc)`. */
  def duckRobotsSitemapsCtes(src: String, pre: String): String =
    s"""${pre}v AS (SELECT host,
       |    list_filter(list_transform(string_split(body, chr(10)),
       |      l0 -> struct_pack(
       |        k := lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
       |        v := trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
       |               instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
       |        c := instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
       |      s0 -> s0.c > 0 AND s0.k = 'sitemap' AND s0.v != '') AS sg
       |  FROM $src),
       |${pre}r AS (SELECT host,
       |    unnest(range(1, len(sg) + 1)) AS pos,
       |    unnest(list_transform(sg, r0 -> r0.v)) AS loc
       |  FROM ${pre}v)""".stripMargin

  /** `Crawl-delay:` extraction from raw robots.txt bodies — the
    * de-facto politeness extension (Bing/Yandex convention; RFC 9309
    * deliberately leaves it undefined — stated). The delay is
    * GROUP-SCOPED like allow/disallow, so group selection replays
    * [[parseRobots]]'s pinned §2.2.1 rules exactly (exact-token agent
    * match merging multiple groups, `*` fallback, consecutive
    * user-agent lines sharing a group, comment/CR stripping). The
    * emitted delay is the FIRST line in the selected groups (document
    * order) whose value is a PURE DIGIT RUN (`^[0-9]+$` — the pinned
    * integer-seconds subset: `10.5`/garbage values are ignored lines.
    * Digits-only is deliberately the parseability test, never a bare
    * TRY_CAST — DuckDB ROUNDS `'10.5'` to 11 where Spark yields
    * NULL); hosts with no selected group or no
    * parseable line emit NO row (the caller's politeness default
    * applies — [[scheduleFetches]]). Same inline-proof lambda-variable
    * chain as parseRobots (the 260× plan-pathology lesson: every
    * intermediate binds once as a lambda variable, never a withColumn
    * an O(n²) HOF would inline).
    *
    * Output: (host, delay_s BIGINT). */
  def parseCrawlDelay(df: DataFrame, hostCol: String, bodyCol: String,
                      agent: String): DataFrame = {
    val ag = agent.toLowerCase.replace("'", "''")
    val sig =
      s"""filter(transform(split($bodyCol, chr(10)),
         |  l0 -> named_struct(
         |    'k', lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
         |    'v', trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
         |           instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
         |    'c', instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
         |  s0 -> s0.c > 0 AND s0.k IN ('user-agent', 'crawl-delay'))""".stripMargin
    def idx(sg: String) =
      s"IF(size($sg) < 1, array(), sequence(1, size($sg)))"
    def gid(sg: String) =
      s"""transform(${idx(sg)}, i9 -> size(filter(sequence(1, i9), j9 ->
         |  element_at($sg, j9).k = 'user-agent' AND
         |  (j9 = 1 OR element_at($sg, j9 - 1).k != 'user-agent'))))""".stripMargin
    def grp(sg: String, gd: String, iv: String, pred: String) =
      s"""array_distinct(transform(filter(${idx(sg)}, $iv ->
         |  element_at($sg, $iv).k = 'user-agent' AND $pred),
         |  $iv -> element_at($gd, $iv)))""".stripMargin
    def sel(sg: String, gd: String) = {
      val exact = grp(sg, gd, "i8", s"lower(element_at($sg, i8).v) = '$ag'")
      val star = grp(sg, gd, "i7", s"element_at($sg, i7).v = '*'")
      s"IF(size($exact) > 0, $exact, $star)"
    }
    // digits-only is the parseability test — NEVER a bare try_cast:
    // DuckDB TRY_CAST('10.5' AS BIGINT) ROUNDS to 11 where Spark's
    // returns NULL (measured — the engines disagree on decimal
    // strings). The try_cast after the digit gate only catches
    // overflow-length digit runs (NULL in both engines).
    def delays(sg: String, gd: String, sl: String) =
      s"""filter(transform(filter(${idx(sg)}, i6 ->
         |  element_at($sg, i6).k = 'crawl-delay' AND
         |  array_contains($sl, element_at($gd, i6))),
         |  i6 -> element_at($sg, i6).v),
         |  d0 -> d0 rlike '^[0-9]+$$'
         |        AND try_cast(d0 AS BIGINT) IS NOT NULL)""".stripMargin
    // try_element_at: a host with no parseable delay has an EMPTY
    // filtered list — ANSI element_at throws there (the pinned
    // windows-transform trap), NULL is the wanted no-row signal.
    val full =
      s"""try_cast(element_at(transform(array($sig), sg ->
         |  element_at(transform(array(${gid("sg")}), gd ->
         |    element_at(transform(array(${sel("sg", "gd")}), sl ->
         |      try_element_at(${delays("sg", "gd", "sl")}, 1)), 1)), 1)), 1)
         |AS BIGINT)""".stripMargin
    df.filter(col(bodyCol).isNotNull)
      .withColumn("delay_s", expr(full))
      .filter(col("delay_s").isNotNull)
      .select(col(hostCol).as("host"), col("delay_s"))
  }

  /** DuckDB twin of [[parseCrawlDelay]] over a relation `src` exposing
    * (host, body) — ends in CTE `<pre>d(host, delay_s)`. Same
    * `range`-exclusive `+ 1` discipline as [[duckRobotsParseCtes]]. */
  def duckCrawlDelayCtes(src: String, pre: String, agent: String): String = {
    val ag = agent.toLowerCase.replace("'", "''")
    s"""${pre}s AS (SELECT host,
       |    list_filter(list_transform(string_split(body, chr(10)),
       |      l0 -> struct_pack(
       |        k := lower(trim(split_part(split_part(replace(l0, chr(13), ''), '#', 1), ':', 1))),
       |        v := trim(substring(split_part(replace(l0, chr(13), ''), '#', 1),
       |               instr(split_part(replace(l0, chr(13), ''), '#', 1), ':') + 1)),
       |        c := instr(split_part(replace(l0, chr(13), ''), '#', 1), ':'))),
       |      s0 -> s0.c > 0 AND s0.k IN ('user-agent', 'crawl-delay')) AS sig
       |  FROM $src),
       |${pre}g AS (SELECT host, sig,
       |    list_transform(range(1, len(sig) + 1), i9 -> len(list_filter(range(1, i9 + 1),
       |      j9 -> sig[j9].k = 'user-agent' AND
       |            (j9 = 1 OR sig[j9 - 1].k != 'user-agent')))) AS gid
       |  FROM ${pre}s),
       |${pre}e AS (SELECT host, sig, gid,
       |    list_distinct(list_transform(list_filter(range(1, len(sig) + 1),
       |      i8 -> sig[i8].k = 'user-agent' AND lower(sig[i8].v) = '$ag'),
       |      i8 -> gid[i8])) AS exact,
       |    list_distinct(list_transform(list_filter(range(1, len(sig) + 1),
       |      i7 -> sig[i7].k = 'user-agent' AND sig[i7].v = '*'),
       |      i7 -> gid[i7])) AS star
       |  FROM ${pre}g),
       |${pre}u AS (SELECT host,
       |    list_filter(list_transform(list_filter(range(1, len(sig) + 1),
       |      i6 -> sig[i6].k = 'crawl-delay' AND
       |            list_contains(CASE WHEN len(exact) > 0 THEN exact ELSE star END, gid[i6])),
       |      i6 -> sig[i6].v),
       |      d0 -> regexp_matches(d0, '^[0-9]+$$')
       |            AND TRY_CAST(d0 AS BIGINT) IS NOT NULL) AS dl
       |  FROM ${pre}e),
       |${pre}d AS (SELECT host, CAST(dl[1] AS BIGINT) AS delay_s
       |  FROM ${pre}u WHERE len(dl) > 0)""".stripMargin
  }

  /** Per-host POLITENESS SCHEDULING of a fetch batch — what
    * crawl-delay exists for: each url gets a dispatch slot offset
    * (seconds from the host's first request) so the fetcher never
    * exceeds one request per `delay_s` seconds per host. `delays` is
    * the (host, delay_s) relation ([[parseCrawlDelay]] output or any
    * loaded policy — broadcast, deployment-artifact-sized by
    * contract); hosts without a row use `defaultDelayS`. Urls
    * canonicalize first (the host key must match the delay relation's
    * canonical hosts); duplicates collapse. Within a host, dispatch
    * order is canonical-url sort (deterministic); slot = rank ·
    * delay.
    *
    * Plan: one broadcast LEFT join + ONE shuffle on host; per-host
    * url lists ride a sorted `collect_list` + posexplode — bounded by
    * the frontier's per-domain cap (the [[capPerDomain]] /
    * FrontierIngest quota contract: a fetch batch carries at most
    * cap urls per host), so no window over raw rows and no unbounded
    * group state.
    *
    * Output: (host, url, delay_s, slot_s). */
  def scheduleFetches(df: DataFrame, urlCol: String, delays: DataFrame,
                      defaultDelayS: Long): DataFrame = {
    val canon = withCanonicalUrl(df, urlCol, "__cu")
      .select(col("__cu_host").as("host"), col("__cu").as("url"))
      .distinct()
    canon
      .join(broadcast(delays.select(col("host"),
        col("delay_s").cast("long").as("__dly"))), Seq("host"), "left")
      .groupBy(col("host"),
        coalesce(col("__dly"), lit(defaultDelayS)).as("delay_s"))
      .agg(sort_array(collect_list(col("url"))).as("__us"))
      .select(col("host"), col("delay_s"),
        posexplode(col("__us")).as(Seq("__p", "url")))
      .select(col("host"), col("url"), col("delay_s"),
        (col("__p") * col("delay_s")).cast("long").as("slot_s"))
  }

  /** CRAWL-TRAP detection — the per-host URL-space explosion guard
    * every real crawler needs (calendar pages, session-id paths,
    * faceted-search permutations: hosts that mint unbounded DISTINCT
    * urls over a bounded content set, silently eating the fetch
    * budget). Score = distinct canonical urls per distinct content
    * digest, ×100 exact integer: a healthy host reads 100; a host
    * serving every page under k spellings the canonicalizer can't
    * collapse reads ~k·100. Tracking-param traps (`?utm_…`) read 100
    * — [[withCanonicalUrl]] already collapses those, which is exactly
    * the division of labor: canonicalization kills the KNOWN
    * dup-spelling classes, the trap score surfaces the unknown ones.
    *
    * Plan (no multi-distinct Expand): a url resolves to exactly ONE
    * fetch, so distinct urls PARTITION by digest — two cascaded
    * hash aggregates (host+digest → distinct urls; host → sum +
    * count), each a single-distinct two-phase agg; text never rides
    * past the first projection (digest immediately).
    *
    * Output: (host, n_urls, n_content, urls_per_content_x100).
    * Gate usage: broadcast the over-threshold hosts, LEFT ANTI the
    * frontier (the [[capPerDomain]] discipline). */
  def trapScores(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    withCanonicalUrl(df, urlCol, "__tw")
      .select(col("__tw_host").as("host"), col("__tw").as("__u"),
        md5(col(textCol)).as("__dg"))
      .groupBy(col("host"), col("__dg"))
      .agg(countDistinct(col("__u")).as("__nu"))
      .groupBy(col("host"))
      .agg(sum(col("__nu")).cast("long").as("n_urls"),
        count(lit(1)).as("n_content"))
      .select(col("host"), col("n_urls"), col("n_content"),
        expr("n_urls * 100 div n_content").as("urls_per_content_x100"))

  /** One `<url>…</url>` entry of a sitemaps.org sitemap. */
  val SitemapEntryPattern: String = "(?is)<url>.*?</url>"

  /** One `<sitemap>…</sitemap>` entry of a sitemaps.org INDEX file. */
  val SitemapIndexEntryPattern: String = "(?is)<sitemap>.*?</sitemap>"

  /** The `<loc>` / `<lastmod>` values inside an entry — `[^<]*` keeps
    * the match inside the element (XML forbids a raw `<` in content). */
  val SitemapLocPattern: String = "(?is)<loc>([^<]*)</loc>"
  val SitemapLastmodPattern: String = "(?is)<lastmod>([^<]*)</lastmod>"

  /** sitemap.xml URL extraction (the sitemaps.org protocol, pinned
    * subset) — the crawl-SEEDING source beside link discovery: one row
    * per `<url>` entry, `(doc_id, pos, loc, lastmod)` in document
    * order. `loc` runs the [[Html.visibleSql]] entity decode (the
    * protocol REQUIRES `&` in URLs escaped as `&amp;` — decode is
    * load-bearing, exactly as for hrefs); `lastmod` is `''` when
    * absent (the no-match `regexp_extract` convention). Entries
    * without a `<loc>` surface with `loc = ''` — a protocol violation
    * the caller filters, never a silent drop. Feed the output through
    * [[withCanonicalUrl]] and the frontier's seen-probe like any other
    * discovery. Gzip'd sitemaps (`sitemap.xml.gz`) decompress at the
    * source layer (the [[graft.sources.Warc]]/Jsonl discipline), not
    * here. One codegen projection + posexplode — no shuffle, no UDF. */
  def extractSitemapUrls(df: DataFrame, idCol: String,
                         xmlCol: String): DataFrame =
    sitemapEntries(df, idCol, xmlCol, SitemapEntryPattern)

  /** `<sitemapindex>` extraction — the OTHER sitemaps.org file shape:
    * the protocol caps a sitemap at 50k URLs, so every large site
    * publishes an INDEX of `<sitemap><loc>…</loc></sitemap>` entries
    * pointing at child sitemaps, and real seeding hits the index
    * shape FIRST. Same pinned subset as [[extractSitemapUrls]] (entity
    * decode on loc, `''` lastmod/loc conventions); recursion is
    * by COMPOSITION — extract child locs, canonicalize, fetch, run
    * the urlset pass (one level per fetch round, exactly like link
    * discovery; the protocol forbids index-of-index nesting). */
  def extractSitemapIndex(df: DataFrame, idCol: String,
                          xmlCol: String): DataFrame =
    sitemapEntries(df, idCol, xmlCol, SitemapIndexEntryPattern)

  private def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String,
                             entryPattern: String): DataFrame =
    df.filter(col(xmlCol).isNotNull)
      .withColumn("__sm", expr(
        s"regexp_extract_all($xmlCol, '$entryPattern', 0)"))
      .withColumn("__sv", expr(
        s"transform(__sm, mm -> named_struct(" +
          s"'loc', ${graft.operators.Html.visibleSql(
            s"regexp_extract(mm, '$SitemapLocPattern', 1)", duck = false)}, " +
          s"'lastmod', regexp_extract(mm, '$SitemapLastmodPattern', 1)))"))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(col("__sv")).as(Seq("__p", "__s")))
      .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
        col("__s.loc").as("loc"), col("__s.lastmod").as("lastmod"))

  /** DuckDB twin of [[extractSitemapUrls]] over a relation exposing
    * (doc_id, x) named `__sitemap_src`: (doc_id, pos, loc, lastmod),
    * zip-unnested. */
  def duckSitemapItems(x: String): String =
    duckSitemapEntryItems(x, SitemapEntryPattern, "__sitemap_src")

  /** DuckDB twin of [[extractSitemapIndex]] over a relation exposing
    * (doc_id, x) named `src`. */
  def duckSitemapIndexItems(x: String, src: String): String =
    duckSitemapEntryItems(x, SitemapIndexEntryPattern, src)

  private def duckSitemapEntryItems(x: String, entryPattern: String,
                                    src: String): String = {
    val ex = s"regexp_extract_all($x, '$entryPattern')"
    val locOf = graft.operators.Html.visibleSql(
      s"regexp_extract(mm, '$SitemapLocPattern', 1)", duck = true)
    val lmOf = s"regexp_extract(mm, '$SitemapLastmodPattern', 1)"
    s"""SELECT doc_id,
       |       unnest(range(1, len(ll) + 1)) AS pos,
       |       unnest(ll) AS loc,
       |       unnest(ml) AS lastmod
       |FROM (SELECT doc_id,
       |        list_transform(sm, mm -> $locOf) AS ll,
       |        list_transform(sm, mm -> $lmOf) AS ml
       |      FROM (SELECT doc_id, $ex AS sm FROM $src))""".stripMargin
  }

  /** SQL for DOT-SEGMENT removal over a PATH expr (no query string) —
    * RFC 3986 §5.2.4 restated as a pinned bounded regex chain that is
    * identical in both engines (the Html-chain discipline: no
    * lookarounds, global replace per pass, fixed pass count):
    *  - `/./` collapses (4 passes + a final `/.$`);
    *  - `/<segment>/../` collapses (8 passes + a final
    *    `/<segment>/..$`) — leftmost-nonoverlapping global replace
    *    resolves one NESTING level per pass, so ≤ 8 levels of `..`
    *    normalize (deeper chains survive verbatim — the bounded
    *    contract, stated);
    *  - leading `/../` clamps at the root (2 passes; RFC: remove).
    * `.`/`..` as literal directory names are indistinguishable from
    * traversal by design (web servers treat them as traversal). */
  def dotNormSql(x: String, duck: Boolean): String = {
    def r(e: String, p: String, rep: String) =
      if (duck) s"regexp_replace($e, '$p', '$rep', 'g')"
      else s"regexp_replace($e, '$p', '$rep')"
    // patterns spell '.' as the class [.] — NO backslashes anywhere
    // (Spark SQL string literals process backslash escapes, DuckDB's
    // don't; a class is identical text in both). These are PLAIN (not
    // s-interpolated) literals, so the end anchor is a single `$` —
    // resolveRefSql's interpolated strings need `$$` for the same
    // character; converting either form later must keep the emitted
    // pattern text identical.
    var e = x
    for (_ <- 1 to 4) e = r(e, "/[.]/", "/")
    e = r(e, "/[.]$", "/")
    for (_ <- 1 to 8) e = r(e, "/[^/]+/[.][.]/", "/")
    e = r(e, "/[^/]+/[.][.]$", "/")
    for (_ <- 1 to 2) e = r(e, "^/[.][.]/", "/")
    r(e, "^/[.][.]$", "/")
  }

  /** SQL resolving an href expr `h` against its page's canonical
    * `scheme`, `host`, and `path` exprs (RFC 3986 §5, the pinned
    * subset) — NULL for out-of-scope refs:
    *  - absolute `http(s)://…` pass verbatim;
    *  - protocol-relative `//…` takes the page scheme;
    *  - any OTHER scheme (`mailto:`, `javascript:`, `tel:` — a
    *    letter-led token before `:` ahead of any `/`) → NULL;
    *  - empty and fragment-only (`#…`) hrefs → NULL;
    *  - root-relative `/…` joins scheme://host;
    *  - everything else is PATH-RELATIVE: merged against the page's
    *    base directory (path up to its last `/`; an empty page path
    *    acts as `/`).
    * Dot segments in the PATH part normalize via [[dotNormSql]] (the
    * query part, after the first `?`, is untouched); fragments and
    * query canonicalization are [[withCanonicalUrl]]'s job
    * downstream. */
  def resolveRefSql(h: String, scheme: String, host: String, path: String,
                    duck: Boolean): String = {
    val baseDir =
      if (duck) s"regexp_replace(CASE WHEN $path = '' THEN '/' ELSE $path END, '[^/]*$$', '')"
      else s"regexp_replace(CASE WHEN $path = '' THEN '/' ELSE $path END, '[^/]*$$', '')"
    def norm(p: String) = {
      val ps = s"split_part($p, '?', 1)"
      val qs =
        if (duck) s"CASE WHEN strpos($p, '?') > 0 THEN '?' || split_part($p, '?', 2) ELSE '' END"
        else s"CASE WHEN instr($p, '?') > 0 THEN concat('?', split_part($p, '?', 2)) ELSE '' END"
      s"(${dotNormSql(ps, duck)} || $qs)"
    }
    val cat = (a: String, b: String) =>
      if (duck) s"($a || $b)" else s"concat($a, $b)"
    s"""CASE
       |  WHEN $h LIKE 'http://%' OR $h LIKE 'https://%' THEN $h
       |  WHEN $h LIKE '//%' THEN ${cat(s"($scheme || ':')", h)}
       |  WHEN $h = '' OR $h LIKE '#%' THEN NULL
       |  WHEN regexp_extract($h, '^[a-zA-Z][a-zA-Z0-9+.-]*:', 0) <> '' THEN NULL
       |  WHEN $h LIKE '/%' THEN
       |    ${cat(s"($scheme || '://' || $host)", norm(h))}
       |  ELSE ${cat(s"($scheme || '://' || $host)", norm(s"($baseDir || $h)"))}
       |END""".stripMargin
  }

  /** DuckDB twin of [[withCanonicalUrl]] as chained CTEs over an input
    * relation `src` exposing a `url` column plus the pass-through
    * columns in `carry` — ends in CTE `<pre>c(carry…, host, canonical)`.
    * CTE names are prefixed with `pre` so two chains (e.g. page URLs
    * and extracted hrefs) compose in one WITH. Each CTE replays one
    * pinned rule 1:1 (the duckUrlCtes shape, parameterized). */
  def duckCanonicalCtes(src: String, carry: Seq[String], pre: String): String = {
    val cc = carry.map(_ + ", ").mkString
    s"""${pre}1 AS (SELECT ${cc}url, lower(split_part(url, '://', 1)) AS scheme,
       |              substr(url, length(split_part(url, '://', 1)) + 4) AS rest
       |       FROM $src),
       |${pre}2 AS (SELECT *, split_part(rest, '#', 1) AS nofrag FROM ${pre}1),
       |${pre}3 AS (SELECT *, split_part(split_part(nofrag, '?', 1), '/', 1) AS hostport
       |       FROM ${pre}2),
       |${pre}4 AS (SELECT *,
       |         CASE WHEN scheme = 'http' AND lower(hostport) LIKE '%:80'
       |                THEN substr(lower(hostport), 1, length(hostport) - 3)
       |              WHEN scheme = 'https' AND lower(hostport) LIKE '%:443'
       |                THEN substr(lower(hostport), 1, length(hostport) - 4)
       |              ELSE lower(hostport) END AS host,
       |         substr(nofrag, length(hostport) + 1) AS pq
       |       FROM ${pre}3),
       |${pre}4a AS (SELECT *, ${pctNormSql("pq", duck = true)} AS pqn
       |        FROM ${pre}4),
       |${pre}5 AS (SELECT *, split_part(pqn, '?', 1) AS path0,
       |         CASE WHEN strpos(pqn, '?') > 0 THEN split_part(pqn, '?', 2)
       |              ELSE '' END AS rawq
       |       FROM ${pre}4a),
       |${pre}6 AS (SELECT *,
       |         CASE WHEN path0 LIKE '%/'
       |                THEN substr(path0, 1, length(path0) - 1)
       |              ELSE path0 END AS path,
       |         COALESCE(array_to_string(list_sort(list_filter(
       |           string_split(rawq, '&'),
       |           p -> p <> '' AND NOT starts_with(p, 'utm_')
       |                AND NOT split_part(p, '=', 1) IN
       |                  ${TrackingParams.map(t => s"'$t'").mkString("(", ", ", ")")})),
       |           '&'), '') AS q
       |       FROM ${pre}5),
       |${pre}c AS (SELECT ${cc}host, path,
       |         scheme || '://' || host || path ||
       |           CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical
       |       FROM ${pre}6)""".stripMargin
  }

  /** Cap documents per registrable domain: canonicalize, extract the
    * domain, keep the `cap` smallest id-hashes per domain (the
    * deterministic [[Sampling.stratifiedSample]] min-k — window-free,
    * map-side k-heaps). Output: (domain, idCol). */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
                   cap: Int): DataFrame = {
    val withDomain = withRegistrableDomain(
      withCanonicalUrl(df, urlCol, "__w_canon"), "__w_canon_host", "domain")
    Sampling.stratifiedSample(withDomain, "domain", idCol, cap)
  }

  /** [[capPerDomain]] with a loadable PSL (the four-arg
    * [[withRegistrableDomain]]). */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
                   cap: Int, psl: DataFrame): DataFrame = {
    val withDomain = withRegistrableDomain(
      withCanonicalUrl(df, urlCol, "__w_canon"), "__w_canon_host", "domain",
      psl)
    Sampling.stratifiedSample(withDomain, "domain", idCol, cap)
  }
}
