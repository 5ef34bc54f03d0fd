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
  *  - tracking parameters are dropped (`utm_*` prefixes and the
  *    literal names below), remaining query params are SORTED (param
  *    order is almost never significant; sorting makes `?a=1&b=2` ≡
  *    `?b=2&a=1`), and an emptied query drops its `?`;
  *  - inputs must contain `://` and at most one `?` (crawler URLs do;
  *    anything stranger passes through the split rules verbatim —
  *    deterministic, just not specially handled).
  */
object Web {

  /** Query parameters dropped by canonicalization: anything whose name
    * starts with `utm_`, plus these exact names. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")

  /** Multi-label public suffixes the registrable-domain rule knows —
    * deliberately a SMALL pinned set (the full PSL is a versioned
    * artifact a deployment loads the same way the tokenizer vocabs
    * are); suffixes here take three labels, everything else two. */
  val MultiSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br")

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
      .withColumn("__w_path0", expr("split_part(__w_pq, '?', 1)"))
      .withColumn("__w_path", expr(
        """CASE WHEN __w_path0 LIKE '%/'
          |       THEN substring(__w_path0, 1, length(__w_path0) - 1)
          |     ELSE __w_path0 END""".stripMargin))
      .withColumn("__w_q", expr(
        s"""array_join(array_sort(filter(
           |  split(CASE WHEN instr(__w_pq, '?') > 0
           |             THEN split_part(__w_pq, '?', 2) ELSE '' END, '&'),
           |  p -> p != '' AND NOT startswith(p, 'utm_')
           |       AND NOT split_part(p, '=', 1) IN $tracking)), '&')""".stripMargin))
      .withColumn(outCol, expr(
        s"""concat(__w_scheme, '://', ${outCol}_host, __w_path,
           |  CASE WHEN __w_q = '' THEN '' ELSE concat('?', __w_q) END)""".stripMargin))
      .drop("__w_scheme", "__w_rest", "__w_nofrag", "__w_hostport",
        "__w_pq", "__w_path0", "__w_path", "__w_q")
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
}
