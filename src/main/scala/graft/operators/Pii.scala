package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every published
  * curation pipeline runs between extraction and quality gating (C4
  * strips lines with blocklisted tokens; Dolma and RefinedWeb mask
  * emails / IPs / phone numbers with typed placeholder tokens — this
  * operator restates the mask-with-placeholder form).
  *
  * The whole operator is a pinned chain of regex projections in the
  * RE2 ∩ Java subset (the [[Html]] discipline: no lookarounds, no
  * backreferences, no backslash character classes — every class is
  * spelled explicitly, so the pattern TEXT is identical in Spark SQL
  * and DuckDB), replayed verbatim by the oracle.
  *
  * Pinned contract:
  *  1. classes scrub in a FIXED order — emails, then IPv4, then
  *     phones — and each class COUNTS its matches on the text as
  *     already redacted by the earlier classes, so counts and
  *     replacements always agree (`192.168.1.10` is one IP and zero
  *     phones — the phone pass sees the `<IP>` mask, never the digit
  *     run; digits in an email local part never recount);
  *  2. every match is replaced by its typed placeholder (`<EMAIL>`,
  *     `<IP>`, `<PHONE>`) — the placeholders contain no digits or `@`,
  *     so a later class can never match inside an earlier one's mask;
  *  3. the patterns are the pinned SUBSET below — deliberately the
  *     scrubbing convention, not a validator: IPv4 octets are 1-3
  *     digits with the VALUE range unchecked (version strings like
  *     `1.2.3.4` mask — the published pipelines accept that false
  *     positive), emails are the practical `local@domain.tld` shape,
  *     phones are E.164 (`+` then 8-15 digits) plus the two common
  *     separated NANP spellings;
  *  4. matching is leftmost-nonoverlapping global replace — both
  *     engines' `regexp_replace` semantics, no per-row iteration.
  *
  * Scale: one codegen'd projection per row, no shuffle, no UDF; the
  * counts ride the same projection (`regexp_extract_all` + size).
  */
object Pii {

  /** `local@domain.tld` — local part from the practical character set,
    * domain labels of letters/digits/dots/hyphens, a literal dot, then
    * a 2-6 letter TLD. `-` sits LAST in each class (literal in both
    * engines without a backslash). */
  val EmailPattern: String =
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,6}"

  /** Dotted quad of 1-3 digit octets — value range unchecked (pinned
    * contract #3). No word anchors: `\b` is a backslash escape the
    * cross-engine literal discipline forbids, and the scrub convention
    * prefers over-masking digits-adjacent quads anyway. */
  val Ipv4Pattern: String =
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** E.164 (`+` then 8-15 digits) | `(NNN) NNN-NNNN` | `NNN-NNN-NNNN`.
    * Runs AFTER the IPv4 pass, so a dotted quad can never leave a
    * digit run for this class to claim. */
  val PhonePattern: String =
    "[+][0-9]{8,15}|[(][0-9]{3}[)] [0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** The (pattern, placeholder) chain in its pinned order. */
  val Classes: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    Ipv4Pattern -> "<IP>",
    PhonePattern -> "<PHONE>")

  private def rre(duck: Boolean)(x: String, p: String, r: String): String =
    if (duck) s"regexp_replace($x, '$p', '$r', 'g')"
    else s"regexp_replace($x, '$p', '$r')"

  private def cnt(duck: Boolean)(x: String, p: String): String =
    if (duck) s"CAST(len(regexp_extract_all($x, '$p')) AS BIGINT)"
    else s"CAST(size(regexp_extract_all($x, '$p', 0)) AS BIGINT)"

  /** SQL for the fully redacted text of expr `x` — the three passes
    * chained in pinned order, identical pattern text in both engines. */
  def redactSql(x: String, duck: Boolean): String =
    Classes.foldLeft(x) { case (e, (p, t)) => rre(duck)(e, p, t) }

  /** SQL for (redacted, n_email, n_ip, n_phone) as a 4-element tuple of
    * (select-list) expressions, each standalone — counts taken on the
    * text as redacted by the EARLIER classes (pinned contract #1). */
  def itemsSql(x: String, duck: Boolean): (String, String, String, String) = {
    val r = rre(duck) _
    val afterEmail = r(x, EmailPattern, "<EMAIL>")
    val afterIp = r(afterEmail, Ipv4Pattern, "<IP>")
    val afterPhone = r(afterIp, PhonePattern, "<PHONE>")
    (afterPhone,
      cnt(duck)(x, EmailPattern),
      cnt(duck)(afterEmail, Ipv4Pattern),
      cnt(duck)(afterIp, PhonePattern))
  }

  /** Adds `<out>` (redacted text), `n_email`, `n_ip`, `n_phone` to
    * `df` — one codegen'd projection, no shuffle. */
  def withRedacted(df: DataFrame, textCol: String,
                   out: String = "redacted"): DataFrame = {
    val (red, ne, ni, np) = itemsSql(textCol, duck = false)
    df.withColumn(out, expr(red))
      .withColumn("n_email", expr(ne))
      .withColumn("n_ip", expr(ni))
      .withColumn("n_phone", expr(np))
  }
}
