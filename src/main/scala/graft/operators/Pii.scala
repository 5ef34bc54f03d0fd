package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every published
  * curation pipeline runs between extraction and quality gating (C4
  * strips lines with blocklisted tokens; Dolma and RefinedWeb mask
  * emails / IPs / phone numbers with typed placeholder tokens — this
  * operator restates the mask-with-placeholder form, extended with the
  * IPv6 and payment-card classes a Dolma-class scrub carries).
  *
  * The whole operator is a pinned chain of regex projections in the
  * RE2 ∩ Java subset (the [[Html]] discipline: no lookarounds, no
  * backreferences, no backslash character classes — every class is
  * spelled explicitly, so the pattern TEXT is identical in Spark SQL
  * and DuckDB), replayed verbatim by the oracle.
  *
  * Pinned contract:
  *  1. classes scrub in a FIXED order — emails, IPv4, IPv6, payment
  *     cards, then phones — and each class COUNTS its matches on the
  *     text as already redacted by the earlier classes, so counts and
  *     replacements always agree (`192.168.1.10` is one IPv4 and zero
  *     phones — the phone pass sees the `<IP>` mask, never the digit
  *     run; a separated card number never leaves digit groups for the
  *     phone class; digits in an email local part never recount);
  *  2. every match is replaced by its typed placeholder (`<EMAIL>`,
  *     `<IP>`, `<IPSIX>`, `<CARD>`, `<PHONE>`) — placeholders contain
  *     NO digits or `@` (hence `<IPSIX>`, not `<IPV6>`: a trailing
  *     placeholder digit could bridge into adjacent digit runs and
  *     feed a later class), so a later class can never match inside
  *     an earlier one's mask;
  *  3. the patterns are the pinned SUBSET below — deliberately the
  *     scrubbing convention, not a validator: IPv4 octets are 1-3
  *     digits with the VALUE range unchecked (version strings like
  *     `1.2.3.4` mask — the published pipelines accept that false
  *     positive); emails are the practical `local@domain.tld` shape;
  *     IPv6 is the full 8-group form plus the `::`-compressed form
  *     with at least one leading group (`::1` does NOT mask — stated;
  *     hex words around a literal `::` may over-mask — the scrub
  *     stance); cards are 16 digits bare or in four `[- ]`-separated
  *     quads, NO Luhn check (over-masks inside longer digit runs —
  *     stated); phones are E.164 (`+` then 8-15 digits) plus the two
  *     common separated NANP spellings;
  *  4. matching is leftmost-nonoverlapping global replace with
  *     leftmost-FIRST alternation — both engines' `regexp_replace`
  *     semantics (Java regex and RE2 agree on this subset), no
  *     per-row iteration.
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

  /** Full 8-group IPv6 (tried FIRST — leftmost-first alternation) or
    * the `::`-compressed form with ≥1 leading group. Runs AFTER IPv4,
    * so an IPv4-mapped tail (`::ffff:1.2.3.4`) has its quad already
    * masked (the residue `::ffff:<IP>` is left as-is — stated). */
  val Ipv6Pattern: String =
    "[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4}){7}" +
      "|[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4}){0,6}" +
      "::([0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4}){0,6})?"

  /** 16-digit payment card: four quads separated by `-` or space, or
    * bare. No Luhn, no 15-digit Amex (pinned subset — stated). Runs
    * BEFORE phones so a separated card never leaves digit groups for
    * the NANP patterns to claim. */
  val CardPattern: String =
    "[0-9]{4}([- ][0-9]{4}){3}|[0-9]{16}"

  /** E.164 (`+` then 8-15 digits) | `(NNN) NNN-NNNN` | `NNN-NNN-NNNN`.
    * Runs LAST: dotted quads, card quads, and hex groups are already
    * masked, so no earlier class's digits can seed a phone match. */
  val PhonePattern: String =
    "[+][0-9]{8,15}|[(][0-9]{3}[)] [0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** The (pattern, placeholder, count column) chain in its pinned
    * order. */
  val Classes: Seq[(String, String, String)] = Seq(
    (EmailPattern, "<EMAIL>", "n_email"),
    (Ipv4Pattern, "<IP>", "n_ip"),
    (Ipv6Pattern, "<IPSIX>", "n_ipv6"),
    (CardPattern, "<CARD>", "n_card"),
    (PhonePattern, "<PHONE>", "n_phone"))

  private def rre(duck: Boolean)(x: String, p: String, r: String): String =
    if (duck) s"regexp_replace($x, '$p', '$r', 'g')"
    else s"regexp_replace($x, '$p', '$r')"

  private def cnt(duck: Boolean)(x: String, p: String): String =
    if (duck) s"CAST(len(regexp_extract_all($x, '$p')) AS BIGINT)"
    else s"CAST(size(regexp_extract_all($x, '$p', 0)) AS BIGINT)"

  /** SQL for the fully redacted text of expr `x` — the five passes
    * chained in pinned order, identical pattern text in both engines. */
  def redactSql(x: String, duck: Boolean): String =
    Classes.foldLeft(x) { case (e, (p, t, _)) => rre(duck)(e, p, t) }

  /** SQL for (redacted, per-class counts) — `counts(i)` is class i's
    * count expr taken on the text as redacted by the EARLIER classes
    * (pinned contract #1), in [[Classes]] order. Each item is a
    * standalone select-list expression. */
  def itemsSql(x: String, duck: Boolean): (String, Seq[String]) = {
    val stages = Classes.scanLeft(x) { case (e, (p, t, _)) =>
      rre(duck)(e, p, t)
    }
    val counts = Classes.zipWithIndex.map { case ((p, _, _), i) =>
      cnt(duck)(stages(i), p)
    }
    (stages.last, counts)
  }

  /** SQL summing every class count — the `n_pii` convenience. */
  def totalSql(x: String, duck: Boolean): String =
    itemsSql(x, duck)._2.mkString("(", " + ", ")")

  /** Adds `<out>` (redacted text) and the per-class count columns
    * (`n_email`, `n_ip`, `n_ipv6`, `n_card`, `n_phone`) to `df` — one
    * codegen'd projection, no shuffle. */
  def withRedacted(df: DataFrame, textCol: String,
                   out: String = "redacted"): DataFrame = {
    val (red, counts) = itemsSql(textCol, duck = false)
    Classes.map(_._3).zip(counts).foldLeft(df.withColumn(out, expr(red))) {
      case (acc, (name, c)) => acc.withColumn(name, expr(c))
    }
  }
}
