package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** PII redaction (graft.operators.Pii) — pins the contract on a-priori
  * cases: the pinned class order (emails → IPv4 → phones), counts taken
  * on the partially-redacted text, placeholders immune to later
  * classes, and the documented false-positive convention (version-like
  * dotted quads mask; value range unchecked). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(t: String): (String, Long, Long, Long) =
    Pii.withRedacted(Seq(t).toDF("t"), "t")
      .select(col("redacted"), col("n_email"), col("n_ip"), col("n_phone"))
      .as[(String, Long, Long, Long)].head()

  test("pii: every class, all three phone spellings, pinned counts") {
    val t = "write bob.smith+x@mail-site3.com or ADMIN@X.CO, " +
      "ping 10.2.0.77 and 999.1.2.3, call +14155550123 or " +
      "(415) 555-0123 or 415-555-0123; v1.2.3.4 stays? user@1.2.3.4 odd"
    val (red, ne, ni, np) = redactOne(t)
    // the a-priori expectation (also DuckDB-verified by x_pii_redact):
    // ADMIN@X.CO has a 2-letter TLD and matches; user@1.2.3.4 has a
    // digit TLD and is NOT an email — its quad masks as an IP; the
    // version-like v1.2.3.4 masks too (pinned convention).
    assert(red == "write <EMAIL> or <EMAIL>, ping <IP> and <IP>, " +
      "call <PHONE> or <PHONE> or <PHONE>; v<IP> stays? user@<IP> odd")
    assert((ne, ni, np) == (2L, 4L, 3L))
  }

  test("pii: counts see earlier masks, never double-count") {
    // the IP count runs on email-redacted text: the quad inside the
    // email never counts as an IP; the phone count runs on IP-redacted
    // text: a dotted quad never leaves digits for the phone class.
    val (red, ne, ni, np) = redactOne("a@b.co 1.2.3.4 c")
    assert(red == "<EMAIL> <IP> c" && ne == 1L && ni == 1L && np == 0L)
    val (r2, e2, i2, p2) = redactOne("+123456789012 and 255-255-255-255")
    // 255-255-255-255 never matches the NANP form: every start offset
    // hits a hyphen where the pattern requires the 4-digit tail
    // (DuckDB-verified; the two engines' leftmost semantics agree).
    assert(r2 == "<PHONE> and 255-255-255-255" &&
      e2 == 0L && i2 == 0L && p2 == 1L)
  }

  test("pii: clean text passes through untouched, zero counts") {
    val (red, ne, ni, np) =
      redactOne("plain words only, 7 digits 1234567 and x.y dots")
    assert(red == "plain words only, 7 digits 1234567 and x.y dots")
    assert((ne, ni, np) == (0L, 0L, 0L))
  }

  test("pii: E.164 bounds — 8 digits match, 7 do not") {
    val (r8, _, _, p8) = redactOne("+12345678")
    assert(r8 == "<PHONE>" && p8 == 1L)
    val (r7, _, _, p7) = redactOne("+1234567")
    assert(r7 == "+1234567" && p7 == 0L)
  }

  test("pii: redaction is idempotent (placeholders never re-match)") {
    // the property the pipeline splice relies on: re-running the scrub
    // over already-redacted text is the identity (placeholders carry
    // no digits or '@'), so a double-applied stage can never corrupt.
    val texts = Seq(
      "write bob@x.example.com ping 10.2.0.77 call +14155550123",
      "mixed <EMAIL> with eve@y.org and 415-555-0123 plus <IP>",
      "clean text with no pii at all")
    texts.foreach { t =>
      val (once, _, _, _) = redactOne(t)
      val (twice, e2, i2, p2) = redactOne(once)
      assert(twice == once, s"not idempotent on: $t")
      assert((e2, i2, p2) == ((0L, 0L, 0L)),
        s"second pass must count nothing on: $once")
    }
  }
}
