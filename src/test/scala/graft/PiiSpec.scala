package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** PII redaction (graft.operators.Pii) — pins the contract on a-priori
  * cases: the pinned class order (emails → IPv4 → IPv6 → cards →
  * phones), counts taken on the partially-redacted text, placeholders
  * immune to later classes, and the documented false-positive
  * convention (version-like dotted quads mask; value range unchecked;
  * no Luhn check on cards). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(t: String): (String, Long, Long, Long, Long, Long) =
    Pii.withRedacted(Seq(t).toDF("t"), "t")
      .select(col("redacted"), col("n_email"), col("n_ip"), col("n_ipv6"),
        col("n_card"), col("n_phone"))
      .as[(String, Long, Long, Long, Long, Long)].head()

  test("pii: every class, all three phone spellings, pinned counts") {
    val t = "write bob.smith+x@mail-site3.com or ADMIN@X.CO, " +
      "ping 10.2.0.77 and 999.1.2.3, call +14155550123 or " +
      "(415) 555-0123 or 415-555-0123; v1.2.3.4 stays? user@1.2.3.4 odd"
    val (red, ne, ni, n6, nc, np) = redactOne(t)
    // the a-priori expectation (also DuckDB-verified by x_pii_redact):
    // ADMIN@X.CO has a 2-letter TLD and matches; user@1.2.3.4 has a
    // digit TLD and is NOT an email — its quad masks as an IP; the
    // version-like v1.2.3.4 masks too (pinned convention).
    assert(red == "write <EMAIL> or <EMAIL>, ping <IP> and <IP>, " +
      "call <PHONE> or <PHONE> or <PHONE>; v<IP> stays? user@<IP> odd")
    assert((ne, ni, n6, nc, np) == ((2L, 4L, 0L, 0L, 3L)))
  }

  test("pii: IPv6 — full 8-group and ::-compressed forms; ::1 excluded by the pinned subset") {
    val (red, _, _, n6, _, _) = redactOne(
      "node fe80:0:0:0:202:b3ff:fe1e:8329 or 2001:db8::ff00:42 " +
        "but loopback ::1 stays and plain words too")
    assert(red == "node <IPSIX> or <IPSIX> " +
      "but loopback ::1 stays and plain words too", red)
    assert(n6 == 2L)
  }

  test("pii: cards — bare / hyphenated / space-separated 16-digit; separated quads never become phones") {
    val (red, _, _, _, nc, np) = redactOne(
      "pay 4111111111111111 or 4111-1111-1111-1234 or 4111 1111 1111 9999 now")
    // cards run BEFORE phones: the hyphenated quads are masked before
    // the NANP patterns could see any digit groups.
    assert(red == "pay <CARD> or <CARD> or <CARD> now", red)
    assert((nc, np) == ((3L, 0L)))
    // 15 digits (Amex length) are outside the pinned subset — stated.
    val (r15, _, _, _, c15, _) = redactOne("id 411111111111111 x")
    assert(r15 == "id 411111111111111 x" && c15 == 0L)
  }

  test("pii: counts see earlier masks, never double-count") {
    // the IP count runs on email-redacted text: the quad inside the
    // email never counts as an IP; the phone count runs on IP-redacted
    // text: a dotted quad never leaves digits for the phone class.
    val (red, ne, ni, _, _, np) = redactOne("a@b.co 1.2.3.4 c")
    assert(red == "<EMAIL> <IP> c" && ne == 1L && ni == 1L && np == 0L)
    val (r2, e2, i2, _, _, p2) = redactOne("+123456789012 and 255-255-255-255")
    // 255-255-255-255 never matches the NANP form: every start offset
    // hits a hyphen where the pattern requires the 4-digit tail
    // (DuckDB-verified; the two engines' leftmost semantics agree).
    assert(r2 == "<PHONE> and 255-255-255-255" &&
      e2 == 0L && i2 == 0L && p2 == 1L)
    // an IPv4-mapped IPv6 tail: the quad masks FIRST (IPv4 < IPv6 in
    // the order), the hex groups then mask around it — the compressed
    // form needs a leading group, so '::ffff:<IP>' keeps its residue
    // (stated subset) while a grouped spelling masks.
    val (r3, _, i3, s3, _, _) = redactOne("at 64:ff9b::1.2.3.4 gw")
    assert(r3 == "at <IPSIX><IP> gw", r3)
    assert((i3, s3) == ((1L, 1L)))
  }

  test("pii: clean text passes through untouched, zero counts") {
    val (red, ne, ni, n6, nc, np) =
      redactOne("plain words only, 7 digits 1234567 and x.y dots")
    assert(red == "plain words only, 7 digits 1234567 and x.y dots")
    assert((ne, ni, n6, nc, np) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("pii: E.164 bounds — 8 digits match, 7 do not") {
    val (r8, _, _, _, _, p8) = redactOne("+12345678")
    assert(r8 == "<PHONE>" && p8 == 1L)
    val (r7, _, _, _, _, p7) = redactOne("+1234567")
    assert(r7 == "+1234567" && p7 == 0L)
  }

  test("pii: redaction is idempotent (placeholders never re-match)") {
    // the property the pipeline splice relies on: re-running the scrub
    // over already-redacted text is the identity (placeholders carry
    // no digits or '@' — hence <IPSIX>, never <IPV6>: a placeholder
    // digit could bridge into adjacent digit runs and seed the card
    // class), so a double-applied stage can never corrupt.
    val texts = Seq(
      "write bob@x.example.com ping 10.2.0.77 call +14155550123",
      "mixed <EMAIL> with eve@y.org and 415-555-0123 plus <IP>",
      "node 2001:db8::42 pays 4111-1111-1111-1111 to <CARD> <IPSIX>",
      "clean text with no pii at all")
    texts.foreach { t =>
      val (once, _, _, _, _, _) = redactOne(t)
      val (twice, e2, i2, s2, c2, p2) = redactOne(once)
      assert(twice == once, s"not idempotent on: $t")
      assert((e2, i2, s2, c2, p2) == ((0L, 0L, 0L, 0L, 0L)),
        s"second pass must count nothing on: $once")
    }
  }
}
