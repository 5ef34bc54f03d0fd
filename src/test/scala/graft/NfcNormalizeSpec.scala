package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Semantics of the native `nfc_normalize` expression (UAX #15 canonical
  * composition). The registry query x_text_normalize proves the
  * cross-engine byte agreement; these pin the expression's own contract.
  * Decomposed/precomposed forms are written as explicit escapes — source
  * literals would be ambiguous to the eye. */
class NfcNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val decomposed = "cafe\u0301"            // e + combining acute
  private val precomposed = "caf\u00e9"            // precomposed e-acute
  private val decomposed2 = "A\u030angstro\u0308m" // A + ring, o + diaeresis
  private val precomposed2 = "\u00c5ngstr\u00f6m"  // precomposed A-ring, o-umlaut

  private def nfc(s: String): String = {
    GraftFunctions.ensureRegistered(spark)
    Seq(s).toDF("t").select(expr("nfc_normalize(t)")).head().getString(0)
  }

  test("composes decomposed sequences to their precomposed forms") {
    assert(decomposed != precomposed) // the fixture itself is load-bearing
    assert(nfc(decomposed) == precomposed)
    assert(nfc(decomposed2) == precomposed2)
  }

  test("idempotent, identity on ASCII and on already-NFC text") {
    assert(nfc("plain ascii text") == "plain ascii text")
    assert(nfc(precomposed) == precomposed)
    assert(nfc(nfc(decomposed)) == precomposed)
    assert(nfc("") == "")
  }

  test("null passes through; digests converge after normalization") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((decomposed, precomposed))
      .toDF("dec", "pre")
      .select(
        expr("nfc_normalize(CAST(NULL AS STRING))").as("n"),
        expr("md5(dec) <> md5(pre)").as("apart"),
        expr("md5(nfc_normalize(dec)) = md5(pre)").as("converged"))
      .head()
    assert(r.isNullAt(0))
    assert(r.getBoolean(1), "decomposed/precomposed should hash apart raw")
    assert(r.getBoolean(2), "digests must converge after NFC")
  }

  test("interpreted eval agrees with codegen") {
    GraftFunctions.ensureRegistered(spark)
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
    assert(e.eval(null).toString == precomposed)
  }
}
