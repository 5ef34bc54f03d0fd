package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — the text-cleaning prerequisite for every
  * digest-keyed operator in the engine: visually-identical strings with
  * different codepoint sequences (precomposed `é` vs `e` + U+0301) hash
  * APART through md5/minhash/simhash unless the corpus is canonicalized
  * first. Spark ships no normalization function; a Scala UDF would pay
  * serialization per row.
  *
  * Cross-engine contract: Unicode canonical composition is fully
  * specified by UAX #15, and DuckDB's `nfc_normalize` implements the same
  * algorithm — outputs agree byte-for-byte, so normalized text flows
  * into the bitwise oracle like any other string column.
  *
  * Scale shape: pure per-row projection (fused into whole-stage codegen,
  * no shuffle); the common case — input already NFC, including all-ASCII
  * corpora — is a quick-check scan that allocates nothing
  * (`Normalizer.isNormalized`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string, got ${t.simpleString}")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Already-normalized input (the overwhelmingly common case) returns
    * the SAME UTF8String — zero allocation on the hot path. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
