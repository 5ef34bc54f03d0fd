package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 128-bit SimHash over an array of 32-hex-char token digests, returned as
  * a 32-hex-char fingerprint.
  *
  * Semantics (shared with the DuckDB oracle): bit b of hex position p is
  * the sign of Σ_tokens(±1), where the token contributes +1 if bit b of
  * its digest's hex digit at position p is set. The SQL formulation
  * (nested `aggregate`/`transform` lambdas) is interpreted per element —
  * 128 lambda evaluations per token, measured 28 s on 5 k docs; this
  * expression does one pass over the digests with int counters (~1000×
  * less interpreter overhead). Integer-only, so no cross-engine FP
  * concerns.
  */
case class SimHash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash128 expects array<string>, got ${t.simpleString}")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def prettyName: String = "simhash128"

  override protected def nullSafeEval(input: Any): Any =
    SimHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

/** [[SimHash128]]'s fingerprint as TWO 64-bit words, `array<bigint>`
  * [w0, w1] — the join/verify representation: a banded self-join carries 16
  * bytes per side instead of a 32-char string, and the exact Hamming
  * distance between two fingerprints is
  * `bit_count(w0a ^ w0b) + bit_count(w1a ^ w1b)` — two fused instructions
  * per pair instead of 32 `conv(substring(…))` digit parses.
  *
  * Word packing mirrors the hex form digit-for-digit: hex char p (0-based,
  * chars 0…15 → w0, 16…31 → w1) occupies bits [(15 − p mod 16)·4, +4) of
  * its word, so `concat(lpad(lower(hex(w0)),16,'0'),
  * lpad(lower(hex(w1)),16,'0'))` reproduces [[SimHash128]]'s string exactly
  * (spec-pinned), and any aligned hex substring band equals an aligned
  * bit-chunk of the words. */
case class SimHash128Words(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash128_words expects array<string>, got ${t.simpleString}")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "simhash128_words"

  override protected def nullSafeEval(input: Any): Any =
    SimHash128.computeWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.computeWords($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash128Words =
    copy(child = newChild)
}

object SimHash128 {
  private val hex = "0123456789abcdef".toCharArray

  private def counters(arr: ArrayData): Array[Int] = {
    val counters = new Array[Int](128)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = arr.getUTF8String(t)
      if (h != null) {
        val s = h.toString
        val len = math.min(32, s.length)
        var p = 0
        while (p < len) {
          val c = s.charAt(p)
          val v =
            if (c >= '0' && c <= '9') c - '0'
            else if (c >= 'a' && c <= 'f') c - 'a' + 10
            else if (c >= 'A' && c <= 'F') c - 'A' + 10
            else 0
          var b = 0
          while (b < 4) {
            counters(p * 4 + b) += (((v >> b) & 1) * 2) - 1
            b += 1
          }
          p += 1
        }
      }
      t += 1
    }
    counters
  }

  private def digit(cnt: Array[Int], p: Int): Int = {
    var dv = 0
    var b = 0
    while (b < 4) {
      if (cnt(p * 4 + b) > 0) dv |= 1 << b
      b += 1
    }
    dv
  }

  /** Static so generated code can call it directly. */
  def compute(arr: ArrayData): UTF8String = {
    val cnt = counters(arr)
    val out = new Array[Char](32)
    var p = 0
    while (p < 32) {
      out(p) = hex(digit(cnt, p))
      p += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Static so generated code can call it directly. */
  def computeWords(arr: ArrayData): ArrayData = {
    val cnt = counters(arr)
    val w = new Array[Long](2)
    var p = 0
    while (p < 32) {
      w(p / 16) |= digit(cnt, p).toLong << ((15 - (p % 16)) * 4)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(w)
  }
}
