package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k seeded MinHash values over a shingle array: element i is
  * `min over shingles s of md5(concat(i, '|', s))` as a lowercase hex
  * string — byte-compatible with the SQL formulation
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s ->
  * md5(concat(CAST(i AS STRING),'|',s)))))` and with the DuckDB oracle's
  * `list_transform(range(0,k), ...)` twin (lexicographic order on
  * lowercase hex == unsigned byte order on the digest).
  *
  * One pass per row with a reused MessageDigest; the SQL formulation
  * allocates and interprets k·|sh| lambda frames plus a hex string per
  * hash (measured ~10 s on 5 k docs vs ~2 s native).
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects (array<string>, int literal), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(shingles: Any, k: Any): Any =
    MinHashSig.compute(shingles.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) => s"graft.functions.MinHashSig.compute($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  private def toHex(b: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(b(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static so generated code can call it directly. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = digestLocal.get()
    val n = shingles.numElements()
    val mins = new Array[Array[Byte]](k)
    var t = 0
    while (t < n) {
      val s = shingles.getUTF8String(t)
      if (s != null) {
        val sBytes = s.getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(String.valueOf(i).getBytes("UTF-8"))
          md.update('|'.toByte)
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null || less(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) null else toHex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
