package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP payload transcode primitives — the decode layer between a raw
  * web archive and every text operator downstream. Real crawl records
  * (CommonCrawl) carry gzip'd payload bodies (`Content-Encoding:
  * gzip`) and a long tail of legacy charsets (windows-1252, GBK,
  * Shift_JIS, …); decoding everything as UTF-8 silently turns those
  * rows into mojibake that poisons digests, LM scores, and dedup.
  * These four expressions make the pinned resolution
  * ([[graft.sources.Warc.withDecodedText]]) a per-row codegen
  * projection — no UDF, no shuffle:
  *
  *  - `gunzip(binary)` — decompress a (possibly multi-member) gzip
  *    stream; CORRUPT input → NULL (the undecodable sentinel, never a
  *    task failure: one damaged record must not kill a 100k-file
  *    ingest);
  *  - `gzip_bytes(binary)` — one gzip member holding the input (the
  *    inverse; fixture/egress side);
  *  - `charset_decode(binary, name)` — decode bytes in the named
  *    charset; malformed/unmappable byte sequences become U+FFFD
  *    (java.nio REPLACE — stated: a few damaged characters must not
  *    null a whole document); an UNKNOWN/unsupported charset name
  *    falls back to UTF-8 (stated — the HTML5 default; real crawls
  *    carry misspelled charset labels and a NULL would drop the row);
  *  - `charset_encode(string, name)` — the inverse (unmappable chars
  *    → `'?'`, java.nio REPLACE; unknown name → UTF-8).
  *
  * Each expression inlines into whole-stage codegen via a static
  * helper call (the work per row is the transcode itself — dominated
  * by gzip/charset machinery, not dispatch). Charset objects are
  * cached per name (Charset.forName hits a JVM-global map; the
  * decoder/encoder per call is the thread-safety contract).
  */
object Transcode {

  /** Decompress all members of a gzip stream; null on any corruption. */
  def gunzip(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      val bo = new ByteArrayOutputStream(bytes.length * 4 + 64)
      val buf = new Array[Byte](1 << 16)
      var k = in.read(buf)
      while (k >= 0) { bo.write(buf, 0, k); k = in.read(buf) }
      in.close()
      bo.toByteArray
    } catch { case _: java.io.IOException => null }

  /** One gzip member holding exactly `bytes`. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(bytes); gz.close()
    bo.toByteArray
  }

  /** Charset for `name` — trimmed, surrounding quotes stripped,
    * case-insensitive (Charset.forName is); unknown → UTF-8. */
  def charsetOf(name: String): Charset = {
    val n = name.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim
    try { if (n.isEmpty) StandardCharsets.UTF_8 else Charset.forName(n) }
    catch { case _: IllegalArgumentException => StandardCharsets.UTF_8 }
  }

  def decode(bytes: Array[Byte], name: UTF8String): UTF8String = {
    val dec = charsetOf(name.toString).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
  }

  def encode(s: UTF8String, name: UTF8String): Array[Byte] = {
    val enc = charsetOf(name.toString).newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bb = enc.encode(java.nio.CharBuffer.wrap(s.toString))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }

  private[functions] def binaryCheck(e: Expression, fn: String): TypeCheckResult =
    if (e.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects binary, got ${e.dataType.simpleString}")
}

/** `gunzip(binary)` — see [[Transcode]]. Nullable even on non-null
  * input: corrupt gzip → NULL (the undecodable sentinel). */
case class Gunzip(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Transcode.binaryCheck(child, "gunzip")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"
  override protected def nullSafeEval(b: Any): Any =
    Transcode.gunzip(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.functions.Transcode.gunzip($b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

/** `gzip_bytes(binary)` — see [[Transcode]]. */
case class GzipBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    Transcode.binaryCheck(child, "gzip_bytes")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_bytes"
  override protected def nullSafeEval(b: Any): Any =
    Transcode.gzip(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.Transcode.gzip($b)")
  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

/** `charset_decode(binary, name)` — see [[Transcode]]. */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_decode expects (binary, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "charset_decode"
  override protected def nullSafeEval(b: Any, n: Any): Any =
    Transcode.decode(b.asInstanceOf[Array[Byte]], n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, n) => s"graft.functions.Transcode.decode($b, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
}

/** `charset_encode(string, name)` — see [[Transcode]]. */
case class CharsetEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_encode expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "charset_encode"
  override protected def nullSafeEval(s: Any, n: Any): Any =
    Transcode.encode(s.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, n) => s"graft.functions.Transcode.encode($s, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetEncode =
    copy(left = newLeft, right = newRight)
}
