package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-vector columns.
  *
  * Why a Catalyst Expression instead of the `aggregate(zip_with(...))`
  * fold (or a Scala UDF): the higher-order-function chain interprets its
  * lambda per element and allocates an intermediate array per row; a UDF
  * adds serialization. This expression is one fused loop with three
  * accumulators, inlined into whole-stage codegen (measured ~10× over the
  * fold chain on the brute-force top-k shape).
  *
  * Determinism contract (the DuckDB oracle compares doubles bitwise): the
  * loop accumulates dot/norms sequentially in index order — the exact
  * operation sequence of the fold formulation — so results are
  * bit-identical to `aggregate(zip_with(a,b,(x,y)->x*y),0d,+)` /
  * `sqrt(..self..)` and to DuckDB's `list_reduce(list_prepend(0.0,...))`.
  *
  * Null handling: null if either array is null (NullIntolerant); elements
  * are assumed non-null (embedding vectors).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0d, $na = 0.0d, $nb = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration: the idiomatic path is `spark.sql.extensions=
  * graft.plans.GraftExtensions`; `ensureRegistered` is the imperative
  * fallback so registry queries work on any caller-provided session. */
object GraftFunctions {

  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSimDescriptor: Descriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  val simHashDescriptor: Descriptor = (
    FunctionIdentifier("simhash128"),
    new ExpressionInfo(classOf[SimHash128].getName, "simhash128"),
    (children: Seq[Expression]) => SimHash128(children.head))

  val simHashWordsDescriptor: Descriptor = (
    FunctionIdentifier("simhash128_words"),
    new ExpressionInfo(classOf[SimHash128Words].getName, "simhash128_words"),
    (children: Seq[Expression]) => SimHash128Words(children.head))

  val minHashDescriptor: Descriptor = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => MinHashSig(children(0), children(1)))

  val nfcNormalizeDescriptor: Descriptor = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** Spark's OWN runtime-filter expressions (BloomFilterAggregate /
    * BloomFilterMightContain — the machinery behind
    * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`), surfaced as
    * registered functions so the dedup library can build and probe bloom
    * filters declaratively (graft.operators.BloomDedup). Not graft code —
    * just a registry door onto public Catalyst classes the SQL registry
    * doesn't expose by default. */
  val bloomAggDescriptor: Descriptor = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_agg"),
    (children: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        children(0), children(1), children(2)))

  val bloomContainsDescriptor: Descriptor = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_contains"),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1)))

  val gunzipDescriptor: Descriptor = (
    FunctionIdentifier("gunzip"),
    new ExpressionInfo(classOf[Gunzip].getName, "gunzip"),
    (children: Seq[Expression]) => Gunzip(children.head))

  val gzipBytesDescriptor: Descriptor = (
    FunctionIdentifier("gzip_bytes"),
    new ExpressionInfo(classOf[GzipBytes].getName, "gzip_bytes"),
    (children: Seq[Expression]) => GzipBytes(children.head))

  val charsetDecodeDescriptor: Descriptor = (
    FunctionIdentifier("charset_decode"),
    new ExpressionInfo(classOf[CharsetDecode].getName, "charset_decode"),
    (children: Seq[Expression]) => CharsetDecode(children(0), children(1)))

  val charsetEncodeDescriptor: Descriptor = (
    FunctionIdentifier("charset_encode"),
    new ExpressionInfo(classOf[CharsetEncode].getName, "charset_encode"),
    (children: Seq[Expression]) => CharsetEncode(children(0), children(1)))

  val all: Seq[Descriptor] =
    Seq(cosineSimDescriptor, simHashDescriptor, simHashWordsDescriptor,
      minHashDescriptor, nfcNormalizeDescriptor, bloomAggDescriptor,
      bloomContainsDescriptor, gunzipDescriptor, gzipBytesDescriptor,
      charsetDecodeDescriptor, charsetEncodeDescriptor)

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
