package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim is bitwise-identical to the fold formulation (codegen + interpreted)") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
    val foldDot =
      "aggregate(zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val both = pairs.select(
      expr("cosine_sim(a.embedding, b.embedding)").as("native"),
      expr(s"${foldDot.format("a.embedding", "b.embedding")} / (sqrt(${foldDot.format("a.embedding", "a.embedding")}) * sqrt(${foldDot.format("b.embedding", "b.embedding")}))")
        .as("fold")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim basics: self-similarity 1.0, null propagation") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>)) AS self,
        |       cosine_sim(CAST(NULL AS ARRAY<FLOAT>),
        |                  CAST(array(1.0) AS ARRAY<FLOAT>)) AS nul""".stripMargin)
    val r = df.collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.isNullAt(1))
  }
}
