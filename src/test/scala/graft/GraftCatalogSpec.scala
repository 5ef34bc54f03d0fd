package graft

import graft.sources.GraftCatalog

/** The SQL surface: same results and same pushed-down plans as the
  * DataFrame API. */
class GraftCatalogSpec extends SparkSpec {

  test("SQL over registered views matches the DataFrame plan's results") {
    val viaSql = GraftCatalog.sql(spark, sf("sf0.001"),
      """SELECT r_name, n_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name, n_name""".stripMargin)
    val viaDf = {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.nation(spark, sf("sf0.001"))
        .join(graft.sources.Tables.region(spark, sf("sf0.001")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("native functions are callable from SQL") {
    val r = GraftCatalog.sql(spark, sf("sf0.001"),
      "SELECT vec_id, cosine_sim(embedding, embedding) AS self FROM embeddings ORDER BY vec_id LIMIT 3")
      .collect()
    assert(r.length == 3 && r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-12))
  }

  test("filters on a view still push into the parquet scan") {
    val df = GraftCatalog.sql(spark, sf("sf0.001"),
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"filter not pushed:\n${scan.take(800)}")
  }
}
