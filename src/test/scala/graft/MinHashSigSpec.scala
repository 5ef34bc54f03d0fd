package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class MinHashSigSpec extends SparkSpec {

  test("minhash_sig matches the SQL transform/array_min formulation") {
    GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(50)
      .withColumn("toks", expr("split(lower(text), ' ')"))
      .withColumn("sh",
        expr("""array_distinct(transform(
               sequence(1, greatest(size(toks) - 2, 1)),
               i -> concat_ws(' ', slice(toks, i, 3))))"""))
    val both = docs.select(
      expr("minhash_sig(sh, 12)").as("native"),
      expr("""transform(sequence(0, 11),
             i -> array_min(transform(sh, s -> md5(concat(CAST(i AS STRING), '|', s)))))""")
        .as("sql")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }
}
