package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class SimHashSpec extends SparkSpec {

  test("simhash128 matches the SQL nested-lambda formulation") {
    GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(50)
      .withColumn("hs", expr("transform(array_distinct(split(lower(text), ' ')), t -> md5(t))"))
    val both = docs.select(
      expr("simhash128(hs)").as("native"),
      expr("""concat_ws('', transform(sequence(0, 31), p ->
             substring('0123456789abcdef', 1 +
               aggregate(sequence(0, 3), 0, (dv, b) ->
                 dv + CASE WHEN aggregate(hs, 0, (acc, h) ->
                             acc + (CAST(shiftright(CAST(conv(substring(h, p+1, 1), 16, 10) AS INT), b) AS INT) & 1) * 2 - 1) > 0
                           THEN shiftleft(1, b) ELSE 0 END),
               1)))""").as("sql"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("simhash128_words packs the hex fingerprint digit-for-digit") {
    // the claim simhashPairs' banding + verify rest on: hex char p of
    // simhash128 == nibble (15 - p%16)*4 of word p/16, so re-formatting the
    // words reproduces the hex string exactly — bands and Hamming distances
    // computed on either representation agree.
    GraftFunctions.ensureRegistered(spark)
    val both = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(50)
      .withColumn("hs", expr("transform(array_distinct(split(lower(text), ' ')), t -> md5(t))"))
      .select(
        expr("simhash128(hs)").as("hexfp"),
        expr("""concat(lpad(lower(hex(simhash128_words(hs)[0])), 16, '0'),
               |       lpad(lower(hex(simhash128_words(hs)[1])), 16, '0'))""".stripMargin)
          .as("fromwords"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(0) == r.getString(1),
      s"${r.getString(0)} != ${r.getString(1)}"))
  }

  test("near-identical token sets land within a few bits") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(
      """SELECT simhash128(transform(array('a','b','c','d','e','f','g','h'), t -> md5(t))) AS s1,
        |       simhash128(transform(array('a','b','c','d','e','f','g','x'), t -> md5(t))) AS s2,
        |       simhash128(transform(array('q','r','s','t','u','v','w','z'), t -> md5(t))) AS s3""".stripMargin)
    val r = df.collect()(0)
    def hamming(a: String, b: String): Int =
      a.zip(b).map { case (x, y) =>
        Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
      }.sum
    val near = hamming(r.getString(0), r.getString(1))
    val far = hamming(r.getString(0), r.getString(2))
    assert(near < far, s"near=$near far=$far")
  }
}
