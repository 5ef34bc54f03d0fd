package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join and shuffles on (key, salt)") {
    val d = sf("sf0.001")
    val o = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, d).select("c_custkey", "c_nationkey")

    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
    val salted = SkewJoin.saltedJoin(o, c, "o_custkey", "c_custkey", 8)

    assert(salted.count() == plain.count())
    val a = plain.groupBy(col("c_nationkey")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val b = salted.groupBy(col("c_nationkey")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(a == b)

    // the left shuffle key must include the salt column.
    val plan = salted.hint("merge").queryExecution.executedPlan.toString
    assert(plan.contains("__lsalt"), plan.take(2000))
  }
}
