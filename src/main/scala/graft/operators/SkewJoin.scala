package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual remedy for heavy-hitter join keys when
  * AQE's skew-join split isn't available or isn't enough (e.g. one key
  * holding >1 task's worth of rows at 100 TB).
  *
  * Mechanics: each left row gets a deterministic pseudo-random salt in
  * `[0, salt)` (hash of the whole row — no RNG, so plans stay
  * deterministic and retry-safe); the right side is replicated `salt`
  * times. The shuffle key becomes (key, salt), spreading one hot key over
  * `salt` reducers at the cost of a `salt`× blow-up of the (small) right
  * side. Semantics are exactly those of the plain inner equi-join.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__lsalt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn("__rsalt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, col(leftKey) === col(rightKey) && col("__lsalt") === col("__rsalt"))
      .drop("__lsalt", "__rsalt")
  }
}
