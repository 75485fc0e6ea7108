package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot aggregation keys (SURVEY §7.8's
  * 100 TB posture; AQE handles skewed *joins* at runtime, but a groupBy
  * with a handful of hot keys still funnels each key into one reducer).
  *
  * Two-phase salted aggregation: explode each key into `salt` sub-keys
  * (deterministically, from a hash of other columns), partially aggregate
  * per (key, salt) — spreading a hot key across `salt` reducers — then
  * re-aggregate per key. Valid for any algebraic aggregate (sum, count,
  * min, max); the library exposes the count/sum pair the summary jobs
  * need.
  */
object Skew {

  /** Salted exact count + cents-sum per key. Result is identical to the
    * direct groupBy — the salt only reshapes the shuffle.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCents: Column,
                     salt: Int = 16): DataFrame = {
    // salt from the row's physical position, NOT from data values: a hot
    // key whose rows share one dominant value would hash to one salt and
    // get zero spread. Position-based salt is uniform by construction;
    // any salt assignment yields the same final aggregate, so retry
    // nondeterminism is harmless.
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCents).as("__s"))
    salted.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_cents"))
  }
}
