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

  /** Salted equi-join for a skewed FACT side: the dim side replicates
    * once per salt, each fact row carries one deterministic salt, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `salt` reducers instead of funnelling into one. Row-identical to
    * the plain inner join (each fact row still meets every dim row of
    * its key exactly once — the replica matching its salt). The dim side
    * grows `salt`-fold, so this is for the small-dim/huge-fact shape —
    * the same shape AQE's skew-join split targets at runtime; this form
    * is plan-deterministic and works where AQE can't see the skew (e.g.
    * under a required distribution). Salt comes from `saltSrc` (any
    * fact column(s) — uniform-ish, e.g. the fact's own id), never from
    * the join key.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 saltSrc: Column, salt: Int = 16): DataFrame = {
    require(salt > 0, "salt count must be positive")
    require(fact.columns.contains(keyCol) && dim.columns.contains(keyCol),
      s"both sides must carry join key '$keyCol'")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already carry __salt")
    val dimX = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val factX = fact.withColumn("__salt", pmod(hash(saltSrc), lit(salt)))
    factX.join(dimX, Seq(keyCol, "__salt")).drop("__salt")
  }
}
