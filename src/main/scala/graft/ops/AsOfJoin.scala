package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group.
  *
  * Spark has no ASOF JOIN operator; the idiomatic scale-out composition
  * (preference (a) from the custom-operator ladder — no custom
  * SparkPlan needed) is union + running last-non-null window:
  * tag both sides, union, and take `last(right value, ignoreNulls)` over
  * (key, ts, side) ordering with right rows sorting before left rows on
  * ties. ONE shuffle on the key — no range join, no per-key loop; skew
  * is bounded by rows-per-key like any window.
  *
  * Right rows must be unique per (key, ts) for deterministic results —
  * dedupe upstream (e.g. max id per instant).
  */
object AsOfJoin {

  /** @return left's (key, id, ts) plus `matched_id` = as-of right id. */
  def asOfLatest(left: DataFrame, right: DataFrame, key: String,
                 idCol: String, tsCol: String): DataFrame = {
    val l = left.select(col(key).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__side"), col(idCol).as("__id"))
    val r = right.select(col(key).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__side"), col(idCol).as("__id"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(when(col("__side") === 0, col("__id")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__k").as(key), col("__id").as(idCol), col("__ts").as(tsCol),
        col("__match").as("matched_id"))
  }
}
