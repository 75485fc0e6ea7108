package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — the set-oriented form of "which windows does
  * this instant fall in" (SURVEY §2 J-family extension; sibling of
  * [[AsOfJoin]], which covers the latest-at-or-before shape).
  *
  * Spark plans a `p BETWEEN lo AND hi` join condition as a broadcast
  * nested-loop (or a cartesian when neither side broadcasts) — fine for
  * a small interval table, catastrophic when both sides are large. The
  * operator here is EQUI-JOIN shaped by construction, so Catalyst plans
  * an ordinary hash shuffle join: scale is governed by shuffle volume
  * and local bin density, never the pair count.
  */
object TimeJoins {

  /** Interval join as a bin equi-join: rows of `points` paired with
    * every `intervals` row whose `[loCol, hiCol)` contains `pCol`. Both
    * sides bin to `binWidth`-sized cells — a point to its one bin, an
    * interval to each bin it overlaps — the join is a plain equi-join
    * on the bin id, and the exact containment predicate filters the
    * bin-mates. Candidate volume per point is the number of intervals
    * overlapping its bin (LOCAL density), never the full interval
    * count; a long interval fans out over more bins, which is exactly
    * the split that keeps any single bin's join population bounded.
    * Pick `binWidth` near the median interval length: much smaller
    * multiplies the interval side's explode, much larger degrades
    * toward all-pairs within a bin.
    *
    * Precondition: `pCol`, `loCol`, `hiCol` are non-negative integral
    * values on a shared scale (e.g. epoch micros — `div` truncation and
    * floor agree only at-or-above zero); empty intervals (`lo >= hi`)
    * are dropped.
    */
  def pointInIntervalJoin(points: DataFrame, pCol: String,
                          intervals: DataFrame, loCol: String, hiCol: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__graft_bin"
    require(!points.columns.contains(bin) && !intervals.columns.contains(bin),
      s"input already carries reserved working column '$bin'")
    // Column-based integral division (`a div b` — exact on longs, unlike
    // a double `/` which can cross an integer boundary at epoch-micro
    // magnitudes): works for any column name, no string-built expr()
    // injection.
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(c: Column) = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c.cast("long")),
      ColumnBridge.expression(lit(binWidth))))
    val p = points.withColumn(bin, intDiv(col(pCol)))
    val iv = intervals.filter(col(loCol) < col(hiCol))
      .withColumn(bin, explode(sequence(
        intDiv(col(loCol)), intDiv(col(hiCol).cast("long") - 1L))))
    p.join(iv, Seq(bin))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop(bin)
  }

  /** Time-series resample with gap fill: per group, the count of rows in
    * each `unit`-truncated bucket between the group's first and last
    * event, with EMPTY buckets materialized at n = 0 — the dense grid a
    * charting/feature layer expects, where a plain groupBy silently
    * omits quiet periods.
    *
    * Everything past the first aggregate is aggregate-sized: bucket
    * counts shuffle once, the per-group [min, max] span is one tiny agg,
    * the dense grid explodes from the span (one row per bucket, data
    * never re-read), and the fill is a grid-vs-counts equi-join. A
    * 100 TB event table with a 2-year hourly span costs the one count
    * pass plus ~17k grid rows per group.
    */
  def resampleGapFill(df: DataFrame, groupCol: String, tsCol: String,
                      unit: String = "hour"): DataFrame = {
    require(Seq("year", "quarter", "month", "week", "day", "hour", "minute")
      .contains(unit.toLowerCase), s"unsupported resample unit '$unit'")
    require(groupCol != "bucket" && groupCol != "n" && tsCol != "bucket" && tsCol != "n",
      "input columns must not be named 'bucket' or 'n' (output column names)")
    val counts = df
      .select(col(groupCol).as("g"), date_trunc(unit, col(tsCol)).as("bucket"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("n"))
    val spans = counts.groupBy(col("g"))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    // 'interval 1 quarter' is not a legal Spark interval literal even
    // though date_trunc accepts the unit — step by 3 months instead
    val step = if (unit.toLowerCase == "quarter") "3 month" else s"1 $unit"
    val grid = spans.select(col("g"),
      explode(expr(s"sequence(__lo, __hi, interval $step)")).as("bucket"))
    grid.join(counts, Seq("g", "bucket"), "left_outer")
      .select(col("g").as(groupCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
