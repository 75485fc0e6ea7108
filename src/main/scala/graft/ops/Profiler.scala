package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-quality audit a corpus gets
  * before anything trains on it: per column, row count, null count,
  * exact distinct count, min and max.
  *
  * The reference audits its drops ad hoc (check_versions_completness.py
  * :86-117 counts one field at a time, a collection pass per question);
  * this computes every column's stats in ONE job: a single wide
  * aggregate (Catalyst plans the multiple COUNT(DISTINCT)s as one
  * Expand — each input row fans out once per distinct-agg, partial
  * aggregation stays map-side), then a `stack` unpivot of the single
  * result row into one row per column. No per-column rescans.
  *
  * min/max aggregate on the NATIVE type (numeric min, not string min)
  * and cast the RESULT to string, so one schema serves every column
  * type. Floating columns should be profiled through a decimal/cents
  * view if the string forms must be engine-portable (IEEE shortest-repr
  * differs across engines; everything else — ints, dates, strings —
  * casts identically).
  *
  * Scale: the Expand duplicates rows k times for k distinct-aggs — the
  * exact-distinct cost is intrinsic (it needs a shuffle per distinct
  * domain). At 100 TB profile width matters: profile the columns you
  * need, or swap `count_distinct` for `approx_count_distinct` (HLL,
  * no Expand, mergeable) via `approx = true` when ±2% is acceptable.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // names are interpolated into the stack() expr — keep to identifier
    // characters rather than trusting string-built SQL with arbitrary names
    cols.foreach { c =>
      require(c.nonEmpty && c.forall(ch => ch.isLetterOrDigit || ch == '_'),
        s"profile column name must be [A-Za-z0-9_]+: '$c'")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val branches = cols.map { c =>
      s"'$c', __rows, __rows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }
    one.select(expr(
      s"stack(${cols.size}, ${branches.mkString(", ")}) AS " +
        "(col_name, n_rows, n_null, n_distinct, min_value, max_value)"))
  }

  /** Fixed-width histogram on an INTEGER grid — the distribution audit
    * beside [[profile]]'s scalar stats. Bucket arithmetic is pure int64
    * (`(v - lo) / width` on non-negative offsets), so the same buckets
    * fall out of any engine — no floating bucket edges to disagree at
    * boundaries (floats route through a cents-style grid first, the
    * repo-wide convention). Under/overflow land in buckets -1 and
    * `nBuckets`; in-range bucket b covers `[lo + b*width, lo + (b+1)*width)`.
    * One groupBy of bucket-count pairs — partials map-side, the shuffle
    * carries at most nBuckets+2 rows per partition.
    */
  def intHistogram(df: DataFrame, value: org.apache.spark.sql.Column,
                   lo: Long, width: Long, nBuckets: Int): DataFrame =
    df.filter(value.isNotNull) // distributions are over VALUES (see bucketOf)
      .select(bucketOf(value, lo, width, nBuckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** The exact int64 bucket id for [[intHistogram]] (shared with the
    * mergeable histogram segments in [[Sketches]]): -1 below `lo`,
    * `nBuckets` at/above the top edge, else `(v - lo) / width` in
    * integer arithmetic. Column `/` is DOUBLE division; subtracting the
    * remainder first makes the one double division exact (k*width /
    * width == k in IEEE for any k this grid can produce).
    */
  def bucketOf(value: org.apache.spark.sql.Column, lo: Long, width: Long,
               nBuckets: Int): org.apache.spark.sql.Column = {
    require(width > 0 && nBuckets > 0, "width and nBuckets must be positive")
    // nulls map to a NULL bucket by design: a distribution is over
    // VALUES, so histogram builders filter nulls out before bucketing
    // (folding them into the underflow bucket would corrupt quantile
    // ranks; see Sketches.histSegment / intHistogram)
    val v = value.cast("long")
    val off = v - lo
    val inRange = ((off - pmod(off, lit(width))) / width).cast("long")
    when(v < lo, lit(-1L))
      .when(v >= lo + width * nBuckets.toLong, lit(nBuckets.toLong))
      .otherwise(inRange)
  }
}
