package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Staged

/** Distinct-count sketches as lake artifacts — the cardinality twin of
  * [[graft.lake.MaterializedAgg]].
  *
  * COUNT(DISTINCT) is the one summary measure that does NOT decompose
  * into count/sum/min/max partials (calc_summary.py:53-80 recomputes its
  * per-dimension cardinalities corpus-wide each run; A3 in SURVEY §2.5).
  * Two churn-proportional forms, both landed per drop and merged at
  * read:
  *
  *  - '''Exact''': a drop's segment stores its DISTINCT (dims, key)
  *    pairs — distinct is idempotent under union, so merged segments
  *    re-distinct to the exact corpus cardinality. Artifact size is
  *    O(distinct keys in drop): right whenever the key domain is
  *    bounded (customer ids, CPV codes); the raw drop is scanned once,
  *    at landing.
  *  - '''HLL sketch''' (Datasketches HLL via Spark's `hll_sketch_agg`):
  *    a segment is one 2^lgK-register sketch per group — KBs per group
  *    regardless of drop size. Sketches merge losslessly
  *    (`hll_union_agg`), so serve cost is segments x groups, and the
  *    estimate's error is the standard ~1.04/sqrt(2^lgK) envelope
  *    (~0.8% at the default lgK=14). Right when the domain is unbounded
  *    (URLs, doc digests) and ±1% answers the question.
  *
  * Both land staged-swap ([[graft.lake.Staged]]) under `path/seg=<drop>`
  * like every sidecar tier — re-landing a drop id is idempotent
  * replacement, other segments' bytes never move.
  */
object Sketches {

  private def segDir(path: String, dropId: String): String = {
    require(dropId.nonEmpty && dropId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"drop id must be [A-Za-z0-9_-]+: '$dropId'")
    s"$path/seg=$dropId"
  }

  // ------------------------------------------------------------ exact tier

  /** One drop's distinct (dims, key) set — the only raw-data pass. */
  def distinctSegment(drop: DataFrame, dims: Seq[String], keyCol: String): DataFrame =
    drop.select((dims :+ keyCol).map(col): _*).distinct()

  def landDistinctDrop(drop: DataFrame, dims: Seq[String], keyCol: String,
                       path: String, dropId: String): Long = {
    val spark = drop.sparkSession
    Staged.land(spark, segDir(path, dropId), distinctSegment(drop, dims, keyCol))
    spark.read.parquet(segDir(path, dropId)).count()
  }

  /** Exact per-dims cardinality over every landed segment. Only
    * segment-distinct pairs shuffle — never raw rows.
    */
  def serveDistinct(spark: SparkSession, path: String, dims: Seq[String],
                    keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(dims.map(col): _*)
      .agg(count_distinct(col(keyCol)).as("n_distinct"))

  // ------------------------------------------------------------- HLL tier

  /** One drop's per-group HLL sketch (binary, mergeable). */
  def hllSegment(drop: DataFrame, dims: Seq[String], keyCol: String,
                 lgK: Int = 14): DataFrame =
    drop.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))

  def landHllDrop(drop: DataFrame, dims: Seq[String], keyCol: String,
                  path: String, dropId: String, lgK: Int = 14): Long = {
    val spark = drop.sparkSession
    Staged.land(spark, segDir(path, dropId), hllSegment(drop, dims, keyCol, lgK))
    spark.read.parquet(segDir(path, dropId)).count()
  }

  /** Merged estimate per dims: union the segment sketches, estimate
    * once. Reads KB-sized sketches, touches no raw data.
    */
  def serveHllEstimate(spark: SparkSession, path: String, dims: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(dims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("n_estimate"))

  // -------------------------------------------------------- compaction

  /** Fold all of a tier's segments into one (`dropId`) via the shared
    * whole-root swap — serve results unchanged (distinct is idempotent,
    * sketch union and bucket addition are associative), segment count
    * bounded without touching raw data. One per tier because the folded
    * form differs: re-distinct, sketch union, bucket sum.
    */
  def compactDistinct(spark: SparkSession, path: String, dims: Seq[String],
                      keyCol: String, dropId: String = "base"): Unit =
    Staged.swapRoot(spark, path,
      spark.read.parquet(path).select((dims :+ keyCol).map(col): _*)
        .distinct().localCheckpoint(true),
      segName(dropId))

  def compactHll(spark: SparkSession, path: String, dims: Seq[String],
                 dropId: String = "base"): Unit =
    Staged.swapRoot(spark, path,
      spark.read.parquet(path).groupBy(dims.map(col): _*)
        .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
        .localCheckpoint(true),
      segName(dropId))

  def compactHist(spark: SparkSession, path: String, dims: Seq[String],
                  dropId: String = "base"): Unit =
    Staged.swapRoot(spark, path,
      serveHist(spark, path, dims).localCheckpoint(true), segName(dropId))

  private def segName(dropId: String): String = {
    require(dropId.nonEmpty && dropId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"drop id must be [A-Za-z0-9_-]+: '$dropId'")
    s"seg=$dropId"
  }

  /** Estimate-vs-exact audit column: true iff `est` is within `tol`
    * relative error of `exact` (exact == 0 demands est == 0).
    */
  def withinRelError(est: Column, exact: Column, tol: Double): Column =
    when(exact === 0, est === 0)
      .otherwise(abs(est.cast("double") - exact.cast("double")) / exact.cast("double") <= tol)

  // ------------------------------------------- histogram (distribution) tier

  /** One drop's per-group fixed-grid histogram — the DISTRIBUTION
    * sketch beside the cardinality tiers: bucket counts merge by plain
    * addition (exactly — they are counts), so per-drop segments serve
    * corpus quantiles with error bounded by the bucket width, no raw
    * rescan. Grid params (lo, width, nBuckets) must be identical across
    * a path's segments — they define the sketch, like lgK for HLL.
    */
  def histSegment(drop: DataFrame, dims: Seq[String], value: Column,
                  lo: Long, width: Long, nBuckets: Int): DataFrame =
    drop.groupBy(dims.map(col) :+ Profiler.bucketOf(value, lo, width, nBuckets).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  def landHistDrop(drop: DataFrame, dims: Seq[String], value: Column,
                   lo: Long, width: Long, nBuckets: Int,
                   path: String, dropId: String): Long = {
    val spark = drop.sparkSession
    Staged.land(spark, segDir(path, dropId),
      histSegment(drop, dims, value, lo, width, nBuckets))
    spark.read.parquet(segDir(path, dropId)).count()
  }

  /** Merged histogram per dims: (dims..., bucket, n). */
  def serveHist(spark: SparkSession, path: String, dims: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(dims.map(col) :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"))

  /** Lower-quantile estimate from a merged histogram: per dims, the
    * LOWER EDGE of the bucket holding the rank-ceil(n*num/den) value
    * (num/den e.g. 1/2 = the lower median). The true quantile value
    * lies inside that bucket, so `|est - exact| < width` whenever the
    * grid covers the data (rank never in the -1 / nBuckets overflow
    * buckets) — equivalently, est == exact - exact mod width, which is
    * what an oracle recomputes from the exact quantile. The window runs
    * over at most nBuckets+2 rows per group — never raw data.
    */
  def quantileFromHist(hist: DataFrame, dims: Seq[String], num: Int, den: Int,
                       lo: Long, width: Long): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "quantile must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(dims.map(col): _*).orderBy(col("bucket"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(dims.map(col): _*)
    hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__k", ceil(sum(col("n")).over(tot) * num / den).cast("long"))
      .filter(col("__cum") - col("n") < col("__k") && col("__k") <= col("__cum"))
      .select(dims.map(col) :+ (lit(lo) + col("bucket") * width).as("est"): _*)
  }
}
