package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeJoins

class TimeJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pointInIntervalJoin equals the naive BETWEEN join on every shape") {
    // points 0..999; intervals: short, long (spans many bins), touching,
    // empty (dropped), point-width, and bin-straddling
    val points = spark.range(1000).select(col("id").as("pid"), (col("id") * 7 % 1000).as("p"))
    val intervals = Seq(
      (0L, 10L, 20L),    // inside one bin
      (1L, 95L, 105L),   // straddles a bin boundary
      (2L, 0L, 1000L),   // spans everything
      (3L, 500L, 500L),  // empty: dropped
      (4L, 42L, 43L),    // single-point width
      (5L, 990L, 2000L)  // runs past the domain
    ).toDF("iid", "lo", "hi")
    val got = TimeJoins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", 100L)
      .select("pid", "iid").orderBy("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(want.nonEmpty && !want.exists(_._2 == 3L), "empty interval must match nothing")
  }

  test("pointInIntervalJoin plans a shuffle hash join, not nested-loop") {
    val points = spark.range(1000).select(col("id").as("p"))
    val intervals = spark.range(100).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 15).as("hi"))
    val plan = TimeJoins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay equi-join shaped:\n$plan")
  }

  test("pointInIntervalJoin is exact at epoch-micro magnitudes") {
    // a double-division binning would round across integer boundaries
    // here; integral `div` must keep the binned join == the naive join
    val base = 1723500000000000L // ~2024 epoch micros
    val points = spark.range(500).select(col("id").as("pid"),
      (lit(base) + col("id") * 977L).as("p"))
    val intervals = spark.range(50).select(col("id").as("iid"),
      (lit(base) + col("id") * 9770L).as("lo"),
      (lit(base) + col("id") * 9770L + 5000L).as("hi"))
    val got = TimeJoins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", 3600L * 1000000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("pointInIntervalJoin refuses inputs carrying the reserved working column") {
    val points = spark.range(10).select(col("id").as("p"), lit(1L).as("__graft_bin"))
    val intervals = Seq((0L, 0L, 5L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException](
      TimeJoins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", 10L))
    assert(e.getMessage.contains("__graft_bin"))
    // and odd column names needing quoting still work (no string expr())
    val oddP = spark.range(100).select((col("id") * 3).as("p col"))
    val oddI = Seq((0L, 10L, 40L)).toDF("i id", "lo-x", "hi x")
    val n = TimeJoins.pointInIntervalJoin(oddP, "p col", oddI, "lo-x", "hi x", 16L).count()
    assert(n == 10L) // 12,15,...,39 step 3
  }

  test("resampleGapFill materializes empty buckets at zero and keeps counts exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 10:05:00")), ("a", ts("2024-01-01 10:55:00")),
      ("a", ts("2024-01-01 14:01:00")), // hours 11-13 are gaps
      ("b", ts("2024-01-02 00:30:00"))) // single-bucket group
      .toDF("g", "ts")
    val got = TimeJoins.resampleGapFill(df, "g", "ts")
      .orderBy("g", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(got == Seq(
      ("a", "2024-01-01 10:00:00.0", 2L),
      ("a", "2024-01-01 11:00:00.0", 0L),
      ("a", "2024-01-01 12:00:00.0", 0L),
      ("a", "2024-01-01 13:00:00.0", 0L),
      ("a", "2024-01-01 14:00:00.0", 1L),
      ("b", "2024-01-02 00:00:00.0", 1L)))
    // day unit: each group spans a single day -> one row per group
    assert(TimeJoins.resampleGapFill(df, "g", "ts", "day").count() == 2L)
    intercept[IllegalArgumentException](TimeJoins.resampleGapFill(df, "g", "ts", "fortnight"))
  }
}
