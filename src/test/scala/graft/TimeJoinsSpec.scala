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
}
