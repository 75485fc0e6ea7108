package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiler

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq(
    (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
    (Some(3L), Some("b")), (Some(10L), Some("c")))
    .toDF("k", "s")

  test("profile counts rows/nulls/distinct and native-typed min/max") {
    val got = Profiler.profile(sample, Seq("k", "s")).orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    // numeric min/max: 1 < 3 < 10 (a string-compared profile would say max="3")
    assert(got(0) == (("k", 5L, 1L, 3L, "1", "10")))
    assert(got(1) == (("s", 5L, 1L, 3L, "a", "c")))
  }

  test("approx profile keeps the same shape; estimates exact at tiny cardinality") {
    val got = Profiler.profile(sample, Seq("k"), approx = true).collect().head
    assert(got.getLong(3) == 3L)
  }

  test("one job, not one scan per column: a single stack row source") {
    val plan = Profiler.profile(sample, Seq("k", "s")).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"profile must read its input once, saw ${scans.size} scans")
  }

  test("intHistogram: exact edges, under/overflow buckets, empty buckets absent") {
    val vals = Seq(-5L, 0L, 9L, 10L, 19L, 20L, 199L, 200L, 201L).toDF("v")
    val got = Profiler.intHistogram(vals, col("v"), lo = 0L, width = 10L, nBuckets = 20)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // -5 -> underflow; 0,9 -> b0; 10,19 -> b1; 20 -> b2; 199 -> b19 (last
    // in-range); 200,201 -> overflow; buckets 3..18 emit nothing
    assert(got == Seq((-1L, 1L), (0L, 2L), (1L, 2L), (2L, 1L), (19L, 1L), (20L, 2L)))
    intercept[IllegalArgumentException](
      Profiler.intHistogram(vals, col("v"), 0L, 0L, 10))
  }

  test("rejects non-identifier column names instead of splicing them into SQL") {
    intercept[IllegalArgumentException](Profiler.profile(sample, Seq("k`; drop")))
    intercept[IllegalArgumentException](Profiler.profile(sample, Nil))
  }
}
