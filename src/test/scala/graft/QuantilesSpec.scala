package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** The histogram-CDF quantile ops must agree exactly with the raw-row
  * window formulations they replace (which stay here as the test oracle —
  * fine at spec scale, parallelism-capped at 100 TB).
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // groups of different sizes, duplicate values, one single-row group
  private lazy val df = (
    (1 to 101).map(i => ("a", (i % 17).toDouble)) ++
    (1 to 40).map(i => ("b", (i % 3).toDouble)) ++
    Seq(("c", 42.0))
  ).toDF("g", "v")

  test("medianByGroup equals rank-select over a full sort") {
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val wc = Window.partitionBy(col("g"))
    val expected = df
      .select(col("g"), col("v"), row_number().over(w).as("rn"),
        count(lit(1)).over(wc).as("cnt"))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("g"), col("v").as("median"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Quantiles.medianByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("ntileStats equals aggregated ntile over a full sort") {
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val expected = df
      .select(col("g"), col("v"), ntile(4).over(w).as("q"))
      .groupBy(col("g"), col("q"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("minv"), max(col("v")).as("maxv"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val got = Quantiles.ntileStats(df, "g", "v", 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expected)
  }

  test("no raw-row window partitioned by the group key in the plan") {
    val plan = Quantiles.medianByGroup(df, "g", "v").queryExecution.optimizedPlan.toString
    // every Window node must sit above an Aggregate (histogram), never
    // directly over the raw scan — the raw-row formulation has
    // Window <- Project <- LocalRelation/Scan with no Aggregate between
    val lines = plan.split("\n")
    val windowIdx = lines.zipWithIndex.filter(_._1.contains("Window")).map(_._2)
    windowIdx.foreach { i =>
      assert(lines.drop(i).exists(_.contains("Aggregate")),
        s"window at plan line $i has no aggregate below it:\n$plan")
    }
  }
}
