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

  test("a NULL group value is a group like any other (median + ntile + CDF)") {
    import spark.implicits._
    // SQL GROUP BY keeps the null group; the CDF's internal joins must
    // not drop it by three-valued logic
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      (null.asInstanceOf[String], 10L), (null.asInstanceOf[String], 20L)).toDF("g", "x")
    val med = Quantiles.medianByGroup(df, "g", "x")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(med == Map(Some("a") -> 3L, None -> 10L), s"median lost the null group: $med")
    val nt = Quantiles.ntileStats(df, "g", "x", 2)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1)) -> r.getLong(2)).toMap
    assert(nt.keySet.map(_._1).contains(None), s"ntile lost the null group: $nt")
  }

  test("quantile-summary tier: exact at k>=n, merged rank error within the pinned bound on a long tail") {
    import graft.ops.Sketches
    val root = java.nio.file.Files.createTempDirectory("qsketch").toString
    // long-tailed values: cubes — a fixed-width histogram's bucket-width
    // error explodes here, the rank sketch must not care
    val n = 3000
    val rows = (1 to n).map(i => (if (i % 2 == 0) "a" else "b", i.toLong * i * i))
    val df = rows.toDF("grp", "x")
    val k = 32
    // three drops land thirds of the data
    (0 until 3).foreach { d =>
      Sketches.landQuantileDrop(df.filter(col("x") % 3 === d), Seq("grp"), col("x"),
        k, root + "/q", s"drop$d")
    }
    // exact per-group CDF for rank checking
    def trueRank(grp: String, v: Long): Long =
      rows.count(r => r._1 == grp && r._2 <= v).toLong
    val nGrp = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // per the class doc: total rank error <= sum over segments of
    // (ceil(n_seg/(2k)) + 1); with 3 drops that is <= N/(2k) + 6 per group
    def bound(g: String) = nGrp(g) / (2 * k) + 6
    for ((num, den) <- Seq((1, 2), (1, 4), (9, 10))) {
      val est = Sketches.serveQuantile(spark, root + "/q", Seq("grp"), num, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (g <- Seq("a", "b")) {
        val target = (nGrp(g) * num + den - 1) / den
        val err = math.abs(trueRank(g, est(g)) - target)
        assert(err <= bound(g),
          s"$num/$den quantile of $g: rank error $err > bound ${bound(g)}")
      }
    }
    // compaction folds to k points per group, serve stays in (grown) bound
    Sketches.compactQuantile(spark, root + "/q", Seq("grp"), k)
    val segs = new java.io.File(root + "/q").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(segs == 1)
    val estC = Sketches.serveQuantile(spark, root + "/q", Seq("grp"), 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- Seq("a", "b")) {
      val target = (nGrp(g) + 1) / 2
      assert(math.abs(trueRank(g, estC(g)) - target) <= 2 * bound(g),
        s"post-compaction median of $g out of the doubled bound")
    }

    // k >= n: the summary IS the data — the served median is exact
    val tiny = Seq(("t", 10L), ("t", 20L), ("t", 30L), ("t", 40L), ("t", 50L)).toDF("grp", "x")
    Sketches.landQuantileDrop(tiny, Seq("grp"), col("x"), 16, root + "/exact", "d0")
    val m = Sketches.serveQuantile(spark, root + "/exact", Seq("grp"), 1, 2)
      .collect().head.getLong(1)
    assert(m == 30L, s"k>=n must serve the exact median, got $m")
  }
}
