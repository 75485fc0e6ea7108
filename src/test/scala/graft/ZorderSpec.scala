package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, Zorder}

class ZorderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave on the driver: bit i of a -> 2i, of b -> 2i+1. */
  private def zRef(a: Int, b: Int): Long =
    (0 until 16).map(i => (((a >> i) & 1).toLong << (2 * i)) |
                          (((b >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)

  test("zValue2 matches the reference interleave; zValueN agrees") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      Zorder.zValue2(col("a"), col("b")).as("z2"),
      Zorder.zValueN(Seq(col("a"), col("b")), 16).as("zn"))
    df.collect().foreach { r =>
      val expect = zRef(r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == expect, s"zValue2(${r.getInt(0)}, ${r.getInt(1)})")
      assert(r.getLong(3) == expect, s"zValueN(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("zValue2 is a bijection on 16-bit pairs (deinterleave recovers both)") {
    def gather(z: Long, off: Int): Int =
      (0 until 16).map(i => (((z >> (2 * i + off)) & 1L) << i).toInt).sum
    val rnd = new scala.util.Random(11)
    Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536))).foreach { case (a, b) =>
      val z = zRef(a, b)
      assert(gather(z, 0) == a && gather(z, 1) == b)
    }
  }

  test("zScale clamps, maps bounds to grid edges, nulls to 0") {
    val df = Seq[java.lang.Double](-5.0, 0.0, 50.0, 100.0, 170.0, null).toDF("v")
      .select(Zorder.zScale(col("v"), 0.0, 100.0, 8).as("s"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 0L, 127L, 255L, 255L, 0L))
  }

  test("clusterBy: a box predicate prunes far fewer files than under a key sort") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile.getAbsolutePath
    // two INDEPENDENT uniform dims derived from row id by hashing
    val data = spark.range(40000).select(
      col("id"),
      pmod(hash(col("id"), lit(1)), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id"), lit(2)), lit(65536)).cast("long").as("b"))
    def candidateFiles(path: String, colName: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(colName).as("mn"), max(colName).as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi).count()

    // baseline: the compact-style layout, range-clustered + sorted on `a`
    val byKey = s"$dir/bykey"
    data.repartitionByRange(16, col("a")).sortWithinPartitions("a").write.parquet(byKey)
    // z-ordered rewrite of the same rows through the lake API
    val zt = new LakeTable(spark, s"$dir/ztab", "id")
    zt.overwrite(data)
    val nOut = zt.clusterBy(Seq("a", "b"), targetFileBytes = 40000L)
    assert(nOut >= 8, s"want a multi-file layout, got $nOut")

    // selective box on `b` only: the a-sorted layout can't prune at all
    val (lo, hi) = (30000L, 34095L) // 1/16 of the domain
    val aSorted = candidateFiles(byKey, "b", lo, hi)
    val zOrdered = candidateFiles(s"$dir/ztab", "b", lo, hi)
    assert(aSorted == 16, s"key-sorted layout should have no b pruning, got $aSorted")
    assert(zOrdered <= aSorted / 2,
      s"z-order should at least halve candidate files: $zOrdered vs $aSorted")

    // and the clustered table still holds exactly the same rows
    assert(zt.read.count() == 40000)
    assert(zt.read.agg(sum("a"), sum("b")).head() ==
      data.agg(sum("a"), sum("b")).head())
  }

  test("clusterBy preserves a partitioned layout and its rows") {
    val dir = java.nio.file.Files.createTempDirectory("zorderp").toFile.getAbsolutePath
    val data = spark.range(2000).select(
      col("id"), (col("id") % 2).cast("string").as("grp"),
      pmod(hash(col("id"), lit(3)), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id"), lit(4)), lit(65536)).cast("long").as("b"))
    val t = new LakeTable(spark, s"$dir/t", "id", partitionCols = Seq("grp"))
    t.overwrite(data)
    t.clusterBy(Seq("a", "b"), targetFileBytes = 20000L)
    assert(t.read.count() == 2000)
    assert(t.read.groupBy("grp").count().collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap == Map("0" -> 1000L, "1" -> 1000L))
    // layout contract survives the rewrite
    assert(LakeTable.layoutOf(spark, s"$dir/t").map(_._1).contains(Seq("grp")))
  }
}
