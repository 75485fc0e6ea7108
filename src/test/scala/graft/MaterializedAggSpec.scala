package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.MaterializedAgg
import graft.lake.MaterializedAgg.Spec

class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("matagg").toString + "/summary"

  private val rows = Seq(
    // (grp, cents, k)
    ("a", 100L, 1L), ("a", 250L, 5L), ("b", 10L, 3L),
    ("b", 40L, 9L), ("c", 7L, 2L))
  private val spec = Spec(dims = Seq("grp"),
    sums = Seq("s" -> col("cents")),
    mins = Seq("kmin" -> col("k")),
    maxs = Seq("kmax" -> col("k")))

  private def df(xs: Seq[(String, Long, Long)]) = xs.toDF("grp", "cents", "k")

  private def served(path: String): Seq[(String, Long, Long, Long, Long)] =
    MaterializedAgg.serve(spark, path, spec).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def oneShot(xs: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long, Long)] =
    df(xs).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"), min("k").as("kmin"), max("k").as("kmax"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("segment merge equals the one-shot aggregate over all drops") {
    val path = tmp()
    val (d1, d2) = rows.splitAt(2)
    MaterializedAgg.landDrop(df(d1), spec, path, "d1")
    MaterializedAgg.landDrop(df(d2), spec, path, "d2")
    assert(served(path) == oneShot(rows))
  }

  test("landing a drop leaves every other segment byte-identical") {
    val path = tmp()
    val (d1, d2) = rows.splitAt(2)
    MaterializedAgg.landDrop(df(d1), spec, path, "d1")
    def segBytes(): Map[String, Seq[Byte]] = {
      val d = new java.io.File(path + "/seg=d1")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> Files.readAllBytes(f.toPath).toSeq
      }.toMap
    }
    val before = segBytes()
    MaterializedAgg.landDrop(df(d2), spec, path, "d2")
    assert(segBytes() == before, "drop-1 segment must not be rewritten by drop-2's landing")
  }

  test("re-landing the same drop id is idempotent (replace, not append)") {
    val path = tmp()
    val (d1, d2) = rows.splitAt(2)
    MaterializedAgg.landDrop(df(d1), spec, path, "d1")
    MaterializedAgg.landDrop(df(d2), spec, path, "d2")
    MaterializedAgg.landDrop(df(d2), spec, path, "d2") // re-ingest of the same drop
    assert(served(path) == oneShot(rows))
  }

  test("compact folds history into one segment without changing serve") {
    val path = tmp()
    val (d1, d2) = rows.splitAt(2)
    MaterializedAgg.landDrop(df(d1), spec, path, "d1")
    MaterializedAgg.landDrop(df(d2), spec, path, "d2")
    val before = served(path)
    MaterializedAgg.compact(spark, path, spec, "base")
    assert(served(path) == before)
    val segs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("seg="))
    assert(segs.toSeq == Seq("seg=base"))
    // and a post-compaction drop folds in on top of the compacted base
    MaterializedAgg.landDrop(df(Seq(("a", 1000L, 0L))), spec, path, "d3")
    assert(served(path) == oneShot(rows :+ (("a", 1000L, 0L))))
  }

  test("streaming summarySink: a batched feed converges to the one-shot aggregate") {
    val root = Files.createTempDirectory("mataggstream").toString
    val feed = root + "/feed"
    val path = root + "/summary"
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      df(chunk).coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(df(rows).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.summarySink(path, spec)(stream)
      .option("checkpointLocation", root + "/ckpt")
      .start()
    q.awaitTermination()
    assert(served(path) == oneShot(rows))
    // one segment per micro-batch: recovery replay of batch N replaces
    // segment batchN rather than double-counting it
    val segs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("seg=")).sorted
    assert(segs.length == 3 && segs.forall(_.startsWith("seg=batch")))
  }

  test("landChangesDrop retracts updates and deletes; cancelled groups vanish") {
    val path = tmp()
    val cdcSpec = Spec(Seq("grp"), sums = Seq("s" -> col("cents")))
    MaterializedAgg.landDrop(df(rows), cdcSpec, path, "base")
    // feed: correct a's 100 -> 150 (pre+post pair), delete BOTH b rows,
    // insert a new d row
    val feed = Seq(
      ("a", 100L, "update_pre"), ("a", 150L, "update_post"),
      ("b", 10L, "delete"), ("b", 40L, "delete"),
      ("d", 7L, "insert")).toDF("grp", "cents", "change_type")
    MaterializedAgg.landChangesDrop(feed, cdcSpec, path, "cdc1")
    val got = MaterializedAgg.serve(spark, path, cdcSpec).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: 2 rows, 350+50; b fully cancelled (absent); c untouched; d inserted
    assert(got == Seq(("a", 2L, 400L), ("c", 1L, 7L), ("d", 1L, 7L)))
    // min/max cannot be maintained from a change feed — refused loudly
    intercept[IllegalArgumentException](
      MaterializedAgg.landChangesDrop(feed, spec, path, "cdc2"))
    // an unrecognized change type fails the land rather than mis-counting
    val bad = Seq(("a", 5L, "carried")).toDF("grp", "cents", "change_type")
    val e = intercept[Exception](
      MaterializedAgg.landChangesDrop(bad, cdcSpec, path, "cdc3"))
    assert(e.getMessage != null)
  }

  test("changesBetween preImages=true emits the Delta-CDF update row pair") {
    val root = Files.createTempDirectory("cdfpre").toString
    val lake = new graft.lake.SnapshotLake(spark, root + "/lake", "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("_id", "v"))
    lake.upsert(Seq(("b", 20), ("d", 40)).toDF("_id", "v"))
    lake.deleteWhere(col("_id") === "a")
    val feed = lake.changesBetween(1, 3, preImages = true)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(feed == Set(("a", 1, "delete"), ("b", 2, "update_pre"),
      ("b", 20, "update_post"), ("d", 40, "insert")))
    // the default form is unchanged: post-images only
    val noPre = lake.changesBetween(1, 3)
      .collect().map(_.getString(2)).toSet
    assert(noPre == Set("delete", "update_post", "insert"))
  }

  test("cli: profile / matagg / sketch operate the tiers end-to-end") {
    val root = Files.createTempDirectory("mataggcli").toString
    val (d1, d2) = rows.splitAt(2)
    df(d1).write.parquet(root + "/in1")
    df(d2).write.parquet(root + "/in2")
    df(rows).write.parquet(root + "/all")

    graft.cli.Main.run(spark, "profile", Array(
      "--in", root + "/all", "--cols", "grp,cents", "--out", root + "/prof"))
    val prof = spark.read.parquet(root + "/prof").orderBy("col_name").collect()
    assert(prof.length == 2 && prof.forall(_.getLong(1) == 5L))
    assert(prof.head.getString(0) == "cents" && prof.head.getLong(3) == 5L)

    val specArgs = Array("--path", root + "/sum", "--dims", "grp",
      "--sums", "s=cents", "--mins", "kmin=k", "--maxs", "kmax=k")
    graft.cli.Main.run(spark, "matagg",
      Array("--op", "land", "--in", root + "/in1", "--drop-id", "d1") ++ specArgs)
    graft.cli.Main.run(spark, "matagg",
      Array("--op", "land", "--in", root + "/in2", "--drop-id", "d2") ++ specArgs)
    graft.cli.Main.run(spark, "matagg", Array("--op", "compact") ++ specArgs)
    assert(served(root + "/sum") == oneShot(rows))

    graft.cli.Main.run(spark, "sketch", Array("--op", "land", "--in", root + "/all",
      "--path", root + "/sk", "--dims", "grp", "--key", "k", "--drop-id", "d0"))
    val nd = graft.ops.Sketches.serveDistinct(spark, root + "/sk", Seq("grp"), "k")
      .orderBy("grp").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(nd == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L))

    // hll set algebra through the cli: land two tiers, intersect serves
    // (library parity for the estimates; the cli path must parse + run)
    Seq("h1", "h2").foreach(p => graft.cli.Main.run(spark, "sketch",
      Array("--op", "land", "--in", root + "/all", "--path", s"$root/$p",
        "--kind", "hll", "--dims", "grp", "--key", "k", "--drop-id", "d0")))
    graft.cli.Main.run(spark, "sketch", Array("--op", "intersect",
      "--path", root + "/h1", "--path-b", root + "/h2", "--dims", "grp"))
    val ia = graft.ops.Sketches.serveHllSetAlgebra(spark, root + "/h1", root + "/h2", Seq("grp"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    // identical tiers: intersection == union == each side's estimate
    assert(ia == Seq(("a", 2L, 2L), ("b", 2L, 2L), ("c", 1L, 1L)), ia.toString)
  }

  test("spec validation rejects colliding or reserved aliases") {
    intercept[IllegalArgumentException](Spec(Seq("grp"), sums = Seq("n" -> col("cents"))))
    intercept[IllegalArgumentException](Spec(Seq("grp"), sums = Seq("grp" -> col("cents"))))
    intercept[IllegalArgumentException](
      Spec(Seq("grp"), sums = Seq("x" -> col("cents")), mins = Seq("x" -> col("k"))))
    intercept[IllegalArgumentException] {
      val path = tmp()
      MaterializedAgg.landDrop(df(rows), spec, path, "bad/../id")
    }
  }
}
