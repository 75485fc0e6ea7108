package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{SnapshotLake, ZoneMapIndex}

class ZoneMapIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A clustered snapshot lake: v1 scatters keys across files, v2
    * sort-rewrites by `v` so each file covers a narrow value interval —
    * the layout zone maps exist to exploit.
    */
  private def mkLake(dir: String): SnapshotLake = {
    val data = spark.range(20000).select(
      col("id").as("k"), (col("id") % 1000).cast("double").as("v"))
    val lake = new SnapshotLake(spark, s"$dir/t", "k")
    lake.overwrite(data.repartition(16, col("k")))
    lake.cluster(Seq(col("v")), 16)
    lake
  }

  test("range lookup: row-identical to a full scan, opens few files on a clustered lake") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toFile.getAbsolutePath
    val lake = mkLake(dir)
    val (kept0, built) = ZoneMapIndex.refreshSnapshot(lake, "v")
    assert(kept0 == 0L && built >= 16L,
      s"first build scans every live file across retained versions, got ($kept0, $built)")

    val (rows, opened) = ZoneMapIndex.rangeLookupSnapshot(
      lake, "v", lit(100.0), lit(149.0))
    val expect = lake.read.filter(col("v") >= 100.0 && col("v") <= 149.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet == expect)
    assert(expect.size == 20000 / 1000 * 50)
    // 5% of the value domain over 16 clustered files -> 1-2 files
    assert(opened <= 3, s"expected <=3 of 16+ files opened, got $opened")

    // empty range below the domain: zero files opened, zero rows
    val (miss, openedMiss) = ZoneMapIndex.rangeLookupSnapshot(
      lake, "v", lit(-10.0), lit(-1.0))
    assert(miss.count() == 0 && openedMiss == 0,
      s"out-of-domain range should prune everything, opened $openedMiss")
  }

  test("lagging sidecar stays correct; refresh is churn-proportional") {
    val dir = java.nio.file.Files.createTempDirectory("zm2").toFile.getAbsolutePath
    val lake = mkLake(dir)
    ZoneMapIndex.refreshSnapshot(lake, "v")

    // CoW upsert moves one key's value INTO the probed range; the new
    // files are sidecar-unknown -> unconditional candidates, so the
    // lookup is correct BEFORE any refresh (just less selective)
    lake.upsert(Seq((19999L, 125.0)).toDF("k", "v"))
    val (rows, _) = ZoneMapIndex.rangeLookupSnapshot(
      lake, "v", lit(100.0), lit(149.0))
    assert(rows.filter(col("k") === 19999L).count() == 1,
      "pre-refresh lookup must see rows in not-yet-indexed files")

    // the refresh scans ONLY the churn (the rewritten + new files), and
    // carries every untouched row verbatim
    val (kept, rebuilt) = ZoneMapIndex.refreshSnapshot(lake, "v")
    assert(kept >= 15L, s"untouched files must carry verbatim, kept $kept")
    assert(rebuilt >= 1L && rebuilt <= 4L,
      s"refresh must scan only the CoW churn, scanned $rebuilt")
    val (rows2, opened2) = ZoneMapIndex.rangeLookupSnapshot(
      lake, "v", lit(100.0), lit(149.0))
    assert(rows2.filter(col("k") === 19999L).count() == 1)
    assert(opened2 <= 5, s"post-refresh lookup should re-prune, opened $opened2")

    // a no-churn refresh carries everything verbatim and scans nothing
    val (kept3, scanned3) = ZoneMapIndex.refreshSnapshot(lake, "v")
    assert(kept3 == kept + rebuilt && scanned3 == 0L,
      s"no-churn refresh must be a carry-only pass: ($kept3, $scanned3)")
  }

  test("refreshSnapshotMulti: one churn scan, per-column sidecars identical to per-column refreshes") {
    val dir = java.nio.file.Files.createTempDirectory("zmmulti").toFile.getAbsolutePath
    val data = spark.range(5000).select(col("id").as("k"),
      (col("id") % 100).cast("double").as("v"), (col("id") % 7).as("w"))
    val lake = new SnapshotLake(spark, s"$dir/t", "k")
    lake.overwrite(data.repartition(8, col("k")))
    // v is indexed FIRST alone; w has no sidecar yet — the multi refresh
    // must honor each column's own freshness diff
    ZoneMapIndex.refreshSnapshot(lake, "v")
    lake.upsert(Seq((5000L, 123.0, 3L)).toDF("k", "v", "w")) // churn
    val rep = ZoneMapIndex.refreshSnapshotMulti(lake, Seq("v", "w"))
    assert(rep("v")._1 >= 7L && rep("v")._2 >= 1L && rep("v")._2 <= 3L,
      s"v must carry its old rows and scan only the churn: ${rep("v")}")
    assert(rep("w")._1 == 0L && rep("w")._2 >= 9L,
      s"w has no sidecar yet: every live file is its churn: ${rep("w")}")
    // both sidecars now serve metadata aggregates matching full scans
    val aggV = ZoneMapIndex.aggregateFromStats(lake, "v").collect().head
    assert(aggV.getDouble(1) == 123.0 && aggV.getLong(2) == 5001L)
    val aggW = ZoneMapIndex.aggregateFromStats(lake, "w").collect().head
    assert(aggW.getLong(0) == 0L && aggW.getLong(1) == 6L && aggW.getLong(2) == 5001L)
    // and a second multi refresh is a no-op carry for both
    val rep2 = ZoneMapIndex.refreshSnapshotMulti(lake, Seq("v", "w"))
    assert(rep2("v")._2 == 0L && rep2("w")._2 == 0L, s"no-churn must scan nothing: $rep2")
  }

  test("aggregateFromStats: metadata-only min/max/count == full scan; stale sidecar throws") {
    val dir = java.nio.file.Files.createTempDirectory("zmagg").toFile.getAbsolutePath
    val lake = mkLake(dir)
    ZoneMapIndex.refreshSnapshot(lake, "v")
    val got = ZoneMapIndex.aggregateFromStats(lake, "v").collect().head
    val want = lake.read.agg(min(col("v")), max(col("v")),
      count(lit(1)), count(col("v"))).collect().head
    assert((got.getDouble(0), got.getDouble(1), got.getLong(2), got.getLong(3)) ==
      (want.getDouble(0), want.getDouble(1), want.getLong(2), want.getLong(3)))
    // a CoW upsert invalidates coverage: the aggregate must THROW, not
    // serve a number missing the rewritten files
    lake.upsert(Seq((19999L, 5000.0)).toDF("k", "v"))
    val ex = intercept[IllegalStateException](
      ZoneMapIndex.aggregateFromStats(lake, "v"))
    assert(ex.getMessage.contains("refresh"), ex.getMessage)
    // refresh restores service, and the new max is visible
    ZoneMapIndex.refreshSnapshot(lake, "v")
    val got2 = ZoneMapIndex.aggregateFromStats(lake, "v").collect().head
    assert(got2.getDouble(1) == 5000.0 && got2.getLong(2) == 20000L)
    // time travel: the pre-upsert version still aggregates (its files
    // remain covered by carried sidecar rows)
    val v0 = ZoneMapIndex.aggregateFromStats(lake, "v", at = Some(2L)).collect().head
    assert(v0.getDouble(1) == 999.0 && v0.getLong(2) == 20000L)
  }

  test("streaming zonemapSink: drops land + sidecar follows, range scans stay pruned") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("zmsink").toString
    val lake = new SnapshotLake(spark, base + "/lake", "k")
    val feed = base + "/feed"
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", DoubleType)))
    def runFeed(): Unit = {
      val q = graft.streaming.EventStreams.zonemapSink(lake, "v")(
          spark.readStream.schema(schema).parquet(feed))
        .option("checkpointLocation", base + "/ckpt").start()
      q.awaitTermination()
    }
    spark.range(1000).select(col("id").as("k"), (col("id") % 100).cast("double").as("v"))
      .coalesce(4).write.mode("append").parquet(feed)
    runFeed()
    spark.range(1000, 1500).select(col("id").as("k"), lit(500.0).as("v"))
      .coalesce(1).write.mode("append").parquet(feed)
    runFeed() // checkpoint resume: only the second file is a new batch

    // both drops visible; the sidecar admits only interval-overlapping
    // files for a band exclusive to the SECOND drop
    val (rows, opened) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(500.0), lit(500.0))
    assert(rows.count() == 500)
    val total = lake.readManifest(lake.latestVersion.get).get.files.size
    assert(opened < total, s"sidecar must prune drop-1 files: opened=$opened of $total")
    val (miss, openedMiss) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(600.0), lit(700.0))
    assert(miss.count() == 0 && openedMiss == 0)

    // REPLAY PARITY: the stream-maintained sidecar must equal a batch
    // rebuild over the same lake — delete it, refresh from scratch, and
    // compare row sets (file/len/bounds/counts all included)
    def sidecarRows() = spark.read.parquet(base + "/lake/_zonemap_v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val streamed = sidecarRows()
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base + "/lake/_zonemap_v"), true)
    ZoneMapIndex.refreshSnapshot(lake, "v")
    assert(sidecarRows() == streamed,
      "per-batch streamed sidecar must equal the from-scratch batch refresh")
  }

  test("duplicate sidecar rows: the scan never reads a file twice; the aggregate throws") {
    val dir = java.nio.file.Files.createTempDirectory("zmdup").toFile.getAbsolutePath
    val data = spark.range(100).select(col("id").as("k"), (col("id") % 10).cast("double").as("v"))
    val lake = new SnapshotLake(spark, s"$dir/t", "k")
    lake.overwrite(data.repartitionByRange(4, col("v")))
    ZoneMapIndex.refreshSnapshot(lake, "v")
    val side = s"$dir/t/_zonemap_v"
    // corrupt the sidecar with a verbatim duplicate of every row (an
    // externally-merged/hand-restored sidecar): no in-repo writer does
    // this, but the serve paths must keep the pre-join duplicate
    // immunity — one open per candidate file, and a metadata aggregate
    // that THROWS instead of silently double-counting
    val dup = spark.read.parquet(side)
    val doubled = dup.unionByName(dup).localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(side)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(side), true)
    doubled.write.parquet(side)
    val (rows, opened) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(3.0), lit(4.0))
    assert(rows.count() == 20, "a duplicated stats row must not read its file twice")
    assert(opened <= lake.readManifest(lake.latestVersion.get).get.files.size)
    val ex = intercept[IllegalStateException] {
      ZoneMapIndex.aggregateFromStats(lake, "v")
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
  }

  test("date and string columns: min/max bounds prune in the column's own type order") {
    // the 100 TB pruning axis is usually a DATE — zone rows are generic
    // Column min/max and range bounds are typed lits, so no numeric
    // assumption may creep into the sidecar or the overlap predicate
    val dir = java.nio.file.Files.createTempDirectory("zmdate").toFile.getAbsolutePath
    val data = spark.range(2000).select(col("id").as("k"),
      date_add(to_date(lit("1995-01-01")), (col("id") % 400).cast("int")).as("d"),
      concat(lit("cat"), lpad((col("id") % 26).cast("string"), 2, "0")).as("s"))
    val lake = new SnapshotLake(spark, s"$dir/t", "k")
    lake.overwrite(data.repartition(8, col("k")))
    lake.cluster(Seq(col("d")), 8)
    ZoneMapIndex.refreshSnapshot(lake, "d")
    val nFiles = lake.readManifest(lake.latestVersion.get).get.files.size
    val (rows, opened) = ZoneMapIndex.rangeLookupSnapshot(lake, "d",
      to_date(lit("1995-02-01")), to_date(lit("1995-02-10")))
    assert(rows.count() == 50, "10 distinct dates x 5 rows each")
    assert(opened < nFiles, s"date sidecar must prune the clustered lake: $opened of $nFiles")
    val agg = ZoneMapIndex.aggregateFromStats(lake, "d").collect().head
    assert(agg.getDate(0).toString == "1995-01-01" &&
      agg.getDate(1).toString == "1996-02-04" && agg.getLong(2) == 2000L)
    // string column: lexicographic bounds, same machinery
    ZoneMapIndex.refreshSnapshot(lake, "s")
    val (srows, _) = ZoneMapIndex.rangeLookupSnapshot(lake, "s", lit("cat03"), lit("cat05"))
    assert(srows.count() == data.filter(col("s").between("cat03", "cat05")).count())
  }

  test("all-null file: (null, null) bounds prune instead of crashing the scan") {
    val dir = java.nio.file.Files.createTempDirectory("zmnull").toFile.getAbsolutePath
    // range-partition on v (nulls first) -> partition 0 is ALL null: its
    // zone row carries (null, null) bounds, the round-13 advice crash site
    val data = spark.range(100).select(col("id").as("k"),
      when(col("id") < 50, lit(null).cast("double"))
        .otherwise((col("id") % 10).cast("double")).as("v"))
    val lake = new SnapshotLake(spark, s"$dir/t", "k")
    lake.overwrite(data.repartitionByRange(2, col("v")))
    ZoneMapIndex.refreshSnapshot(lake, "v")
    val nFiles = lake.readManifest(lake.latestVersion.get).get.files.size
    assert(nFiles >= 2)
    // the scan must SURVIVE the null bounds and prune that file: a range
    // predicate never matches null values
    val (rows, opened) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(3.0), lit(4.0))
    assert(rows.count() == 10, "range rows must match the full-scan filter")
    assert(opened < nFiles, s"the all-null file must be pruned: opened=$opened of $nFiles")
    // and the out-of-domain probe still prunes everything
    val (miss, openedMiss) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(90.0), lit(99.0))
    assert(miss.count() == 0 && openedMiss == 0)
  }

  test("time travel: a range scan at an old version sees the old values") {
    val dir = java.nio.file.Files.createTempDirectory("zm3").toFile.getAbsolutePath
    val lake = mkLake(dir)
    val v2 = lake.latestVersion.get
    lake.upsert(Seq((5L, 9999.0)).toDF("k", "v")) // v3 moves k=5 out of range
    ZoneMapIndex.refreshSnapshot(lake, "v")
    val (old, _) = ZoneMapIndex.rangeLookupSnapshot(
      lake, "v", lit(5.0), lit(5.0), at = Some(v2))
    assert(old.filter(col("k") === 5L).count() == 1,
      "time-travel lookup must resolve the OLD manifest's files")
    val (now, _) = ZoneMapIndex.rangeLookupSnapshot(lake, "v", lit(5.0), lit(5.0))
    assert(now.filter(col("k") === 5L).count() == 0)
  }
}
