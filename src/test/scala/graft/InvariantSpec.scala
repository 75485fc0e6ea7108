package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.NtpIds
import graft.lake.LakeTable
import graft.pipeline.IngestJob
import graft.versions.Versions

/** The reference's operational `checking/` audits re-expressed as lake
  * invariants (SURVEY §5.4): after any sequence of ingests —
  *  - exactly one active row per natural key;
  *  - every tombstone's pointer chain resolves to an active row, no
  *    cycles (check_versions_completness semantics);
  *  - surrogate ids unique and inside their group's order range;
  *  - natural key maps to one active id (check_unique_place_id).
  */
class InvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buildLake(): LakeTable = {
    val dir = Files.createTempDirectory("lake-inv").toString + "/place"
    val lake = new LakeTable(spark, dir, "_id")
    val codes = Map("id" -> "id", "updated" -> "updated")
    val drop1 = Seq(
      ("url/a", "2024-01-01 10:00:00"), ("url/a", "2024-01-02 10:00:00"),
      ("url/b", "2024-01-01 09:00:00"), ("url/c", "2024-01-05 09:00:00")
    ).toDF("id", "updated")
    IngestJob.run(spark, lake, drop1, codes, "id", "updated", group = 0)
    val drop2 = Seq(
      ("url/a", "2024-02-01 10:00:00"), ("url/b", "2024-02-02 09:00:00"),
      ("url/d", "2024-02-03 09:00:00")
    ).toDF("id", "updated")
    IngestJob.run(spark, lake, drop2, codes, "id", "updated", group = 0)
    lake
  }

  test("lake invariants hold after multiple incremental ingests") {
    val state = buildLake().read.cache()
    val active = state.filter(col("obsolete_version").isNull)
    val tombs = state.filter(col("obsolete_version") === true)

    // one active row per natural key
    val dupActive = active.groupBy("id").count().filter(col("count") > 1).count()
    assert(dupActive == 0)

    // ids unique across the whole table
    assert(state.groupBy("_id").count().filter(col("count") > 1).count() == 0)

    // every id in the group-0 order range and well-formed
    assert(state.filter(!NtpIds.checkNtpId(col("_id"))).count() == 0)
    assert(state.filter(NtpIds.group(col("_id")) =!= 0).count() == 0)

    // tombstone chains resolve to an active row (no dangling, no cycles)
    val resolved = Versions.resolveChains(
      tombs.select(col("_id").as("src"), col("updated_to").as("dst")), "src", "dst")
    val dangling = resolved.join(active.select(col("_id").as("head")),
      col("resolved_to") === col("head"), "left_anti").count()
    assert(dangling == 0)

    // counts: 4 natural keys -> 4 active; 7 total versions -> 3 tombstones
    assert(active.count() == 4)
    assert(tombs.count() == 3)
    state.unpersist()
  }

  test("minors group ingests into its own id sub-space with independent watermark") {
    val dir = Files.createTempDirectory("lake-grp").toString + "/place"
    val lake = new LakeTable(spark, dir, "_id")
    val codes = Map("id" -> "id", "updated" -> "updated")
    IngestJob.run(spark, lake,
      Seq(("url/a", "2024-01-01 10:00:00")).toDF("id", "updated"), codes, "id", "updated", group = 0)
    IngestJob.run(spark, lake,
      Seq(("url/m1", "2024-01-01 10:00:00"), ("url/m2", "2024-01-02 10:00:00")).toDF("id", "updated"),
      codes, "id", "updated", group = 1)
    // group-0 sequence continues from ITS watermark, not the minors max
    IngestJob.run(spark, lake,
      Seq(("url/b", "2024-01-03 10:00:00")).toDF("id", "updated"), codes, "id", "updated", group = 0)
    val state = lake.read
    val orders = state.select(col("id"),
        NtpIds.group(col("_id")).as("g"), NtpIds.parseNtpId(col("_id")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(orders("url/a") == (0, 0L))
    assert(orders("url/m1") == (1, NtpIds.MinOrderMinors))
    assert(orders("url/m2") == (1, NtpIds.MinOrderMinors + 1))
    assert(orders("url/b") == (0, 1L)) // continued group-0 sequence
    assert(state.count() == 4 && state.filter(col("obsolete_version") === true).count() == 0)
  }

  test("partitioned lake: incremental drop rewrites ONLY touched buckets, state matches unpartitioned") {
    val base = Files.createTempDirectory("lake-part").toString
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title")
    val pLake = new LakeTable(spark, base + "/p", "_id", IngestJob.LakePartitionCols, nBuckets = 8)
    val uLake = new LakeTable(spark, base + "/u", "_id")
    val drop1 = (1 to 24).map(i => (s"url/k$i", "2024-01-01 10:00:00", s"t$i"))
      .toDF("id", "updated", "title")
    IngestJob.run(spark, pLake, drop1, codes, "id", "updated", group = 0)
    IngestJob.run(spark, uLake, drop1, codes, "id", "updated", group = 0)

    // snapshot (path -> (length, modTime)) of every file under bucket dirs
    def bucketFiles(dir: String): Map[String, (Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toString.stripPrefix(p.toString)
        if (rel.contains("bucket=")) b += rel -> (s.getLen, s.getModificationTime)
      }
      b.result()
    }
    val before = bucketFiles(base + "/p")
    assert(before.nonEmpty)

    // second drop touches ONE natural key -> exactly one bucket
    val touchedBucket = drop1.sparkSession.range(1)
      .select(pmod(hash(lit("url/k1")), lit(8)).cast("int")).collect().head.getInt(0)
    val drop2 = Seq(("url/k1", "2024-02-01 10:00:00", "t1v2")).toDF("id", "updated", "title")
    IngestJob.run(spark, pLake, drop2, codes, "id", "updated", group = 0)
    IngestJob.run(spark, uLake, drop2, codes, "id", "updated", group = 0)
    val after = bucketFiles(base + "/p")

    // every file outside the touched bucket is byte-identical and untouched
    // (same path set, same length, same modification time)
    def outside(m: Map[String, (Long, Long)]) = m.filterNot(_._1.contains(s"bucket=$touchedBucket"))
    assert(outside(before) == outside(after) && outside(before).nonEmpty)
    // the touched bucket WAS rewritten
    def inside(m: Map[String, (Long, Long)]) = m.filter(_._1.contains(s"bucket=$touchedBucket"))
    assert(inside(before) != inside(after))

    // final state is identical to the unpartitioned staged-rewrite path
    val cols = uLake.read.columns.sorted.toSeq
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).orderBy("_id").collect().map(_.toString).toSeq
    assert(dump(pLake.read.drop("grp", "bucket")) == dump(uLake.read))
    // partition values are derived, so they round-trip consistently
    assert(pLake.read.filter(
      col("grp") =!= NtpIds.group(col("_id")) ||
      col("bucket") =!= pmod(hash(col("id")), lit(8))).count() == 0)

    // the bucket restriction must reach the scan as a PARTITION filter
    // (directory pruning — bytes of untouched buckets are never read),
    // and the watermark's group filter must prune on grp the same way
    val scoped = pLake.read.filter(col("bucket").isin(3, 5))
    val scanLine = scoped.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("bucket"), s"no partition filter on bucket: $scanLine")
    val wmLine = pLake.read.filter(col("grp") === 0)
      .agg(max(NtpIds.parseNtpId(col("_id"))))
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(wmLine.contains("grp"), s"no partition filter on grp: $wmLine")

    // housekeeping: compaction over the live ingest layout (threshold 0
    // forces every partition through the rewrite) is state-neutral
    assert(pLake.compact(maxFilesPerPartition = 0).nonEmpty)
    assert(dump(pLake.read.drop("grp", "bucket")) == dump(uLake.read))
  }

  test("partitioned lake: a drop adding a NEW mapped column evolves the schema for every read") {
    val base = Files.createTempDirectory("lake-schema").toString
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title", "title2" -> "title2")
    val lake = new LakeTable(spark, base + "/p", "_id", IngestJob.LakePartitionCols, nBuckets = 8)
    val drop1 = (1 to 16).map(i => (s"url/k$i", "2024-01-01 10:00:00", s"t$i"))
      .toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop1, codes, "id", "updated", group = 0)

    // second drop touches ONE key and carries a NEW mapped column: it
    // lands physically in that key's bucket only, so without a persisted
    // table schema a plain parquet read samples a footer that may lack it.
    // Evolve via the key whose bucket dir sorts LAST, so footer sampling
    // in listing order is guaranteed to meet an un-evolved file first.
    val keyBuckets = (1 to 16).map { i =>
      val k = s"url/k$i"
      k -> spark.range(1).select(pmod(hash(lit(k)), lit(8)).cast("int")).collect().head.getInt(0)
    }
    val (evolKey, _) = keyBuckets.maxBy(_._2)
    val (otherKey, _) = keyBuckets.minBy(_._2)
    val drop2 = Seq((evolKey, "2024-02-01 10:00:00", "t1v2", "extra1"))
      .toDF("id", "updated", "title", "title2")
    IngestJob.run(spark, lake, drop2, codes, "id", "updated", group = 0)
    val state = lake.read
    assert(state.columns.contains("title2"),
      s"lake read dropped the evolved column: ${state.columns.toSeq}")
    assert(state.filter(col("id") === evolKey && col("obsolete_version").isNull)
      .select("title2").collect().head.getString(0) == "extra1")
    // every row outside the evolved one exposes the column as null
    assert(state.filter(col("title2").isNull).count() == state.count() - 1)

    // a third ingest touching a DIFFERENT bucket still sees (and carries)
    // the evolved column through its scoped merge
    val drop3 = Seq((otherKey, "2024-03-01 10:00:00", "t2v2")).toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop3, codes, "id", "updated", group = 0)
    val s3 = lake.read
    assert(s3.columns.contains("title2"))
    assert(s3.filter(col("id") === evolKey && col("obsolete_version").isNull)
      .select("title2").collect().head.getString(0) == "extra1")
    assert(s3.filter(col("id") === otherKey && col("obsolete_version").isNull)
      .count() == 1)
  }

  test("partitioned lake: per-group id watermark rides the sidecar, scan only as crash fallback") {
    val base = Files.createTempDirectory("lake-wm").toString
    val codes = Map("id" -> "id", "updated" -> "updated")
    val lake = new LakeTable(spark, base + "/p", "_id", IngestJob.LakePartitionCols, nBuckets = 8)
    def ingest(keys: String*): Unit = IngestJob.run(spark, lake,
      keys.map(k => (k, "2024-01-01 10:00:00")).toDF("id", "updated"),
      codes, "id", "updated", group = 0)
    def orderOf(key: String): Long = lake.read.filter(col("id") === key)
      .select(NtpIds.parseNtpId(col("_id"))).collect().head.getLong(0)
    def scanNext: Long = lake.read.filter(col("grp") === 0)
      .agg(max(NtpIds.parseNtpId(col("_id")))).collect().head.getLong(0) + 1

    ingest("url/a", "url/b")
    ingest("url/c")
    // sidecar committed with the land and equal to the scan-derived next
    assert(lake.readProps(IngestJob.WatermarkSidecar) == Map("next.0" -> "3"))
    assert(scanNext == 3L)

    // behavioral proof that steady state reads the sidecar, NOT the lake:
    // tamper the sidecar upward; the next fresh key must start exactly
    // there (a scan would have said 3)
    lake.writeProps(IngestJob.WatermarkSidecar, Map("next.0" -> "42"))
    ingest("url/d")
    assert(orderOf("url/d") == 42L)
    assert(lake.readProps(IngestJob.WatermarkSidecar) == Map("next.0" -> "43"))

    // crash fallback: sidecar deleted -> watermark recomputed by scan
    // (continues from the REAL max, 42), and the sidecar is rebuilt
    val fs = new org.apache.hadoop.fs.Path(base + "/p")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base + "/p", IngestJob.WatermarkSidecar), false)
    ingest("url/e")
    assert(orderOf("url/e") == 43L)
    assert(lake.readProps(IngestJob.WatermarkSidecar) == Map("next.0" -> "44"))

    // a second group keeps its own independent entry
    IngestJob.run(spark, lake,
      Seq(("url/m1", "2024-01-01 10:00:00")).toDF("id", "updated"), codes, "id", "updated", group = 1)
    val props = lake.readProps(IngestJob.WatermarkSidecar)
    assert(props("next.0") == "44" && props("next.1") == (NtpIds.MinOrderMinors + 1).toString)
  }

  test("repair: stale tombstone pointers repoint one hop to the active, touched buckets only") {
    val base = Files.createTempDirectory("lake-repair").toString
    val codes = Map("id" -> "id", "updated" -> "updated")
    val lake = new LakeTable(spark, base + "/p", "_id", IngestJob.LakePartitionCols, nBuckets = 8)
    def ingest(rows: (String, String)*): Unit = IngestJob.run(spark, lake,
      rows.toDF("id", "updated"), codes, "id", "updated", group = 0)

    // three sequential versions of the same key + padding keys in other
    // buckets; carried-forward tombstones go one hop stale by design
    ingest("url/a" -> "2024-01-01 10:00:00", "url/p1" -> "2024-01-01 10:00:00",
      "url/p2" -> "2024-01-01 10:00:00", "url/p3" -> "2024-01-01 10:00:00")
    ingest("url/a" -> "2024-02-01 10:00:00")
    ingest("url/a" -> "2024-03-01 10:00:00")
    val st = lake.read
    val activeId = st.filter(col("id") === "url/a" && col("obsolete_version").isNull)
      .select("_id").collect().head.getString(0)
    // the v1 tombstone points at v2 (a tombstone), not the active — stale
    val ptrs = st.filter(col("obsolete_version") === true)
      .select("updated_to").collect().map(_.getString(0)).toSet
    assert(ptrs.size == 2 && ptrs.contains(activeId))
    val nBefore = st.count() // materialized pre-repair: st's file listing dies with the land

    val aBucket = spark.range(1)
      .select(pmod(hash(lit("url/a")), lit(8)).cast("int")).collect().head.getInt(0)
    def files(): Map[String, (Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(base + "/p")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toString.stripPrefix(p.toString)
        if (rel.contains("bucket=")) b += rel -> (s.getLen, s.getModificationTime)
      }
      b.result()
    }
    val before = files()

    val report = graft.pipeline.RepairJob.run(spark, lake, "id")
    assert(report.count() == 1) // exactly the stale v1 tombstone
    val r = report.collect().head
    assert(r.getAs[String]("action") == "REPOINTED" && r.getAs[String]("new_to") == activeId)

    // every tombstone now points DIRECTLY at the active head (one hop)
    val after = lake.read
    assert(after.filter(col("obsolete_version") === true && col("updated_to") =!= activeId)
      .count() == 0)
    assert(after.count() == nBefore) // repair rewrites pointers, never rows

    // only the stale key's bucket was rewritten
    def outside(m: Map[String, (Long, Long)]) = m.filterNot(_._1.contains(s"bucket=$aBucket"))
    assert(outside(before) == outside(files()) && outside(before).nonEmpty)

    // idempotent: a clean lake reports nothing
    assert(graft.pipeline.RepairJob.run(spark, lake, "id").count() == 0)
  }

  test("repair: NO_ACTIVE and legacy-recovery arms (J7) report without corrupting rows") {
    val base = Files.createTempDirectory("lake-repair-legacy").toString
    val codes = Map("id" -> "id", "updated" -> "updated")
    val lake = new LakeTable(spark, base + "/p", "_id", IngestJob.LakePartitionCols, nBuckets = 8)
    IngestJob.run(spark, lake,
      Seq(("url/a", "2024-01-01 10:00:00")).toDF("id", "updated"), codes, "id", "updated", group = 0)
    val activeId = lake.read.filter(col("obsolete_version").isNull)
      .select("_id").collect().head.getString(0)

    // fabricate two dangling tombstones: ghost keys with no active, each
    // pointing at an id absent from the lake
    def ghost(id: String, nk: String, to: String) = {
      import org.apache.spark.sql.Row
      val st = lake.read.schema
      val vals = st.map(f => f.name match {
        case "_id" => id
        case "id" => nk
        case "updated_to" => to
        case "obsolete_version" => true
        case "grp" => 0
        case "bucket" => spark.range(1)
          .select(pmod(hash(lit(nk)), lit(8)).cast("int")).collect().head.getInt(0)
        case _ => null
      })
      spark.createDataFrame(java.util.List.of(Row.fromSeq(vals)), st)
    }
    lake.upsert(ghost("zz1", "url/ghost1", "gone1"))
    lake.upsert(ghost("zz2", "url/ghost2", "gone2"))

    // without legacy: both report NO_ACTIVE, nothing rewritten
    val rep1 = graft.pipeline.RepairJob.run(spark, lake, "id")
    assert(rep1.filter(col("action") === "NO_ACTIVE").count() == 2)
    assert(lake.read.filter(col("_id") === "zz1").collect().head
      .getAs[String]("updated_to") == "gone1")

    // legacy knows gone1 belongs to url/a (which has an active): that arm
    // repoints; gone2 is unknown -> NOT_IN_LEGACY, untouched
    val legacy = Seq(("gone1", "url/a")).toDF("_id", "id")
    val rep2 = graft.pipeline.RepairJob.run(spark, lake, "id", Some(legacy))
    val byAction = rep2.collect().map(r => r.getAs[String]("_id") -> r.getAs[String]("action")).toMap
    assert(byAction("zz1") == "REPOINTED" && byAction("zz2") == "NOT_IN_LEGACY")
    assert(lake.read.filter(col("_id") === "zz1").collect().head
      .getAs[String]("updated_to") == activeId)
    assert(lake.read.filter(col("_id") === "zz2").collect().head
      .getAs[String]("updated_to") == "gone2")
  }

  test("streaming CDC ingest converges to the batch double-ingest state") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("lake-cdc").toString
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title")
    val drop1 = Seq(
      ("url/a", "2024-01-01 10:00:00", "first a"),
      ("url/b", "2024-01-02 09:00:00", "first b")
    ).toDF("id", "updated", "title")
    val drop2 = Seq(
      ("url/a", "2024-02-01 10:00:00", "second a"), // new version of a
      ("url/c", "2024-02-02 09:00:00", "first c")
    ).toDF("id", "updated", "title")

    // batch truth: two sequential IngestJob runs (partitioned layout)
    val bLake = new LakeTable(spark, base + "/batch", "_id", IngestJob.LakePartitionCols, 8)
    IngestJob.run(spark, bLake, drop1, codes, "id", "updated", group = 0)
    IngestJob.run(spark, bLake, drop2, codes, "id", "updated", group = 0)

    // streaming: the same drops land as files in a feed directory; each
    // AvailableNow pass picks up the new file and runs the merge per batch
    val sLake = new LakeTable(spark, base + "/stream", "_id", IngestJob.LakePartitionCols, 8)
    val feed = base + "/feed"
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("updated", StringType), StructField("title", StringType)))
    def runFeed(): Unit = {
      val q = graft.streaming.EventStreams.ingestSink(sLake, codes, "id", "updated", 0)(
          spark.readStream.schema(schema).parquet(feed))
        .option("checkpointLocation", base + "/ckpt").start()
      q.awaitTermination()
    }
    drop1.write.mode("append").parquet(feed)
    runFeed()
    drop2.write.mode("append").parquet(feed)
    runFeed() // checkpoint resume: only the new file is processed

    val cols = bLake.read.columns.sorted.toSeq
    def dump(lake: LakeTable) =
      lake.read.select(cols.map(col): _*).orderBy("_id").collect().map(_.toString).toSeq
    assert(dump(sLake) == dump(bLake))
    assert(sLake.read.count() == 4) // a(v1 tombstone) + a(v2) + b + c
  }

  test("J2: overlapping re-deliveries merge id-stable; ingest is idempotent") {
    val dir = Files.createTempDirectory("lake-j2").toString + "/place"
    val lake = new LakeTable(spark, dir, "_id")
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title")
    val drop1 = Seq(
      ("url/a", "2024-01-01 10:00:00", "first a"),
      ("url/b", "2024-01-02 09:00:00", "first b")
    ).toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop1, codes, "id", "updated", group = 0)
    val ids1 = lake.read.select("id", "_id").as[(String, String)].collect().toMap

    // 1. exact re-delivery of the same drop: no id churn, no tombstones
    IngestJob.run(spark, lake, drop1, codes, "id", "updated", group = 0)
    val s2 = lake.read
    assert(s2.count() == 2)
    assert(s2.filter(col("obsolete_version") === true).count() == 0)
    assert(s2.select("id", "_id").as[(String, String)].collect().toMap == ids1)

    // 2. same-version re-delivery with a changed field: merged in place —
    //    id stable, field updated, patch recorded
    val drop3 = Seq(("url/a", "2024-01-01 10:00:00", "retitled a")).toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop3, codes, "id", "updated", group = 0)
    val s3 = lake.read
    assert(s3.count() == 2 && s3.filter(col("obsolete_version") === true).count() == 0)
    val aRow = s3.filter(col("id") === "url/a").collect().head
    assert(aRow.getAs[String]("_id") == ids1("url/a"))
    assert(aRow.getAs[String]("title") == "retitled a")
    val patches = lake.readPatches.filter(col("_id") === ids1("url/a"))
    assert(patches.filter(array_contains(col("modified"), "title")).count() >= 1)

    // 3. empty new value never erases an existing one (F19 precedence)
    val drop3b = Seq(("url/a", "2024-01-01 10:00:00", "")).toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop3b, codes, "id", "updated", group = 0)
    assert(lake.read.filter(col("id") === "url/a").collect().head
      .getAs[String]("title") == "retitled a")

    // 4. a genuinely new version still versions: new id + tombstone chain
    val drop4 = Seq(("url/a", "2024-03-01 10:00:00", "newer a")).toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop4, codes, "id", "updated", group = 0)
    val s4 = lake.read
    assert(s4.count() == 3)
    val newActive = s4.filter(col("id") === "url/a" && col("obsolete_version").isNull).collect().head
    assert(newActive.getAs[String]("_id") != ids1("url/a"))
    val tomb = s4.filter(col("_id") === ids1("url/a")).collect().head
    assert(tomb.getAs[Boolean]("obsolete_version"))
    assert(tomb.getAs[String]("updated_to") == newActive.getAs[String]("_id"))

    // 5. a row with a NULL timestamp still ingests (as fresh): its
    //    timeline compacts to [] and its overlap must coalesce to false —
    //    a NULL overlap once dropped the row from BOTH classification
    //    branches, silently losing it from the ingest. (A garbage STRING
    //    timestamp fails loudly at the ANSI cast, which is the right
    //    behavior; null is the silent shape.)
    val drop5 = Seq(("url/nullts", null.asInstanceOf[String], "ghost"))
      .toDF("id", "updated", "title")
    IngestJob.run(spark, lake, drop5, codes, "id", "updated", group = 0)
    assert(lake.read.filter(col("id") === "url/nullts").count() == 1,
      "null-timestamp rows must classify as fresh, never vanish")
    // and re-delivering it against ITS OWN active (both timelines empty —
    // overlap unprovable) keeps it present rather than losing it
    IngestJob.run(spark, lake, drop5, codes, "id", "updated", group = 0)
    assert(lake.read.filter(col("id") === "url/nullts").count() >= 1)
  }

  test("id-space ceiling: a drop that would cross its group's boundary is refused loudly") {
    val dir = Files.createTempDirectory("lake-ceiling").toString + "/place"
    // partitioned layout: the watermark sidecar is only consulted there
    val lake = new LakeTable(spark, dir, "_id", IngestJob.LakePartitionCols, nBuckets = 4)
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title")
    // seed the lake, then plant a watermark just under group 0's 10M
    // ceiling: the next 2-row drop must refuse instead of silently
    // minting ntp1000000x ids that NtpIds.group reclassifies as minors
    IngestJob.run(spark, lake,
      Seq(("url/a", "2024-01-01 10:00:00", "a")).toDF("id", "updated", "title"),
      codes, "id", "updated", group = 0)
    lake.writeProps(IngestJob.WatermarkSidecar, Map("next.0" -> "9999999"))
    val e = intercept[IllegalArgumentException] {
      IngestJob.run(spark, lake,
        Seq(("url/x", "2024-01-01 10:00:00", "x"),
            ("url/y", "2024-01-01 10:00:00", "y")).toDF("id", "updated", "title"),
        codes, "id", "updated", group = 0)
    }
    assert(e.getMessage.contains("id space exhausted"))
  }
}
