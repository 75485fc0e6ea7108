package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{SnapshotConflict, SnapshotLake}

class SnapshotLakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("snaplake").toString + "/t"

  test("overwrite/append/upsert/delete roll versions; read sees the newest") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    lake.append(Seq(("c", 3)).toDF("_id", "v"))
    lake.upsert(Seq(("b", 20), ("d", 40)).toDF("_id", "v"))
    lake.deleteWhere(col("_id") === "a")
    val got = lake.read.orderBy("_id").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(got.toSeq == Seq("b" -> 20, "c" -> 3, "d" -> 40))
    assert(lake.latestVersion.contains(4L))
  }

  test("time travel: every historical version stays readable pre-vacuum") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    lake.upsert(Seq(("b", 20)).toDF("_id", "v"))
    lake.deleteWhere(col("_id") === "a")
    assert(lake.readAt(1).orderBy("_id").collect().map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(lake.readAt(2).orderBy("_id").collect().map(_.getInt(1)).toSeq == Seq(1, 20))
    assert(lake.readAt(3).orderBy("_id").collect().map(_.getInt(1)).toSeq == Seq(20))
  }

  test("CoW upsert rewrites ONLY the files containing batch keys") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    // 4 range-partitioned files: each holds a known contiguous id range
    val base = (0 until 40).map(i => (f"id$i%03d", i)).toDF("_id", "v")
      .repartitionByRange(4, col("_id"))
    lake.overwrite(base)
    val m1 = lake.readManifest(1L).get
    assert(m1.files.size == 4)
    lake.upsert(Seq(("id000", 100)).toDF("_id", "v")) // touches one range file
    val m2 = lake.readManifest(2L).get
    val carried = m2.files.map(_.rel).toSet intersect m1.files.map(_.rel).toSet
    assert(carried.size == 3, s"expected 3 carried-by-reference files, got $carried")
    val got = lake.read.orderBy("_id").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(got.length == 40 && got.head == ("id000" -> 100) && got(1) == ("id001" -> 1))
  }

  test("snapshot isolation: a resolved version is unaffected by later commits") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    val reader = lake.readAt(1) // plan resolved against v1's file list
    lake.upsert(Seq(("a", 99)).toDF("_id", "v"))
    lake.deleteWhere(col("_id") === "zz") // no-match predicate: no new version
    assert(reader.collect().head.getInt(1) == 1)
    assert(lake.read.collect().head.getInt(1) == 99)
    assert(lake.latestVersion.contains(2L))
  }

  test("a commit built against a stale base self-aborts with SnapshotConflict") {
    val dir = tmp()
    val lake = new SnapshotLake(spark, dir, "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    lake.append(Seq(("b", 2)).toDF("_id", "v")) // v2 — the intervening commit
    // a writer that built its file list against v1 commits now: must lose
    val stale = intercept[SnapshotConflict] {
      lake.commitVersion(base = 1L, op = "upsert",
        schema = lake.readManifest(1L).get.schema, files = lake.readManifest(1L).get.files)
    }
    assert(stale.getMessage.contains("v2"))
    assert(lake.latestVersion.contains(2L)) // the loser's claim was rolled back
    assert(lake.read.count() == 2)
  }

  test("REAL writer race: concurrent upserts with conflict-retry all land exactly once, versions dense") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("base", 0)).toDF("_id", "v"))
    val nWriters = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to nWriters).map { i =>
      new Thread(() => {
        try {
          var done = false
          var attempts = 0
          while (!done && attempts < 20) {
            attempts += 1
            try { lake.upsert(Seq((s"w$i", i)).toDF("_id", "v")); done = true }
            catch { case _: SnapshotConflict => () } // rebuild-and-retry contract
          }
          if (!done) errors.add(new RuntimeException(s"writer $i never landed"))
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    // unbounded join: a timed join under full-suite load once returned
    // while a writer was still mid-upsert, and the test misread the
    // still-in-flight row as a lost update
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"writer errors: ${errors.toArray.mkString("; ")}")
    // every writer's row present exactly once, nothing lost to the race
    val got = lake.read.orderBy("_id").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(got.toSeq == ("base" -> 0) +: (1 to nWriters).map(i => s"w$i" -> i),
      s"lost or duplicated rows: ${got.toSeq}")
    // exactly one COMPLETE manifest per successful commit. Density of the
    // version NUMBERS is deliberately not asserted: a conflicted claim's
    // deleted number can be skipped by a concurrent claimer (permanent,
    // harmless hole) — the protocol guarantees no complete version is
    // ever built on a base that skips another complete version, not
    // consecutive numbering
    val complete = lake.history().collect().map(_.getLong(0)).sorted
    assert(complete.length == nWriters + 1,
      s"expected ${nWriters + 1} complete manifests, got ${complete.toSeq}")
    // the commit chain is linear over the COMPLETE versions: each commit
    // based on its complete predecessor (that is what carries every row)
    val bases = lake.history().orderBy(col("version")).collect()
      .map(r => r.getLong(0) -> r.getLong(3))
    bases.sliding(2).foreach {
      case Array((_, _), (v, b)) =>
        assert(b == bases.takeWhile(_._1 < v).last._1,
          s"v$v based on v$b, skipping a complete version: ${bases.toSeq}")
      case _ => ()
    }
  }

  test("claim storm: racing claimants never share a version number (O_EXCL claim)") {
    // drives commitVersion directly (no Spark jobs): 20 rounds of 8
    // barrier-synchronized SINGLE-attempt claimants racing for the same
    // base — the reproducer for two local-fs hazards this spec caught:
    // (1) fs.create(p, overwrite=false)'s exists-then-create TOCTOU let
    // two writers win the SAME version number, one manifest silently
    // replacing the other with both reporting success (now O_EXCL via
    // java.nio on file: schemes); (2) a conflicting loser's claim
    // delete raced readers' exists-then-open in readManifest, turning
    // writer conflicts into reader FileNotFound crashes
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("base", 0)).toDF("_id", "v"))
    val schema = lake.readManifest(1L).get.schema
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    var successes = 0
    (1 to 20).foreach { round =>
      val base = lake.latestVersion.get
      val files = lake.readManifest(base).get.files
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (1 to 8).map { _ =>
        new Thread(() => {
          try {
            barrier.await()
            try { lake.commitVersion(base, "append", schema, files); wins.incrementAndGet() }
            catch { case _: SnapshotConflict => () } // losing IS the contract
          } catch { case t: Throwable => errors.add(t) }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      // exactly one winner: any claimant on a later number must conflict
      // on the winner's claim; TWO winners == the shared-number bug
      assert(wins.get == 1, s"round $round: ${wins.get} writers won one base")
      successes += wins.get
    }
    assert(errors.isEmpty,
      s"claim/read errors under the storm: ${errors.toArray.take(3).mkString("; ")}")
    assert(lake.history().count() == (1 + successes).toLong)
  }

  test("9-digit versions stay visible: claim naming pads to AT LEAST 8 digits") {
    val dir = tmp()
    val lake = new SnapshotLake(spark, dir, "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    // simulate the lake's 100-millionth commit: the manifest name grows a
    // 9th digit. An exact-8 listing regex would blind latestVersion and
    // wedge every later claim against the invisible file. The body's
    // version field must move with the name (base chains read it).
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p1 = new org.apache.hadoop.fs.Path(dir, "_snap/v00000001.manifest")
    val body = {
      val in = fs.open(p1)
      try org.apache.commons.io.IOUtils.toString(in, java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_snap/v100000001.manifest"), false)
    try out.write(body.replace("version=1\n", "version=100000001\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(fs.delete(p1, false))
    assert(lake.latestVersion.contains(100000001L))
    assert(lake.read.count() == 1)
    lake.append(Seq(("b", 2)).toDF("_id", "v"))
    assert(lake.latestVersion.contains(100000002L))
    assert(lake.read.count() == 2)
  }

  test("torn manifest is invisible to readers and does not block writers") {
    val dir = tmp()
    val lake = new SnapshotLake(spark, dir, "_id", claimStaleMs = 0L)
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    // a crashed writer left a truncated claim at v2 (no `end` terminator)
    val torn = java.nio.file.Paths.get(dir, "_snap", "v00000002.manifest")
    Files.writeString(torn, "version=2\nop=upsert\nts=0\nbase=1\nf 10 data/ghost.parquet\n")
    assert(lake.latestVersion.contains(1L)) // reader falls back
    lake.append(Seq(("b", 2)).toDF("_id", "v")) // writer allocates ABOVE the corpse
    assert(lake.latestVersion.contains(3L))
    assert(lake.read.count() == 2)
  }

  test("vacuum removes unreferenced data, keeps retained versions readable") {
    val dir = tmp()
    val lake = new SnapshotLake(spark, dir, "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    lake.overwrite(Seq(("a", 2)).toDF("_id", "v"))
    lake.overwrite(Seq(("a", 3)).toDF("_id", "v"))
    val (dataGone, manGone) = lake.vacuum(retainVersions = 2)
    assert(dataGone >= 1 && manGone == 1)
    assert(lake.readAt(2).collect().head.getInt(1) == 2)
    assert(lake.readAt(3).collect().head.getInt(1) == 3)
    intercept[IllegalArgumentException] { lake.readAt(1) }
    // the data dir holds exactly the retained versions' files
    val left = new java.io.File(dir, "data").list().filterNot(_.startsWith(".")).toSet
    val want = (2L to 3L).flatMap(v =>
      lake.readManifest(v).get.files.map(_.rel.split('/').last)).toSet
    assert(left == want)
  }

  test("schema evolution: appended column reads as null from old files") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    lake.append(Seq(("b", 2, "fresh")).toDF("_id", "v", "note"))
    val got = lake.read.orderBy("_id").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(got(0).isNullAt(2) && got(1).getString(2) == "fresh")
    // time travel to v1 sees the ORIGINAL two-column schema
    assert(lake.readAt(1).columns.toSeq == Seq("_id", "v"))
  }

  test("changesBetween classifies insert/update/delete; CoW-carried rows cancel") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    // 4 range files so the upsert's CoW rewrite copies neighbours verbatim
    lake.overwrite((0 until 40).map(i => (f"id$i%03d", i)).toDF("_id", "v")
      .repartitionByRange(4, col("_id")))
    lake.upsert(Seq(("id000", 100), ("id999", 999)).toDF("_id", "v")) // update + insert
    lake.deleteWhere(col("_id") === "id039")                          // delete
    val ch = lake.changesBetween(1L, 3L).orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // id001..id009 share id000's rewritten file; id030..id038 share id039's:
    // all copied verbatim, none may surface as changes
    assert(ch.toSeq == Seq(("id000", 100, "update_post"),
      ("id039", 39, "delete"), ("id999", 999, "insert")))
  }

  test("changesBetween reads churned files only, never the carried bulk") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite((0 until 40).map(i => (f"id$i%03d", i)).toDF("_id", "v")
      .repartitionByRange(4, col("_id")))
    lake.upsert(Seq(("id000", 100)).toDF("_id", "v")) // rewrites 1 of 4 files
    val m1 = lake.readManifest(1L).get.files.map(_.rel).toSet
    val m2 = lake.readManifest(2L).get.files.map(_.rel).toSet
    val carried = (m1 intersect m2).map(_.split('/').last)
    // the upsert rewrote only the file(s) holding id000; everything else
    // is carried by reference (don't hardcode 3 — a sampling-based range
    // partitioner may legally produce an empty partition)
    val rewritten = m1.size - carried.size
    assert(carried.nonEmpty && rewritten >= 1,
      s"expected >=1 rewritten and >=1 carried file, carried=$carried of ${m1.size}")
    val opened = lake.changesBetween(1L, 2L).inputFiles.map(_.split('/').last).toSet
    assert(opened.nonEmpty && (opened intersect carried).isEmpty,
      s"change feed opened carried-by-reference files: ${opened intersect carried}")
  }

  test("changesBetween collapses intermediate states to net changes") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    lake.upsert(Seq(("a", 10), ("c", 3)).toDF("_id", "v"))  // a updated, c inserted
    lake.upsert(Seq(("a", 11)).toDF("_id", "v"))            // a updated AGAIN
    lake.deleteWhere(col("_id") === "c")                    // c insert+delete = nothing
    val ch = lake.changesBetween(1L, 4L).orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(ch.toSeq == Seq(("a", 11, "update_post")))       // final post-image only
    assert(lake.changesBetween(2L, 2L).isEmpty)             // same-version diff is empty
  }

  test("changesBetween under schema evolution: pre-image reads new field as null") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    lake.append(Seq(("c", 3, "fresh")).toDF("_id", "v", "note"))
    val ch = lake.changesBetween(1L, 2L).orderBy("_id").collect()
    assert(ch.map(_.getString(0)).toSeq == Seq("c"))
    assert(ch.head.getString(2) == "fresh" && ch.head.getString(3) == "insert")
    // an update whose only change IS the new column still surfaces
    lake.upsert(Seq(("a", 1, "tagged")).toDF("_id", "v", "note"))
    val ch2 = lake.changesBetween(2L, 3L).orderBy("_id").collect()
    assert(ch2.map(r => (r.getString(0), r.getString(2), r.getString(3))).toSeq ==
      Seq(("a", "tagged", "update_post")))
  }

  test("history is manifest-only and complete") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    lake.upsert(Seq(("b", 2)).toDF("_id", "v"))
    val h = lake.history().orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "overwrite", 2L -> "upsert"))
    assert(h.forall(_.getLong(4) > 0)) // n_files
    assert(h.map(_.getLong(3)).toSeq == Seq(0L, 1L)) // base_version chain
  }

  test("compact packs small files, carries big ones, keeps rows and history") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    // 8 small files via hash repartition
    lake.overwrite((0 until 400).map(i => (f"id$i%03d", i)).toDF("_id", "v")
      .repartition(8, col("_id")))
    val before = lake.read.orderBy("_id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val m1 = lake.readManifest(1L).get.files

    val (packed, produced) = lake.compact(smallBytes = 1L << 20, targetBytes = 1L << 30)
    assert(packed == 8 && produced == 1, s"8 tiny files should pack to 1, got ($packed, $produced)")
    val m2 = lake.readManifest(2L).get
    assert(m2.op == "compact" && m2.files.size == 1)
    // row-identical, and v1 still resolves the old layout
    assert(lake.read.orderBy("_id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq == before)
    assert(lake.readAt(1L).count() == 400 &&
      lake.readAt(1L).inputFiles.length == m1.size)
    // a second compact is a no-op: nothing left to pack
    assert(lake.compact(smallBytes = 1L << 20, targetBytes = 1L << 30) == ((0, 0)))
    assert(lake.latestVersion.contains(2L), "no-op compact must not roll a version")
  }

  test("compact carries files already at target size by reference") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite((0 until 400).map(i => (f"id$i%03d", i)).toDF("_id", "v")
      .repartition(4, col("_id")))
    // threshold below the 4 real files' size -> all 4 are "big": no-op
    assert(lake.compact(smallBytes = 10L, targetBytes = 1L << 30) == ((0, 0)))
    // threshold above: all pack; the carried set is empty here, so use a
    // mixed lake — append tiny files next to the big ones
    lake.append(Seq(("zz1", 1), ("zz2", 2)).toDF("_id", "v").repartition(2))
    val big = lake.readManifest(2L).get.files.sortBy(-_.len).take(2).map(_.rel).toSet
    val sizes = lake.readManifest(2L).get.files.map(_.len).sorted
    val cut = sizes(sizes.size - 2) // keep the 2 largest as "big"
    val (packed, produced) = lake.compact(smallBytes = cut, targetBytes = 1L << 30)
    assert(packed >= 2 && produced == 1)
    val m3 = lake.readManifest(3L).get.files.map(_.rel).toSet
    assert(big.subsetOf(m3), "the big files must be carried by reference")
    assert(lake.read.count() == 402)
  }

  test("cluster rewrites sorted as a version; range predicates prune files") {
    val lake = new SnapshotLake(spark, tmp(), "id")
    // ids arrive hash-scattered: every file spans the whole id range, so
    // min/max footers prune nothing
    lake.overwrite(spark.range(4000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8, col("id")))
    // candidate files for id < 500 by each file's min/max — what the
    // parquet footer skip evaluates
    def candidatesAt(v: Long): Long =
      lake.readAt(v).groupBy(input_file_name()).agg(min("id").as("mn"))
        .filter(col("mn") < 500).count()
    assert(candidatesAt(1L) == 8, s"hash layout must not prune, got ${candidatesAt(1L)}")

    lake.cluster(Seq(col("id")), nFiles = 8)
    val m2 = lake.readManifest(2L).get
    assert(m2.op == "cluster" && m2.files.size == 8)
    assert(candidatesAt(2L) <= 2,
      s"clustered layout should prune to ~1 of 8 files, got ${candidatesAt(2L)}")
    // row-identical; pre-cluster version keeps the old scattered layout
    assert(lake.read.count() == 4000)
    assert(lake.read.agg(sum("id")).head().getLong(0) ==
      lake.readAt(1L).agg(sum("id")).head().getLong(0))
  }

  test("streaming snapshotSink: replayed drops converge and version per batch") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("snapsink").toString
    val lake = new SnapshotLake(spark, base + "/lake", "_id")
    val feed = base + "/feed"
    val schema = StructType(Seq(StructField("_id", StringType), StructField("v", IntegerType)))
    def runFeed(): Unit = {
      val q = graft.streaming.EventStreams.snapshotSink(lake)(
          spark.readStream.schema(schema).parquet(feed))
        .option("checkpointLocation", base + "/ckpt").start()
      q.awaitTermination()
    }
    Seq(("a", 1), ("b", 2)).toDF("_id", "v").coalesce(1).write.mode("append").parquet(feed)
    runFeed()
    Seq(("a", 10), ("c", 3)).toDF("_id", "v").coalesce(1).write.mode("append").parquet(feed)
    runFeed() // checkpoint resume: only the second file is a new batch

    assert(lake.read.orderBy("_id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 10), ("b", 2), ("c", 3)))
    val ops = lake.history().orderBy("version").collect().map(_.getString(1)).toSeq
    assert(ops == Seq("overwrite", "upsert"), s"one version per non-empty batch, got $ops")
    // and the journey is CDC-queryable
    val ch = lake.changesBetween(1L, 2L).orderBy("_id").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(ch == Seq(("a", "update_post"), ("c", "insert")))
  }

  test("streaming quarantineSink: clean rows land, dirty rows dead-letter with their rules") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("quarsink").toString
    val lake = new SnapshotLake(spark, base + "/lake", "_id")
    val feed = base + "/feed"
    val quar = base + "/deadletter"
    val schema = StructType(Seq(StructField("_id", StringType), StructField("v", IntegerType)))
    val rules = Seq(graft.ops.Expectations.inRange("v", lit(0), lit(100)))
    def runFeed(): Unit = {
      val q = graft.streaming.EventStreams.quarantineSink(lake, rules, quar)(
          spark.readStream.schema(schema).parquet(feed))
        .option("checkpointLocation", base + "/ckpt").start()
      q.awaitTermination()
    }
    Seq(("a", 1), ("bad", 999), ("b", 2)).toDF("_id", "v")
      .coalesce(1).write.mode("append").parquet(feed)
    runFeed()
    Seq(("c", 3), ("worse", -7)).toDF("_id", "v")
      .coalesce(1).write.mode("append").parquet(feed)
    runFeed() // checkpoint resume: only the second file is a new batch

    // the lake got ONLY the clean rows; the stream never wedged on the
    // bad ones
    assert(lake.read.orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2), ("c", 3)))
    // dead letters carry the violated rules and their batch id
    val dead = spark.read.parquet(quar).orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getSeq[String](r.fieldIndex("violated")).toList))
    assert(dead.toSeq ==
      Seq(("bad", 999, List("in_range(v)")), ("worse", -7, List("in_range(v)"))))

    // CRASH REPLAY: simulate a crash between the quarantine landing and
    // the engine's batch commit — delete the last batch's commit record
    // so the restart re-runs the SAME batch id. The dead-letter seg is
    // REPLACED, not appended: zero duplicates across the re-run.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(base + "/ckpt/commits"))
      .map(_.getPath).filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toLong)
    fs.delete(last, false)
    runFeed() // replays the last batch under its original id
    val deadAfter = spark.read.parquet(quar).orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(deadAfter.toSeq == Seq(("bad", 999), ("worse", -7)),
      s"batch replay must not duplicate dead letters: ${deadAfter.toSeq}")
    // and the lake converged identically (upsert idempotent per content)
    assert(lake.read.orderBy("_id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("a writer committed past as a stale corpse fails loudly instead of returning success") {
    val dir = tmp()
    val lake = new SnapshotLake(spark, dir, "_id", claimStaleMs = 100L)
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v")) // v1
    // writer A claims v2, then stalls past claimStaleMs with the claim
    // still torn (empty manifest = claimed but contentless)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aClaim = new org.apache.hadoop.fs.Path(dir, "_snap/v00000002.manifest")
    fs.create(aClaim, false).close()
    Thread.sleep(250)
    // writer B validates, classifies A's claim as a corpse, and commits
    // v3 with base=1 — A's version is now pre-shadowed
    lake.append(Seq(("b", 2)).toDF("_id", "v"))
    assert(lake.readManifest(3L).exists(_.base == 1L))
    // A resumes and lands its content: the post-write shadow check must
    // raise (its change is absent from latest), naming the shadowing
    // version — NOT return success
    val lost = intercept[SnapshotConflict] { lake.raiseIfShadowed(2L) }
    assert(lost.getMessage.contains("v3") && lost.getMessage.contains("shadowed"),
      lost.getMessage)
    // the winner itself is not shadowed
    lake.raiseIfShadowed(3L)
    // readers stayed consistent throughout: latest is B's state
    assert(lake.read.count() == 2)
  }

  test("upsert: a null-key row is diagnosed as a null key, not as a duplicate") {
    val lake = new SnapshotLake(spark, tmp(), "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))
    val nul = intercept[IllegalArgumentException] {
      lake.upsert(Seq((null.asInstanceOf[String], 9)).toDF("_id", "v"))
    }
    assert(nul.getMessage.contains("NULL"), nul.getMessage)
    assert(!nul.getMessage.contains("duplicate"))
    val dup = intercept[IllegalArgumentException] {
      lake.upsert(Seq(("d", 1), ("d", 2)).toDF("_id", "v"))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    assert(lake.latestVersion.contains(1L), "refused batches must not commit")
  }

  test("Staged.renameOrThrow: a false rename raises instead of reporting success with no live root") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val base = Files.createTempDirectory("stagedrn").toString
    val src = new org.apache.hadoop.fs.Path(base, "staging")
    val dst = new org.apache.hadoop.fs.Path(base, "dest")
    fs.create(src, false).close()
    // a concurrently re-created destination makes rename return FALSE
    // (no exception) — exactly the silent failure mode the guard catches
    fs.create(dst, false).close()
    val ex = intercept[java.io.IOException] {
      graft.lake.Staged.renameOrThrow(fs, src, dst)
    }
    assert(ex.getMessage.contains("rename"), ex.getMessage)
  }

  test("marker-commit landing never serves a torn artifact under copy-then-crash (object-store posture)") {
    import graft.lake.Staged
    import org.apache.hadoop.fs.Path
    val base = Files.createTempDirectory("stagedmark").toString
    val path = base + "/idx"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    Staged.landMarked(spark, path, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val g1 = Staged.resolveMarked(spark, path).get
    assert(spark.read.parquet(g1).count() == 2)

    Staged.landMarked(spark, path, Seq((3, "c")).toDF("k", "v"))
    val g2 = Staged.resolveMarked(spark, path).get
    assert(g2 != g1 && spark.read.parquet(g2).count() == 1)
    // one cycle of reader grace: the previous gen survives this land
    assert(fs.exists(new Path(g1)))

    // CRASH SIM 1 — a copy+delete "rename" died mid-copy: a newer
    // generation dir exists with partial parquet bytes and no _SUCCESS,
    // and the marker was never updated. Readers must keep serving g2.
    val torn = new Path(base + "/idx.g000099")
    fs.mkdirs(torn)
    val part = fs.listStatus(new Path(g2))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    // half-copied: truncated bytes of a real part file
    val in = fs.open(part)
    val bytes = new Array[Byte](16); in.readFully(bytes); in.close()
    val out = fs.create(new Path(torn, part.getName), true)
    out.write(bytes); out.close()
    assert(Staged.resolveMarked(spark, path).contains(g2),
      "a _SUCCESS-less generation must never be served")

    // CRASH SIM 2 — the marker PUT itself died half-written (no
    // terminator): readers fall back to the newest COMPLETE generation.
    val marker = new Path(base + "/idx.current")
    val mo = fs.create(marker, true); mo.write("99\n".getBytes); mo.close()
    assert(Staged.resolveMarked(spark, path).contains(g2),
      "a torn marker must degrade to the complete-gen scan, not serve gen 99")

    // CRASH SIM 3 — marker lost entirely: same fallback.
    fs.delete(marker, false)
    assert(Staged.resolveMarked(spark, path).contains(g2))

    // recovery: the next land re-establishes the marker and prunes
    // everything older than the previously-live gen (the torn orphan
    // sorts above and is named by nothing, so it stays inert until a
    // later cycle; correctness never depends on pruning)
    Staged.landMarked(spark, path, Seq((4, "d"), (5, "e")).toDF("k", "v"))
    val g3 = Staged.resolveMarked(spark, path).get
    assert(spark.read.parquet(g3).count() == 2)
    assert(!fs.exists(new Path(g1)), "gens older than the previous live gen are pruned")
  }
}
