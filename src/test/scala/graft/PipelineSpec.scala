package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.harvest.Fetch
import graft.lake.LakeTable
import graft.ops.Multimodal
import graft.streaming.EventStreams

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LakeTable.upsert: updates replace by key, new keys append (K1)") {
    val dir = Files.createTempDirectory("lake").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id")
    lake.overwrite(Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    lake.upsert(Seq(("b", 20), ("c", 30)).toDF("_id", "v"))
    val got = lake.read.orderBy("_id").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(got.toSeq == Seq("a" -> 1, "b" -> 20, "c" -> 30))
    // a batch with two rows for one key would anti-join the existing row
    // away and land BOTH — refused loudly (no generic latest-wins here)
    val dup = intercept[IllegalArgumentException] {
      lake.upsert(Seq(("d", 1), ("d", 2)).toDF("_id", "v"))
    }
    assert(dup.getMessage.contains("duplicate"))
    assert(lake.read.count() == 3, "a refused batch must not land")
    // a single NULL-key row is NOT a duplicate (countDistinct ignores
    // nulls) — it must be diagnosed as a null key, not as "1 duplicate"
    val nul = intercept[IllegalArgumentException] {
      lake.upsert(Seq((null.asInstanceOf[String], 7)).toDF("_id", "v"))
    }
    assert(nul.getMessage.contains("NULL"), nul.getMessage)
    assert(!nul.getMessage.contains("duplicate"))
    assert(lake.read.count() == 3)
  }

  test("LakeTable.replace recovers from every crash point of the swap") {
    def move(a: String, b: String): Unit =
      Files.move(java.nio.file.Paths.get(a), java.nio.file.Paths.get(b))
    val dir = Files.createTempDirectory("lake-swap").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id")
    lake.overwrite(Seq(("a", 1)).toDF("_id", "v"))

    // crash between rename(cur->old) and rename(staging->cur): staging was
    // fully written, table path is gone
    Seq(("a", 2)).toDF("_id", "v").write.parquet(dir + ".staging")
    move(dir, dir + ".old")
    lake.recover()
    assert(lake.read.collect().head.getInt(1) == 2) // staging promoted
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".old")))

    // crash after rename(cur->old) in a run whose staging never finished
    // (no staging dir): fall back to the old state
    move(dir, dir + ".old")
    lake.recover()
    assert(lake.read.collect().head.getInt(1) == 2) // old restored

    // stale staging from a crash mid-write must not break the next replace
    Seq(("junk", 0)).toDF("_id", "v").write.parquet(dir + ".staging")
    lake.replace(Seq(("a", 3)).toDF("_id", "v"))
    assert(lake.read.collect().head.getInt(1) == 3)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".staging")))
  }

  test("LakeTable.overwritePartitions: untouched partitions preserved; empty batch no-op; recover re-lands") {
    val dir = Files.createTempDirectory("lake-dyn").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"))
    lake.overwrite(Seq(("a", 1, 0), ("b", 2, 1)).toDF("_id", "v", "pk"))

    // dynamic overwrite: only pk=0 rewritten, pk=1 untouched
    lake.overwritePartitions(Seq(("a", 10, 0)).toDF("_id", "v", "pk"))
    assert(lake.read.orderBy("_id").collect().map(r => (r.getAs[String]("_id"), r.getAs[Int]("v")))
      .toSeq == Seq("a" -> 10, "b" -> 2))

    // zero-row incremental batch: live table untouched, no schema blowup
    lake.overwritePartitions(Seq.empty[(String, Int, Int)].toDF("_id", "v", "pk"))
    assert(lake.read.count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".pstaging")))

    // crash AFTER the stage committed but BEFORE the land: recover()
    // re-lands the committed stage (idempotent per-partition replace)
    Seq(("a", 11, 0)).toDF("_id", "v", "pk")
      .write.partitionBy("pk").parquet(dir + ".pstaging")
    lake.recover()
    assert(lake.read.filter(col("_id") === "a").collect().head.getAs[Int]("v") == 11)
    assert(lake.read.count() == 2) // pk=1 still there
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".pstaging")))

    // crash MID-stage (no _SUCCESS): stage discarded, live table untouched
    Seq(("a", 99, 0)).toDF("_id", "v", "pk")
      .write.partitionBy("pk").parquet(dir + ".pstaging")
    Files.delete(java.nio.file.Paths.get(dir + ".pstaging/_SUCCESS"))
    lake.recover()
    assert(lake.read.filter(col("_id") === "a").collect().head.getAs[Int]("v") == 11)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".pstaging")))

    // crashed replace() (table missing, .old intact) then an incremental
    // batch: recover-first must promote .old BEFORE the exists check, so
    // the batch merges into the restored table instead of becoming it
    Files.move(java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dir + ".old"))
    lake.overwritePartitions(Seq(("a", 12, 0)).toDF("_id", "v", "pk"))
    assert(lake.read.orderBy("_id").collect().map(r => (r.getAs[String]("_id"), r.getAs[Int]("v")))
      .toSeq == Seq("a" -> 12, "b" -> 2))
  }

  test("LakeTable layout marker: persisted, reconstructable, and enforced on incremental writes") {
    val dir = Files.createTempDirectory("lake-layout").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"), nBuckets = 8)
    lake.overwrite(Seq(("a", 1, 0)).toDF("_id", "v", "pk"))
    // marker persisted and readable
    assert(LakeTable.layoutOf(spark, dir).contains((Seq("pk"), 8)))
    // replace() (staged swap) keeps the marker
    lake.replace(Seq(("a", 2, 0)).toDF("_id", "v", "pk"))
    assert(LakeTable.layoutOf(spark, dir).contains((Seq("pk"), 8)))
    // a writer with a different modulus is refused on the incremental path
    val wrong = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"), nBuckets = 1024)
    intercept[IllegalStateException] {
      wrong.overwritePartitions(Seq(("b", 3, 1)).toDF("_id", "v", "pk"))
    }
    // the matching writer proceeds
    lake.overwritePartitions(Seq(("b", 3, 1)).toDF("_id", "v", "pk"))
    assert(lake.read.count() == 2)
    // Spark readers ignore the underscore-prefixed marker
    assert(spark.read.parquet(dir).columns.toSet == Set("_id", "v", "pk"))
  }

  test("LakeTable lease: concurrent mutation fails fast, stale lease is broken, compact reenters") {
    val dir = Files.createTempDirectory("lake-lease").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"))
    lake.overwrite((0 until 8).map(i => (f"id$i", i, i % 2)).toDF("_id", "v", "pk").repartition(4))

    // a held (fresh) lease blocks every mutation path with a clear error
    val leaseFile = new java.io.File(dir + ".lease")
    assert(leaseFile.createNewFile())
    intercept[IllegalStateException] { lake.replace(Seq(("x", 1, 0)).toDF("_id", "v", "pk")) }
    intercept[IllegalStateException] {
      lake.overwritePartitions(Seq(("x", 1, 0)).toDF("_id", "v", "pk"))
    }
    intercept[IllegalStateException] { lake.compact(maxFilesPerPartition = 0) }
    // whole-cycle jobs (read-compute-land) are guarded too, not just the land
    intercept[IllegalStateException] {
      graft.pipeline.IngestJob.run(spark, lake,
        Seq(("u1", "2024-01-01 10:00:00")).toDF("id", "updated"),
        Map("id" -> "id", "updated" -> "updated"), "id", "updated", group = 0)
    }
    intercept[IllegalStateException] { graft.pipeline.RepairJob.run(spark, lake, "_id") }
    // reads are never blocked
    assert(lake.read.count() == 8)

    // a stale lease (old mtime = crashed writer) is broken and taken over
    assert(leaseFile.setLastModified(System.currentTimeMillis() - lake.leaseStaleMs - 1000))
    lake.upsert(Seq(("id0", 100, 0)).toDF("_id", "v", "pk"))
    assert(lake.read.filter(col("_id") === "id0").collect().head.getAs[Int]("v") == 100)
    // and released after the mutation
    assert(!leaseFile.exists())

    // compact lands through overwritePartitions under the SAME lease
    // (reentrant), then releases
    assert(lake.compact(maxFilesPerPartition = 0).nonEmpty)
    assert(!leaseFile.exists())
  }

  test("LakeTable.upsert/updateWhere are partition-scoped: untouched partitions byte-identical") {
    val base = Files.createTempDirectory("lake-upsert-scope").toString
    val pLake = new LakeTable(spark, base + "/p", "_id", partitionCols = Seq("pk"))
    val uLake = new LakeTable(spark, base + "/u", "_id") // flat twin = semantic oracle
    val init = (0 until 16).map(i => (f"id$i%02d", i, i % 4)).toDF("_id", "v", "pk")
    pLake.overwrite(init); uLake.overwrite(init)

    def files(dir: String): Map[String, (Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toString.stripPrefix(p.toString)
        if (rel.contains("pk=")) b += rel -> (s.getLen, s.getModificationTime)
      }
      b.result()
    }
    def dump(lake: LakeTable) =
      lake.read.select("_id", "v", "pk").orderBy("_id").collect().map(_.toString).toSeq

    // upsert touching ONLY pk=1: one updated key, one brand-new key
    val before = files(base + "/p")
    val batch = Seq(("id01", 100, 1), ("id99", 99, 1)).toDF("_id", "v", "pk")
    pLake.upsert(batch); uLake.upsert(batch)
    val after = files(base + "/p")
    def outside(m: Map[String, (Long, Long)]) = m.filterNot(_._1.contains("pk=1"))
    assert(outside(before) == outside(after) && outside(before).nonEmpty)
    assert(files(base + "/p").exists(_._1.contains("pk=1")))
    assert(dump(pLake) == dump(uLake))
    assert(pLake.read.filter(col("_id") === "id01").collect().head.getAs[Int]("v") == 100)
    assert(pLake.read.count() == 17)

    // updateWhere keeping the partition cols rides the same scoped path
    val before2 = files(base + "/p")
    val tf = (df: org.apache.spark.sql.DataFrame) => df.withColumn("v", col("v") + 1000)
    pLake.updateWhere(col("pk") === 2, tf); uLake.updateWhere(col("pk") === 2, tf)
    val after2 = files(base + "/p")
    def outside2(m: Map[String, (Long, Long)]) = m.filterNot(_._1.contains("pk=2"))
    assert(outside2(before2) == outside2(after2))
    assert(dump(pLake) == dump(uLake))
    assert(pLake.read.filter(col("pk") === 2 && col("v") < 1000).count() == 0)

    // a batch that drops the partition column falls back to the full
    // rewrite and still converges to the same state
    val flatBatch = Seq(("id00", -1)).toDF("_id", "v")
    pLake.upsert(flatBatch.withColumn("pk", lit(0))); uLake.upsert(flatBatch.withColumn("pk", lit(0)))
    assert(dump(pLake) == dump(uLake))

    // the scoped anti-join's null-safe per-tuple predicate must reach the
    // scan as a PARTITION filter — at 100 TB the read prunes to the
    // touched dirs, it doesn't enumerate every partition
    val pred = (col("pk") <=> lit(1)) || (col("pk") <=> lit(3))
    val scanLine = pLake.read.filter(pred).queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("pk"), s"no partition filter on pk: $scanLine")

    // verifyScope: a batch whose partition value contradicts the key's
    // stored partition (contract breach — would silently duplicate the
    // key under the scoped path) fails fast; a conforming batch passes
    val breach = Seq(("id01", 7, 3)).toDF("_id", "v", "pk") // id01 lives in pk=1
    val ex = intercept[IllegalArgumentException] { pLake.upsert(breach, verifyScope = true) }
    assert(ex.getMessage.contains("scope violation"))
    pLake.upsert(Seq(("id01", 7, 1)).toDF("_id", "v", "pk"), verifyScope = true)
    assert(pLake.read.filter(col("_id") === "id01").collect().head.getAs[Int]("v") == 7)
  }

  test("LakeTable.compact: oversized partitions rewritten key-sorted, small ones' files untouched") {
    val dir = Files.createTempDirectory("lake-compact").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"))
    // pk=0 fragmented into 8 files, pk=1 a single file
    val frag = (0 until 64).map(i => (f"id$i%03d", i, 0)).toDF("_id", "v", "pk").repartition(8)
    val small = Seq(("z", 999, 1)).toDF("_id", "v", "pk")
    lake.overwrite(frag.unionByName(small))
    def files(pk: Int): Seq[java.io.File] =
      new java.io.File(s"$dir/pk=$pk").listFiles.toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(files(0).size == 8)
    val before = lake.read.orderBy("_id").collect().toSeq
    val smallFilesBefore = files(1).map(f => (f.getName, f.lastModified))

    // the stats view sees the fragmentation compact is about to fix
    val st0 = lake.stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st0 == Map("pk=0" -> 8L, "pk=1" -> 1L))

    val compacted = lake.compact(maxFilesPerPartition = 4)
    assert(compacted == Seq("pk=0"))
    // fragmented partition now one file (tiny bytes, one target chunk)
    assert(files(0).size == 1)
    // and stats reflects the rewrite
    assert(lake.stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("pk=0" -> 1L, "pk=1" -> 1L))
    // the small partition's physical files were never rewritten
    assert(files(1).map(f => (f.getName, f.lastModified)) == smallFilesBefore)
    // data identical
    assert(lake.read.orderBy("_id").collect().toSeq == before)
    // rows inside the compacted file are key-sorted (row-group pruning)
    val inFile = spark.read.parquet(files(0).head.getPath).select("_id")
      .collect().map(_.getString(0)).toSeq
    assert(inFile == inFile.sorted)
    // idempotent: below threshold now, nothing to do
    assert(lake.compact(maxFilesPerPartition = 4).isEmpty)
  }

  test("LakeTable.compact handles Hive-escaped and null partition values") {
    val dir = Files.createTempDirectory("lake-compact-esc").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id", partitionCols = Seq("pk"))
    // "a:b" escapes to a%3Ab in the directory name; null lands in the
    // default partition — both must round-trip through compact's
    // dir-parse -> value join
    val rows = (0 until 32).map(i => (f"id$i%02d", i, if (i % 2 == 0) "a:b" else null))
    lake.overwrite(rows.toDF("_id", "v", "pk").repartition(8))
    val before = lake.read.orderBy("_id").collect().toSeq
    // a leftover scratch dir from a crashed plain overwrite must be
    // skipped, not parsed as a 'col=value' partition segment
    assert(new java.io.File(s"$dir/_temporary/0").mkdirs())
    val done = lake.compact(maxFilesPerPartition = 2)
    assert(done.size == 2) // both partitions were fragmented and rewritten
    assert(lake.read.orderBy("_id").collect().toSeq == before)
    def files(sub: String): Int =
      new java.io.File(s"$dir/$sub").listFiles.count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(files("pk=a%3Ab") <= 2 && files("pk=__HIVE_DEFAULT_PARTITION__") <= 2)
  }

  test("unescapeHive decodes per UTF-8 byte (multi-byte escapes from external Hive writers)") {
    assert(LakeTable.unescapeHive("a%3Ab") == "a:b")
    assert(LakeTable.unescapeHive("espa%C3%B1a") == "españa") // ñ = %C3%B1, one char
    assert(LakeTable.unescapeHive("%E6%97%A5%E6%9C%AC") == "日本") // 3-byte sequences
    assert(LakeTable.unescapeHive("plain") == "plain")
    assert(LakeTable.unescapeHive("mix%2Fed%C3%A9s") == "mix/edés") // ascii + multi-byte runs
  }

  test("LakeTable.compact on a flat table rewrites in place") {
    val dir = Files.createTempDirectory("lake-compact-flat").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id")
    lake.overwrite((0 until 32).map(i => (f"id$i%02d", i)).toDF("_id", "v").repartition(8))
    val before = lake.read.orderBy("_id").collect().toSeq
    assert(lake.compact(maxFilesPerPartition = 4) == Seq("."))
    val fl = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(fl.size == 1)
    assert(lake.read.orderBy("_id").collect().toSeq == before)
  }

  test("LakeTable summary singleton round-trip (K8)") {
    val dir = Files.createTempDirectory("lake").toString + "/t"
    val lake = new LakeTable(spark, dir, "_id")
    lake.writeSummary(Seq((42L, 7L)).toDF("total", "groups"))
    val r = lake.readSummary.collect().head
    assert(r.getAs[String]("_id") == "summary_data" && r.getAs[Long]("total") == 42L)
  }

  test("Fetch: host-partitioned stub fetch with whitelist + status codes (S11)") {
    val urls = Seq(
      "https://h1.example.es/docs/ntp00000001_a.pdf",
      "https://h2.example.es/docs/ntp00000002_b.zip",
      "https://h1.example.es/docs/ntp00000003_c.exe",   // not whitelisted
      "https://skipme.example.es/docs/ntp00000004_d.pdf" // skip-listed host
    ).toDF("url")
    val res = Fetch.fetchAll(urls, "url", hostPartitions = 4,
      skipServers = Set("skipme.example.es")).collect()
    // skip-listed hosts stay in the ledger as status=skipped, never
    // fetched (they used to vanish from the accounting entirely)
    assert(res.length == 4)
    val byUrl = res.map(r => r.getAs[String]("url") -> r.getAs[String]("status")).toMap
    assert(byUrl("https://h1.example.es/docs/ntp00000003_c.exe") == Fetch.Status.UnknownType)
    assert(byUrl("https://h1.example.es/docs/ntp00000001_a.pdf") == Fetch.Status.Ok)
    assert(byUrl("https://skipme.example.es/docs/ntp00000004_d.pdf") == Fetch.Status.Skipped)
  }

  test("Multimodal: binary payload plumbing + partition-batched decode stub") {
    val docs = Seq((1L, "hello world"), (2L, "spark engine")).toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs, "doc_id", "text")
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    assert(feats.length == 2)
    assert(feats.head.getAs[Long]("n_bytes") == "hello world".getBytes("UTF-8").length)
    assert(feats.head.getAs[scala.collection.Seq[Float]]("features").length == 8)
    // deterministic: same input -> same features
    val again = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    assert(feats.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // resize: binary -> binary with refreshed metadata; payload shrinks
    // with the area ratio and the transform is deterministic
    val resized = Multimodal.resize(media, 2, 2).orderBy("media_id").collect()
    assert(resized.length == 2)
    val r0 = resized.head
    assert(r0.getAs[Int]("width") == 2 && r0.getAs[Int]("height") == 2)
    assert(r0.getAs[Array[Byte]]("payload").length <= "hello world".getBytes("UTF-8").length)
    val resizedAgain = Multimodal.resize(media, 2, 2).orderBy("media_id").collect()
    def payloads(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq
    assert(payloads(resized) == payloads(resizedAgain))

    // sampleFrames: pure byte slicing — every stride-th frameBytes slice,
    // short tail kept, no base64 round-trip
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
      .orderBy("media_id", "frame_no").collect()
    val bytes1 = "hello world".getBytes("UTF-8")
    def expected(p: Array[Byte]) = p.grouped(4).toSeq.zipWithIndex
      .collect { case (b, i) if i % 2 == 0 => (i, b.toSeq) }
    assert(frames.filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(1), r.getAs[Array[Byte]]("frame").toSeq)).toSeq == expected(bytes1))
    // 11 bytes / 4 = 3 frames (0,1,2-partial); stride 2 keeps 0 and 2
    assert(frames.count(_.getLong(0) == 1L) == 2)
    assert(frames.filter(_.getLong(0) == 1L).last.getAs[Array[Byte]]("frame").length == 3)

    // an int-typed media_id source must not ClassCastException: the ops
    // cast the id to long at the select, whatever the source type
    val intMedia = media.withColumn("media_id", col("media_id").cast("int"))
    assert(Multimodal.sampleFrames(intMedia, 4, 2).count() ==
      Multimodal.sampleFrames(media, 4, 2).count())
    assert(Multimodal.decodeAndFeaturize(intMedia).count() == 2)
    assert(Multimodal.resize(intMedia, 2, 2).count() == 2)
  }

  test("Multimodal: perceptual average-hash — exact bits, collision on identical content, banded near-dup join") {
    // hand-computable image: left half black, right half white -> each
    // 8x8 bucket row is 0000 1111 (white buckets sit above the mean)
    val split = Multimodal.encodeGrayPng(8, 8, (x, _) => if (x < 4) 0 else 255)
    assert(Multimodal.averageHash64(split).get == "00001111" * 8)
    // undecodable payload -> None (never a fabricated hash)
    assert(Multimodal.averageHash64("not an image".getBytes("UTF-8")).isEmpty)
    // non-divisible dims still fill all 64 buckets when w, h >= 8
    val odd = Multimodal.encodeGrayPng(11, 13, Multimodal.testPattern(7L))
    assert(Multimodal.averageHash64(odd).get.length == 64)

    // identical patterns produce identical hashes; the banded Hamming
    // join surfaces exactly those pairs at distance 0 without all-pairs
    val dims = Seq(
      (1L, 12, 12, 100L), (2L, 12, 12, 100L),   // same content, distinct ids
      (3L, 12, 12, 100L),                       // third copy -> 3 pairs
      (4L, 12, 12, 23L), (5L, 9, 14, 31L))      // different content
      .toDF("doc_id", "w", "h", "pat")
    val media = Multimodal.grayPngTable(dims, "doc_id", "w", "h", "pat")
    val hashes = Multimodal.imageHashes(media).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes(1L) == hashes(2L) && hashes(2L) == hashes(3L))
    val pairs = Multimodal.imageNearDupPairs(media, chunks = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.intersect(Set((1L, 2L), (1L, 3L), (2L, 3L))) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"identical images must pair at Hamming 0, got $pairs")
    pairs.foreach { case (a, b) => assert(hashes(a) == hashes(b)) }
  }

  test("Multimodal: audio energy fingerprint — exact bits, collision on identical tones, banded near-dup join") {
    // hand-computable clip: silent first half, full-scale second half ->
    // first 32 windows 0, last 32 windows 1
    val clip = Multimodal.encodePcm16Wav(8000,
      Array.tabulate(128)(i => if (i < 64) 0.toShort else 32767.toShort))
    assert(Multimodal.audioHash64(clip).get == "0" * 32 + "1" * 32)
    assert(Multimodal.audioHash64("not audio".getBytes("UTF-8")).isEmpty)

    val spec = Seq(
      (1L, 8000, 200, 5L), (2L, 8000, 200, 5L),  // identical tone + length
      (3L, 8000, 200, 9L), (4L, 8000, 150, 13L)) // different content
      .toDF("doc_id", "rate", "n", "tone")
    val media = Multimodal.wavTable(spec, "doc_id", "rate", "n", "tone")
    val hashes = Multimodal.audioHashes(media).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes(1L) == hashes(2L))
    val pairs = Multimodal.audioNearDupPairs(media, chunks = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical clips must pair, got $pairs")
    pairs.foreach { case (a, b) => assert(hashes(a) == hashes(b)) }
  }

  test("Multimodal: REAL image codec — PNG/BMP decode, Graphics2D resize") {
    // real round-trip: encode through the JVM PNG writer, read the
    // dims/bands/sample-sum back from the BYTES
    val bytes = Multimodal.encodeGrayPng(7, 5, Multimodal.testPattern(42L))
    assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val Some((w, h, bands, sum)) = Multimodal.decodeImageMeta(bytes)
    val wantSum = (for (y <- 0 until 5; x <- 0 until 7)
      yield Multimodal.testPattern(42L)(x, y).toLong).sum
    assert((w, h, bands, sum) == (7, 5, 1, wantSum))

    // a second real format: the same image through the BMP writer
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val bmpOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bmpOut))
    assert(Multimodal.decodeImageMeta(bmpOut.toByteArray).contains((7, 5, 1, wantSum)))

    // non-image payloads report None -> the stub arm, tagged as such
    assert(Multimodal.decodeImageMeta("not an image".getBytes("UTF-8")).isEmpty)
    val dims = Seq((1L, 7, 5), (2L, 3, 9)).toDF("doc_id", "w", "h")
    val decoded = Multimodal.decodeImages(Multimodal.grayPngTable(dims, "doc_id", "w", "h"))
      .orderBy("media_id").collect()
    assert(decoded.map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getString(6))).toSeq ==
      Seq((1L, 7, 5, "imageio"), (2L, 3, 9, "imageio")))
    val garbage = Seq((9L, Array[Byte](1, 2, 3), "application/octet-stream"))
      .toDF("media_id", "payload", "mime")
    assert(Multimodal.decodeImages(garbage).collect().head.getString(6) == "stub")

    // real resize: a decodable payload comes back PNG at the target dims
    val resized = Multimodal.resize(
      Seq((1L, bytes, "image/png")).toDF("media_id", "payload", "mime"), 4, 3).collect().head
    assert(resized.getString(2) == "image/png")
    assert(Multimodal.decodeImageMeta(resized.getAs[Array[Byte]]("payload"))
      .exists(m => m._1 == 4 && m._2 == 3))
  }

  test("Multimodal: REAL animation codec — multi-frame GIF round-trip, stride sampling, stub arm") {
    // 3-frame animated GIF through the JVM's real sequence writer; the
    // indexed 256-gray palette makes the round-trip lossless
    def pat(f: Int): (Int, Int) => Int = Multimodal.testPattern(5L * 131 + f)
    val gif = Multimodal.encodeGrayAnimatedGif(6, 4, 3, pat)
    assert(gif.take(3).toSeq == "GIF".getBytes("US-ASCII").toSeq)
    def wantSum(f: Int): Long =
      (for (y <- 0 until 4; x <- 0 until 6) yield pat(f)(x, y).toLong).sum
    val Some((n1, all)) = Multimodal.decodeAnimation(gif, 1)
    assert(n1 == 3 && all == (0 until 3).map(f => (f, 6, 4, wantSum(f))))
    // stride 2 keeps frames 0 and 2, never decodes frame 1
    val Some((n2, kept)) = Multimodal.decodeAnimation(gif, 2)
    assert(n2 == 3 && kept.map(_._1) == Seq(0, 2))
    // a single-frame PNG decodes as a 1-frame animation through the same path
    val png = Multimodal.encodeGrayPng(6, 4, pat(0))
    assert(Multimodal.decodeAnimation(png, 1).exists {
      case (n, fs) => n == 1 && fs == Seq((0, 6, 4, wantSum(0)))
    })
    // DataFrame op: per-frame rows for decodable payloads, tagged stub row otherwise
    val dims = Seq((5L, 6, 4, 3), (6L, 3, 3, 2)).toDF("doc_id", "w", "h", "nf")
    val rows = Multimodal.sampleAnimationFrames(
        Multimodal.grayGifTable(dims, "doc_id", "w", "h", "nf"), 2)
      .orderBy("media_id", "frame_no").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(6))).toSeq ==
      Seq((5L, 3, 0, "imageio"), (5L, 3, 2, "imageio"), (6L, 2, 0, "imageio")))
    val garbage = Seq((9L, Array[Byte](9, 9, 9), "video/mp4"))
      .toDF("media_id", "payload", "mime")
    assert(Multimodal.sampleAnimationFrames(garbage, 1).collect().head.getString(6) == "stub")
  }

  test("Multimodal: REAL audio codec — WAV PCM16 round-trip via javax.sound") {
    // encode through the JVM WAV writer, read rate/channels/bits/frames
    // and the lossless sample sum back from the BYTES
    val samples = Array.tabulate(100)(Multimodal.testTone(42L))
    val wav = Multimodal.encodePcm16Wav(8000, samples)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    val Some((rate, ch, bits, frames, sum)) = Multimodal.decodeAudioMeta(wav)
    assert((rate, ch, bits, frames) == (8000, 1, 16, 100L))
    assert(sum == samples.map(_.toLong).sum)

    // non-audio payloads report None -> the stub arm, tagged as such
    assert(Multimodal.decodeAudioMeta("not audio".getBytes("UTF-8")).isEmpty)
    val spec = Seq((1L, 8000, 40), (2L, 16000, 17)).toDF("doc_id", "rate", "n")
    val decoded = Multimodal.decodeAudio(Multimodal.wavTable(spec, "doc_id", "rate", "n"))
      .orderBy("media_id").collect()
    assert(decoded.map(r => (r.getLong(0), r.getInt(2), r.getLong(5), r.getString(7))).toSeq ==
      Seq((1L, 8000, 40L, "javasound"), (2L, 16000, 17L, "javasound")))
    val garbage = Seq((9L, Array[Byte](1, 2, 3), "application/octet-stream"))
      .toDF("media_id", "payload", "mime")
    assert(Multimodal.decodeAudio(garbage).collect().head.getString(7) == "stub")
  }

  test("EventStreams: windowed aggregation over a stream matches batch (streaming)") {
    val dir = Files.createTempDirectory("events").toString
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 7L, "click", 1.5, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), 7L, "click", 2.5, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), 8L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.parquet(dir + "/drop1")
    val stream = EventStreams.readEvents(spark, dir + "/drop1")
    val q = EventStreams.windowedCounts(stream).writeStream
      .format("memory").queryName("win_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("win_out").orderBy("wstart", "event_type").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n") == 2L) // two clicks in the 10:00 window
    assert(got(0).getAs[Double]("sum_value") == 4.0) // cents-grid: exactly 1.5 + 2.5
    assert(got(1).getAs[String]("event_type") == "view")
  }

  test("EventStreams: a cross-batch LATE event never regresses the session clock") {
    val dir = Files.createTempDirectory("events_late").toString
    def land(rows: (Long, String)*): Unit =
      rows.map { case (id, ts) =>
        (id, java.sql.Timestamp.valueOf(ts), 9L, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir + "/in")
    import graft.streaming.EventStreams.Event
    land(1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:05:00")
    val stream = EventStreams.readEvents(spark, dir + "/in")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.sessionizeStateful(stream, gapMs = 30 * 60 * 1000,
        watermarkDelay = "1 day")
      .writeStream.format("memory").queryName("sess_late").outputMode("append")
      .option("checkpointLocation", dir + "/ckpt").start()
    q.processAllAvailable()
    // batch 2: a LATE 9:58 event (admissible under the 1-day watermark)
    // plus 10:30. The buggy clock regressed lastTs to 9:58, saw
    // 10:30 - 9:58 > gap, and emitted a session ending BEFORE it started
    land(3L -> "2024-01-01 09:58:00", 4L -> "2024-01-01 10:30:00")
    q.processAllAvailable()
    assert(spark.table("sess_late").count() == 0,
      "10:30 is within gap of the true last event (10:05) — nothing closes")
    // batch 3: 13:00 closes the session: all four events, true span
    land(5L -> "2024-01-01 13:00:00")
    q.processAllAvailable(); q.stop()
    val s = spark.table("sess_late").orderBy("session_id").collect()
    assert(s.length == 1)
    assert(s(0).getAs[Long]("n_events") == 4)
    assert(s(0).getAs[java.sql.Timestamp]("session_start") ==
      java.sql.Timestamp.valueOf("2024-01-01 09:58:00"))
    assert(s(0).getAs[java.sql.Timestamp]("session_end") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:30:00"))
  }

  test("EventStreams: sessionization spans micro-batches, emits each session once") {
    val dir = Files.createTempDirectory("events3").toString
    // batch 1: user 7 opens a session (10:00, 10:10); user 8 opens one (10:00)
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 7L, "click", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 8L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir + "/in")
    import graft.streaming.EventStreams.Event
    val stream = EventStreams.readEvents(spark, dir + "/in")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.sessionizeStateful(stream, gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out").outputMode("append")
      .option("checkpointLocation", dir + "/ckpt").start()
    q.processAllAvailable()
    // nothing closed yet: both sessions still open — NOT emitted (the old
    // per-batch emit would have produced partial sessions here)
    assert(spark.table("sess_out").count() == 0)

    // batch 2: user 7 continues past the gap (12:00 closes session 1 with
    // its FULL cross-batch count); user 8 is idle — the advancing
    // watermark (12:00) times its open session out
    Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir + "/in")
    q.processAllAvailable(); q.stop()

    val sessions = spark.table("sess_out").orderBy("user_id", "session_id").collect()
    // user 7 session 1 emitted exactly once, with both batch-1 events and
    // the true start; user 8's idle session flushed by timeout; user 7's
    // 12:00 session is still open (stream not ended) — not emitted
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("user_id") == 7L)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(0).getAs[java.sql.Timestamp]("session_start") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(sessions(0).getAs[java.sql.Timestamp]("session_end") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:10:00"))
    assert(sessions(1).getAs[Long]("user_id") == 8L)
    assert(sessions(1).getAs[Long]("n_events") == 1)
  }

  test("EventStreams: dropDuplicates dedup of re-delivered events (CDC shape)") {
    val dir = Files.createTempDirectory("events2").toString
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 7L, "click", 1.5, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 7L, "click", 1.5, "{}"), // dup
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), 7L, "click", 2.5, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.parquet(dir + "/drop1")
    val q = EventStreams.dedupDeliveries(EventStreams.readEvents(spark, dir + "/drop1"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("EventStreams: corpus fingerprint dedup spans micro-batches, canon-form invariant") {
    val dir = Files.createTempDirectory("docs-stream").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, "Hello, World!"), (2L, "unrelated text")).toDF("doc_id", "text")
      .write.parquet(dir + "/in")
    val stream = spark.readStream.schema(schema).parquet(dir + "/in")
    val q = EventStreams.dedupCorpus(stream, "text")
      .writeStream.format("memory").queryName("corpus_dedup_out")
      .option("checkpointLocation", dir + "/ckpt").outputMode("append").start()
    q.processAllAvailable()
    // second drop arrives later: one canon-equal re-delivery (casing/punct
    // differ), one genuinely new doc — only the new fingerprint is emitted
    Seq((3L, "hello   world"), (4L, "brand new")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir + "/in")
    q.processAllAvailable(); q.stop()
    assert(spark.table("corpus_dedup_out").count() == 3)
  }
}
