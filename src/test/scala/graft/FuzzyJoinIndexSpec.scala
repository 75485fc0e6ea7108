package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FuzzyJoin, FuzzyJoinIndex}

class FuzzyJoinIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def master = Seq(
    (1L, "acme corporation"),
    (2L, "acme corpoation"), // deletion-1 of 1
    (3L, "globex industries"),
    (4L, "globex industrees"),
    (5L, "ab"),              // short: len ≤ 2d at d=1? len 2 ≤ 2 — short-bucket b side
    (6L, "a"),               // too short to chunk at d=1
    (7L, "initech llc"),
    (8L, "umbrella corp")
  ).toDF("rid", "rname")

  private def probes = Seq(
    (101L, "acme corporation"),   // exact
    (102L, "acme corporatio"),    // deletion
    (103L, "globex industries!"), // insertion
    (104L, "b"),                  // short probe
    (105L, "completely unrelated name")
  ).toDF("pid", "pname")

  test("build + probe reproduces editDistanceJoin exactly, incl. short strings both sides") {
    val root = Files.createTempDirectory("fuzzyidx").toString + "/idx"
    val n = FuzzyJoinIndex.build(master, "rid", "rname", root, maxDist = 1)
    assert(n == 8L)
    val got = FuzzyJoinIndex.probe(probes, "pid", "pname", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(probes, "pid", "pname",
        master, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty,
      s"missing=${want -- got} extra=${got -- want}")
    // the short buckets really fired: the 1-char probe resolved against
    // the short master rows
    assert(got.exists(_._1 == 104L), s"short probe must resolve: $got")
  }

  test("refresh re-chunks only the churn, drops vanished ids, pins the hot list") {
    val root = Files.createTempDirectory("fuzzyidx2").toString + "/idx"
    FuzzyJoinIndex.build(master, "rid", "rname", root, maxDist = 1)
    val hotBefore = spark.read.parquet(root + "/hot").collect().toSet
    // drop id 8, change id 7, add id 9
    val next = master.filter(col("rid") =!= 8L && col("rid") =!= 7L)
      .unionByName(Seq((7L, "initech limited"), (9L, "hooli inc")).toDF("rid", "rname"))
    val (carried, chunked) = FuzzyJoinIndex.refresh(next, "rid", "rname", root)
    assert(carried == 6L && chunked == 2L,
      s"refresh must follow the churn: carried=$carried chunked=$chunked")
    assert(spark.read.parquet(root + "/hot").collect().toSet == hotBefore,
      "the hot list is pinned at build; refresh must not retune it")
    // the refreshed index serves the NEW master exactly
    val got = FuzzyJoinIndex.probe(probes, "pid", "pname", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(probes, "pid", "pname",
        next, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // vanished id 8 serves nothing
    assert(!got.exists(_._2 == 8L))
  }

  test("upsert: batch delta under the pinned hot list; streaming sink replay converges to the final master") {
    val root = Files.createTempDirectory("fuzzyups").toString
    val idx = root + "/idx"
    FuzzyJoinIndex.build(master, "rid", "rname", idx, maxDist = 1)
    // batch = {1 re-delivered unchanged, 7 changed, 9 new}: strings/keys
    // outside the batch stay untouched (no drop semantics)
    val batch = Seq(
      (1L, "acme corporation"),  // unchanged
      (7L, "initech limited"),   // changed
      (9L, "hooli inc")          // new
    ).toDF("rid", "rname")
    val (carried, chunked) = FuzzyJoinIndex.upsert(batch, "rid", "rname", idx)
    assert(carried == 1L && chunked == 2L, s"carried=$carried chunked=$chunked")
    val after = spark.read.parquet(idx + "/strings")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(after.size == 9 && after(7L) == "initech limited" &&
      after(8L) == "umbrella corp" && after(9L) == "hooli inc")
    // probe equals the direct join against the upserted master
    val cur = master.filter(col("rid") =!= 7L)
      .unionByName(Seq((7L, "initech limited"), (9L, "hooli inc")).toDF("rid", "rname"))
    val got = FuzzyJoinIndex.probe(probes, "pid", "pname", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(probes, "pid", "pname",
        cur, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")

    // streaming maintenance: a batched master feed through the sink
    // converges to exactly the refresh-maintained index state
    val feed = root + "/feed"
    val idx2 = root + "/idx2"
    FuzzyJoinIndex.build(master.limit(0), "rid", "rname", idx2, maxDist = 1)
    val all = master.collect().map(r => (r.getLong(0), r.getString(1)))
    all.grouped(3).zipWithIndex.foreach { case (rows, i) =>
      rows.toSeq.toDF("rid", "rname").coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream.schema(master.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.fuzzyIndexSink(idx2, "rid", "rname")(stream)
      .option("checkpointLocation", root + "/ckpt")
      .start()
    q.awaitTermination()
    val gotS = FuzzyJoinIndex.probe(probes, "pid", "pname", idx2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantS = FuzzyJoin.editDistanceJoin(probes, "pid", "pname",
        master, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotS == wantS && gotS.nonEmpty,
      s"stream-maintained index must serve the final master: missing=${wantS -- gotS} extra=${gotS -- wantS}")
  }

  test("cli fuzzy --index-path: build, churn refresh, probe round-trip") {
    val root = Files.createTempDirectory("fuzzycli").toString
    master.write.parquet(root + "/master")
    probes.write.parquet(root + "/probes")
    graft.cli.Main.run(spark, "fuzzy", Array(
      "--index-path", root + "/idx", "--ref", root + "/master",
      "--ref-id", "rid", "--ref-str", "rname", "--max-dist", "1"))
    // second maintain call with the same master = all-carried refresh
    graft.cli.Main.run(spark, "fuzzy", Array(
      "--index-path", root + "/idx", "--ref", root + "/master",
      "--ref-id", "rid", "--ref-str", "rname"))
    // the distance is pinned at build: a refresh asking for a different
    // one must fail loudly, not silently keep the old distance
    val dd = intercept[RuntimeException] {
      graft.cli.Main.run(spark, "fuzzy", Array(
        "--index-path", root + "/idx", "--ref", root + "/master",
        "--ref-id", "rid", "--ref-str", "rname", "--max-dist", "2"))
    }
    assert(dd.getMessage.contains("pinned at --max-dist 1"), dd.getMessage)
    // same guard on the PROBE path: probing with a different --max-dist
    // must fail loudly, not silently serve pairs at the pinned distance
    val dp = intercept[RuntimeException] {
      graft.cli.Main.run(spark, "fuzzy", Array(
        "--index-path", root + "/idx", "--in", root + "/probes",
        "--id", "pid", "--str", "pname", "--max-dist", "2"))
    }
    assert(dp.getMessage.contains("pinned at --max-dist 1"), dp.getMessage)
    graft.cli.Main.run(spark, "fuzzy", Array(
      "--index-path", root + "/idx", "--in", root + "/probes",
      "--id", "pid", "--str", "pname", "--out", root + "/pairs"))
    val got = spark.read.parquet(root + "/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(probes, "pid", "pname",
        master, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("volume-gated escalation: templated master pins complement keys; probe + refresh stay brute-exact") {
    val root = Files.createTempDirectory("fuzzyesc").toString + "/idx"
    // single-template master: every classic singleton key carries the
    // shared "Customer#" content, so measured Σ pop² trips the budget
    // and the BUILD pins the complement scheme (round-15 weak #2: the
    // escalation previously lived only in the recompute path)
    val n = 300
    val ref = (0 until n).map(i =>
      (i.toLong, "Customer#" + f"${(i * 37) % 100000}%05d")).toDF("rid", "rname")
    FuzzyJoinIndex.build(ref, "rid", "rname", root, maxDist = 1,
      extraChunks = 1, hotChunkCap = 4096L, candBudgetPerString = 4L)
    val meta = FuzzyJoinIndex.readMeta(spark, root)
    assert(meta.keyScheme == "complement" && meta.n1 == 4,
      s"the measured volume must pin complement keys: $meta")
    // probes: distance-1 mutations (substitution, deletion, insertion)
    // of sampled masters + an unrelated name
    val p = (0 until n by 7).flatMap { i =>
      val s = "Customer#" + f"${(i * 37) % 100000}%05d"
      Seq((3000L + i, s.dropRight(1) + "!"), (6000L + i, s.drop(1)),
        (9000L + i, "X" + s))
    }.toDF("pid", "pname")
    val got = FuzzyJoinIndex.probe(p, "pid", "pname", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(p, "pid", "pname",
        ref, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.size >= 3 * (n / 7),
      s"escalated probe must stay lossless: missing=${want -- got} extra=${got -- want}")
    // refresh under the PINNED scheme: fresh strings must emit
    // complement keys too (never singleton rows into escalated lengths)
    val next = ref.filter(col("rid") =!= 0L)
      .unionByName(Seq((0L, "Customer#99999"), (900L, "Customer#12321"))
        .toDF("rid", "rname"))
    val (carried, chunked) = FuzzyJoinIndex.refresh(next, "rid", "rname", root)
    assert(carried == n - 1L && chunked == 2L, s"carried=$carried chunked=$chunked")
    assert(FuzzyJoinIndex.readMeta(spark, root).keyScheme == "complement")
    val got2 = FuzzyJoinIndex.probe(p, "pid", "pname", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want2 = FuzzyJoin.editDistanceJoin(p, "pid", "pname",
        next, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == want2,
      s"refreshed escalated index: missing=${want2 -- got2} extra=${got2 -- want2}")
  }

  test("escalation fan-out cap: extreme (d, extra) stays classic (advisor finding)") {
    // C(18,8) * drift combos would blow the driver spec frames — the
    // cap must refuse before materializing anything
    assert(!FuzzyJoin.escFanoutOk(18, 8))
    assert(FuzzyJoin.escFanoutOk(4, 1))
    val root = Files.createTempDirectory("fuzzycap").toString + "/idx"
    val ref = (0 until 60).map(i =>
      (i.toLong, "TemplateSharedPrefix#" + f"${(i * 37) % 1000}%03d" * 3))
      .toDF("rid", "rname")
    FuzzyJoinIndex.build(ref, "rid", "rname", root, maxDist = 8,
      extraChunks = 8, hotChunkCap = 4096L, candBudgetPerString = 1L)
    assert(FuzzyJoinIndex.readMeta(spark, root).keyScheme == "classic",
      "over-cap escalation must fall back to the classic guarded pass")
  }

  test("probe against a guarded templated master stays lossless with the pinned hot list") {
    val root = Files.createTempDirectory("fuzzyidx3").toString + "/idx"
    // single-template master: the shared "TMPL#" prefix chunk is hot at
    // build (cap 32) and dropped from the served keys
    val n = 200
    val ref = (0 until n).map(i =>
      (i.toLong, "TMPL#" + f"$i%05d".reverse + f"$i%05d".reverse)).toDF("rid", "rname")
    FuzzyJoinIndex.build(ref, "rid", "rname", root, maxDist = 1,
      extraChunks = 1, hotChunkCap = 32L)
    assert(spark.read.parquet(root + "/hot").count() >= 1L,
      "the template prefix key must be hot at build")
    // probes: distance-1 mutations of a sample of masters
    val p = (0 until n by 7).map(i =>
      (1000L + i, "TMPL#" + f"$i%05d".reverse + f"$i%05d".reverse.dropRight(1) + "!"))
      .toDF("pid", "pname")
    val got = FuzzyJoinIndex.probe(p, "pid", "pname", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = FuzzyJoin.editDistanceJoin(p, "pid", "pname",
        ref, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.size >= n / 7,
      s"guarded index must stay lossless: missing=${want -- got} extra=${got -- want}")
  }
}
