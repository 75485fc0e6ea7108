package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("sketches").toString + "/idx"

  private def rows(n: Int) = (0 until n).map(i => (s"g${i % 3}", (i % 97).toLong))

  test("exact tier: merged segments equal one-shot count_distinct") {
    val path = tmp()
    val all = rows(500)
    all.grouped(200).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landDistinctDrop(drop.toDF("g", "k"), Seq("g"), "k", path, s"d$i")
    }
    val got = Sketches.serveDistinct(spark, path, Seq("g"), "k")
      .orderBy("g").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = all.toDF("g", "k").groupBy("g").agg(count_distinct(col("k")).as("n"))
      .orderBy("g").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == want)
  }

  test("exact tier: a segment stores distinct pairs, not raw rows") {
    val path = tmp()
    // 400 raw rows but only 3x97 distinct (g, k) pairs
    Sketches.landDistinctDrop(rows(400).toDF("g", "k"), Seq("g"), "k", path, "d0")
    assert(spark.read.parquet(path).count() < 400)
  }

  test("hll tier: merged-segment estimate matches the whole-corpus sketch and sits in bound") {
    val path = tmp()
    val all = (0 until 3000).map(i => ("g", (i % 1231).toLong))
    all.grouped(1000).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landHllDrop(drop.toDF("g", "k"), Seq("g"), "k", path, s"d$i")
    }
    val merged = Sketches.serveHllEstimate(spark, path, Seq("g")).collect().head.getLong(1)
    val whole = all.toDF("g", "k").groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(14))).as("e"))
      .collect().head.getLong(1)
    assert(merged == whole,
      s"sketch union must be lossless: merged=$merged whole-corpus=$whole")
    assert(math.abs(merged - 1231L) <= 0.02 * 1231, s"estimate $merged outside 2% of 1231")
  }

  test("hll set algebra: inclusion-exclusion intersect in bound; one-side and null groups served") {
    val root = Files.createTempDirectory("hllset").toString
    // A = keys 0..1999 in groups g0/null; B = keys 1000..2999 in g0 plus
    // a B-only group g9 — true per-group overlap is exactly 1000 for g0,
    // and the null group lives on side A only
    val a = (0 until 2000).map(i => (if (i % 4 == 0) null else "g0", i.toLong))
      .toDF("g", "k")
    val b = ((1000 until 3000).map(i => ("g0", i.toLong)) ++
      (0 until 500).map(i => ("g9", i.toLong))).toDF("g", "k")
    Seq(("a", a), ("b", b)).foreach { case (side, df) =>
      // two drops per side: the serve merges segments before estimating
      Sketches.landHllDrop(df.filter(col("k") % 2 === 0), Seq("g"), "k",
        s"$root/$side", "d0")
      Sketches.landHllDrop(df.filter(col("k") % 2 === 1), Seq("g"), "k",
        s"$root/$side", "d1")
    }
    val byG = Sketches.serveHllSetAlgebra(spark, s"$root/a", s"$root/b", Seq("g"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (na, nb, nu, ni) = byG(Some("g0"))
    // exact: |A_g0| = 1500 (keys 0..1999 minus multiples of 4),
    // |B_g0| = 2000 (keys 1000..2999), |A∪B| = 2750, |A∩B| = 750;
    // lgK=14 keeps these near-exact at this cardinality — allow the
    // compounded envelope of 4% of the union
    assert(math.abs(ni - 750L) <= (2750 * 0.04).toLong,
      s"intersect estimate out of bound: $ni (na=$na nb=$nb nu=$nu)")
    val (na9, nb9, nu9, ni9) = byG(Some("g9"))
    assert(na9 == 0L && ni9 == 0L && nb9 > 0L && nu9 == nb9,
      s"a B-only group estimates A as 0 and union as B: ($na9, $nb9, $nu9, $ni9)")
    val (naN, nbN, nuN, niN) = byG(None)
    assert(naN > 0L && nbN == 0L && nuN == naN && niN == 0L,
      s"the NULL group (A-only) must be served, not dropped: ($naN, $nbN, $nuN, $niN)")
  }

  test("re-landing a drop id replaces its segment (idempotent)") {
    val path = tmp()
    val drop = rows(100).toDF("g", "k")
    Sketches.landDistinctDrop(drop, Seq("g"), "k", path, "d0")
    val once = Sketches.serveDistinct(spark, path, Seq("g"), "k")
      .agg(sum("n_distinct")).collect().head.getLong(0)
    Sketches.landDistinctDrop(drop, Seq("g"), "k", path, "d0")
    val twice = Sketches.serveDistinct(spark, path, Seq("g"), "k")
      .agg(sum("n_distinct")).collect().head.getLong(0)
    assert(once == twice)
  }

  test("hist tier: merged segments answer quantiles within one bucket width of exact") {
    val path = tmp()
    // deterministic-but-irregular values over [0, 1000)
    val all = (0 until 900).map(i => ("g" + (i % 2), ((i * 37 + 11) % 1000).toLong))
    all.grouped(300).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landHistDrop(drop.toDF("g", "v"), Seq("g"), col("v"),
        lo = 0L, width = 50L, nBuckets = 20, path, s"d$i")
    }
    val hist = Sketches.serveHist(spark, path, Seq("g"))
    // merged histogram equals the one-shot histogram over everything
    val whole = Sketches.histSegment(all.toDF("g", "v"), Seq("g"), col("v"), 0L, 50L, 20)
    assert(hist.orderBy("g", "bucket").collect().map(_.toSeq).toSeq ==
      whole.orderBy("g", "bucket").collect().map(_.toSeq).toSeq)
    for ((num, den) <- Seq((1, 2), (1, 4), (3, 4), (1, 1))) {
      val est = Sketches.quantileFromHist(hist, Seq("g"), num, den, 0L, 50L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      all.groupBy(_._1).foreach { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        val exact = sorted((math.ceil(sorted.size.toDouble * num / den) - 1).toInt)
        assert(est(g) <= exact && exact < est(g) + 50,
          s"q=$num/$den g=$g est=${est(g)} exact=$exact")
        assert(est(g) == exact - exact % 50, "estimate is the grid floor of the exact quantile")
      }
    }
  }

  test("compaction folds each tier to one segment without changing serve") {
    // exact tier
    val dPath = tmp()
    val all = rows(500)
    all.grouped(200).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landDistinctDrop(drop.toDF("g", "k"), Seq("g"), "k", dPath, s"d$i")
    }
    val dBefore = Sketches.serveDistinct(spark, dPath, Seq("g"), "k")
      .orderBy("g").collect().map(_.toSeq).toSeq
    Sketches.compactDistinct(spark, dPath, Seq("g"), "k")
    assert(Sketches.serveDistinct(spark, dPath, Seq("g"), "k")
      .orderBy("g").collect().map(_.toSeq).toSeq == dBefore)
    assert(new java.io.File(dPath).listFiles().map(_.getName)
      .filter(_.startsWith("seg=")).toSeq == Seq("seg=base"))

    // hll tier: estimate unchanged by folding
    val hPath = tmp()
    val hAll = (0 until 2000).map(i => ("g", (i % 701).toLong))
    hAll.grouped(700).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landHllDrop(drop.toDF("g", "k"), Seq("g"), "k", hPath, s"d$i")
    }
    val hBefore = Sketches.serveHllEstimate(spark, hPath, Seq("g")).collect().head.getLong(1)
    Sketches.compactHll(spark, hPath, Seq("g"))
    assert(Sketches.serveHllEstimate(spark, hPath, Seq("g")).collect().head.getLong(1) == hBefore)

    // hist tier: bucket counts unchanged by folding
    val tPath = tmp()
    val tAll = (0 until 600).map(i => ("g" + (i % 2), ((i * 13) % 300).toLong))
    tAll.grouped(200).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landHistDrop(drop.toDF("g", "v"), Seq("g"), col("v"), 0L, 30L, 10, tPath, s"d$i")
    }
    val tBefore = Sketches.serveHist(spark, tPath, Seq("g"))
      .orderBy("g", "bucket").collect().map(_.toSeq).toSeq
    Sketches.compactHist(spark, tPath, Seq("g"))
    assert(Sketches.serveHist(spark, tPath, Seq("g"))
      .orderBy("g", "bucket").collect().map(_.toSeq).toSeq == tBefore)
  }

  // skewed corpus for the top-k tier: 3 hot keys x 60, 60 tail keys x 3
  private def hhRows: Seq[(String, Int)] =
    (0 until 180).map(i => (s"h${i % 3}", i)) ++
      (0 until 180).map(i => (s"t${i % 60}", 1000 + i))

  private def trueCounts: Map[String, Long] =
    hhRows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }

  test("topk tier: merged bounds bracket every true count; guarantee set surfaces") {
    val path = tmp()
    hhRows.zipWithIndex.groupBy(_._2 % 3).foreach { case (d, part) =>
      Sketches.landTopKDrop(part.map(_._1).toDF("k", "i"), Nil, "k", 8, path, s"d$d")
    }
    val served = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tot = Sketches.totalCutoff(spark, path, Nil).collect().head.getLong(0)
    served.foreach { case (k, (est, hi)) =>
      val t = trueCounts(k)
      assert(est <= t && t <= hi, s"key $k: est=$est true=$t hi=$hi")
    }
    // absent keys' true counts can't exceed the summed cutoffs...
    trueCounts.filterNot(kv => served.contains(kv._1))
      .foreach { case (k, t) => assert(t <= tot, s"absent $k true=$t > tot=$tot") }
    // ...so every key above them is guaranteed present — here the hot keys
    val guaranteed = trueCounts.filter(_._2 > tot).keySet
    assert(Set("h0", "h1", "h2").subsetOf(guaranteed))
    assert(guaranteed.subsetOf(served.keySet), s"guarantee violated: tot=$tot")
  }

  test("topk tier: compaction preserves retained bounds exactly and the invariant under later drops") {
    val path = tmp()
    val parts = hhRows.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
    parts.take(2).foreach { case (d, part) =>
      Sketches.landTopKDrop(part.map(_._1).toDF("k", "i"), Nil, "k", 8, path, s"d$d")
    }
    val before = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Sketches.compactTopK(spark, path, Nil, "k", 8)
    assert(new java.io.File(path).listFiles().map(_.getName)
      .count(_.startsWith("seg=")) == 1)
    val after = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    after.foreach { case (k, bounds) =>
      assert(before(k) == bounds, s"compaction changed $k: ${before(k)} -> $bounds")
    }
    // a post-compaction drop folds in and the bracket invariant survives
    parts.drop(2).foreach { case (d, part) =>
      Sketches.landTopKDrop(part.map(_._1).toDF("k", "i"), Nil, "k", 8, path, s"d$d")
    }
    val served = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tot = Sketches.totalCutoff(spark, path, Nil).collect().head.getLong(0)
    served.foreach { case (k, (est, hi)) =>
      val t = trueCounts(k)
      assert(est <= t && t <= hi, s"post-compact key $k: est=$est true=$t hi=$hi")
    }
    trueCounts.filter(_._2 > tot).keySet
      .foreach(k => assert(served.contains(k), s"guarantee violated post-compact for $k"))
  }

  test("topk tier: lossless retention (k >= domain) serves exact counts with zero slack") {
    val path = tmp()
    val all = (0 until 90).map(i => (s"k${i % 9}", i))
    all.grouped(30).zipWithIndex.foreach { case (drop, i) =>
      Sketches.landTopKDrop(drop.toDF("k", "i"), Nil, "k", 64, path, s"d$i")
    }
    val served = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(Sketches.totalCutoff(spark, path, Nil).collect().head.getLong(0) == 0L)
    all.groupBy(_._1).foreach { case (k, v) =>
      assert(served(k) == ((v.size.toLong, v.size.toLong)))
    }
  }

  test("streaming topkSink: a batched feed's merged bounds bracket the whole stream's counts") {
    val root = Files.createTempDirectory("topkstream").toString
    val feed = root + "/feed"
    val path = root + "/topk"
    val all = hhRows
    all.grouped(120).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("k", "i").coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(all.toDF("k", "i").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.topkSink(path, Nil, "k", 8)(stream)
      .option("checkpointLocation", root + "/ckpt")
      .start()
    q.awaitTermination()
    val segs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("seg=")).sorted
    assert(segs.length == 3 && segs.forall(_.startsWith("seg=batch")))
    val served = Sketches.serveTopK(spark, path, Nil, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tot = Sketches.totalCutoff(spark, path, Nil).collect().head.getLong(0)
    served.foreach { case (k, (est, hi)) =>
      val t = trueCounts(k)
      assert(est <= t && t <= hi, s"stream key $k: est=$est true=$t hi=$hi")
    }
    trueCounts.filter(_._2 > tot).keySet
      .foreach(k => assert(served.contains(k), s"stream guarantee violated for $k"))
  }

  test("streaming quantileSink: batched feed's merged summaries answer in bound; replay idempotent") {
    val root = Files.createTempDirectory("qstream").toString
    val feed = root + "/feed"
    val path = root + "/qs"
    val n = 900
    val all = (1 to n).map(i => ("g", i.toLong * i)) // long-tailed squares
    all.grouped(300).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("grp", "x").coalesce(1).write.parquet(s"$feed/b$i")
    }
    def runFeed(): Unit = {
      val stream = spark.readStream
        .schema(all.toDF("grp", "x").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$feed/*")
      val q = graft.streaming.EventStreams.quantileSink(path, Seq("grp"), "x", 32)(stream)
        .option("checkpointLocation", root + "/ckpt")
        .start()
      q.awaitTermination()
    }
    runFeed()
    val segs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("seg=")).sorted
    assert(segs.length == 3 && segs.forall(_.startsWith("seg=batch")), segs.toSeq)
    def medianEst(): Long = Sketches.serveQuantile(spark, path, Seq("grp"), 1, 2)
      .collect().head.getLong(1)
    val est = medianEst()
    // true rank of the estimate within the summed envelope (3 segments)
    val rank = all.count(_._2 <= est)
    val target = (n + 1) / 2
    assert(math.abs(rank - target) <= n / 64 + 6,
      s"stream median est=$est rank=$rank target=$target")
    // checkpoint replay: re-running the drained feed lands nothing new
    // and serves the identical answer (segment-per-batch idempotence)
    runFeed()
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("seg=")) == 3)
    assert(medianEst() == est)
  }

  test("a NULL dims value is a served group with intact bounds in every tier") {
    // null dims are legitimate groups (groupBy keeps them); plain
    // column-name joins dropped them by three-valued logic — null
    // groups lost their cutoffs/totals and vanished from serves
    val root = Files.createTempDirectory("nulldim").toString
    val rows = (Seq.fill(30)("x") ++ Seq.fill(20)("y") ++ Seq.fill(9)("z"))
      .zipWithIndex.map { case (k, i) =>
        (if (i % 2 == 0) "g" else null, k, (i % 7).toLong)
      }
    val df = rows.toDF("grp", "k", "x")
    // top-k tier, k=2: 'z' is dropped in BOTH groups -> each group,
    // including the NULL one, must carry a nonzero cutoff and bracket
    Sketches.landTopKDrop(df, Seq("grp"), "k", 2, root + "/topk", "d0")
    val served = Sketches.serveTopK(spark, root + "/topk", Seq("grp"), "k")
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val trueCnt = rows.groupBy(r => (Option(r._1), r._2)).view.mapValues(_.size.toLong).toMap
    assert(served.keys.exists(_._1.isEmpty), s"null group must be served: ${served.keys}")
    served.foreach { case (gk, (est, hi)) =>
      val t = trueCnt(gk)
      assert(est <= t && t <= hi, s"$gk: est=$est true=$t hi=$hi")
    }
    // the null group's retention cutoff survives (z was dropped there
    // too) — the old name-join lost it, silently voiding the surfacing
    // guarantee for exactly the null group
    val cuts = Sketches.totalCutoff(spark, root + "/topk", Seq("grp"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(cuts.get(None).exists(_ > 0L), s"null group lost its retention cutoff: $cuts")
    // quantile tier: the null group serves an estimate
    Sketches.landQuantileDrop(df, Seq("grp"), col("x"), 8, root + "/qs", "d0")
    val qs = Sketches.serveQuantile(spark, root + "/qs", Seq("grp"), 1, 2)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(qs.contains(None) && qs.contains(Some("g")),
      s"both groups incl. null must serve a quantile: $qs")
  }

  test("withinRelError handles the zero-exact edge") {
    val df = Seq((0L, 0L), (0L, 1L), (100L, 101L), (100L, 110L)).toDF("exact", "est")
    val got = df.select(Sketches.withinRelError(col("est"), col("exact"), 0.02))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, true, false))
  }
}
