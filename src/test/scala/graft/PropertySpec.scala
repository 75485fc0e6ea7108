package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{NtpIds, TimeFns}

/** Property tests for the algebraic core (SURVEY §5.2): id-codec
  * round-trip, merge_updates idempotence/commutativity, overlap symmetry.
  * Uses ScalaCheck generators with fixed seeds (deterministic) sampled
  * manually — the scalatest/scalacheck bridge artifact is not available
  * offline.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // design range is two 10M id sub-spaces: group 0 in [0, 10M), group 1
  // (minors) in [10M, 20M) — the reference's group test is the literal
  // `ntp1` prefix (ntp_utils.py:28-32), so ids >= 20M are out of range
  private val orderGen = Gen.choose(0L, 19999999L)
  private val tsGen = for {
    d <- Gen.choose(1, 28); h <- Gen.choose(0, 23); m <- Gen.choose(0, 59)
  } yield f"2024-01-$d%02d $h%02d:$m%02d:00"
  private val tsListGen = Gen.nonEmptyListOf(tsGen).map(_.take(5))

  test("ntp id round-trip: parse(set(o)) == o and group matches order space (F1-F4)") {
    val orders = samples(orderGen, 32) ++ Seq(0L, 9999999L, 10000000L, 19999999L)
    val rows = orders.toDF("o")
      .select(col("o"), NtpIds.parseNtpId(NtpIds.setNtpId(col("o"))).as("back"),
        NtpIds.group(NtpIds.setNtpId(col("o"))).as("grp"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("back") == r.getAs[Long]("o"))
      assert(r.getAs[Int]("grp") == (if (r.getAs[Long]("o") >= NtpIds.MinOrderMinors) 1 else 0))
    }
    // malformed ids classify as group 0 (the reference's everything-else
    // bucket), NEVER null — a group === 0 predicate must not drop them
    // (round-16 advisor fix); well-formed high groups generalize 2-9
    val weird = Seq("x", "", "ntp1234", "ntp123456789", "NTP00000001", "ntp2zzzzzzz")
      .toDF("id").select(NtpIds.group(col("id")).as("g")).collect()
    weird.foreach(r => assert(!r.isNullAt(0) && r.getInt(0) == 0, s"got $r"))
    val high = Seq("ntp93334444").toDF("id")
      .select(NtpIds.group(col("id")).as("g")).collect()
    assert(high.head.getInt(0) == 9)
  }

  test("merge_updates is commutative, canonical, idempotent (A9)") {
    val cases = samples(Gen.zip(tsListGen, tsListGen), 16)
    val df = cases.toDF("a", "b").select(col("a"),
      TimeFns.mergeUpdates(col("a"), col("b")).as("ab"),
      TimeFns.mergeUpdates(col("b"), col("a")).as("ba"))
    df.collect().foreach { r =>
      val ab = r.getAs[scala.collection.Seq[String]]("ab")
      val ba = r.getAs[scala.collection.Seq[String]]("ba")
      assert(ab == ba)                      // commutative
      assert(ab == ab.distinct.sorted)      // canonical sorted-distinct form
    }
    val idem = cases.map(_._1).toDF("a")
      .select(col("a"), TimeFns.mergeUpdates(col("a"), col("a")).as("aa"))
    idem.collect().foreach { r =>
      val a = r.getAs[scala.collection.Seq[String]]("a")
      assert(r.getAs[scala.collection.Seq[String]]("aa") == a.distinct.sorted)
    }
  }

  test("native MinHashSig/SimHashBits equal the Catalyst HOF forms on random docs") {
    val wordGen = Gen.oneOf("the", "cat", "perro", "año", "data", "x1", "ünïcode", "a")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = samples(docGen, 24)
    val df = docs.toDF("text").withColumn("sh", graft.ops.Dedup.shingles(col("text")))
    val hofSig = aggregate(col("sh"), array_repeat(lit("~"), 6),
      (acc, s) => zip_with(acc,
        array((0 until 6).map(i => md5(concat(lit(s"$i|"), s))): _*),
        (a, h) => least(a, h)))
    df.select(graft.ops.Dedup.minhashSignature(col("sh"), 6).as("n"), hofSig.as("h"))
      .collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    val hofBits = {
      val hs = transform(graft.ops.TextAnalysis.tokens(col("text")), t => substring(md5(t), 1, 16))
      val votes = aggregate(hs, array_repeat(lit(0L), 64),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (a, b) => {
          val hexPos = (b / 4).cast("int") + 1
          val mask = element_at(array(lit(8), lit(4), lit(2), lit(1)), pmod(b, lit(4)).cast("int") + 1)
          a + when((instr(lit("0123456789abcdef"), h.substr(hexPos, lit(1))) - 1)
            .bitwiseAND(mask) > 0, lit(1L)).otherwise(lit(-1L))
        }))
      array_join(transform(votes, v => when(v > 0, lit("1")).otherwise(lit("0"))), "")
    }
    df.select(graft.ops.Dedup.simhashBits(col("text")).as("n"), hofBits.as("h"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("ngrams match the sliding-window reference; repetition fracs in [0,1]") {
    val wordGen = Gen.oneOf("a", "b", "cat", "dog", "x1")
    val docGen = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val docs = samples(docGen, 40)
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    Seq(1, 2, 3, 4).foreach { n =>
      val got = docs.toDF("text")
        .select(col("text"), graft.ops.TextAnalysis.ngrams(toks, n).as("g"),
          graft.ops.TextAnalysis.dupNgramFrac(toks, n).as("f"))
        .collect()
      got.foreach { r =>
        val words = r.getString(0).split("\\s+").filter(_.nonEmpty).toSeq
        val expect = words.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        assert(r.getAs[scala.collection.Seq[String]]("g") == expect, s"n=$n '${r.getString(0)}'")
        val f = r.getDouble(2)
        assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  test("packSequencesFirstFit matches the sequential reference fold on random corpora") {
    val docGen = for {
      shard <- Gen.oneOf("s0", "s1", "s2")
      n <- Gen.choose(0, 9)
    } yield (shard, n)
    val docs = samples(docGen, 60).zipWithIndex
      .map { case ((s, n), i) => (s, i.toLong, Seq.fill(n)("w").mkString(" ")) }
    val budget = 7
    // reference: plain Scala first-fit fold per shard in order
    val expect = docs.groupBy(_._1).flatMap { case (shard, ds) =>
      var bin = 0L; var off = 0L
      ds.sortBy(_._2).map { case (_, id, text) =>
        val n = text.split("\\s+").count(_.nonEmpty).toLong
        if (off > 0 && off + n > budget) { bin += 1; off = 0 }
        val r = (shard, id, n, bin, off); off += n; r
      }
    }.toSet
    val got = graft.ops.TextAnalysis
      .packSequencesFirstFit(docs.toDF("source", "doc_id", "text"),
        "source", "doc_id", "text", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect)
  }

  test("bpeTokens partition the non-space text: segments rejoin to the lowercased input") {
    // alnum + punctuation + single spaces (no bare apostrophes — a lone
    // quote is deliberately unmatched by the ASCII contraction pattern)
    val pieceGen = Gen.oneOf("word", "It's", "42", "x9", "well-known", "end.", "Yes!")
    val docGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, pieceGen)).map(_.mkString(" "))
    samples(docGen, 40).toDF("text")
      .select(col("text"), graft.ops.TextAnalysis.bpeTokens(col("text")).as("bt"))
      .collect().foreach { r =>
        val rejoined = r.getAs[scala.collection.Seq[String]]("bt").mkString
        assert(rejoined == r.getString(0).toLowerCase,
          s"'${r.getString(0)}' -> $rejoined")
      }
  }

  test("hyperplaneBucket hybrid sign equals the pure-decimal form on random vectors") {
    import graft.ops.Similarity
    // the production bucket decides with the compiled double dot unless
    // within 1e-6 of a hyperplane; this re-derives the ORIGINAL
    // decimal-only form inline and asserts bit-identical buckets — the
    // guarantee the 5e-13-vs-1e-6 margin argument claims
    def decimalOnlyBucket(vec: org.apache.spark.sql.Column, nBits: Int, dim: Int) = {
      val bits = Similarity.hyperplaneSigns(nBits, dim).map { sv =>
        val signs = array(sv.map(lit): _*)
        val dot = aggregate(
          zip_with(vec, signs, (x, sg) => (x.cast("double") * sg).cast("decimal(25,15)")),
          lit(BigDecimal(0)).cast("decimal(36,15)"),
          (acc, p) => (acc + p).cast("decimal(36,15)"))
        when(dot >= lit(BigDecimal(0)), lit("1")).otherwise(lit("0"))
      }
      concat(bits: _*)
    }
    val vecGen = Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    val vecs = samples(vecGen, 200).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
      .select(col("id"),
        graft.ops.Similarity.hyperplaneBucket(col("v"), 8, 64).as("hybrid"),
        decimalOnlyBucket(col("v"), 8, 64).as("pure"))
    assert(df.filter(col("hybrid") =!= col("pure")).count() == 0)
    // near-boundary coverage: a vector orthogonal-ish to plane 0 (tiny
    // dot) must still agree — this exercises the decimal fallback branch
    val tiny = Seq((0L, (0 until 64).map(_ => 1e-9f))).toDF("id", "v")
      .select(graft.ops.Similarity.hyperplaneBucket(col("v"), 8, 64).as("hybrid"),
        decimalOnlyBucket(col("v"), 8, 64).as("pure"))
      .collect().head
    assert(tiny.getString(0) == tiny.getString(1))
  }

  test("updatesOverlap is symmetric, reflexive, equals set-intersection (F21)") {
    val cases = samples(Gen.zip(tsListGen, tsListGen), 16)
    val df = cases.toDF("a", "b").select(col("a"), col("b"),
      TimeFns.updatesOverlap(col("a"), col("b")).as("ab"),
      TimeFns.updatesOverlap(col("b"), col("a")).as("ba"),
      TimeFns.updatesOverlap(col("a"), col("a")).as("aa"))
    df.collect().foreach { r =>
      val a = r.getAs[scala.collection.Seq[String]]("a").toSet
      val b = r.getAs[scala.collection.Seq[String]]("b").toSet
      assert(r.getAs[Boolean]("ab") == r.getAs[Boolean]("ba"))
      assert(r.getAs[Boolean]("aa"))
      assert(r.getAs[Boolean]("ab") == a.intersect(b).nonEmpty)
    }
  }

  test("pointInIntervalJoin equals the naive BETWEEN join on random workloads") {
    // random points and random intervals (some empty, some long, some
    // clustered at bin boundaries), several bin widths — the binned
    // equi-join must be EXACTLY the filtered cartesian on every draw
    val pointGen = Gen.choose(0L, 999L)
    val ivalGen = for {
      lo <- Gen.choose(0L, 999L); len <- Gen.choose(-5L, 400L)
    } yield (lo, lo + len) // negative len = empty interval (dropped)
    for (round <- 0 until 3) {
      val pts = samples(pointGen, 60).zipWithIndex
        .map { case (p, i) => (i.toLong + round * 1000L, p) }.toDF("pid", "p")
      val ivs = samples(ivalGen, 25).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
      for (w <- Seq(1L, 7L, 100L, 1000L)) {
        val got = graft.ops.TimeJoins.pointInIntervalJoin(pts, "p", ivs, "lo", "hi", w)
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"divergence at binWidth=$w round=$round")
      }
    }
  }

  test("DedupIndex: any build+refresh/upsert history converges to the from-scratch index") {
    import graft.ops.DedupIndex
    // random corpora from a small word pool (collisions likely, which is
    // what makes the band index non-trivial), random churn histories
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.listOf(wordGen).map(_.take(8).mkString(" "))
    for (trial <- 0 until 3) {
      val texts = samples(docGen, 12 + trial)
      val v1 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // churn: rewrite every 3rd doc, drop every 5th, add two
      val v2 = v1.collect {
        case (i, t) if i % 5 != 4 => (i, if (i % 3 == 0) t + " omega" else t)
      } ++ Seq((100L + trial, "omega alpha"), (101L + trial, "beta beta gamma"))
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_prop_didx$trial").toString
      DedupIndex.build(v1.toDF("doc_id", "text"), "doc_id", "text", tmp + "/inc")
      DedupIndex.refresh(v2.toDF("doc_id", "text"), "doc_id", "text", tmp + "/inc")
      DedupIndex.build(v2.toDF("doc_id", "text"), "doc_id", "text", tmp + "/scratch")
      def pairs(p: String) = DedupIndex.candidatePairs(spark, p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(tmp + "/inc") == pairs(tmp + "/scratch"),
        s"trial $trial: incremental index must converge to the batch build")
      // refresh is idempotent: a second identical refresh signs nothing
      val (_, signed) = DedupIndex.refresh(v2.toDF("doc_id", "text"), "doc_id", "text", tmp + "/inc")
      assert(signed == 0, s"trial $trial: no-op refresh must sign nothing")
    }
  }

  test("bm25Fold equals the pivot bm25 bit-for-bit on random corpora and term sets") {
    import graft.ops.Relevance
    val wordGen = Gen.oneOf("spark", "data", "lake", "fox", "dog", "xyz", "qq")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(12).mkString(" "))
    for (trial <- 0 until 3) {
      val docs = samples(docGen, 16 + trial).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("spark", "lake", "dog", "absent")
      val a = Relevance.bm25(docs, "doc_id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = Relevance.bm25Fold(docs, "doc_id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a == b, s"trial $trial: fold and pivot must agree bit-for-bit")
    }
  }

  test("chunkTokens at step==window partitions the token stream losslessly") {
    import graft.ops.TextAnalysis
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val docGen = Gen.listOf(wordGen).map(_.take(40).mkString(" "))
    val docs = samples(docGen, 24).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (w <- Seq(1, 3, 7, 64)) {
      val rows = docs.select(col("id"), col("text"),
          TextAnalysis.chunkTokens(col("text"), w, w).as("cs"))
        .collect()
      rows.foreach { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val chunks = r.getSeq[org.apache.spark.sql.Row](2)
        // non-overlapping chunks rejoin to the exact token stream
        assert(chunks.flatMap(_.getString(1).split(' ').filter(_.nonEmpty)) == toks)
        // chunk_ids are 0..n-1; all but the last chunk are full
        assert(chunks.map(_.getLong(0)) == chunks.indices.map(_.toLong))
        assert(chunks.dropRight(1).forall(_.getLong(2) == w))
        assert(chunks.map(_.getLong(2)).sum == toks.size)
      }
    }
  }

  test("MaterializedAgg: ANY drop partition + compaction points serves the one-shot aggregate") {
    import graft.lake.MaterializedAgg
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-500L, 500L),
      Gen.choose(0L, 99L))
    val rows = samples(rowGen, 60)
    val spec = MaterializedAgg.Spec(Seq("g"),
      sums = Seq("s" -> col("v")), mins = Seq("mn" -> col("k")),
      maxs = Seq("mx" -> col("k")))
    def oneShot = rows.toDF("g", "v", "k").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("k").as("mn"), max("k").as("mx"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val cutsGen = Gen.listOfN(3, Gen.choose(0, rows.size))
    samples(cutsGen, 4).zipWithIndex.foreach { case (cuts, trial) =>
      val path = java.nio.file.Files.createTempDirectory("maggprop").toString + "/s"
      val bounds = (Seq(0, rows.size) ++ cuts).distinct.sorted
      val drops = bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty)
      drops.zipWithIndex.foreach { case (d, i) =>
        MaterializedAgg.landDrop(d.toDF("g", "v", "k"), spec, path, s"d$i")
        if (i == trial % drops.size) MaterializedAgg.compact(spark, path, spec, s"c$i")
      }
      val served = MaterializedAgg.serve(spark, path, spec)
        .select(col("g"), col("n"), col("s"), col("mn"), col("mx"))
        .orderBy("g").collect().map(_.toSeq).toSeq
      assert(served == oneShot, s"cuts=$cuts compactAfter=${trial % drops.size}")
    }
  }

  test("topk sketch: ANY drop partition + compaction point keeps est <= true <= hi and the surfacing guarantee") {
    import graft.ops.Sketches
    // zipf-ish key mix: a few hot keys, a long uniform tail
    val keyGen = Gen.frequency(
      (5, Gen.oneOf("h0", "h1")), (2, Gen.oneOf("m0", "m1", "m2")),
      (3, Gen.choose(0, 40).map(i => s"t$i")))
    val rows = samples(keyGen, 300)
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cutsGen = Gen.listOfN(3, Gen.choose(0, rows.size))
    samples(cutsGen, 4).zipWithIndex.foreach { case (cuts, trial) =>
      val path = java.nio.file.Files.createTempDirectory("topkprop").toString + "/s"
      val bounds = (Seq(0, rows.size) ++ cuts).distinct.sorted
      val drops = bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty)
      drops.zipWithIndex.foreach { case (d, i) =>
        Sketches.landTopKDrop(d.zipWithIndex.toDF("k", "i"), Nil, "k", 5, path, s"d$i")
        if (i == trial % drops.size) Sketches.compactTopK(spark, path, Nil, "k", 5)
      }
      val served = Sketches.serveTopK(spark, path, Nil, "k").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val tot = Sketches.totalCutoff(spark, path, Nil).collect().head.getLong(0)
      served.foreach { case (k, (est, hi)) =>
        assert(est <= truth(k) && truth(k) <= hi,
          s"cuts=$cuts compactAfter=${trial % drops.size} key=$k est=$est true=${truth(k)} hi=$hi")
      }
      truth.foreach { case (k, t) =>
        if (t > tot) assert(served.contains(k),
          s"cuts=$cuts: key $k true=$t above tot=$tot must surface")
        else if (!served.contains(k)) assert(t <= tot)
      }
    }
  }

  test("TextIndex: any build+refresh/upsert history converges to the from-scratch stats") {
    import graft.ops.TextIndex
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(5).mkString)
    val docGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val corpusGen = Gen.listOfN(8, docGen)
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    samples(Gen.zip(corpusGen, corpusGen, Gen.choose(0, 2)), 3).foreach {
      case (v1, v2, mode) =>
        val tmp = java.nio.file.Files.createTempDirectory("txtprop").toString
        val idx = tmp + "/idx"
        // final corpus: v2 wins per id; history varies by mode
        TextIndex.build(v1.toDF("doc_id", "text"), "doc_id", "text", idx)
        mode match {
          case 0 => TextIndex.refresh(v2.toDF("doc_id", "text"), "doc_id", "text", idx)
          case 1 => TextIndex.upsert(v2.toDF("doc_id", "text"), "doc_id", "text", idx)
          case _ =>
            v2.grouped(3).foreach { b =>
              TextIndex.upsert(b.toDF("doc_id", "text"), "doc_id", "text", idx)
            }
        }
        // refresh drops vanished ids; upsert keeps them — the reference
        // corpus differs accordingly
        val ref = if (mode == 0) v2
          else (v1.toMap ++ v2.toMap).toSeq.sortBy(_._1)
        TextIndex.build(ref.toDF("doc_id", "text"), "doc_id", "text", tmp + "/scratch")
        val got = TextIndex.serve(spark, idx).orderBy("doc").collect().map(_.toSeq).toSeq
        val want = TextIndex.serve(spark, tmp + "/scratch").orderBy("doc")
          .collect().map(_.toSeq).toSeq
        assert(got == want, s"mode=$mode")
    }
  }

  test("knnGraphBucketed: every edge stays in-bucket and ranks exactly per the decimal dot") {
    import graft.ops.Similarity
    val vecGen = Gen.listOfN(64, Gen.choose(-1000, 1000))
      .map(_.map(_ / 1000.0f))
    val vecs = samples(vecGen, 40).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.knnGraphBucketed(df, "vec_id", "embedding", 3, 4, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: bucket via the same hyperplane signs, rank by exact
    // BigDecimal dot, tie-break by cid — computed driver-side from scratch
    val signs = Similarity.hyperplaneSigns(4, 64)
    def bucket(v: Seq[Float]): String = signs.map { sv =>
      val dot = v.zip(sv).map { case (x, w) =>
        BigDecimal(x.toDouble) * BigDecimal(w) }.sum
      if (dot >= 0) '1' else '0'
    }.mkString
    def dot(a: Seq[Float], b: Seq[Float]): BigDecimal =
      a.zip(b).map { case (x, y) =>
        BigDecimal(x.toDouble * y.toDouble).setScale(15, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    val byBucket = vecs.groupBy { case (_, v) => bucket(v) }
    val want = byBucket.values.flatMap { members =>
      members.flatMap { case (qid, qv) =>
        members.filter(_._1 != qid)
          .map { case (cid, cv) => (cid, dot(qv, cv)) }
          .sortBy { case (cid, d) => (-d, cid) }
          .take(3).zipWithIndex
          .map { case ((cid, _), r) => (qid, cid, (r + 1).toLong) }
      }
    }.toSet
    assert(got.toSet == want && got.nonEmpty)
  }

  test("sampleMixture seats: for random weights, Σalloc == budget and |alloc - ideal| <= 1 per stratum") {
    import graft.ops.Curation
    // strata counts large enough that the seat allocation (not corpus
    // size) is the binding constraint; weights random in [1, 1000]
    val wGen = Gen.nonEmptyListOf(Gen.choose(1L, 1000L)).map(_.take(9))
    samples(wGen, 12).filter(_.size >= 2).foreach { ws =>
      val total = 37L
      val rows = ws.zipWithIndex.flatMap { case (w, i) =>
        (0 until 40).map(j => (s"s$i", (i * 1000 + j).toLong, s"doc $i $j", w))
      }
      val got = Curation.sampleMixture(rows.toDF("src", "id", "text", "w"),
          "src", "id", "text", col("w"), total)
        .groupBy(col("src")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bigW = ws.map(BigInt(_)).sum
      assert(got.values.sum == total, s"seats must sum to budget for weights $ws: $got")
      ws.zipWithIndex.foreach { case (w, i) =>
        val seats = BigDecimal(got.getOrElse(s"s$i", 0L))
        val ideal = BigDecimal(total) * BigDecimal(w) / BigDecimal(bigW)
        assert((seats - ideal).abs <= 1,
          s"stratum s$i seats $seats vs ideal $ideal for weights $ws")
      }
    }
  }
}
