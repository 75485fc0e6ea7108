package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens filter empties; tokenCount (text analysis)") {
    val df = Seq("  The cat  sat ", "").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0))
  }

  test("langId votes stopwords, tie-break smallest code, und when none") {
    val df = Seq(
      "the cat is on the mat",       // en
      "el perro de la casa",         // es
      "zzz qqq xxx"                  // no hits -> und
    ).toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "und"))
  }

  test("fingerprintMd5 is casing/punct/whitespace invariant") {
    val df = Seq("Hello,  World!", "hello world").toDF("text")
      .select(TextAnalysis.fingerprintMd5(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("rollingHash is order-sensitive, exact int64") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextAnalysis.rollingHash(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) != hs(1) && hs(0) == hs(2))
  }

  test("PII scrub: counts per class, redaction deterministic and idempotent") {
    val df = Seq(
      "mail Bob@Example.COM or call +34 600 123 456 from 10.0.0.1",
      "no pii here at all",
      "two mails: a@b.es c@d.org"
    ).toDF("text")
    val got = df.select(
      TextAnalysis.piiCounts(col("text")).as("p"),
      TextAnalysis.redactPii(col("text")).as("r")).collect()
    assert(got(0).getStruct(0).toSeq == Seq(1, 1, 1))
    assert(got(0).getString(1) == "mail [email] or call [phone] from [ip]")
    assert(got(1).getStruct(0).toSeq == Seq(0, 0, 0))
    assert(got(1).getString(1) == "no pii here at all")
    assert(got(2).getStruct(0).toSeq == Seq(2, 0, 0))
    assert(got(2).getString(1) == "two mails: [email] [email]")
    // idempotent: redacting redacted text is a no-op
    val again = df.select(TextAnalysis.redactPii(TextAnalysis.redactPii(col("text"))).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(again == got.map(_.getString(1)).toSeq)
    // case-PRESERVING: only the PII spans are replaced — an earlier form
    // lowercased the entire document, silently case-mangling any corpus
    // whose textCol was rewritten with the redacted output
    val cased = Seq("Contact John Smith at JOHN@EXAMPLE.COM today").toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).collect().head.getString(0)
    assert(cased == "Contact John Smith at [email] today", cased)
  }

  test("bpeTokens: contractions/digits/punctuation segment separately; ws count unchanged") {
    val df = Seq(
      "It's 2024, really-good!",  // it|'s| 2024|,| really|-|good|!
      "plain words here",
      ""
    ).toDF("text")
    val got = df.select(
      TextAnalysis.bpeTokens(col("text")).as("bt"),
      TextAnalysis.bpeTokenCount(col("text")).as("nb"),
      TextAnalysis.tokenCount(col("text")).as("nw")).collect()
    assert(got(0).getAs[scala.collection.Seq[String]]("bt") ==
      Seq("it", "'s", " 2024", ",", " really", "-", "good", "!"))
    assert(got(0).getInt(1) == 8 && got(0).getInt(2) == 3)
    assert(got(1).getInt(1) == 3 && got(1).getInt(2) == 3)
    assert(got(2).getInt(1) == 0 && got(2).getInt(2) == 0)
  }

  test("text queries tokenize once (plan lock: no re-inlined split per signal)") {
    // these queries materialize tokens in a prior projection; if a
    // future edit lets CollapseProject re-inline them, the interpreted
    // HOF tree re-splits the text up to ~20x per row. corpus_curate /
    // dedup_canonical get a budget of 2: their MinHash shingle subtree
    // tokenizes independently of the signal projection.
    val budget = Map("txt_repetition" -> 1, "txt_token_stats" -> 1,
      "q_token_budget" -> 1, "corpus_curate" -> 2, "dedup_canonical" -> 2)
    budget.foreach { case (q, maxSplits) =>
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan.toString
      val splits = "split\\(lower\\(".r.findAllIn(plan).length
      assert(splits <= maxSplits, s"$q: expected <= $maxSplits tokenize(s), found $splits")
    }
  }

  test("ngrams / dupNgramFrac / topTokenFrac: repetition signals, short docs safe") {
    val df = Seq(
      "a b a b a",     // 5 toks: top a=3/5; bigrams [a b, b a, a b, b a] -> dup 2/4
      "x y z",         // all unique: top 1/3, dup 0
      "q",             // 1 token: no bigrams -> 0.0, top 1.0
      ""               // empty: all 0.0
    ).toDF("text")
    val toks = TextAnalysis.tokens(col("text"))
    val got = df.select(
      TextAnalysis.ngrams(toks, 2).as("bg"),
      TextAnalysis.topTokenFrac(toks).as("top"),
      TextAnalysis.dupNgramFrac(toks, 2).as("dup2"),
      TextAnalysis.dupNgramFrac(toks, 3).as("dup3")).collect()
    assert(got(0).getAs[scala.collection.Seq[String]]("bg") == Seq("a b", "b a", "a b", "b a"))
    assert(got(0).getDouble(1) == 3.0 / 5 && got(0).getDouble(2) == 2.0 / 4)
    // trigrams of "a b a b a": [a b a, b a b, a b a] -> dup 1/3
    assert(got(0).getDouble(3) == 1.0 / 3)
    assert(got(1).getDouble(1) == 1.0 / 3 && got(1).getDouble(2) == 0.0)
    assert(got(2).getAs[scala.collection.Seq[String]]("bg").isEmpty)
    assert(got(2).getDouble(1) == 1.0 && got(2).getDouble(2) == 0.0)
    assert(got(3).getDouble(1) == 0.0 && got(3).getDouble(2) == 0.0 && got(3).getDouble(3) == 0.0)
  }

  test("assignShards: md5-hex shard, stable under repartitioning, within [0-9a-f]") {
    import graft.ops.Curation
    val docs = (1 to 64).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    val a = Curation.assignShards(docs, "text")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.values.forall(s => s.length == 1 && "0123456789abcdef".contains(s)))
    val b = Curation.assignShards(docs.repartition(7), "text")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > 4) // 64 docs spread over many of the 16 shards
  }

  test("shingles: distinct word 3-grams; short docs give empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val sh = df.collect().map(_.getAs[scala.collection.Seq[String]]("sh"))
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1).isEmpty)
  }

  test("shingles(w): matches sliding-window reference for w in {2,3,5}") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b",             // repeats -> distinct matters
      "uno dos tres", "one two", "solo", "")
    val df = texts.toDF("text")
    // reference: the SAME tokenizer's output, slid in plain Scala
    val toks = df.select(graft.ops.TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(_.getAs[scala.collection.Seq[String]]("t").toList)
    for (w <- Seq(2, 3, 5)) {
      val got = df.select(Dedup.shingles(col("text"), w).as("sh"))
        .collect().map(_.getAs[scala.collection.Seq[String]]("sh").toList)
      val expected = toks.map(t =>
        if (t.length < w) Nil else t.sliding(w).map(_.mkString(" ")).toList.distinct)
      assert(got.toSeq == expected.toSeq, s"w=$w")
    }
  }

  test("minhash LSH finds near-identical docs, not unrelated ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and once"),
      (3L, "completely different text about spark shuffles and partitions here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("jaccard of identical shingle sets is 1.0, disjoint is 0.0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c", "x y z")).toDF("t1", "t2")
      .select(Dedup.jaccard(Dedup.shingles(col("t1")), Dedup.shingles(col("t2"))).as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }

  test("containmentPairs: asymmetric, catches low-Jaccard containment, matches brute force") {
    // a (3 shingles) sits verbatim inside b (8 shingles): containment
    // a->b = 1.0 but Jaccard = 3/8 — the case symmetric LSH misses.
    // b->a = 3/8 < 0.75 must NOT appear (asymmetry).
    val docs = Seq(
      (1L, "t3 t4 t5 t6 t7"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (3L, "x1 x2 x3 x4"),
      (4L, "t3 t4 t5 t6 t7"),            // exact dup of 1 -> both directions
      (5L, "x1 x2 x3 x4 y1"),            // contains all of 3's shingles
      (6L, "zz")                         // < 3 tokens -> no shingles, ignored
    ).toDF("doc", "text")
    val shd = docs.select(col("doc"), Dedup.shingles(col("text")).as("sh"))
    val got = Dedup.containmentPairs(shd, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(!got.contains((2L, 1L)))
    assert(got((1L, 4L)) == 1.0 && got((4L, 1L)) == 1.0)
    // brute-force all-pairs ground truth over the same shingle frame
    val brute = shd.filter(size(col("sh")) >= 1).as("x")
      .crossJoin(shd.filter(size(col("sh")) >= 1).as("y"))
      .filter(col("x.doc") =!= col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(col("x.sh")).cast("double")).as("c"))
      .filter(col("c") >= 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == brute)
  }

  test("simhash: 64-bit signature, near-identical docs within small hamming") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog every single day", "a"),
      ("the quick brown fox jumps over the lazy dog every single night", "b"),
      ("spark catalyst optimizer rewrites logical plans into physical ones", "c")
    ).toDF("text", "tag").select(col("tag"), Dedup.simhashBits(col("text")).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sigs.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(sigs("a"), sigs("b")) < hamming(sigs("a"), sigs("c")))
  }

  test("cosine: orthogonal 0, identical 1 (exact decimal accumulation)") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(0.5f, 0.5f), Seq(0.5f, 0.5f))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(cs(0) == 0.0)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
  }

  test("bruteTopK ranks by cosine desc with id tie-break") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(1.0f, 0.01f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteTopK(vecs, vecs.filter(col("vec_id") === 1), "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(_.getAs[Long]("cid"))
    assert(top.toSeq == Seq(4L, 2L))
  }

  test("asOfLatest: latest right row at-or-before each left row, per key") {
    import graft.ops.AsOfJoin
    val queries = Seq(("k1", "q1", "2024-01-05"), ("k1", "q2", "2024-01-01"), ("k2", "q3", "2024-01-10"))
      .toDF("k", "id", "ts")
    val quotes = Seq(("k1", "p1", "2024-01-02"), ("k1", "p2", "2024-01-04"), ("k2", "p3", "2024-01-10"))
      .toDF("k", "id", "ts")
    val got = AsOfJoin.asOfLatest(queries, quotes, "k", "id", "ts")
      .orderBy("id").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("matched_id"))
    assert(got.toSeq == Seq(
      "q1" -> "p2",   // latest quote <= 01-05
      "q2" -> null,   // no quote yet
      "q3" -> "p3"))  // equal timestamp matches
  }

  test("bucketedTopK only scores same-bucket candidates and agrees with brute on its bucket") {
    val vecs = (0 until 32).map { i =>
      (i.toLong, (0 until 64).map(j => (math.sin(i * 64 + j) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val res = Similarity.bucketedTopK(vecs, vecs.filter(col("vec_id") < 4), "vec_id", "embedding", 3, 2, 64)
    assert(res.count() >= 0) // structural: runs, no crash, bounded candidates
    val got = res.select("qid", "cid").collect()
    assert(got.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("connectedComponents: min-label per component, transitive chains merge") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; isolated nodes absent
    val edges = Seq((2L, 1L), (2L, 3L), (9L, 3L), (5L, 7L)).toDF("a", "b")
    val got = graft.ops.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents: distributed tier matches driver union-find tier") {
    // a 40-node random-ish graph: rings + cross links + a long chain, so
    // label propagation needs several hops to converge
    val ring = (0 until 10).map(i => (i.toLong + 100, ((i + 1) % 10).toLong + 100))
    val chain = (0 until 15).map(i => (i.toLong * 2 + 200, i.toLong * 2 + 202))
    val stars = Seq((300L, 301L), (300L, 302L), (301L, 303L), (9L, 300L))
    val edges = (ring ++ chain ++ stars).toDF("a", "b")
    val viaDriver = graft.ops.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPropagation = graft.ops.Dedup.connectedComponents(edges, driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaPropagation)
    assert(viaDriver(109L) == 100L && viaDriver(230L) == 200L && viaDriver(303L) == 9L)
    // byte gate: same graph with a tiny byte budget must route to the
    // distributed tier (row count is under the cap) and still agree
    val viaByteGate = graft.ops.Dedup.connectedComponents(edges, driverMaxBytes = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaByteGate == viaDriver)
  }

  test("int8 quantization round-trips within scale/2 per component") {
    val vecs = (0 until 8).map { i =>
      (i.toLong, (0 until 64).map(j => (math.sin(i * 64 + j) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = vecs.select(col("embedding"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("back"),
        Similarity.quantizeInt8(col("embedding")).getField("codes").as("codes"))
      .collect()
    rows.foreach { r =>
      val orig = r.getAs[scala.collection.Seq[Float]](0)
      val back = r.getAs[scala.collection.Seq[Double]](1)
      val codes = r.getAs[scala.collection.Seq[Int]](2)
      val scale = (orig.max - orig.min).toDouble / 255.0
      orig.zip(back).foreach { case (o, b) => assert(math.abs(o - b) <= scale / 2 + 1e-12) }
      assert(codes.forall(c => c >= -128 && c <= 127))
    }
  }

  test("int8-quantized IVF matches full-precision IVF; lists carry tinyint codes") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, (0 until 64).map(j => (math.sin(i * 64 + j) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 12 === 0)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // identical top-k: the margin absorbs the <=scale/2-per-component
    // coarse error, the exact-decimal decider sees full precision
    val full = res(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 5, 8, 3))
    val int8 = res(Similarity.ivfTopKInt8(vecs, queries, "vec_id", "embedding", 5, 8, 3))
    assert(int8 == full)
    // codebook pluggability mirrors the full-precision tier: under the
    // SAME k-means codebook, int8 and full-precision agree exactly too
    val km = Similarity.ivfCentroidsKMeans(vecs, "vec_id", "embedding", 8)
    val fullKm = res(Similarity.ivfTopKWith(km, vecs, queries, "vec_id", "embedding", 5, 3))
    val int8Km = res(Similarity.ivfTopKInt8With(km, vecs, queries, "vec_id", "embedding", 5, 3))
    assert(int8Km == fullKm)
    // the inverted-list layout this tier shuffles is 1-byte codes
    val codesType = Similarity.quantizeInt8(col("embedding")).getField("codes")
      .cast("array<tinyint>")
    val probe = vecs.select(codesType.as("codes"))
    assert(probe.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    // byte-dot kernel agrees with the affine decomposition ground truth
    val row = vecs.filter(col("vec_id") === 1).select(
      graft.functions.DotByteFloat.dot_byte_float(codesType, col("embedding")).as("bd"),
      Similarity.quantizeInt8(col("embedding")).as("q8"), col("embedding"))
      .collect().head
    val emb = row.getAs[scala.collection.Seq[Float]]("embedding")
    val q8 = row.getAs[org.apache.spark.sql.Row]("q8")
    val codes = q8.getAs[scala.collection.Seq[Int]]("codes")
    val expected = codes.zip(emb).map { case (c, x) => (c + 128) * x.toDouble }.sum
    assert(math.abs(row.getAs[Double]("bd") - expected) < 1e-9)
  }

  test("int8 IVF gate is error-bound-complete on a dense near-duplicate corpus") {
    // every vector within quantization error of its neighbors: the coarse
    // int8 scores all tie inside the error band, so a fixed rank margin
    // would cut true top-k rows — the bound-aware gate must widen instead
    val base = (0 until 64).map(j => (math.sin(j) / 2).toFloat)
    val vecs = (0 until 60).map { i =>
      (i.toLong, base.updated(i % 64, base(i % 64) + i * 1e-4f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 15 === 0)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = res(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 5, 4, 2))
    val int8 = res(Similarity.ivfTopKInt8(vecs, queries, "vec_id", "embedding", 5, 4, 2))
    assert(int8 == full)
  }

  test("contaminated: flags train docs on a full 3-shingle overlap, never on shorter runs") {
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a sentence with the quick brown inside it"), // full 3-gram overlap -> flagged
      (2L, "only quick brown here but then different"),  // longest shared run = 2 tokens
      (3L, "completely unrelated words entirely"),
      (4L, "ends with brown fox jumps")                  // overlap at eval tail -> flagged
    ).toDF("doc_id", "text")
    val flagged = graft.ops.Dedup.contaminated(train, evalSet, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(1L, 4L))

    // threshold knob: doc 1 shares ONE distinct shingle ("the quick
    // brown"), doc 5 shares two ("quick brown fox", "brown fox jumps") —
    // minShared=2 keeps only doc 5
    val train2 = train.unionByName(
      Seq((5L, "see the quick brown fox jumps high")).toDF("doc_id", "text"))
    val strict = graft.ops.Dedup.contaminated(train2, evalSet, "doc_id", "text", minShared = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(strict == Seq(5L))
  }

  test("contaminatedExact: verbatim containment only; empty needles dropped; no shuffle") {
    val evalSet = Seq((100L, "quick brown fox"), (101L, "")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a quick brown fox appears"),     // verbatim -> flagged
      (2L, "quick brown wolf quick fox"),    // all words, not contiguous -> clean
      (3L, "entirely different")             // would match ONLY an empty needle
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.contaminatedExact(train, evalSet, "doc_id", "text")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L))
    // scale shape: broadcast nested-loop probe, no exchange before the
    // distinct — the corpus is scanned once, needles ride the broadcast
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("Curation: budget admits best-first with straddler kept; stratified sample is stable") {
    import graft.ops.Curation
    // quality order is approximated here by doc_id (orderBy is caller's);
    // budget 5: doc 1 (3 toks, start 0) + doc 2 (4 toks, start 3 < 5 —
    // straddles, kept) admitted; doc 3 (start 7) cut. Shard b's single
    // over-budget doc is still admitted (starts at 0).
    val docs = Seq(
      ("a", 1L, "w1 w2 w3"), ("a", 2L, "w1 w2 w3 w4"), ("a", 3L, "w1 w2"),
      ("b", 7L, "x1 x2 x3 x4 x5 x6 x7 x8")
    ).toDF("source", "doc_id", "text")
    val kept = Curation.capTokenBudget(docs, "source", "text", 5, Seq(col("doc_id")))
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set("a" -> 1L, "a" -> 2L, "b" -> 7L))

    // stratified: n per stratum, identical across runs AND repartitionings
    val corpus = (1 to 40).map(i => (s"l${i % 2}", i.toLong, s"text body number $i"))
      .toDF("lang", "doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.sampleStratified(df, "lang", "doc_id", "text", 5)
        .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1 = ids(corpus)
    assert(s1.count(_._1 == "l0") == 5 && s1.count(_._1 == "l1") == 5)
    assert(ids(corpus.repartition(7)) == s1)
  }

  test("Curation.sampleMixture: exact Hamilton seats — sum==budget, per-stratum error <=1, repartition-stable") {
    import graft.ops.Curation
    // 3 strata with weights 5:3:2 over a 7-seat budget: ideal seats
    // 3.5/2.1/1.4, floors 3/2/1 (sum 6), the 1 leftover seat goes to the
    // largest remainder (a: rem .5) -> alloc 4/2/1
    val corpus = (
      (1 to 10).map(i => ("a", i.toLong, s"alpha doc $i", 5L)) ++
      (1 to 10).map(i => ("b", (100 + i).toLong, s"beta doc $i", 3L)) ++
      (1 to 10).map(i => ("c", (200 + i).toLong, s"gamma doc $i", 2L))
    ).toDF("source", "doc_id", "text", "wt")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.sampleMixture(df, "source", "doc_id", "text", col("wt"), total = 7L)
        .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1 = run(corpus)
    assert(s1.size == 7, s"Hamilton seats must sum to the budget: $s1")
    val bySrc = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySrc == Map("a" -> 4, "b" -> 2, "c" -> 1), s"seat split wrong: $bySrc")
    // |alloc - total*w/W| <= 1 for every stratum (Hamilton bound):
    // ideals 3.5/2.1/1.4 vs 4/2/1 — all within 1
    assert(run(corpus.repartition(5)) == s1, "content-hash order must be partitioning-invariant")

    // a stratum smaller than its allocation under-fills without stealing
    // seats from others
    val tiny = corpus.filter(col("source") =!= "a")
      .union(Seq(("a", 1L, "alpha doc 1", 50L)).toDF("source", "doc_id", "text", "wt"))
    val s2 = run(tiny) // a's weight dominates but a holds ONE doc
    assert(s2.count(_._1 == "a") == 1, "allocation is a cap, not a quota to fill")

    // a stratum whose weights are all NULL gets explicit ZERO seats (its
    // sum is coalesced, not dropped) and the Σalloc == budget contract
    // holds for the remaining strata
    val nullWt = corpus.withColumn("wt",
      when(col("source") === "c", lit(null).cast("long")).otherwise(col("wt")))
    val s3 = Curation.sampleMixture(nullWt, "source", "doc_id", "text", col("wt"), total = 7L)
      .select("source").collect().map(_.getString(0))
    assert(s3.length == 7, s"null-weight stratum must not break Σalloc==total: ${s3.toSeq}")
    assert(!s3.contains("c"), "a zero-weight stratum gets zero seats")

    // an all-zero/NULL total weight is diagnosed by name, not as an
    // opaque ANSI divide-by-zero
    val zero = intercept[Exception] {
      Curation.sampleMixture(corpus.withColumn("wt", lit(0L)),
        "source", "doc_id", "text", col("wt"), total = 7L).collect()
    }
    val msgs = Iterator.iterate(zero: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("total rowWeight must be positive"),
      s"expected a named diagnosis, got: $msgs")
  }

  test("packSequences: concat-and-chunk bins per shard, documents straddle boundaries") {
    val docs = Seq(
      ("a", 1L, "w1 w2 w3"),              // 3 tokens: start 0 -> bin 0, offset 0
      ("a", 2L, "w1 w2 w3 w4"),           // start 3  -> bin 0, offset 3 (straddles into bin 1)
      ("a", 3L, "w1 w2"),                 // start 7  -> bin 1, offset 2
      ("b", 7L, "x1 x2 x3 x4 x5 x6"),     // shard b restarts: bin 0, offset 0
      ("b", 9L, "x1")                     // start 6  -> bin 1, offset 1
    ).toDF("source", "doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "source", "doc_id", "text", budget = 5)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.toSeq == Seq(
      ("a", 1L, 3L, 0L, 0L),
      ("a", 2L, 4L, 0L, 3L),
      ("a", 3L, 2L, 1L, 2L),
      ("b", 7L, 6L, 0L, 0L),
      ("b", 9L, 1L, 1L, 1L)))

    // a null-text document contributes ZERO tokens — it must not poison
    // the prefix sum for every later document in its shard
    val withNull = Seq(("c", 1L, "y1 y2"), ("c", 2L, null), ("c", 3L, "y3"))
      .toDF("source", "doc_id", "text")
    val packedN = TextAnalysis.packSequences(withNull, "source", "doc_id", "text", budget = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packedN.toSeq == Seq((1L, 2L, 0L, 0L), (2L, 0L, 0L, 2L), (3L, 1L, 0L, 2L)))
  }

  test("skew: salted aggregation equals direct groupBy; AQE splits the skewed join") {
    // 90% of rows on one hot key
    val df = spark.range(10000).select(col("id"),
      when(col("id") < 9000, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("k"),
      (col("id") % 100).as("v"))
    def norm(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = norm(df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_cents")))
    assert(norm(graft.ops.Skew.saltedCountSum(df, "k", col("v"))) == direct)

    // the documented join-skew path: AQE's OptimizeSkewedJoin splits the
    // hot partition at runtime (plan shows skew=true) — thresholds
    // shrunk so the 9k-row hot key qualifies at test scale
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shuffle blocks are compressed, so the hot partition is only a
      // few KB at test scale — thresholds shrink to match, and coalesce
      // is off so small sibling partitions don't mask the skew ratio
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the tiny result stage would otherwise veto the split as "extra
      // shuffle not worth it" at toy scale
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      // per-row unique payload: identical payloads would compress the
      // hot shuffle partition below the skew detector's size ratio
      val left = df.withColumn("pay",
        concat_ws("", Seq.tabulate(4)(i => md5((col("id") + lit(i * 1000000)).cast("string"))): _*))
      // right side must shuffle WITHOUT a post-shuffle aggregate: the
      // skew rule pattern-matches SMJ(Sort(Shuffle), Sort(Shuffle)) and
      // a distinct's final HashAggregate between them defeats it
      val right = spark.range(9000, 10000)
        .select(concat(lit("k"), col("id")).as("k"))
        .union(Seq("hot").toDF("k"))
        .withColumn("tag", lit(1))
      val joined = left.join(right, "k")
      // drive THIS Dataset's QueryExecution (count() would plan a fresh
      // one and leave joined's adaptive plan unexecuted)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("skew: saltedJoin is row-identical to the plain join, incl. duplicate dim rows") {
    val fact = spark.range(2000).select(col("id"),
      when(col("id") < 1800, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("k"))
    // dim with a DUPLICATE key row: each fact row must still meet both
    val dim = (Seq(("hot", 1), ("hot", 2)) ++
      (1800 until 2000).map(i => (s"k$i", i))).toDF("k", "d")
    def norm(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("k"), col("d")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    val plain = norm(fact.join(dim, "k"))
    val salted = norm(graft.ops.Skew.saltedJoin(fact, dim, "k", col("id"), salt = 8))
    assert(salted == plain && plain.size == 1800 * 2 + 200)
    intercept[IllegalArgumentException](graft.ops.Skew.saltedJoin(
      fact.withColumn("__salt", lit(1)), dim, "k", col("id")))
  }

  test("packSequencesFirstFit: no doc straddles a bin; oversize doc gets its own bin") {
    val docs = Seq(
      ("a", 1L, "w1 w2 w3"),            // bin 0, off 0 (3)
      ("a", 2L, "w1 w2 w3 w4"),         // 3+4=7 > 5 -> bin 1, off 0
      ("a", 3L, "w1"),                  // fits: bin 1, off 4
      ("a", 4L, "w1 w2 w3 w4 w5 w6"),   // oversize -> bin 2 alone, off 0
      ("a", 5L, "w1"),                  // 6 > 5 in bin 2 -> bin 3, off 0
      ("b", 7L, "x1 x2")                // new shard resets: bin 0, off 0
    ).toDF("source", "doc_id", "text")
    val got = graft.ops.TextAnalysis
      .packSequencesFirstFit(docs, "source", "doc_id", "text", budget = 5)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", 1L, 0L, 0L), ("a", 2L, 1L, 0L), ("a", 3L, 1L, 4L),
      ("a", 4L, 2L, 0L), ("a", 5L, 3L, 0L), ("b", 7L, 0L, 0L)))
    // stable under repartitioning (the fold sorts within shard partitions)
    val again = graft.ops.TextAnalysis
      .packSequencesFirstFit(docs.repartition(7), "source", "doc_id", "text", budget = 5)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(again == got)
  }

  test("k-means IVF codebook: bit-reproducible and recall >= seed codebook (sf0.01)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 25 === 0) // 20 probes over 500 vectors

    // bit-reproducibility: two independent builds produce identical floats
    Similarity.trainerCollectMax.set(0L)
    val cb1 = Similarity.ivfCentroidsKMeans(emb, "vec_id", "embedding", nList = 16)
    val cb2 = Similarity.ivfCentroidsKMeans(emb, "vec_id", "embedding", nList = 16)
    assert(cb1 == cb2)
    assert(cb1.map(_._1) == (0L until 16L)) // cell ids are 0..nList-1
    // the trainer is DISTRIBUTED: the 128-row sample never lands on the
    // driver — no single collect in either build exceeded nList rows
    assert(Similarity.trainerCollectMax.get() > 0L)
    assert(Similarity.trainerCollectMax.get() <= 16L,
      s"trainer collected ${Similarity.trainerCollectMax.get()} rows > nList=16")

    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteTopKExact(emb, queries, "vec_id", "embedding", 10))
    val seedCb = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val seedHits = hits(Similarity.ivfTopKWith(seedCb, emb, queries, "vec_id", "embedding", 10, 4))
    val kmHits = hits(Similarity.ivfTopKWith(cb1, emb, queries, "vec_id", "embedding", 10, 4))
    val seedRecall = (seedHits & truth).size.toDouble / truth.size
    val kmRecall = (kmHits & truth).size.toDouble / truth.size
    info(f"recall@10 nProbe=4/16: seed=$seedRecall%.3f kmeans=$kmRecall%.3f")
    assert(kmRecall >= seedRecall,
      f"k-means codebook recall $kmRecall%.3f below seed codebook $seedRecall%.3f")
    // pinned floor (round-12 verdict): the distributed trainer must not
    // regress below the driver-Lloyd recall it replaced
    assert(kmRecall >= 0.52,
      f"k-means codebook recall $kmRecall%.3f below the pinned 0.52 floor")
  }

  test("multi-probe bucketed ANN recalls a superset of single-probe candidates") {
    val vecs = (0 until 48).map { i =>
      (i.toLong, (0 until 64).map(j => (math.sin(i * 64 + j) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 6)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // compare raw candidate coverage (k large enough to keep everything scored)
    val single = pairs(Similarity.bucketedTopK(vecs, queries, "vec_id", "embedding", 1000, 3, 64))
    val multi = pairs(Similarity.bucketedTopKMultiProbe(vecs, queries, "vec_id", "embedding", 1000, 3, 64))
    assert(single.subsetOf(multi))
    assert(multi.size > single.size) // the sin-grid data straddles cell boundaries
    // multi-probe ranks agree with brute force restricted to probed candidates
    val brute = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 1000)
      .select("qid", "cid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val multiRanked = Similarity.bucketedTopKMultiProbe(vecs, queries, "vec_id", "embedding", 1000, 3, 64)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every probed candidate exists in the brute ranking (same scoring math)
    assert(multiRanked.forall(brute.contains))
    // the exact-decimal variant probes the same candidate set as the
    // cosine variant (identical probe algebra, different decider)
    val exact = pairs(Similarity.multiProbeTopKExact(vecs, queries, "vec_id", "embedding", 1000, 3, 64))
    assert(exact == multi)
  }

  test("dedupSpansGlobal: cross-doc blocks survive only in the min doc") {
    val docs = Seq(
      (1L, "a b c d e f"),       // blocks (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),       // shares "a b c" with doc 1 -> dropped here
      (3L, "x y z"),             // shares "x y z" with doc 2 -> doc 2 keeps it
      (4L, "a b c"),             // fully deduplicated -> empty text survives as a row
      (5L, "p q")                // short doc: one partial block, untouched
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.dedupSpansGlobal(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2L, 0L, "a b c d e f")))  // min doc keeps both
    assert(got(1) == ((2L, 2L, 1L, "x y z")))        // "a b c" dropped, own block kept
    assert(got(2) == ((3L, 1L, 1L, "")))             // doc 2 won "x y z"
    assert(got(3) == ((4L, 1L, 1L, "")))             // fully dropped, row kept
    assert(got(4) == ((5L, 1L, 0L, "p q")))          // trailing partial block kept
  }

  test("dedupSpansAnyAlign: catches the one-token-shifted duplicate block dedup misses") {
    import graft.ops.Dedup
    // doc 2 = doc 1's 6-token span shifted one token right: with w=3
    // FIXED blocks its blocks are ("z a b", "c d e", "f") — none equal
    // doc 1's ("a b c", "d e f") — so block dedup keeps everything;
    // sliding grams collide at every inner alignment
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d e f"),
      (3L, "p q r p q r p q"), // within-doc repetition: 2nd occurrence dropped
      (4L, "u v")              // shorter than the window: untouched
    ).toDF("doc_id", "text")
    val blocks = Dedup.dedupSpansGlobal(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(blocks(1) == ((2L, 0L)), s"fixture: block dedup must MISS the shift: ${blocks.toSeq}")
    val got = Dedup.dedupSpansAnyAlign(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is canonical everywhere (min doc id)
    assert(got(0) == ((1L, 6L, 0L, "a b c d e f")))
    // doc 2: every position covered by a duplicated gram of doc 1 drops;
    // the leading "z" is covered only by its own unique grams
    assert(got(1) == ((2L, 7L, 6L, "z")))
    // doc 3: grams "p q r" at positions 0 and 3 collide (and more) —
    // the canonical prefix survives, the repeat is removed
    val (_, n3, dup3, clean3) = got(2)
    assert(n3 == 8L && dup3 > 0L && clean3.startsWith("p q r"),
      s"within-doc repeat must dedup against its own prefix: ${got(2)}")
    assert(got(3) == ((4L, 2L, 0L, "u v")))
  }

  test("chunkTokens: overlap, short tail, exact-boundary and empty docs") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "a b c d e"), // window 3 step 2: [a b c][c d e][e]
      (2L, "a b c d"),   // [a b c][c d] — tail short, no phantom chunk
      (3L, "a"),         // single short chunk
      (4L, "  ")         // zero tokens -> zero chunks
    ).toDF("id", "text")
    val got = df.select(col("id"), explode(TextAnalysis.chunkTokens(col("text"), 3, 2)).as("c"))
      .select(col("id"), col("c.chunk_id"), col("c.chunk"), col("c.n_tokens"))
      .orderBy("id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L), (1L, 2L, "e", 1L),
      (2L, 0L, "a b c", 3L), (2L, 1L, "c d", 2L),
      (3L, 0L, "a", 1L)))
    // consecutive chunks share window - step tokens
    assert(got(0)._3.split(' ').last == got(1)._3.split(' ').head)
  }

  test("dsirWeights: target-like docs score above raw-like; repartition-stable; short docs drop") {
    import graft.ops.Curation
    // two disjoint idioms: target docs repeat 'alpha beta', raw docs
    // repeat 'gamma delta'; a mixed doc sits between. Replicated 300x
    // so the bigram totals dominate the +nBuckets Laplace denominator —
    // the operating regime (a corpus SMALLER than the bucket count has
    // no distribution to estimate)
    val base = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta", "en"),
      (3L, "gamma delta gamma delta gamma delta", "xx"),
      (4L, "gamma delta gamma delta", "xx"),
      (5L, "alpha beta gamma delta", "xx"),
      (6L, "solo", "en") // 1 token -> no bigrams -> dropped
    ).toDF("doc_id", "text", "lang")
    val docs = base.crossJoin(spark.range(300).toDF("r"))
      .select((col("doc_id") * 1000 + col("r")).as("doc_id"), col("text"), col("lang"))
    val w = Curation.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!w.contains(6000L), "a doc with no bigram features carries no weight row")
    // every target-idiom doc outscores every raw-idiom doc, per bigram
    // and in total; the mixed doc lands strictly between
    def per(id: Long) = w(id)._2.toDouble / w(id)._1
    assert(per(1000L) > per(5000L) && per(5000L) > per(3000L),
      s"target > mixed > raw expected, got (${per(1000L)}, ${per(5000L)}, ${per(3000L)})")
    assert(w(1000L)._2 > 0 && w(3000L)._2 < 0,
      s"target-idiom weight positive, raw-idiom negative: ${w(1000L)}, ${w(3000L)}")
    // replicas of one text all carry the identical weight
    assert(w(1000L) == w(1299L) && w(3000L) == w(3299L))
    // deterministic under repartitioning (hash features, integer grid)
    val w2 = Curation.dsirWeights(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w == w2)
  }

  test("Expectations: one-pass report counts every rule class; gate lists ALL failures") {
    import graft.ops.Expectations._
    val df = Seq(
      (1L, Option(10.0), Option("F"), "1-URGENT"),
      (2L, Option(-5.0), Option("X"), "9-BAD"),     // range + accepted + regex
      (2L, None: Option[Double], Option("O"), "2-HIGH"), // duplicate key, null price ok
      (4L, Option(999.0), None: Option[String], "3-MEDIUM") // null status: accepted must NOT fire
    ).toDF("k", "price", "status", "prio")
    val rules = Seq(
      notNull("status"),
      inRange("price", lit(0.0), lit(100.0)),
      accepted("status", Seq("F", "O")),
      matches("prio", "^[1-5]-[A-Z]+$"),
      satisfies("key_positive", col("k") > 0L))
    val rep = report(df, rules, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rep("not_null(status)") == ((1L, false)))
    assert(rep("in_range(price)") == ((2L, false)), "both -5 and 999 violate; null does not")
    assert(rep("accepted(status)") == ((1L, false)), "only X; null is not_null's business")
    assert(rep("matches(prio)") == ((1L, false)))
    assert(rep("unique(k)") == ((1L, false)), "k=2 appears twice")
    assert(rep("check(key_positive)") == ((0L, true)))
    val ex = intercept[IllegalStateException](gate(df, rules, Seq("k")))
    assert(ex.getMessage.contains("not_null(status)") && ex.getMessage.contains("unique(k)"),
      s"gate must list every failed rule: ${ex.getMessage}")
    // a clean frame passes through untouched
    assert(gate(df.filter(col("k") === 1L), rules, Seq("k")).count() == 1)

    // dead-letter split: clean keeps the original schema, dirty carries
    // the violated-rule list in declaration order
    val (clean, dirty) = split(df, rules)
    assert(clean.columns.toSeq == df.columns.toSeq)
    // the duplicate-key row is row-locally CLEAN — uniqueness is a
    // dataset property, not a row's, so split must not quarantine it
    assert(clean.select("k").as[Long].collect().toSet == Set(1L, 2L))
    val dv = dirty.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](r.fieldIndex("violated")).toList).toMap
    assert(dv(2L).head == "in_range(price)" &&
      dv(2L).contains("accepted(status)") && dv(2L).contains("matches(prio)"))
    assert(dv(4L) == List("not_null(status)", "in_range(price)"),
      "declaration order: the null-status rule precedes the 999-out-of-range rule")

    // full-match semantics: an UNANCHORED pattern must not validate a
    // mere prefix/substring (rlike alone would — round-13 advice)
    val un = Seq((1L, "1-URGENT TRAILING"), (2L, "x 2-HIGH"), (3L, "3-LOW")).toDF("k", "prio")
    val unRep = report(un, Seq(matches("prio", "[1-5]-[A-Z]+"))).collect().head
    assert(unRep.getLong(1) == 2L,
      s"only '3-LOW' matches in full; prefix/infix hits must violate: $unRep")
  }

  test("FuzzyJoin: PassJoin candidates are lossless vs brute force, incl. indels and short strings") {
    import graft.ops.FuzzyJoin
    // deterministic mutation zoo: bases plus appended / head-dropped /
    // inserted / reversed variants — exercises substitutions AND indels
    // across mixed lengths, the empty string, and the short bucket
    val bases = Seq("abababa", "aabbaab", "bbaabba", "abba", "aaaa", "ba", "b", "")
    val strs = bases.flatMap(s => Seq(
        s, s + "a", s.drop(1), s.patch(math.min(2, s.length), "b", 0), s.reverse))
      .distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    def brute(d: Int): Set[(Long, Long, Long)] =
      (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        dist = {
          val m = Array.tabulate(sa.length + 1, sb.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0 }
          for (i <- 1 to sa.length; j <- 1 to sb.length)
            m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
              m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
          m(sa.length)(sb.length)
        } if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
    for (d <- Seq(1, 2, 3)) {
      val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(d), s"maxDist=$d drift: missing=${brute(d) -- got} extra=${got -- brute(d)}")
    }
    // repartition-stable
    val g2 = FuzzyJoin.editDistanceSelfJoin(df.repartition(7), "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(g2 == brute(2))

    // two-table lookup: mutated probes vs the full zoo as reference,
    // brute parity (probe side chunks, reference side probes windows)
    val probeRows = strs.filter(_._1 % 3 == 0)
      .map { case (i, s) => (i + 1000L, s + "b") }
    val probes = probeRows.toDF("id", "s")
    def lev(sa: String, sb: String): Int = {
      val m = Array.tabulate(sa.length + 1, sb.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to sa.length; j <- 1 to sb.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
      m(sa.length)(sb.length)
    }
    val bruteX = (for {
      (ip, sp) <- probeRows; (ir, sr) <- strs
      d = lev(sp, sr) if d <= 2
    } yield (ip, ir, d.toLong)).toSet
    val gotX = FuzzyJoin.editDistanceJoin(probes, "id", "s", df, "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotX == bruteX,
      s"lookup drift: missing=${bruteX -- gotX} extra=${gotX -- bruteX}")
  }

  test("FuzzyJoin hot-chunk guard: templated corpus stays lossless with a bounded pair budget") {
    import graft.ops.FuzzyJoin
    // single-template corpus — the synthetic Customer# degeneracy: a
    // 5-char shared prefix spanning exactly chunk 0 at d=1/arity 3,
    // varying digits (reversed, so no shared leading zeros) elsewhere
    val n = 240
    val base = (0 until n).map(i =>
      (i.toLong, "TMPL#" + f"$i%05d".reverse + f"$i%05d".reverse))
    val mutated = (0 until 5).map(i =>
      (1000L + i, base(i)._2.dropRight(1) + "!")) // distance-1 partners
    val strs = base ++ mutated
    val df = strs.toDF("id", "s")
    def lev(sa: String, sb: String): Int = {
      val m = Array.tabulate(sa.length + 1, sb.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to sa.length; j <- 1 to sb.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
      m(sa.length)(sb.length)
    }
    val brute = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(brute.size == 5, s"fixture: the 5 planted pairs: ${brute.size}")
    val cap = 32L
    val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 1,
        extraChunks = 1, hotChunkCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"guard must stay lossless: missing=${brute -- got} extra=${got -- brute}")
    // the observable the guard exists for: candidate volume. Without it
    // the shared prefix chunk funnels ~n² pairs; with it every served
    // chunk key is population-capped and the budget collapses
    val prepped = df.select(col("id").as("__id"), col("s").as("__s"))
      .withColumn("__l", length(col("__s")))
    val unguarded = FuzzyJoin.candidates(prepped, prepped, 1, 1, 0L).count()
    val guarded = FuzzyJoin.candidates(prepped, prepped, 1, 1, cap).count()
    assert(unguarded >= n.toLong * n,
      s"fixture: the template must degenerate unguarded, got $unguarded")
    assert(guarded <= unguarded / 20,
      s"guard must collapse the pair budget: $guarded vs $unguarded")
    // disabled guard (cap=0) is the pre-guard behavior and stays lossless
    val off = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 1, hotChunkCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(off == brute)
  }

  test("samplePps: exact total multiplicity, heavy rows repeat, partitioning-independent") {
    import graft.ops.Curation
    val rows = (1L to 300L).map(i => (i, 10L + (i % 7) * 13L)) ++
      Seq((1000L, 5000L)) // heavier than the step: must repeat
    val df = rows.toDF("id", "w")
    val step = 997L
    val got = Curation.samplePps(df, "id", "w", step).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalW = rows.map(_._2).sum
    assert(got.map(_._3).sum == totalW / step,
      s"sum of copies must be floor(totalW/step) exactly: ${got.map(_._3).sum} vs ${totalW / step}")
    assert(got.find(_._1 == 1000L).exists(_._3 >= 5000L / step),
      s"a heavy row covers >= w/step selection points: ${got.find(_._1 == 1000L)}")
    // the selection depends only on the global hash order, never the
    // input partitioning
    val re = Curation.samplePps(df.repartition(7, col("w")), "id", "w", step)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet == got.toSet, "PPS selection must be partitioning-independent")
    // zero/null weights carry no mass
    val withZero = df.unionByName(Seq((2000L, 0L)).toDF("id", "w"))
    assert(!Curation.samplePps(withZero, "id", "w", step).collect()
      .exists(_.getLong(0) == 2000L))
    // fractional weights would silently truncate on the integer axis
    // (a (0,1] quality score loses ALL its mass) — demand pre-scaling
    val frac = intercept[IllegalArgumentException] {
      Curation.samplePps(Seq((1L, 0.9)).toDF("id", "w"), "id", "w", step)
    }
    assert(frac.getMessage.contains("integral"), frac.getMessage)
  }

  test("shuffleOrder: a permutation with balanced round-robin shards, partitioning-independent") {
    import graft.ops.Curation
    val df = (1L to 333L).toDF("id")
    val got = Curation.shuffleOrder(df, "id", nShards = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sorted.toSeq == (0L until 333L).toSeq,
      "positions must be a contiguous permutation")
    assert(got.forall { case (_, pos, sh) => sh == pos % 16 })
    val bySh = got.groupBy(_._3).view.mapValues(_.length)
    assert(bySh.values.max - bySh.values.min <= 1,
      s"round-robin striping must balance shards: $bySh")
    val re = Curation.shuffleOrder(df.repartition(5), "id", nShards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet == got.toSet, "the shuffle order must be partitioning-independent")
  }

  test("cli sample: PPS and shuffle-order modes round-trip; ambiguous flags rejected") {
    import graft.ops.Curation
    val root = java.nio.file.Files.createTempDirectory("clisample").toString
    (1L to 100L).map(i => (i, 10L + i % 5)).toDF("doc_id", "w")
      .write.parquet(root + "/in")
    graft.cli.Main.run(spark, "sample", Array("--in", root + "/in",
      "--id", "doc_id", "--weight-col", "w", "--step", "97", "--out", root + "/pps"))
    val got = spark.read.parquet(root + "/pps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Curation.samplePps(spark.read.parquet(root + "/in"), "doc_id", "w", 97L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
    graft.cli.Main.run(spark, "sample", Array("--in", root + "/in",
      "--id", "doc_id", "--shuffle-shards", "4", "--out", root + "/ord"))
    assert(spark.read.parquet(root + "/ord").collect()
      .map(_.getLong(1)).sorted.toSeq == (0L until 100L).toSeq)
    val both = intercept[RuntimeException] {
      graft.cli.Main.run(spark, "sample", Array("--in", root + "/in",
        "--id", "doc_id", "--weight-col", "w", "--step", "97", "--shuffle-shards", "4"))
    }
    assert(both.getMessage.contains("EXACTLY ONE"), both.getMessage)
  }

  test("dsirWeights incremental tier: merged segments == one-shot; signed changes retract exactly") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta", "en"),
      (3L, "gamma delta gamma delta gamma delta", "xx"),
      (4L, "gamma delta gamma delta", "xx"),
      (5L, "alpha beta gamma delta", "xx")
    ).toDF("doc_id", "text", "lang")
    val root = java.nio.file.Files.createTempDirectory("dsirseg").toString
    val tgt = col("lang") === "en"
    Curation.landDsirDrop(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", tgt, root, "d0")
    Curation.landDsirDrop(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", tgt, root, "d1")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(Curation.scoreAgainstDsirCounts(docs, "doc_id", "text",
        Curation.serveDsirCounts(spark, root))) ==
      key(Curation.dsirWeights(docs, "doc_id", "text", tgt)),
      "merged drop segments must reproduce the one-shot model exactly")
    // doc 3 is re-written: the signed change segment cancels its old
    // features, and the merged model equals a from-scratch retrain
    val newText = "alpha beta alpha beta epsilon"
    val changes = Seq(
      (3L, "gamma delta gamma delta gamma delta", "xx", "update_pre"),
      (3L, newText, "xx", "update_post")
    ).toDF("doc_id", "text", "lang", "change_type")
    Curation.landDsirChangesDrop(changes, "doc_id", "text", tgt, root, "d2")
    val updated = docs.filter(col("doc_id") =!= 3L)
      .unionByName(Seq((3L, newText, "xx")).toDF("doc_id", "text", "lang"))
    assert(key(Curation.scoreAgainstDsirCounts(updated, "doc_id", "text",
        Curation.serveDsirCounts(spark, root))) ==
      key(Curation.dsirWeights(updated, "doc_id", "text", tgt)),
      "retraction must make the merged model equal a from-scratch retrain")
  }

  test("dsirScore OOV: unseen buckets score the smoothed zero-count delta, not silence") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en"),
      (2L, "gamma delta gamma delta", "xx")
    ).toDF("doc_id", "text", "lang")
    val root = java.nio.file.Files.createTempDirectory("dsiroov").toString
    Curation.landDsirDrop(docs, "doc_id", "text", col("lang") === "en", root, "d0")
    val counts = Curation.serveDsirCounts(spark, root).localCheckpoint(true)
    val t = counts.agg(sum(col("__cr")), sum(col("__ct"))).collect().head
    val (tr, tt) = (t.getLong(0), t.getLong(1))
    val zd = 1000000L / (tt + 4096L) - 1000000L / (tr + 4096L)
    // a doc of entirely NOVEL bigrams scored against the older model must
    // NOT vanish: every bigram counts, each scoring the Laplace
    // zero-count delta derived from the model totals
    val novel = Seq((9L, "zeta eta theta iota")).toDF("doc_id", "text")
    val got = Curation.scoreAgainstDsirCounts(novel, "doc_id", "text", counts).collect()
    assert(got.length == 1, "an all-unseen doc must not vanish from the output")
    assert(got.head.getLong(1) == 3L, s"all 3 bigrams must count: ${got.head}")
    assert(got.head.getLong(2) == 3L * zd,
      s"unseen buckets must score the smoothed zero delta: ${got.head.getLong(2)} vs ${3L * zd}")
    // a MIXED doc keeps both: seen buckets via the model, unseen via zd
    val mixed = Seq((10L, "alpha beta omega")).toDF("doc_id", "text")
    val gm = Curation.scoreAgainstDsirCounts(mixed, "doc_id", "text", counts).collect().head
    assert(gm.getLong(1) == 2L, s"both bigrams must count: $gm")
    val seenDelta = 1000000L * 4L / (tt + 4096L) - 1000000L * 4L / (tr + 4096L)
    assert(gm.getLong(2) == seenDelta + zd,
      s"mixed doc = model delta + zero delta: ${gm.getLong(2)} vs ${seenDelta + zd}")
  }

  test("mmrTopK defers the near-duplicate of the top hit; plain top-k does not; deterministic") {
    import graft.ops.Similarity
    def v(pairs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0.0f); pairs.foreach { case (i, x) => a(i) = x }; a.toSeq
    }
    val queries = Seq((100L, v(0 -> 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(0 -> 0.9f, 1 -> 0.1f)),  // top hit
      (2L, v(0 -> 0.9f, 1 -> 0.1f)),  // its exact duplicate
      (3L, v(0 -> 0.6f, 2 -> 0.8f))   // less relevant but diverse
    ).toDF("vec_id", "embedding")
    // plain relevance ranking puts the duplicate second...
    val brute = Similarity.bruteTopKExact(corpus, queries, "vec_id", "embedding", 2)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("cid")).toSeq
    assert(brute == Seq(1L, 2L))
    // ...MMR (λ=0.3) defers it behind the diverse candidate
    val mmr = Similarity.mmrTopK(corpus, queries, "vec_id", "embedding",
        poolK = 3, k = 3, lambdaPct = 30)
      .orderBy(col("rank")).collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("rank")))
    assert(mmr.toSeq == Seq((1L, 1L), (3L, 2L), (2L, 3L)),
      s"expected the duplicate deferred to rank 3, got ${mmr.toSeq}")
    val mmr2 = Similarity.mmrTopK(corpus.repartition(3), queries, "vec_id", "embedding",
        poolK = 3, k = 3, lambdaPct = 30)
      .orderBy(col("rank")).collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("rank")))
    assert(mmr.toSeq == mmr2.toSeq)
  }

  test("knnPageRank: hub node outranks leaves; isolated keeps the teleport floor; deterministic") {
    import graft.ops.Similarity
    // vectors engineered so one direction (the 'hub') is every other
    // vector's nearest neighbor within the bucket: v0 is the centroid
    // direction, v1..v3 are slight perturbations of it, v4 is isolated
    // (opposite direction -> its own bucket, no candidates)
    def vec(main: Int, eps: Int, sign: Float): Seq[Float] = {
      val v = Array.fill(64)(0.0f)
      v(main) = sign
      if (eps >= 0) v(eps) = 0.3f
      v.toSeq
    }
    val emb = Seq(
      (0L, vec(0, -1, 1.0f)),
      (1L, vec(0, 10, 1.0f)),
      (2L, vec(0, 11, 1.0f)),
      (3L, vec(0, 12, 1.0f)),
      (4L, vec(5, -1, -1.0f))
    ).toDF("vec_id", "embedding")
    // k=1: v1..v3 each point at the hub v0 (cos ~0.958 beats the
    // leaf-leaf ~0.917), the hub points at v1 (tie on cosine, lower id)
    val pr = Similarity.knnPageRank(emb, "vec_id", "embedding", 1, 4, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 5, "every node gets a rank row")
    // the isolated node receives no inflow: exactly the teleport floor
    // after the final iteration
    assert(pr(4L) == 150000L, s"isolated node must keep the floor, got ${pr(4L)}")
    assert(pr(0L) > pr(1L) && pr(1L) > pr(2L) && pr(2L) == pr(3L),
      s"hub > its out-neighbor > unreferenced leaves expected: $pr")
    val pr2 = Similarity.knnPageRank(emb.repartition(5), "vec_id", "embedding", 1, 4, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == pr2)
  }
}
