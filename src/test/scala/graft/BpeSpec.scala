package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, BpeIndex}

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainer reproduces the hand-computed merge sequence (greedy, tie-broken)") {
    // corpus: aaab ×2, ab ×1.
    //  round 1: (a,a)=4 beats (a,b)=3 and (b,</w>)=3 -> merge (a,a)
    //           greedy left-to-right: 'a a a b' -> 'aa a b'
    //  round 2: (aa,a)=2, (a,b)=3, (b,</w>)=3 -> tie broken on lhs:
    //           'a' < 'b' -> merge (a,b)
    //  round 3: (aa,ab)=2, (ab,</w>)=3 -> merge (ab,</w>)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.cnt)) ==
      Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "ab", "</w>", 3L)),
      s"got $merges")
    // learned token counts: aaab -> [aa, ab</w>] = 2; ab -> [ab</w>] = 1
    val wt = Bpe.wordTokenCounts(Seq("aaab", "ab").toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wt == Map("aaab" -> 2L, "ab" -> 1L), s"got $wt")
    val dt = Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dt == Map(1L -> 5L), s"2+2+1 learned tokens: $dt")
  }

  test("merge rhs must not fire on a PREFIX of the next symbol (round-15 advisor bug)") {
    // merges (t,h) then (a,t) on 'bath': after (t,h) the sequence is
    // ' b| a| th| </w>|'. The (a,t) pattern ' a| t|' must NOT match
    // inside ' a| th|' — under the old unterminated scheme ' a t'
    // matched the prefix of ' a th' and produced [b, ath, </w>].
    val merges = Seq(Bpe.Merge(1, "t", "h", 9L), Bpe.Merge(2, "a", "t", 8L))
    val toks = Seq("bath").toDF("word")
      .select(Bpe.encodeWord(col("word"), merges)).collect().head.getSeq[String](0)
    assert(toks == Seq("b", "a", "th", "</w>"), s"got $toks")
    // ...and where rhs IS the full next symbol the merge still fires
    val toks2 = Seq("bat").toDF("word")
      .select(Bpe.encodeWord(col("word"), merges)).collect().head.getSeq[String](0)
    assert(toks2 == Seq("b", "at", "</w>"), s"got $toks2")
    // consecutive occurrences still collapse pairwise left-to-right
    // (the replace match consumes rhs's terminator, not the next
    // symbol's leading space)
    val aa = Seq(Bpe.Merge(1, "a", "a", 9L))
    val toks3 = Seq("aaaa").toDF("word")
      .select(Bpe.encodeWord(col("word"), aa)).collect().head.getSeq[String](0)
    assert(toks3 == Seq("aa", "aa", "</w>"), s"got $toks3")
  }

  test("training is deterministic under repartitioning") {
    val docs = (0 until 120).map(i =>
      (i.toLong, s"stream merge table ${"abcdefgh".substring(0, 1 + i % 7)} sort")).toDF("doc_id", "text")
    val a = Bpe.train(docs, "text", 10)
    val b = Bpe.train(docs.repartition(13, col("doc_id")), "text", 10)
    assert(a == b, s"merge list must not depend on partitioning:\n$a\n$b")
    assert(a.size == 10)
  }

  test("trainer stops early when the vocab is fully merged") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // 'ab' saturates after 2 merges: (a,b) then (ab,</w>)
    val merges = Bpe.train(docs, "text", 50)
    assert(merges.size == 2, s"got $merges")
    val wt = Bpe.wordTokenCounts(Seq("ab").toDF("word"), merges).collect()
    assert(wt.head.getLong(1) == 1L, "the saturated word is one token")
  }

  test("encodeDocs: ordered learned-token streams, counts agree with docTokenCounts") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab aaab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 3)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // aaab -> [aa, ab</w>], ab -> [ab</w>]; streams keep document order
    assert(enc(1L) == List("aa", "ab</w>", "aa", "ab</w>", "ab</w>"), s"got ${enc(1L)}")
    assert(enc(2L) == List("ab</w>", "aa", "ab</w>"), s"got ${enc(2L)}")
    val counts = Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc.map { case (k, v) => k -> v.size.toLong } == counts,
      "encode streams and count surface must agree")
  }

  test("native BpeEncode expression == replace fold on trained and adversarial merge lists") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"lower newest widest low wide new ${"abcdefgh".substring(0, 1 + i % 7)}ath"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 24)
    val words = Bpe.wordCounts(docs, "text").select(col("word"))
    def foldToks(ms: Seq[Bpe.Merge]) =
      words.select(col("word"), split(substring(
          translate(Bpe.applySeq(Bpe.seqInit(col("word")), ms), "|", ""), 2, 1 << 20), " ")
          .as("t")).collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    def exprToks(ms: Seq[Bpe.Merge]) =
      words.select(col("word"),
          graft.functions.BpeEncode.bpe_encode(col("word"),
            ms.sortBy(_.rank).map(m => (m.lhs, m.rhs))).as("t"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(exprToks(merges) == foldToks(merges), "trained list must agree")
    // adversarial: a later rule re-creating an EARLIER rule's pair (the
    // fold is already past it and must not re-apply), plus prefix traps
    val adv = Seq(Bpe.Merge(1, "ab", "cd", 9), Bpe.Merge(2, "a", "b", 8),
      Bpe.Merge(3, "c", "d", 7), Bpe.Merge(4, "t", "h", 6), Bpe.Merge(5, "a", "t", 5))
    assert(exprToks(adv) == foldToks(adv), "rank-order semantics must agree")
    // SQL registration surface
    graft.functions.GraftExtensions.registerAll(spark)
    val viaSql = Seq("bath").toDF("w")
      .selectExpr("bpe_encode(w, 't h;a t')").collect().head.getSeq[String](0)
    assert(viaSql == Seq("b", "a", "th", "</w>"), s"got $viaSql")
    val viaSqlIds = Seq("bath").toDF("w")
      .selectExpr("bpe_encode_ids(w, 't h;a t')").collect().head.getSeq[Int](0)
    assert(viaSqlIds == Seq('b' + 1, 'a' + 1, 257, 0),
      s"b=byte+1 a=byte+1 th=256+rank1 </w>=0: $viaSqlIds")
  }

  test("trainLocalOnCounts == trainOnCounts (same greedy rounds, same tie-breaks)") {
    val docs = (0 until 150).map(i =>
      (i.toLong, s"stream merge table ${"abcdefgh".substring(0, 1 + i % 7)} sort low lower"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
    val dist = Bpe.trainOnCounts(wc, 16)
    val local = Bpe.trainLocalOnCounts(
      wc.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 16)
    assert(local == dist, s"local trainer must reproduce the distributed rounds:\n$local\n$dist")
  }

  test("production vocab: 8k+ merges train locally and encode via the native expression") {
    // synthetic 3k-word vocab over a-z (the fixture corpus's ~40-word
    // vocab saturates after ~200 merges; a production-vocab test needs
    // Heaps'-law room): deterministic 14-char words, no RNG
    val words = (0 until 3000).map { i =>
      val s = new StringBuilder
      var x = i * 2654435761L & 0x7fffffffL
      (0 until 14).foreach { _ => s.append(('a' + (x % 26)).toChar); x = (x * 6364136223846793005L + 1442695040888963407L) >>> 3 }
      (s.toString, 1L + i % 7)
    }
    val merges = Bpe.trainLocalOnCounts(words, 8192)
    assert(merges.size == 8192, s"vocab must sustain 8k merges: ${merges.size}")
    // encode the whole vocab through the expression path (fold would be
    // an 8192-deep expression tree — the ceiling this lifts) and check
    // round-trip: concatenated tokens minus the marker rebuild the word
    val enc = Bpe.encodeWord(col("word"), merges)
    val got = words.map(_._1).toDF("word").select(col("word"), enc.as("t"))
      .collect()
    got.foreach { r =>
      val w = r.getString(0)
      val rebuilt = r.getSeq[String](1).mkString("").stripSuffix(Bpe.Eow)
      assert(rebuilt == w, s"token concat must rebuild '$w', got '$rebuilt'")
    }
    // ids stay consistent with the string tokens under the vocab map
    val ids = words.take(50).map(_._1).toDF("word")
      .select(col("word"), Bpe.encodeWordIds(col("word"), merges).as("i"),
        Bpe.encodeWord(col("word"), merges).as("t")).collect()
    val firstIdOf = scala.collection.mutable.HashMap.empty[String, Int]
    merges.foreach(m => if (!firstIdOf.contains(m.merged)) firstIdOf(m.merged) = 256 + m.rank)
    ids.foreach { r =>
      val want = r.getSeq[String](2).map {
        case Bpe.Eow => 0
        case s if s.length == 1 => graft.ops.ByteAlphabet.byteValue(s.charAt(0)) + 1
        case s => firstIdOf(s)
      }
      assert(r.getSeq[Int](1) == want, s"ids must follow the pinned scheme for ${r.getString(0)}")
    }
  }

  test("byte alphabet: bijection, reserved chars absent, ASCII letters self-map") {
    import graft.ops.ByteAlphabet
    val chars = ByteAlphabet.charOf.toSeq
    assert(chars.distinct.size == 256, "byte -> char must be injective")
    assert(!chars.contains(' ') && !chars.contains('|') && !chars.contains('<'),
      "reserved seq-representation chars must never be mapped chars")
    assert(chars.forall(c => c > ' ' && c != 127.toChar), "mapped chars are printable non-space")
    ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') foreach { c =>
      assert(ByteAlphabet.charOf(c.toInt) == c, s"$c must self-map")
      assert(ByteAlphabet.byteValue(c) == c.toInt)
    }
    // round trip through multibyte UTF-8, digits, punctuation, controls
    val s = "Canción nº3, 3.14€ §\t|<>"
    assert(ByteAlphabet.unmap(ByteAlphabet.map(s)) == s, "map/unmap must round-trip")
    assert(ByteAlphabet.map("€").length == 3, "3-byte UTF-8 char = 3 mapped chars")
  }

  test("byte-level trainer: digits, punctuation, case and accents are first-class") {
    import graft.ops.ByteAlphabet
    val docs = Seq(
      (1L, "Año 2024! Año 2024! price: 3.14€"),
      (2L, "Año 2024? price... 3.14€ 3.14€")).toDF("doc_id", "text")
    // pre-tokens split letters/digits/punct runs, preserve case, keep accents
    val words = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(words(ByteAlphabet.map("Año")) == 3L, s"accented word must count: $words")
    assert(words(ByteAlphabet.map("2024")) == 3L, "digit runs are pre-tokens")
    assert(words(ByteAlphabet.map("...")) == 1L && words(ByteAlphabet.map("!")) == 2L,
      "punctuation runs are pre-tokens")
    assert(words(ByteAlphabet.map("€")) == 3L, "multibyte symbols are pre-tokens")
    assert(!words.contains(ByteAlphabet.map("año")), "case is preserved (no lowercasing)")
    // trained merges operate on mapped symbols; token concat + unmap
    // rebuilds the ORIGINAL bytes of every word
    val merges = Bpe.train(docs, "text", 8)
    assert(merges.size == 8)
    val got = Bpe.wordCounts(docs, "text").select(col("word"),
        Bpe.encodeWord(col("word"), merges).as("t")).collect()
    got.foreach { r =>
      val rebuilt = r.getSeq[String](1).mkString("").stripSuffix(Bpe.Eow)
      assert(rebuilt == r.getString(0), "token concat must rebuild the mapped word")
      ByteAlphabet.unmap(rebuilt) // must not throw: all chars in-alphabet
    }
    // ids mode: an out-of-training word is pure base bytes + eow; a
    // trained word's ids mirror its token strings under the scheme
    val unseen = Seq(ByteAlphabet.map("XYZ9")).toDF("word")
      .select(Bpe.encodeWordIds(col("word"), merges)).collect().head.getSeq[Int](0)
    assert(unseen == Seq('X' + 1, 'Y' + 1, 'Z' + 1, '9' + 1, 0), s"got $unseen")
    val firstIdOf = scala.collection.mutable.HashMap.empty[String, Int]
    merges.foreach(m => if (!firstIdOf.contains(m.merged)) firstIdOf(m.merged) = 256 + m.rank)
    val both = Seq(ByteAlphabet.map("2024"), ByteAlphabet.map("Año")).toDF("word")
      .select(col("word"), Bpe.encodeWordIds(col("word"), merges).as("i"),
        Bpe.encodeWord(col("word"), merges).as("t")).collect()
    both.foreach { r =>
      val want = r.getSeq[String](2).map {
        case Bpe.Eow => 0
        case s if s.length == 1 => ByteAlphabet.byteValue(s.charAt(0)) + 1
        case s => firstIdOf(s)
      }
      assert(r.getSeq[Int](1) == want, s"ids/tokens must agree for ${r.getString(0)}")
    }
  }

  test("decode inverts encode at pre-token granularity, embedded </w> merges included") {
    import graft.ops.ByteAlphabet
    val docs = Seq(
      (1L, "Año 2024!  price:   3.14€"), // multi-space runs collapse
      (2L, "ab ab ab ab low lower")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 10)
    // at 10 merges on this corpus some merged symbol absorbs '</w>'
    assert(merges.exists(_.merged.endsWith(Bpe.Eow)),
      s"fixture must exercise eow-absorbing merges: $merges")
    val got = Bpe.encodeDocsIds(docs, "doc_id", "text", merges)
      .select(col("doc_id"), Bpe.decodeIds(col("token_ids"), merges).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Año 2024 ! price : 3.14 €".split(' ').mkString(" ")
      || got(1L) == "Año 2024 ! price : 3 . 14 €",
      s"decode must rebuild the pre-token stream: '${got(1L)}'")
    // the exact contract: decode == raw pre-tokens joined by one space
    val want = docs.select(col("doc_id"),
        array_join(regexp_extract_all(col("text"), lit(Bpe.PreTokenRegex), lit(0)), " ").as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want, s"got=$got want=$want")
    // SQL surface
    graft.functions.GraftExtensions.registerAll(spark)
    val viaSql = Seq(Seq('b' + 1, 'a' + 1, 257, 0)).toDF("ids")
      .selectExpr("bpe_decode_ids(ids, 't h;a t')").collect().head.getString(0)
    assert(viaSql == "bath", s"got '$viaSql'")
    // out-of-vocab ids fail loudly
    val ex = intercept[Throwable] {
      Seq(Seq(9999)).toDF("ids")
        .selectExpr("bpe_decode_ids(ids, 't h')").collect()
    }
    assert(ex.getMessage != null)
  }

  test("cli bpe: train -> refresh -> count round trip matches the library serve") {
    val root = java.nio.file.Files.createTempDirectory("bpe-cli").toString
    val d1 = Seq((1L, "low lower lowest"), (2L, "low low new")).toDF("doc_id", "text")
    val d2 = d1.unionByName(Seq((3L, "low newest new")).toDF("doc_id", "text"))
    d1.write.parquet(root + "/d1")
    d2.write.parquet(root + "/d2")
    graft.cli.Main.run(spark, "bpe", Array(
      "--op", "train", "--in", root + "/d1", "--path", root + "/idx",
      "--n-merges", "6"))
    graft.cli.Main.run(spark, "bpe", Array(
      "--op", "refresh", "--in", root + "/d2", "--path", root + "/idx"))
    graft.cli.Main.run(spark, "bpe", Array(
      "--op", "count", "--in", root + "/d2", "--path", root + "/idx",
      "--out", root + "/counts"))
    val got = spark.read.parquet(root + "/counts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = BpeIndex.tokenCounts(d2, "doc_id", "text", root + "/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 3)
  }

  test("persisted index: pinned merges, churn-only cache refresh, lagging-cache serve") {
    val root = java.nio.file.Files.createTempDirectory("bpe-idx").toString
    val d1 = Seq((1L, "low lower lowest"), (2L, "low low new")).toDF("doc_id", "text")
    val (nM, nW) = BpeIndex.build(d1, "text", root, nMerges = 6)
    assert(nM == 6 && nW == 4, s"merges=$nM cached=$nW") // low lower lowest new
    val mergesBefore = spark.read.parquet(root + "/merges").collect().toSet
    // drop 2 brings one NEW word; refresh must carry 4, tokenize 1, and
    // never touch the pinned merges
    val d2 = Seq((3L, "low newest new")).toDF("doc_id", "text")
    val (carried, fresh) = BpeIndex.refresh(d2, "text", root)
    assert((carried, fresh) == (4L, 1L), s"carried=$carried fresh=$fresh")
    assert(spark.read.parquet(root + "/merges").collect().toSet == mergesBefore,
      "refresh must not retrain the pinned merge list")
    // idempotent: a replay tokenizes nothing
    assert(BpeIndex.refresh(d2, "text", root) == (5L, 0L))
    // serve parity: index counts == direct fold under the same merges,
    // including a word the cache has never seen (lagging-cache path)
    val probe = Seq((9L, "low lowest unknownword new")).toDF("doc_id", "text")
    val merges = BpeIndex.readMerges(spark, root)
    val direct = Bpe.docTokenCounts(probe, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = BpeIndex.tokenCounts(probe, "doc_id", "text", root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct, s"index serve must match direct apply: $served vs $direct")
  }
}
