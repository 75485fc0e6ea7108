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
