package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relevance

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark joins data with spark shuffles"),   // spark x2
    (2L, "spark data"),                             // spark x1, short
    (3L, "vector vector vector search"),            // rare term, repeated
    (4L, "nothing relevant here at all whatsoever"),
    (5L, "spark spark spark spark spark spark")     // tf saturation
  ).toDF("doc_id", "text")

  test("bm25: matched docs only, rare terms outweigh common, tf saturates") {
    val scores = Relevance.bm25(docs, "doc_id", "text", Seq("spark", "vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 3L, 5L), "only matching docs emitted")
    assert(scores.values.forall(_ > 0))
    // 'vector' appears in 1 of 5 docs, 'spark' in 3: doc3's single rare
    // term beats doc2's single common term
    assert(scores(3L) > scores(2L))
    // tf saturation: 6x'spark' scores more than 1x but far less than 6x
    assert(scores(5L) > scores(2L) && scores(5L) < scores(2L) * 3)
  }

  test("bm25: score is independent of partitioning (fixed-order sum)") {
    val terms = Seq("spark", "vector")
    val a = Relevance.bm25(docs.repartition(1), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Relevance.bm25(docs.repartition(7, col("doc_id")), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "bit-identical scores across physical layouts")
  }

  test("bm25: plan-width guard refuses pathological term counts") {
    val many = (0 until 65).map(i => s"t$i")
    val e = intercept[IllegalArgumentException](
      Relevance.bm25(docs, "doc_id", "text", many))
    assert(e.getMessage.contains("max 64"))
    // 64 terms is still accepted (plan builds without throwing)
    Relevance.bm25(docs, "doc_id", "text", (0 until 64).map(i => s"t$i")).schema
  }

  test("bigramLmScore: hand-computed ppm scores on a tiny corpus") {
    val tiny = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    // corpus bigrams: d1 (a,b)(b,a)(a,b); d2 (a,b); d3 (a,c)
    // c1: a->4, b->1 | c2: (a,b)->3, (b,a)->1, (a,c)->1
    // ppm: (a,b)=750000, (b,a)=1000000, (a,c)=250000
    val got = Relevance.bigramLmScore(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((3L, (750000L + 1000000L + 750000L) / 3)), // 833333: floor div
      2L -> ((1L, 750000L)),
      3L -> ((1L, 250000L))), "single-token docs emit no row")
    // fluent repetition outscores the rare-transition doc
    assert(got(1L)._2 > got(3L)._2)
  }

  test("bigramLmScore: partition-invariant (integer grid, no double sums)") {
    val docs2 = docs.unionByName(Seq((6L, "spark data joins data")).toDF("doc_id", "text"))
    val a = Relevance.bigramLmScore(docs2.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Relevance.bigramLmScore(docs2.repartition(7, col("doc_id")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("incremental LM: partitioned segments and a retracting change feed both reproduce the from-scratch model") {
    val root = java.nio.file.Files.createTempDirectory("lmseg").toString
    val v1 = Seq((1L, "a b a b"), (2L, "c d"), (3L, "a b")).toDF("doc_id", "text")
    // partitioned landing: two segments sum to the v1 model
    Relevance.landLmDrop(v1.filter(col("doc_id") <= 2), "doc_id", "text", root + "/p", "d0")
    Relevance.landLmDrop(v1.filter(col("doc_id") > 2), "doc_id", "text", root + "/p", "d1")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(counts(Relevance.serveLmCounts(spark, root + "/p")) ==
      counts(Relevance.bigramCountSegment(v1, "doc_id", "text")))

    // retraction: doc2 rewritten, doc3 deleted, doc4 inserted
    Relevance.landLmDrop(v1, "doc_id", "text", root + "/r", "base")
    val changes = Seq(
      (2L, "c d", "update_pre"), (2L, "a b", "update_post"),
      (3L, "a b", "delete"), (4L, "c d c", "insert"))
      .toDF("doc_id", "text", "change_type")
    Relevance.landLmChangesDrop(changes, "doc_id", "text", root + "/r", "cdc1")
    val finalCorpus = Seq((1L, "a b a b"), (2L, "a b"), (4L, "c d c")).toDF("doc_id", "text")
    assert(counts(Relevance.serveLmCounts(spark, root + "/r")) ==
      counts(Relevance.bigramCountSegment(finalCorpus, "doc_id", "text")),
      "retracted model must equal a retrain over the final corpus")
    // and scoring against the maintained model == the one-shot path
    val a = Relevance.scoreAgainstCounts(finalCorpus, "doc_id", "text",
        Relevance.serveLmCounts(spark, root + "/r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Relevance.bigramLmScore(finalCorpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("cli lm: land + changes + score runs the whole tier end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("lmcli").toString
    val v1 = Seq(("1", "a b a b"), ("2", "c d"), ("3", "a b")).toDF("_id", "text")
    v1.write.parquet(root + "/in1")
    Seq(("2", "c d", "update_pre"), ("2", "a b", "update_post"),
      ("3", "a b", "delete"), ("4", "c d c", "insert"))
      .toDF("_id", "text", "change_type").write.parquet(root + "/cdc")
    val finalCorpus = Seq(("1", "a b a b"), ("2", "a b"), ("4", "c d c")).toDF("_id", "text")
    finalCorpus.write.parquet(root + "/corpus")
    graft.cli.Main.run(spark, "lm", Array("--path", root + "/m", "--op", "land",
      "--in", root + "/in1", "--drop-id", "base"))
    graft.cli.Main.run(spark, "lm", Array("--path", root + "/m", "--op", "changes",
      "--in", root + "/cdc", "--drop-id", "cdc1"))
    graft.cli.Main.run(spark, "lm", Array("--path", root + "/m", "--op", "score",
      "--in", root + "/corpus", "--out", root + "/scored"))
    val got = spark.read.parquet(root + "/scored")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = Relevance.bigramLmScore(finalCorpus, "_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("bm25Fold: bit-identical to the pivot, constant plan width at any term count") {
    val terms = Seq("spark", "vector", "the")
    val pivot = Relevance.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fold = Relevance.bm25Fold(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pivot == fold, "same reduction order -> same doubles bit-for-bit")
    // beyond the pivot's width guard: 200 terms plan and run fine
    val many = (0 until 200).map(i => s"t$i") :+ "spark"
    val wide = Relevance.bm25Fold(docs, "doc_id", "text", many)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // only 'spark' matches, so scores equal the single-term query's
    val single = Relevance.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wide == single)
  }
}
