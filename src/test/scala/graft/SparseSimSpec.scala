package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, TextAnalysis}

/** The hashed-TF bridge and the inverted-index sparse cosine join must
  * equal a naive dense computation, and bucket pruning must drop
  * exactly the over-frequent coordinates from BOTH the candidate space
  * and the norms.
  */
class SparseSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark vector merge stream spark"),
    (2L, "spark vector merge batch"),
    (3L, "totally different words here entirely"),
    (4L, "spark vector merge stream mostly"),
    (5L, "words here entirely different totally words")
  ).toDF("doc_id", "text")

  test("hashedTf: bucket is the 3-nibble md5 prefix, cnt the term frequency") {
    val rows = TextAnalysis.hashedTf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(tok).substring(0, 3), 16)
    val naive = docs.collect().flatMap { r =>
      r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getLong(0), bucket(t)))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(rows == naive)
    assert(rows((1L, bucket("spark"))) == 2L) // term frequency, not presence
  }

  test("sparseCosineTopK equals the naive dense cosine ranking") {
    val posts = TextAnalysis.hashedTf(docs, "doc_id", "text")
    val got = Similarity.sparseCosineTopK(posts, 2, maxPosting = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // naive: dense vectors over the bucket space, cosine, top-2
    val vecs = posts.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    // the inverted index surfaces only OVERLAPPING candidates (dot > 0):
    // a doc sharing no bucket with the query is never a candidate row
    val want = vecs.keys.flatMap { q =>
      val scored = vecs.keys.filter(_ != q).map { c =>
        val dot = vecs(q).map { case (b, n) => n * vecs(c).getOrElse(b, 0L) }.sum
        val cos = dot.toDouble / math.sqrt(
          vecs(q).values.map(x => x * x).sum.toDouble * vecs(c).values.map(x => x * x).sum.toDouble)
        (c, dot, cos)
      }.toSeq.filter(_._2 > 0L).sortBy { case (c, _, cos) => (-cos, c) }
      scored.zipWithIndex.take(2).map { case ((c, _, _), i) => (q, c, (i + 1).toLong) }
    }.toSet
    assert(got == want)
  }

  test("dupNgramStats: occurrence-level duplicate fraction on the exact ppm grid") {
    val d = Seq(
      (1L, "a b c d e"),          // 3-grams: abc bcd cde
      (2L, "a b c x y"),          // abc xxy...; shares abc with doc 1
      (3L, "zz qq ww"),           // unique 3-gram
      (4L, "a b c a b c a b"),    // sliding: abc bca cab abc bca cab — within-doc repeats of a shared gram all count
      (5L, "t u")                 // shorter than n -> zeros
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 1L, 333333L))) // abc shared with docs 2/4
    assert(got(2L) == ((3L, 1L, 333333L)))
    assert(got(3L) == ((1L, 0L, 0L)))
    // doc 4: 6 occurrences; 'a b c' occurs twice and is corpus-shared ->
    // BOTH occurrences count; 'b c a'/'c a b' are doc-4-only (df=1)
    assert(got(4L) == ((6L, 2L, 333333L)))
    assert(got(5L) == ((0L, 0L, 0L)))
  }

  test("cli: sparsesim, semdedup and index --kind pca round-trip") {
    val root = java.nio.file.Files.createTempDirectory("clivec").toString
    docs.write.parquet(root + "/docs")
    graft.cli.Main.run(spark, "sparsesim", Array(
      "--in", root + "/docs", "--k", "2", "--max-posting", "100",
      "--out", root + "/nn"))
    val nn = spark.read.parquet(root + "/nn")
    assert(nn.columns.toSet == Set("qid", "cid", "cos", "rank") && nn.count() > 0)
    // embeddings side: semantic dedup labels + the PCA moment index
    val emb = (0 until 40).map { i =>
      (i.toLong, (0 until 4).map(j => (math.sin(i * 0.7 + j) * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    emb.write.parquet(root + "/emb")
    graft.cli.Main.run(spark, "semdedup", Array(
      "--in", root + "/emb", "--nlist", "4", "--threshold", "0.2",
      "--out", root + "/labels"))
    val labels = spark.read.parquet(root + "/labels")
    assert(labels.count() == 40 &&
      labels.columns.toSet == Set("id", "cell", "component", "keep"))
    graft.cli.Main.run(spark, "index", Array(
      "--kind", "pca", "--lake", root + "/emb", "--path", root + "/pca",
      "--dim", "4", "--drop-id", "d0"))
    graft.cli.Main.run(spark, "index", Array(
      "--kind", "pca", "--lake", root + "/emb", "--path", root + "/pca",
      "--dim", "4", "--fit", "2"))
    assert(graft.ops.PcaIndex.serveModel(spark, root + "/pca", 4, 2) ==
      graft.ops.Pca.fit(emb, "embedding", 4, 2))
  }

  test("bucket pruning drops over-frequent coordinates from candidates AND norms") {
    // 'spark' appears in 4/5 docs; with maxPosting = 3 its bucket must
    // vanish: doc pairs related ONLY through pruned buckets disappear,
    // and surviving norms exclude the pruned coordinate
    val posts = TextAnalysis.hashedTf(docs, "doc_id", "text")
    val full = Similarity.sparseCosineTopK(posts, 4, maxPosting = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Similarity.sparseCosineTopK(posts, 4, maxPosting = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pruned.keySet.subsetOf(full), "pruning can only remove pairs")
    // docs 3 and 5 share only low-frequency words — their pair survives
    assert(pruned.contains((3L, 5L)) && pruned.contains((5L, 3L)))
    // a surviving cosine reflects pruned norms: recompute 3-5 by hand
    // over buckets with document frequency <= 3
    val vecs = posts.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val df = vecs.values.flatMap(_.keys).groupBy(identity).map { case (b, v) => b -> v.size }
    val keep = df.filter(_._2 <= 3).keySet
    def v(id: Long) = vecs(id).view.filterKeys(keep).toMap
    val dot = v(3L).map { case (b, n) => n * v(5L).getOrElse(b, 0L) }.sum
    val cos = dot.toDouble / math.sqrt(
      v(3L).values.map(x => x * x).sum.toDouble * v(5L).values.map(x => x * x).sum.toDouble)
    assert(pruned((3L, 5L)) == cos)
  }
}
