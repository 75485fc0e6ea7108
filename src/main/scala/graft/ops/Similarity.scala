package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    (small) query set against the corpus — one broadcast-nested-loop
  *    with codegen'd dot products, no shuffle of the corpus;
  *  - IVF-style bucketed search (the 100 TB path): assign every vector to
  *    a coarse bucket via deterministic hyperplane signs (an LSH variant
  *    of IVF cell assignment), then only join query/candidate pairs that
  *    share a bucket — turning the O(n*q) scan into a bucket-partitioned
  *    equi-join that shuffles each side once on the bucket key.
  *
  * All arithmetic: float -> double products (IEEE-deterministic per
  * element), accumulated in DECIMAL(38,15) so the sum is order-independent
  * and exactly reproducible, then one double division at the end.
  */
object Similarity {

  /** Exact, order-independent dot product of two float-array columns. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(38,15)")),
      lit(BigDecimal(0)).cast("decimal(38,15)"),
      (acc, p) => acc + p).cast("double")

  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  def cosine(a: Column, b: Column): Column = dotExact(a, b) / (normExact(a) * normExact(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ranked by (cosine desc, id asc).
    * `queries` is expected to be small — it is broadcast.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic hyperplane-sign bucket: bit i = sign of the dot product
    * with pseudo-random hyperplane i, where hyperplane component j is
    * derived from md5 — reproducible everywhere, no RNG state.
    * With `nBits` planes this is signed random projection LSH; buckets act
    * as IVF cells.
    */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { p =>
      // component j of plane p in {-1,+1}: parity of md5("p|j") first hex char
      val prods = (0 until dim).map { j =>
        val h = java.lang.Integer.parseInt(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$p|$j").substring(0, 1), 16)
        val sgn = if ((h & 1) == 1) 1.0 else -1.0
        element_at(vec, j + 1).cast("double") * lit(sgn)
      }
      val dot = prods.reduce(_ + _)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Bucketed ANN: candidates restricted to the query's bucket. Recall is
    * tunable via nBits (fewer bits = bigger cells = higher recall); at
    * scale, re-run with the query's neighboring buckets (multi-probe) for
    * the recall/latency trade.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                   k: Int, nBits: Int, dim: Int): DataFrame = {
    val bc = hyperplaneBucket(col(vecCol), nBits, dim)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"), bc.as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"), bc.as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a<b) pairs in the same
    * hyperplane bucket with cosine above `threshold`. The bucket join is
    * the scale lever — only same-cell pairs are ever scored.
    */
  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nBits: Int, dim: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), nBits, dim).as("bucket"))
    c.as("x").join(c.as("y"), col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), cosine(col("x.v"), col("y.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
