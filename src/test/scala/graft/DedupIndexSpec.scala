package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, DedupIndex}

/** The persisted band index's incremental contract: refresh cost follows
  * CHURN, not corpus size — unchanged documents' band rows are carried
  * byte-verbatim (proven by a sentinel that only survives if the rows
  * are never recomputed), and the served candidate set stays identical
  * to the from-scratch recompute.
  */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "a completely different document about spark engines",
    4L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    5L -> "")                                            // shingle-less

  test("refresh signs only churn; unchanged docs' rows survive verbatim") {
    val tmp = Files.createTempDirectory("graft_dedupidx").toString
    val idx = tmp + "/idx"
    val n = DedupIndex.build(corpus(base: _*), "doc_id", "text", idx)
    assert(n == 5, "every doc (incl. the shingle-less one) is tracked")

    // tamper: prefix every band key with a sentinel the signer cannot
    // produce — any recompute of an unchanged doc would erase it
    val tampered = spark.read.parquet(idx)
      .withColumn("key", concat(lit("SENTINEL#"), col("key")))
    tampered.write.mode("overwrite").parquet(tmp + "/t")
    spark.read.parquet(tmp + "/t").write.mode("overwrite").parquet(idx)

    // no-op refresh: zero signing
    val (kept0, signed0) = DedupIndex.refresh(corpus(base: _*), "doc_id", "text", idx)
    assert(kept0 == 5 && signed0 == 0)
    val keys0 = spark.read.parquet(idx).filter(col("band") >= 0).select("key")
      .collect().map(_.getString(0))
    assert(keys0.nonEmpty && keys0.forall(_.startsWith("SENTINEL#")),
      "an unchanged doc's band rows must never be recomputed")

    // churn: doc 2 retext'd, doc 6 new, doc 3 vanished
    val drop2 = corpus((base.filterNot(d => d._1 == 2 || d._1 == 3) ++ Seq(
      2L -> "the quick brown fox naps under the lazy dog",
      6L -> "the quick brown fox jumps over the lazy dogs")): _*)
    val (kept1, signed1) = DedupIndex.refresh(drop2, "doc_id", "text", idx)
    assert(kept1 == 3, s"docs 1,4,5 carried; got $kept1")
    assert(signed1 == 2, s"exactly the churn (2, 6) signed; got $signed1")
    val after = spark.read.parquet(idx)
    assert(after.filter(col("doc") === 3L).count() == 0, "vanished doc dropped")
    val byDoc = after.filter(col("band") >= 0).select("doc", "key")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1))).toMap
    assert(Seq(1L, 4L).forall(d => byDoc(d).forall(_.startsWith("SENTINEL#"))),
      "unchanged docs still verbatim after a churn refresh")
    assert(Seq(2L, 6L).forall(d => byDoc(d).forall(k => !k.startsWith("SENTINEL#"))),
      "churned docs freshly signed")
  }

  test("upsert touches only the batch's docs; streaming feed converges to the batch build") {
    val tmp = Files.createTempDirectory("graft_dedupidx3").toString
    val idx = tmp + "/idx"
    DedupIndex.build(corpus(base: _*), "doc_id", "text", idx)
    // sentinel every row, then upsert a batch of {1 re-delivered
    // unchanged, 2 changed, 6 new}: only 2 and 6 may lose the sentinel
    val tampered = spark.read.parquet(idx)
      .withColumn("key", concat(lit("SENTINEL#"), col("key")))
    tampered.write.mode("overwrite").parquet(tmp + "/t")
    spark.read.parquet(tmp + "/t").write.mode("overwrite").parquet(idx)
    val batch = corpus(
      1L -> "the quick brown fox jumps over the lazy dog", // unchanged
      2L -> "the quick brown fox naps under the lazy dog", // changed
      6L -> "the quick brown fox jumps over the lazy dogs") // new
    val (kept, signed) = DedupIndex.upsert(batch, "doc_id", "text", idx)
    assert(kept == 1 && signed == 2)
    val after = spark.read.parquet(idx).filter(col("band") >= 0).select("doc", "key")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1))).toMap
    assert(Seq(1L, 3L, 4L).forall(d => after(d).forall(_.startsWith("SENTINEL#"))),
      "docs outside the batch AND re-delivered unchanged docs carry verbatim")
    assert(Seq(2L, 6L).forall(d => after(d).forall(k => !k.startsWith("SENTINEL#"))))
    assert(spark.read.parquet(idx).filter(col("doc") === 5L).count() == 1,
      "shingle-less doc outside the batch untouched (no drop semantics)")

    // streaming maintenance: a 3-batch document feed through the sink
    // converges to exactly the from-scratch index over the final corpus
    val tmp2 = Files.createTempDirectory("graft_dedupidx4").toString
    val feed = tmp2 + "/feed"
    val idx2 = tmp2 + "/idx"
    val all = base ++ Seq(6L -> "the quick brown fox jumps over the lazy dogs")
    all.grouped(2).zipWithIndex.foreach { case (docs, i) =>
      corpus(docs: _*).coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(corpus(base.head).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.dedupIndexSink(idx2, "doc_id", "text")(stream)
      .option("checkpointLocation", tmp2 + "/ckpt")
      .start()
    q.awaitTermination()
    val got = DedupIndex.candidatePairs(spark, idx2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx3 = tmp2 + "/scratch"
    DedupIndex.build(corpus(all: _*), "doc_id", "text", idx3)
    val want = DedupIndex.candidatePairs(spark, idx3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("candidate pairs from the index == from-scratch recompute") {
    val tmp = Files.createTempDirectory("graft_dedupidx2").toString
    val idx = tmp + "/idx"
    DedupIndex.build(corpus(base.take(3): _*), "doc_id", "text", idx)
    val drop2 = corpus((base ++ Seq(
      6L -> "the quick brown fox jumps over the lazy dogs")): _*)
    DedupIndex.refresh(drop2, "doc_id", "text", idx)
    val got = DedupIndex.candidatePairs(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.minhashCandidates(drop2, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // and a shingle-less doc never pairs
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))

    // the monthly-drop working set: pairs involving the drop == the full
    // pair set filtered to rows touching a drop doc (either side)
    val dropDocs = Seq(6L).toDF("doc_id")
    val inv = DedupIndex.candidatePairsInvolving(spark, idx, dropDocs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inv == want.filter(p => p._1 == 6L || p._2 == 6L) && inv.nonEmpty)
  }

  // ------------------------------------------------- cluster-label index

  import graft.ops.ClusterIndex

  private def labelsOf(path: String): Map[Long, Long] =
    ClusterIndex.serve(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def scratchLabels(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 4, 2)
    val comp = Dedup.connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left_outer")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cluster index: merges, splits, and re-deliveries all converge to the from-scratch labels at churn cost") {
    val tmp = Files.createTempDirectory("graft_clusteridx").toString
    val idx = tmp + "/cl"
    // v1 corpus: {1,2,4} one near-dup cluster (label 1); {3} alone;
    // {7,8} a second cluster; {10} a lone doc that will later bridge
    val v1 = corpus(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "a completely different document about spark engines",
      4L -> "the quick brown fox jumps over the lazy dog",
      7L -> "catalyst optimizer rules rewrite logical plans fast",
      8L -> "catalyst optimizer rules rewrite logical plans slow",
      10L -> "nothing like anything else in this corpus at all")
    ClusterIndex.build(v1, "doc_id", "text", idx)
    assert(labelsOf(idx) == scratchLabels(v1))

    // drop 2 — every mutation class at once:
    //  - doc 6 arrives as an exact dup of 1 (JOINS cluster 1)
    //  - doc 9 arrives bridging clusters {1,..} and {7,8} (MERGE)
    //  - doc 2 drifts to a spark-engines text (LEAVES cluster 1, JOINS 3)
    //  - docs 1,3,4,7,8,10 re-deliver unchanged (must carry)
    val v2 = corpus(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a completely different document about spark engines",
      3L -> "a completely different document about spark engines",
      4L -> "the quick brown fox jumps over the lazy dog",
      6L -> "the quick brown fox jumps over the lazy dog",
      7L -> "catalyst optimizer rules rewrite logical plans fast",
      8L -> "catalyst optimizer rules rewrite logical plans slow",
      9L -> "the quick brown fox rules rewrite logical plans fast",
      10L -> "nothing like anything else in this corpus at all")
    val (carried, relabeled) = ClusterIndex.refresh(v2, "doc_id", "text", idx)
    val got = labelsOf(idx)
    assert(got == scratchLabels(v2), s"incremental labels diverged: $got")
    // churn-proportional: doc 10 and doc 3's... — at minimum the lone
    // untouched doc 10 must carry, and SOME docs carried
    assert(carried >= 1L, s"carried=$carried")
    assert(got.contains(10L) && carried + relabeled == got.size.toLong)

    // drop 3: pure re-delivery — nothing relabels, everything carries
    val (c3, r3) = ClusterIndex.refresh(v2, "doc_id", "text", idx)
    assert(r3 == 0L && c3 == got.size.toLong,
      s"re-delivery must be a carry-only pass: carried=$c3 relabeled=$r3")
    assert(labelsOf(idx) == got)

    // drop 4: doc 9 (the bridge) VANISHES — the merged component must
    // split back; doc 6 vanishes too (member deletion)
    val v4 = v2.filter(col("doc_id") =!= 9L && col("doc_id") =!= 6L)
    val (c4, _) = ClusterIndex.refresh(v4, "doc_id", "text", idx)
    assert(labelsOf(idx) == scratchLabels(v4), "deletion split diverged")
    // the spark-engines cluster {2,3} was untouched by drop 4: carried
    assert(c4 >= 2L, s"untouched components must carry through a split: carried=$c4")
  }
}
