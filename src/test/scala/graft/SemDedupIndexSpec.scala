package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SemDedupIndex, Similarity}

/** The persisted semantic-label index must converge to the from-scratch
  * [[Similarity.semanticDedup]] components under every mutation class —
  * join, merge, drift-across-clusters, deletion/split, re-delivery —
  * while maintenance follows the churn.
  */
class SemDedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tau = BigDecimal("0.6")

  // planar unit vectors: a(t) in the (x,y) plane, c(t) in the (z,w)
  // plane — dots inside a plane are cos(dt), across planes 0
  private def a(t: Double): Seq[Float] =
    Seq(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f)
  private def c(t: Double): Seq[Float] =
    Seq(0f, 0f, math.cos(t).toFloat, math.sin(t).toFloat)

  private def corpus(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def labelsOf(path: String): Map[Long, Long] =
    SemDedupIndex.serve(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def scratch(docs: org.apache.spark.sql.DataFrame,
                      cents: Seq[(Long, Seq[Float])]): Map[Long, Long] =
    Similarity.semanticDedup(docs, "vec_id", "embedding", cents, tau)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("semantic label index: join, merge, drift, split and deletion converge at churn cost") {
    val tmp = Files.createTempDirectory("graft_semidx").toString
    val idx = tmp + "/sem"
    // v1: cells split the (x,y) plane (centroid = doc 1) from the (z,w)
    // plane (centroid = doc 2). Components: {1,4} {2,3} {7,8} {10}
    val v1 = corpus(
      1L -> a(0.0), 2L -> c(0.0), 3L -> c(0.1), 4L -> a(0.05),
      7L -> a(1.0), 8L -> a(1.05), 10L -> c(1.2))
    SemDedupIndex.build(v1, "vec_id", "embedding", idx, nList = 2, threshold = tau)
    val cents = Similarity.ivfCentroids(v1, "vec_id", "embedding", 2)
    assert(labelsOf(idx) == scratch(v1, cents))
    assert(labelsOf(idx)(4L) == 1L && labelsOf(idx)(8L) == 7L && labelsOf(idx)(10L) == 10L)

    // drop 2 — every mutation class at once:
    //  - 6 arrives near a(0)      -> JOINS {1,4}
    //  - 9 arrives at a(0.5)      -> BRIDGES {1,4,6} and {7,8} (merge)
    //  - 3 drifts to c(1.15)      -> LEAVES {2,..}, JOINS {10}
    //  - 1,2,4,7,8,10 re-deliver unchanged (must carry where intact)
    val v2 = corpus(
      1L -> a(0.0), 2L -> c(0.0), 3L -> c(1.15), 4L -> a(0.05),
      6L -> a(0.02), 7L -> a(1.0), 8L -> a(1.05), 9L -> a(0.5), 10L -> c(1.2))
    val (carried2, relabeled2) = SemDedupIndex.refresh(v2, "vec_id", "embedding", idx)
    val got2 = labelsOf(idx)
    assert(got2 == scratch(v2, cents), s"incremental labels diverged: $got2")
    assert(got2(9L) == 1L && got2(8L) == 1L, "bridge must merge the planes' clusters")
    assert(got2(3L) == 3L && got2(10L) == 3L, "drifted doc must re-home")
    assert(carried2 + relabeled2 == got2.size.toLong)
    // doc 2 lost a member but stays served; the untouched {2} carried? —
    // 2's component lost doc 3, so it recomputes (split candidate); the
    // genuinely intact merge-side docs are doc-granularity too (they
    // gained edges) — at minimum SOMETHING was churn-scoped:
    assert(relabeled2 < got2.size.toLong || carried2 > 0L)

    // drop 3: pure re-delivery — everything carries, nothing relabels
    val (c3, r3) = SemDedupIndex.refresh(v2, "vec_id", "embedding", idx)
    assert(r3 == 0L && c3 == got2.size.toLong,
      s"re-delivery must be a no-op: carried=$c3 relabeled=$r3")
    assert(labelsOf(idx) == got2)

    // drop 4: deletions — 9 vanishes (the merged cluster SPLITS back),
    // 3 vanishes ({10} is alone again)
    val v4 = corpus(
      1L -> a(0.0), 2L -> c(0.0), 4L -> a(0.05), 6L -> a(0.02),
      7L -> a(1.0), 8L -> a(1.05), 10L -> c(1.2))
    val (_, _) = SemDedupIndex.refresh(v4, "vec_id", "embedding", idx)
    val got4 = labelsOf(idx)
    assert(got4 == scratch(v4, cents), s"post-deletion labels diverged: $got4")
    assert(got4(8L) == 7L && got4(6L) == 1L, "deletion must split the bridge merge")
    assert(got4(10L) == 10L && !got4.contains(9L) && !got4.contains(3L))
  }

  test("hier mode: build + churn refresh converge to the from-scratch recompute under the pinned two-level codebook") {
    val tmp = Files.createTempDirectory("graft_semhier").toString
    val idx = tmp + "/sem"
    // a denser corpus on the real fixture: build on 90%, add-only drop
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v1 = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    SemDedupIndex.buildHier(v1, "vec_id", "embedding", idx,
      nList = 16, m = 2, threshold = BigDecimal("0.35"))
    // reconstruct the PINNED hier codebook from the landed tables and
    // assert the index labels equal the from-scratch recompute under it
    def pinnedHier(): graft.ops.IvfHier = {
      val fine = spark.read.parquet(idx + "/centroids").orderBy(col("cell_id"))
        .collect().toIndexedSeq.map(_.getSeq[Float](1).toArray)
      val cr = spark.read.parquet(idx + "/coarse").orderBy(col("coarse_id"))
        .collect().toIndexedSeq
      val m = spark.read.parquet(idx + "/meta").collect().head.getAs[Int]("m")
      graft.ops.IvfHier(fine, cr.map(_.getSeq[Float](1).toArray),
        cr.map(_.getSeq[Int](2).toArray), m)
    }
    def scratchHier(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.semanticDedupHier(docs, "vec_id", "embedding", pinnedHier(),
          BigDecimal("0.35"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(labelsOf(idx) == scratchHier(v1), "hier build must label like the recompute")
    val hierBefore = pinnedHier()
    val (carried, relabeled) = SemDedupIndex.refresh(emb, "vec_id", "embedding", idx)
    val n = emb.count()
    assert(carried + relabeled == n, s"carried=$carried relabeled=$relabeled n=$n")
    // add-only drop: doc-granularity recompute is EXACTLY the churn
    assert(relabeled * 10 == n, s"add-only churn: relabeled=$relabeled of $n")
    // the codebook is PINNED: refresh must not retrain it
    val hierAfter = pinnedHier()
    assert(hierBefore.fine.map(_.toSeq) == hierAfter.fine.map(_.toSeq) &&
      hierBefore.coarse.map(_.toSeq) == hierAfter.coarse.map(_.toSeq))
    assert(labelsOf(idx) == scratchHier(emb),
      "hier refresh must converge to the from-scratch labels")
  }

  test("cli semdedup --index-path build/refresh round-trip") {
    val tmp = Files.createTempDirectory("graft_semcli").toString
    val v1 = corpus(1L -> a(0.0), 2L -> c(0.0), 4L -> a(0.05), 7L -> a(1.0))
    v1.write.parquet(tmp + "/v1")
    corpus(1L -> a(0.0), 2L -> c(0.0), 4L -> a(0.05), 7L -> a(1.0), 9L -> a(0.5))
      .write.parquet(tmp + "/v2")
    graft.cli.Main.run(spark, "semdedup", Array(
      "--in", tmp + "/v1", "--index-path", tmp + "/idx",
      "--nlist", "2", "--threshold", tau.toString))
    graft.cli.Main.run(spark, "semdedup", Array(
      "--in", tmp + "/v2", "--index-path", tmp + "/idx", "--refresh"))
    val cents = Similarity.ivfCentroids(v1, "vec_id", "embedding", 2)
    assert(labelsOf(tmp + "/idx") ==
      scratch(spark.read.parquet(tmp + "/v2"), cents))
  }
}
