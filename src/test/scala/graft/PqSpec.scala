package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, PqModel, Similarity}

/** The IVF-PQ tier (Jégou et al. TPAMI'11 shape): trainer determinism,
  * the exactness island where ADC provably equals the true dot, the
  * byte layout, and usable recall on the fixture.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("trainer: determinism across partitioning; ragged codebooks; dsub layout") {
    val m1 = Pq.train(emb, "vec_id", "embedding", mSub = 8, ks = 16)
    val m2 = Pq.train(emb.repartition(7, col("vec_id")), "vec_id", "embedding",
      mSub = 8, ks = 16)
    assert(m1.dsub == 8 && m1.mSub == 8)
    assert(m1.codebooks.map(_.map(_.toSeq)) == m2.codebooks.map(_.map(_.toSeq)),
      "training must not depend on partitioning")
    m1.codebooks.foreach { cb =>
      assert(cb.nonEmpty && cb.length <= 16, s"codebook size ${cb.length}")
      cb.foreach(c => assert(c.length == 8))
    }
  }

  /** When every corpus subvector IS a codebook entry, encode finds an
    * exact match (L2 distance 0), reconstruction is the identity, and
    * ADC equals the full-precision double dot — so IVF-PQ under a
    * single cell must reproduce the brute exact top-k, pool ties and
    * all (the exact-decimal re-rank decides final order either way).
    */
  test("exactness island: codebook == corpus subvectors makes IVF-PQ == brute top-k") {
    val some = emb.filter(col("vec_id") < 120).localCheckpoint(true)
    val q = some.filter(col("vec_id") % 10 === 0)
    val n = some.count().toInt
    // every subvector trains into the codebook: ks >= distinct subvecs
    val model = Pq.train(some, "vec_id", "embedding", mSub = 8, ks = 256,
      trainN0 = n)
    // one IVF cell: the gate admits everything, isolating the ADC pool
    val oneCell = Seq((0L, Seq.fill(64)(0.0f)))
    val lists = Pq.pqLists(some, "vec_id", "embedding", oneCell, model)
    val got = Pq.ivfTopKPqFromLists(oneCell, model, lists, some, q,
        "vec_id", "embedding", 3, 1, margin = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.bruteTopKExact(some, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
  }

  test("codes are mSub bytes; encode is deterministic and cell-independent") {
    val model = Pq.train(emb, "vec_id", "embedding", mSub = 8, ks = 16)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
    val a = Pq.pqLists(emb, "vec_id", "embedding", cents, model)
      .select(col("cid"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).toSeq)).toMap
    val b = Pq.pqLists(emb.repartition(5, col("vec_id")), "vec_id", "embedding",
        cents, model)
      .select(col("cid"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).toSeq)).toMap
    assert(a == b, "codes must be a pure function of the vector and model")
    assert(a.values.forall(_.length == 8), "one byte per subspace")
  }

  test("ADC lookup-table cache: interleaved queries score identically to fresh scoring") {
    val model = Pq.train(emb, "vec_id", "embedding", mSub = 8, ks = 16)
    val oneCell = Seq((0L, Seq.fill(64)(0.0f)))
    val lists = Pq.pqLists(emb, "vec_id", "embedding", oneCell, model)
      .localCheckpoint(true)
    val q = emb.filter(col("vec_id") % 25 === 0)
    // every (query, candidate) ADC, computed twice: once with the whole
    // query set interleaved through the join (the cache sees qids in
    // arbitrary order), once per single query (every LUT fresh)
    def scores(qs: org.apache.spark.sql.DataFrame) =
      qs.select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
        .crossJoin(lists.select(col("cid"), col("codes")))
        .select(col("qid"), col("cid"), graft.functions.PqCodes.pq_adc(
          col("qid"), col("qv"), col("codes"), model).as("s"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val all = scores(q)
    val qids = q.select(col("vec_id")).as[Long].collect()
    qids.foreach { id =>
      val one = scores(emb.filter(col("vec_id") === id))
      one.foreach { case (k, v) =>
        assert(all(k) == v, s"cache-order drift at $k: ${all(k)} vs $v")
      }
    }
  }

  test("hier composition: single-cell hier gate reproduces the exactness island") {
    val some = emb.filter(col("vec_id") < 120).localCheckpoint(true)
    val q = some.filter(col("vec_id") % 10 === 0)
    val n = some.count().toInt
    val model = Pq.train(some, "vec_id", "embedding", mSub = 8, ks = 256,
      trainN0 = n)
    // one fine cell in one coarse cell: the hier gate admits everything,
    // so with the exact-reconstruction codebook the composed tier must
    // equal brute — pinning the hier-cells + ADC-pool plumbing
    val one = graft.ops.IvfHier(IndexedSeq(new Array[Float](64)),
      IndexedSeq(new Array[Float](64)), IndexedSeq(Array(0)), 1)
    val got = Pq.ivfTopKPqHier(some, q, "vec_id", "embedding", one, model,
        3, 1, margin = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.bruteTopKExact(some, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
  }

  test("ivfTopKPq: PQ8x256 ADC with a complete gate keeps >= 80% recall on the fixture") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val margin = math.max(32, math.ceil(emb.count() * 0.02).toInt)
    val exact = Similarity.bruteTopKExact(emb, q, "vec_id", "embedding", 5)
      .select(col("qid").cast("long").as("qid"), col("cid").cast("long").as("cid"))
    // nProbe = nList: the cell gate admits everything, so the assertion
    // pins ADC + pool quality (the gated variant's floor lives on the
    // recall board, capped by the shared seeded-cell gate like its
    // sq8/seed siblings)
    val approx = Pq.ivfTopKPq(emb, q, "vec_id", "embedding", 5, 8, 8, margin)
      .select(col("qid"), col("cid"), lit(1).as("h"))
    val r = exact.join(approx, Seq("qid", "cid"), "left_outer")
      .agg(count(lit(1)), sum(coalesce(col("h"), lit(0)))).collect().head
    val recall = 100.0 * r.getLong(1) / r.getLong(0)
    assert(recall >= 80.0, f"pq recall@5 collapsed: $recall%.1f%% of ${r.getLong(0)}")
  }
}
