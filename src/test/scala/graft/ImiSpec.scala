package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfImi, Pq, Similarity}

/** The product-coarse (IMI) tier: exact assignment/probe vs the brute
  * product ranking, determinism, the PQ composition's exactness island,
  * and the side-factorized residual's parity with a materialized
  * per-cell reference.
  */
class ImiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("assignment and probe are exact vs brute ranking over all product cells") {
    val imi = IvfImi.train(emb, "vec_id", "embedding", nList = 25)
    assert(imi.k1 == 5 && imi.k2 == 5 && imi.nCells == 25)
    val d1 = imi.dSplit
    val got = emb.limit(64).select(col("vec_id"),
        Similarity.imiProbeCells(col("embedding"), imi, 4).as("cells"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      // brute: score every (i, j) pair with sequential double folds
      def dot(a: Array[Float], off: Int): Double = {
        var s = 0.0; var x = 0
        while (x < a.length && off + x < v.length) { s += v(off + x).toDouble * a(x).toDouble; x += 1 }
        s
      }
      val scored = for (i <- 0 until imi.k1; j <- 0 until imi.k2)
        yield (i.toLong * imi.k2 + j, dot(imi.sub1(i), 0) + dot(imi.sub2(j), d1))
      val want = scored.sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
      assert(r.getSeq[Long](1) == want,
        s"probe must equal the brute product top-4 for vec ${r.getLong(0)}")
    }
    // top-1 == element 1 of the probe (the assignment surface)
    val a = emb.select(Similarity.imiCell(col("embedding"), imi).as("c"),
      element_at(Similarity.imiProbeCells(col("embedding"), imi, 3), 1).as("p"))
    assert(a.filter(col("c") =!= col("p")).count() == 0)
  }

  test("assignment is deterministic across partitioning; train is bounded-driver") {
    val imi = IvfImi.train(emb, "vec_id", "embedding", nList = 64)
    val x = emb.select(col("vec_id"), Similarity.imiCell(col("embedding"), imi).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val y = emb.repartition(7, col("vec_id"))
      .select(col("vec_id"), Similarity.imiCell(col("embedding"), imi).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(x == y, "cell assignment must not depend on partitioning")
    // the train collects are k-row, not nList-row (k = ceil(sqrt(nList)))
    assert(imi.k1 == 8 && imi.k2 == 8)
  }

  test("exactness island: one product cell + full codebook makes IMI-PQ == brute") {
    val some = emb.filter(col("vec_id") < 120).localCheckpoint(true)
    val q = some.filter(col("vec_id") % 10 === 0)
    val n = some.count().toInt
    val model = Pq.train(some, "vec_id", "embedding", mSub = 8, ks = 256, trainN0 = n)
    val one = IvfImi(IndexedSeq(new Array[Float](32)), IndexedSeq(new Array[Float](32)))
    val got = Pq.ivfTopKPqImi(some, q, "vec_id", "embedding", one, model,
        3, 1, margin = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.bruteTopKExact(some, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
  }

  test("side-factorized residual == materialized per-cell reference (codes and ADC)") {
    val imi = IvfImi.train(emb, "vec_id", "embedding", nList = 16)
    val model = Pq.trainResidualImi(emb, "vec_id", "embedding", imi, mSub = 8, ks = 16)
    assert(model.residual && model.mu.isEmpty,
      "IMI residual models derive mu — no per-cell map materialized")
    // materialize the tiny product's mu map explicitly and compare the
    // flat-residual kernels against the factorized ones
    val muMap = (0L until imi.nCells).map(c => c -> imi.mu(c)).toMap
    val modelFlat = model.copy(mu = muMap)
    val withCell = emb.select(col("vec_id"), col("embedding"),
      Similarity.imiCell(col("embedding"), imi).as("cell")).localCheckpoint(true)
    val facto = withCell.select(col("vec_id"),
        graft.functions.PqCodes.pq_codes_imi_res(col("embedding"), col("cell"), model, imi).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toSeq).toMap
    val mater = withCell.select(col("vec_id"),
        graft.functions.PqCodes.pq_codes_res(col("embedding"), col("cell"), modelFlat, muMap).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toSeq).toMap
    assert(facto == mater, "factorized residual codes must equal the materialized reference's")
    // ADC: q·mu via side LUTs == q·mu via the per-cell map
    val q = withCell.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cand = withCell.select(col("vec_id").as("cid"), col("cell"),
      graft.functions.PqCodes.pq_codes_imi_res(col("embedding"), col("cell"), model, imi).as("codes"))
    val joined = q.crossJoin(cand).localCheckpoint(true)
    val sF = joined.select(col("qid"), col("cid"),
        graft.functions.PqCodes.pq_adc_imi_res(col("qid"), col("qv"), col("codes"), col("cell"), model, imi).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sM = joined.select(col("qid"), col("cid"),
        graft.functions.PqCodes.pq_adc_res(col("qid"), col("qv"), col("codes"), col("cell"), modelFlat, muMap).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    sF.foreach { case (k, v) =>
      assert(math.abs(v - sM(k)) < 1e-9, s"ADC drift at $k: $v vs ${sM(k)}")
    }
  }

  test("ivfTopKImi and ivfTopKPqImi serve k ranks per query on the fixture") {
    val imi = IvfImi.train(emb, "vec_id", "embedding", nList = 64)
    val q = emb.filter(col("vec_id") % 50 === 0)
    val a = Similarity.ivfTopKImi(emb, q, "vec_id", "embedding", imi, 5, 8)
      .groupBy(col("qid")).count().collect()
    assert(a.nonEmpty && a.forall(_.getLong(1) == 5L))
    val model = Pq.trainResidualImi(emb, "vec_id", "embedding", imi, mSub = 8, ks = 32)
    val b = Pq.ivfTopKPqImi(emb, q, "vec_id", "embedding", imi, model, 5, 8,
        margin = 64)
      .groupBy(col("qid")).count().collect()
    assert(b.nonEmpty && b.forall(_.getLong(1) == 5L))
  }
}
