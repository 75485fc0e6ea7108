package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pca, Similarity}

/** The distributed moment pass must equal a naive single-machine
  * accumulation; the Jacobi eigensolver must produce a genuine
  * orthonormal eigenbasis; the whole fit must be deterministic across
  * runs; and the PCA-gated ANN must recover the exact top-k at high
  * recall on the test embeddings.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  /** Deterministic synthetic vectors with real correlation structure
    * (two dominant directions + small noise) so the eigen-spectrum is
    * non-degenerate.
    */
  private lazy val vecs: Seq[Seq[Float]] = (0 until 200).map { r =>
    val a = math.sin(r * 0.37); val b = math.cos(r * 0.11)
    (0 until dim).map { j =>
      (a * (j + 1) * 0.1 + b * (if (j % 2 == 0) 0.5 else -0.3) +
        math.sin(r * 7.3 + j * 1.9) * 0.01).toFloat
    }
  }
  private lazy val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("id", "v")

  test("moments equals naive accumulation on the same decimal grid") {
    val got = Pca.moments(df, "v", dim).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDecimal(2), r.getLong(3))).toMap
    assert(got.size == dim * (dim + 3) / 2)
    def snap(x: Double): BigDecimal =
      BigDecimal(x).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    for (i <- 0 until dim) {
      val want1 = vecs.map(v => snap(v(i).toDouble)).sum
      assert(BigDecimal(got((i, -1))._1).compare(want1) == 0, s"first moment $i")
      assert(got((i, -1))._2 == 200L)
      for (j <- i until dim) {
        val want2 = vecs.map(v => snap(v(i).toDouble * v(j).toDouble)).sum
        assert(BigDecimal(got((i, j))._1).compare(want2) == 0, s"second moment ($i,$j)")
      }
    }
  }

  test("fit: orthonormal components, descending eigenvalues, Av = lambda v") {
    val m = Pca.fit(df, "v", dim, dim)
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b })
    // orthonormality
    for (a <- 0 until dim; b <- a until dim) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"ortho ($a,$b) -> $dot")
    }
    // eigen residual against the covariance rebuilt from the raw data
    val n = vecs.length
    val mean = (0 until dim).map(j => vecs.map(_(j).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map(v => v(i).toDouble * v(j).toDouble).sum / n - mean(i) * mean(j)
    }
    m.components.zip(m.eigenvalues).foreach { case (v, lam) =>
      val av = (0 until dim).map(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(av.zip(v).map { case (x, y) => (x - lam * y) * (x - lam * y) }.sum)
      assert(resid < 1e-6, s"residual $resid for lambda=$lam")
    }
    // sign canonicalization: the largest-|coordinate| entry is positive
    m.components.foreach { v =>
      val best = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(best) > 0)
    }
  }

  test("fit is deterministic across invocations and partitionings") {
    val m1 = Pca.fit(df.repartition(7), "v", dim, 3)
    val m2 = Pca.fit(df.repartition(2), "v", dim, 3)
    assert(m1 == m2)
  }

  test("the dim budget guard refuses past MaxFitDim and names the route") {
    val e = intercept[IllegalArgumentException] {
      Pca.fit(df, "v", Pca.MaxFitDim + 1, 3)
    }
    assert(e.getMessage.contains("MaxFitDim") && e.getMessage.contains("project"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pca.fitFromMoments(df.limit(0), Pca.MaxFitDim + 1, 3)
    }
    assert(e2.getMessage.contains("Pca.fitFromMoments"), e2.getMessage)
  }

  test("pcaTopK at m = dim with a full margin equals brute-force exact top-k") {
    val q = df.filter(col("id") % 40 === 0)
    val m = Pca.fit(df, "v", dim, dim)
    val exact = Similarity.bruteTopKExact(df, q, "id", "v", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Pca.pcaTopK(df, q, "id", "v", m, 3, margin = vecs.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("pcaTopK recall on the testdata embeddings meets the pinned bound") {
    // the synthetic embeddings are isotropic (near-flat spectrum) — the
    // PCA worst case — so the operating point is m=48 with a
    // corpus-relative margin (20% of n), like the sim_pca_recall oracle
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val model = Pca.fit(emb, "embedding", 64, 48)
    val margin = math.max(25, math.ceil(emb.count() * 0.2).toInt)
    val exact = Similarity.bruteTopKExact(emb, q, "vec_id", "embedding", 5)
      .select(col("qid"), col("cid"))
    val gated = Pca.pcaTopK(emb, q, "vec_id", "embedding", model, 5, margin)
      .select(col("qid"), col("cid"))
    val total = exact.count()
    val hit = exact.join(gated, Seq("qid", "cid"), "left_semi").count()
    assert(total > 0)
    val recall = hit.toDouble / total
    assert(recall >= 0.95, s"PCA gate recall $recall < 0.95 ($hit/$total)")
  }

  test("PcaIndex: drops + retraction + compaction converge to the from-scratch fit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pcaidx_spec").toString
    val path = tmp + "/pca"
    val spark2 = spark
    import graft.ops.PcaIndex
    // three drops with one segment landed twice and retracted once
    val d0 = df.filter(col("id") % 3 === 0)
    val d1 = df.filter(col("id") % 3 === 1)
    val d2 = df.filter(col("id") % 3 === 2)
    val dup = d2.filter(col("id") % 5 === 0)
    assert(PcaIndex.landDrop(d0, "v", dim, path, "d0") == dim * (dim + 3) / 2)
    assert(PcaIndex.landDrop(d1, "v", dim, path, "d1") > 0)
    PcaIndex.compact(spark2, path)
    PcaIndex.landDrop(d2, "v", dim, path, "d2")
    PcaIndex.landDrop(dup, "v", dim, path, "d2dup")
    PcaIndex.landDrop(dup, "v", dim, path, "d2retract", sign = -1)
    // merged moments equal the one-pass moments EXACTLY (decimal sums)
    val served = PcaIndex.serveMoments(spark2, path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (BigDecimal(r.getDecimal(2)), r.getLong(3))).toMap
    val direct = Pca.moments(df, "v", dim).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (BigDecimal(r.getDecimal(2)), r.getLong(3))).toMap
    assert(served.keySet == direct.keySet)
    served.foreach { case (k, (s, n)) =>
      assert(s.compare(direct(k)._1) == 0, s"moment $k drifted")
      assert(n == direct(k)._2, s"count $k drifted")
    }
    // and the served model equals the from-scratch fit
    assert(PcaIndex.serveModel(spark2, path, dim, 3) == Pca.fit(df, "v", dim, 3))
    // landing a drop id twice is idempotent replacement
    PcaIndex.landDrop(d2, "v", dim, path, "d2")
    assert(PcaIndex.serveModel(spark2, path, dim, 3) == Pca.fit(df, "v", dim, 3))
    new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark2.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  test("streaming pcaMomentsSink: a batched feed converges to the one-shot fit") {
    val root = java.nio.file.Files.createTempDirectory("pcastream").toString
    val feed = root + "/feed"
    val path = root + "/pca"
    val chunks = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.grouped(70).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("id", "v").coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(df.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.pcaMomentsSink(path, "v", dim)(stream)
      .option("checkpointLocation", root + "/ckpt")
      .start()
    q.awaitTermination()
    assert(graft.ops.PcaIndex.serveModel(spark, path, dim, 3) == Pca.fit(df, "v", dim, 3))
    val segs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("seg=")).sorted
    assert(segs.length == chunks.length && segs.forall(_.startsWith("seg=batch")))
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("semanticDedup: keep is the component-min and respects cell boundaries") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", cents,
      BigDecimal("0.35"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == emb.count())
    val byComp = rows.groupBy(_._3)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp, s"component $comp min mismatch")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == comp)
      // a component never crosses a cell: edges only exist within cells
      assert(members.map(_._2).distinct.length == 1, s"component $comp crosses cells")
    }
    // at least one real near-dup group on this corpus, else the test is vacuous
    assert(byComp.exists(_._2.length > 1), "no multi-member component found")
  }
}
