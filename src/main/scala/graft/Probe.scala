package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  /** Phase timing for corpus_curate / dedup_clusters (the bench's most
    * expensive pair) — run twice to split one-time codegen/JIT from
    * steady-state.
    */
  def curate(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warm docs")(docs.count())
    (1 to 2).foreach { round =>
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 4, 2)
      time(s"r$round pairs")(println(s"[probe] pairs n=${pairs.count()}"))
      // real implementation with its instrumentation hook — a local clone
      // would silently drift from production behavior
      val comp = time(s"r$round components")(Dedup.connectedComponents(pairs,
        phase = (label, sec) => println(f"[probe]   cc $label: $sec%.2f s")))
      val curated = docs.select(col("doc_id"), col("text"), col("lang"))
        .join(comp, col("doc_id") === col("node"), "left_outer")
        .select(col("doc_id"), col("text"), col("lang"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("keep_dup", col("doc_id") === col("component"))
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      // collect, not count: EliminateSorts strips an orderBy below an
      // aggregate, and the bench query pays the sort when materializing
      time(s"r$round curate-tail")(println(
        s"[probe] curated n=${curated.orderBy(col("doc_id")).collect().length}"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }

  /** Numeric recall@5 per ANN tier vs the exact brute ranking — the
    * measurement behind sim_recall_board's pinned floors (the board
    * serves oracle-gated booleans; floor re-tuning reads this).
    */
  def recall(spark: SparkSession, dir: String): Unit = {
    import graft.ops.{Pca, Similarity}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteTopKExact(emb, q, "vec_id", "embedding", 5)
      .select(col("qid"), col("cid")).localCheckpoint(true)
    def rec(name: String, ap: org.apache.spark.sql.DataFrame): Unit = {
      val j = exact.join(ap.select(col("qid"), col("cid"), lit(1).as("h")),
          Seq("qid", "cid"), "left_outer")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("h"), lit(0))).as("hits"))
        .collect().head
      println(f"[probe] $dir $name%-16s recall=${100.0 * j.getLong(1) / j.getLong(0)}%5.1f%% of ${j.getLong(0)}")
    }
    val km = Similarity.ivfCentroidsKMeans(emb, "vec_id", "embedding", 8)
    rec("ivf_kmeans", Similarity.ivfTopKWith(km, emb, q, "vec_id", "embedding", 5, 2))
    rec("ivf_seed", Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 2))
    val hier = graft.ops.IvfHier.train(emb, "vec_id", "embedding", 8, m = 2)
    rec("ivf_hier", Similarity.ivfTopKHier(emb, q, "vec_id", "embedding", hier, 5, 2))
    // the m sweep needs nCoarse > m headroom: nList 16 -> nCoarse 4,
    // so m in {1, 2, 4} are genuinely distinct beams (at nList 8 the
    // coarse level has 3 cells and m >= 3 all clamp to the same config)
    Seq(1, 2, 4).foreach { m =>
      val h = graft.ops.IvfHier.train(emb, "vec_id", "embedding", 16, m = m)
      rec(s"ivf_hier16_m$m", Similarity.ivfTopKHier(emb, q, "vec_id", "embedding", h, 5, 2))
    }
    rec("ivf_sq8", Similarity.ivfTopKInt8(emb, q, "vec_id", "embedding", 5, 8, 2))
    val pqMargin = math.max(32, math.ceil(emb.count() * 0.02).toInt)
    rec("ivf_pq", graft.ops.Pq.ivfTopKPq(emb, q, "vec_id", "embedding", 5, 8, 2,
      pqMargin))
    rec("ivf_pq_raw", graft.ops.Pq.ivfTopKPq(emb, q, "vec_id", "embedding", 5, 8, 2,
      pqMargin, residual = false))
    rec("pq_adc_full", graft.ops.Pq.ivfTopKPq(emb, q, "vec_id", "embedding", 5, 8, 8,
      pqMargin))
    val pqModel = graft.ops.Pq.trainResidualHier(emb, "vec_id", "embedding", hier)
    rec("ivf_hier_pq", graft.ops.Pq.ivfTopKPqHier(emb, q, "vec_id", "embedding",
      hier, pqModel, 5, 2, pqMargin))
    val imi = graft.ops.IvfImi.train(emb, "vec_id", "embedding", 8)
    rec("ivf_imi", Similarity.ivfTopKImi(emb, q, "vec_id", "embedding", imi, 5, 2))
    val imiPq = graft.ops.Pq.trainResidualImi(emb, "vec_id", "embedding", imi)
    rec("ivf_imi_pq", graft.ops.Pq.ivfTopKPqImi(emb, q, "vec_id", "embedding",
      imi, imiPq, 5, 2, pqMargin))
    // parametric-OPQ tiers: the same serves over the rotated corpus
    val pcaFull = Pca.fit(emb, "embedding", 64, 64)
    val opq = graft.ops.Pq.opqBasis(pcaFull, 8)
    val embR = emb.withColumn("embedding",
      graft.ops.Pq.opqRotateExpr(col("embedding"), opq)).localCheckpoint(true)
    val qR = embR.filter(col("vec_id") % 50 === 0)
    rec("ivf_opq", graft.ops.Pq.ivfTopKPq(embR, qR, "vec_id", "embedding", 5, 8, 2,
      pqMargin))
    val imiR = graft.ops.IvfImi.train(embR, "vec_id", "embedding", 8)
    rec("ivf_imi_opq", graft.ops.Pq.ivfTopKPqImi(embR, qR, "vec_id", "embedding",
      imiR, graft.ops.Pq.trainResidualImi(embR, "vec_id", "embedding", imiR), 5, 2,
      pqMargin))
    rec("lsh_multiprobe", Similarity.multiProbeTopKExact(emb, q, "vec_id", "embedding", 5, 4, 64))
    val m = Pca.fit(emb, "embedding", 64, 48)
    val margin = math.max(25, math.ceil(emb.count() * 0.2).toInt)
    rec("pca_gate", Pca.pcaTopK(emb, q, "vec_id", "embedding", m, 5, margin))
  }

  /** Sub-phase timing for the OPQ-persisted family (the bench's top two
    * rows): where do PqIndex.build(opq) and the recompute twin spend
    * their wall? Run twice to split codegen/JIT from steady state.
    */
  def pqphase(spark: SparkSession, dir: String): Unit = {
    import graft.ops._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("warm emb")(emb.count())
    (1 to 2).foreach { round =>
      val b90 = emb.filter(col("vec_id") % 10 =!= 9)
      // --- Pca.fit internals
      val dim = time(s"r$round dim head")(
        b90.select(size(col("embedding"))).head().getInt(0))
      val mom = Pca.moments(b90, "embedding", dim)
      time(s"r$round moments collect")(mom.collect().length)
      val pcaFull = time(s"r$round Pca.fit full")(Pca.fit(b90, "embedding", dim, dim))
      val basis = Pq.opqBasis(pcaFull, 8)
      def rot(df: org.apache.spark.sql.DataFrame) = df.withColumn("embedding",
        Pq.opqRotateExpr(col("embedding"), basis))
      val rb90 = rot(b90)
      time(s"r$round rot(b90) count-materialize")(rb90.count())
      val cents = time(s"r$round ivfCentroids")(
        Similarity.ivfCentroids(rb90, "vec_id", "embedding", 8))
      val model = time(s"r$round trainResidualFlat")(
        Pq.trainResidualFlat(rb90, "vec_id", "embedding", cents))
      val lists = time(s"r$round pqLists ckpt")(
        Pq.pqLists(rot(emb), "vec_id", "embedding", cents, model).localCheckpoint(true))
      val q50 = rot(emb.filter(col("vec_id") % 50 === 0))
      val margin = math.max(32, math.ceil(emb.count() * 0.02).toInt)
      time(s"r$round serve fromLists")(
        Pq.ivfTopKPqFromLists(cents, model, lists, rot(emb), q50,
          "vec_id", "embedding", 5, 8, margin).count())
      // --- the persisted index build for comparison
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_opq").toString
      time(s"r$round PqIndex.build opq")(
        PqIndex.build(b90, "vec_id", "embedding", s"$tmp/opq", nList = 8, opq = true))
      time(s"r$round PqIndex.refresh")(
        PqIndex.refresh(emb, "vec_id", "embedding", s"$tmp/opq"))
      time(s"r$round PqIndex.topK")(
        PqIndex.topK(emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", s"$tmp/opq", 5, 8, margin).count())
      new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.lift(1).contains("curate")) { curate(spark, dir); spark.stop(); return }
    if (args.lift(1).contains("recall")) { recall(spark, dir); spark.stop(); return }
    if (args.lift(1).contains("pqphase")) { pqphase(spark, dir); spark.stop(); return }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs count")(docs.count())
    val withSh = docs.withColumn("__sh", Dedup.shingles(col("text")))
    time("shingles count")(withSh.select(size(col("__sh"))).agg(sum("size(__sh)")).collect())
    val sig1 = withSh.select(col("doc_id"), Dedup.minhash(col("__sh"), 0).as("h0"))
    time("1 minhash")(sig1.count())
    val keys = (0 until 4).map { b =>
      concat_ws("#", (0 until 2).map(r => Dedup.minhash(col("__sh"), b * 2 + r)): _*)
    }
    val banded = withSh.filter(size(col("__sh")) >= 1)
      .select(col("doc_id").as("doc"), posexplode(array(keys: _*)).as(Seq("band", "key")))
    time("banded")(banded.count())
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 4, 2)
    time("candidates")(cand.count())
    val shd = docs.withColumn("sh", Dedup.shingles(col("text"))).select("doc_id", "sh")
    val jac = cand.join(shd.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(shd.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"), Dedup.jaccard(col("sha"), col("shb")).as("jac"))
    time("jaccard")(jac.count())
    val sg = docs.select(col("doc_id"), Dedup.simhashBits(col("text")).as("sig"))
    time("simhash sigs")(sg.count())
    val sc = Dedup.simhashCandidates(docs, "doc_id", "text", 4, 3)
    time("simhash pairs")(sc.count())
    spark.stop()
  }
}
