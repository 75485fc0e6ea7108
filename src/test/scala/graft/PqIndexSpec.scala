package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, PqIndex, Similarity}

/** The persisted IVF-PQ index: codebook round-trip, probe parity with
  * the recompute form, churn-proportional refresh, and delta-upsert
  * carry semantics — the [[SimilarityIndexSpec]] contract applied to
  * the PQ tier.
  */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def scratch() =
    java.nio.file.Files.createTempDirectory("graft_pqidx").toString + "/pq"

  test("codebooks round-trip the lake bit-for-bit (incl. the residual flag)") {
    val idx = scratch()
    PqIndex.build(emb, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
    val want = Pq.trainResidualFlat(emb, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val got = PqIndex.loadModel(spark, idx)
    assert(got.dsub == want.dsub)
    assert(got.residual, "the default build is the residual IVFADC posture")
    assert(got.codebooks.map(_.map(_.toSeq)) == want.codebooks.map(_.map(_.toSeq)),
      "persisted codebooks must equal the trainer's output exactly")
    assert(PqIndex.loadCentroids(spark, idx) == cents)
    // a raw build pins residual = false the same way
    val idxRaw = scratch()
    PqIndex.build(emb, "vec_id", "embedding", idxRaw, nList = 4, mSub = 8, ks = 32,
      residual = false)
    assert(!PqIndex.loadModel(spark, idxRaw).residual)
  }

  test("served top-k == recompute top-k under the same pinned codebooks") {
    val idx = scratch()
    PqIndex.build(emb, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    val q = emb.filter(col("vec_id") % 25 === 0)
    val served = PqIndex.topK(emb, q, "vec_id", "embedding", idx, 3, 2, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
    val model = Pq.trainResidualFlat(emb, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val want = Pq.ivfTopKPqFromLists(cents, model,
        Pq.pqLists(emb, "vec_id", "embedding", cents, model),
        emb, q, "vec_id", "embedding", 3, 2, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == want && served.nonEmpty,
      s"missing=${want -- served} extra=${served -- want}")
  }

  test("refresh re-encodes exactly the churn under the pinned codebooks") {
    val idx = scratch()
    val b90 = emb.filter(col("vec_id") % 10 =!= 9)
    PqIndex.build(b90, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    val (kept, signed) = PqIndex.refresh(emb, "vec_id", "embedding", idx)
    assert(kept == b90.count() && signed == emb.count() - b90.count(),
      s"churn seam drifted: kept=$kept signed=$signed")
    // the refreshed lists must equal a from-scratch encode under the
    // SAME (build-pinned) codebooks — carry-verbatim cannot drift
    val cents = Similarity.ivfCentroids(b90, "vec_id", "embedding", 4)
    val model = Pq.trainResidualFlat(b90, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val got = spark.read.parquet(idx + "/lists")
      .select(col("cid"), col("cell"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq)).toSet
    val want = Pq.pqLists(emb, "vec_id", "embedding", cents, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("drop-cycle runEmbeddings maintains the PQ index at O(drop) cost") {
    val root = java.nio.file.Files.createTempDirectory("graft_pqdrop").toString
    val idxSq8 = root + "/sq8"
    val idxPq = root + "/pq"
    val b90 = emb.filter(col("vec_id") % 10 =!= 9).localCheckpoint(true)
    graft.ops.SimilarityIndex.build(b90, "vec_id", "embedding", idxSq8, nList = 4)
    PqIndex.build(b90, "vec_id", "embedding", idxPq, nList = 4, mSub = 8, ks = 32)
    val drop = emb.filter(col("vec_id") % 10 === 9).localCheckpoint(true)
    val n = drop.count()
    // drop of new ids: every row signs, nothing carried
    val r1 = graft.pipeline.DropCycle.runEmbeddings(drop, "vec_id", "embedding",
      idxSq8, pqIndexPath = Some(idxPq))
    assert(r1("pqidx") == (0L, n), s"new ids must sign: ${r1("pqidx")}")
    // re-delivery of the same drop: everything carries, nothing signs
    val r2 = graft.pipeline.DropCycle.runEmbeddings(drop, "vec_id", "embedding",
      idxSq8, pqIndexPath = Some(idxPq))
    assert(r2("pqidx") == (n, 0L), s"re-delivery must carry: ${r2("pqidx")}")
    // the maintained lists equal a from-scratch encode under the
    // BUILD-pinned (b90) codebooks — residual reference included
    val cents = Similarity.ivfCentroids(b90, "vec_id", "embedding", 4)
    val model = Pq.trainResidualFlat(b90, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val got = spark.read.parquet(idxPq + "/lists")
      .select(col("cid"), col("cell"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq)).toSet
    val want = Pq.pqLists(emb, "vec_id", "embedding", cents, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("streaming pqIndexSink replay converges to the recompute serve") {
    val root = java.nio.file.Files.createTempDirectory("graft_pqstream").toString
    val idx = root + "/pq"
    val feed = root + "/feed"
    val b90 = emb.filter(col("vec_id") % 10 =!= 9).localCheckpoint(true)
    PqIndex.build(b90, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    // replay the WHOLE corpus (re-deliveries included) in file batches
    emb.filter(col("vec_id") % 3 === 0).coalesce(1).write.parquet(feed + "/b0")
    emb.filter(col("vec_id") % 3 === 1).coalesce(1).write.parquet(feed + "/b1")
    emb.filter(col("vec_id") % 3 === 2).coalesce(1).write.parquet(feed + "/b2")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(feed + "/*")
    val q = graft.streaming.EventStreams.pqIndexSink(idx, "vec_id", "embedding")(stream)
      .option("checkpointLocation", root + "/ckpt").start()
    q.awaitTermination()
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val served = PqIndex.topK(emb, queries, "vec_id", "embedding", idx, 3, 2, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cents = Similarity.ivfCentroids(b90, "vec_id", "embedding", 4)
    val model = Pq.trainResidualFlat(b90, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val want = Pq.ivfTopKPqFromLists(cents, model,
        Pq.pqLists(emb, "vec_id", "embedding", cents, model),
        emb, queries, "vec_id", "embedding", 3, 2, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == want && served.nonEmpty,
      s"missing=${want -- served} extra=${served -- want}")
  }

  test("mmrTopKPq: PQ-served pool reproduces brute-pool MMR at a gate-complete probe; plan never pair-scans") {
    val idx = scratch()
    val full = emb.localCheckpoint(true)
    val n = full.count().toInt
    PqIndex.build(full, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    val queries = full.filter(col("vec_id") % 50 === 0)
    // nProbe = nList AND margin = corpus: every candidate reaches the
    // exact-decimal re-rank, so the pool IS the brute pool and the
    // greedy ranking must match bit-for-bit
    val got = Similarity.mmrTopKPq(full, queries, "vec_id", "embedding", idx,
        poolK = 6, k = 3, nProbe = 4, margin = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.mmrTopK(full, queries, "vec_id", "embedding", 6, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
    // the seam's plan contract, like the SQ8 twin: equi joins only
    val p = Similarity.mmrPqPool(full, queries, "vec_id", "embedding", idx, 6, 4, n)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pq-served pool must never pair-scan the corpus:\n$p")
    // a selective, fixed-margin probe still fills k ranks per query
    val sel = Similarity.mmrTopKPq(full, queries, "vec_id", "embedding", idx,
        poolK = 6, k = 3, nProbe = 2, margin = 32)
      .groupBy(col("qid")).count().collect()
    assert(sel.nonEmpty && sel.forall(_.getLong(1) == 3L),
      "selective probe must still fill k ranks per query")
  }

  test("upsert: re-delivered unchanged rows carry, out-of-batch rows untouched") {
    val idx = scratch()
    PqIndex.build(emb, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32)
    val before = spark.read.parquet(idx + "/lists").count()
    // re-deliver an unchanged slice: everything carries, nothing signs
    val (kept1, signed1) = PqIndex.upsert(emb.filter(col("vec_id") % 7 === 0),
      "vec_id", "embedding", idx)
    assert(signed1 == 0L && kept1 > 0L, s"re-delivery must carry: $kept1/$signed1")
    // deliver changed vectors: exactly those sign, corpus size constant
    val changed = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), transform(col("embedding"), x => x + 1.0f).as("embedding"))
    val (kept2, signed2) = PqIndex.upsert(changed, "vec_id", "embedding", idx)
    assert(kept2 == 0L && signed2 == changed.count(),
      s"changed batch must re-encode: $kept2/$signed2")
    assert(spark.read.parquet(idx + "/lists").count() == before,
      "upsert must not grow or shrink the out-of-batch corpus")
  }

  test("OPQ index: pinned rotation — served == rotated recompute, churn in rotated space") {
    val idx = scratch()
    val b90 = emb.filter(col("vec_id") % 10 =!= 9)
    PqIndex.build(b90, "vec_id", "embedding", idx, nList = 4, mSub = 8, ks = 32,
      opq = true)
    // the basis landed beside the codebooks; a plain build has none
    val basis = PqIndex.loadBasis(spark, idx)
    assert(basis.nonEmpty && basis.get.size == 64 && basis.get.head.length == 64)
    val plain = scratch()
    PqIndex.build(b90, "vec_id", "embedding", plain, nList = 4, mSub = 8, ks = 32)
    assert(PqIndex.loadBasis(spark, plain).isEmpty)
    // refresh carries the unchanged 90% verbatim (fingerprints are over
    // ROTATED vectors, so the re-rotation must hash identically)
    val (kept, signed) = PqIndex.refresh(emb, "vec_id", "embedding", idx)
    assert(kept == b90.count() && signed == emb.count() - b90.count(),
      s"opq churn seam drifted: kept=$kept signed=$signed")
    // served == the from-scratch recompute under the same pinned basis
    val q = emb.filter(col("vec_id") % 25 === 0)
    val served = PqIndex.topK(emb, q, "vec_id", "embedding", idx, 3, 4, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def rot(df: org.apache.spark.sql.DataFrame) = df.withColumn("embedding",
      Pq.opqRotateExpr(col("embedding"), basis.get))
    val rb90 = rot(b90)
    val cents = Similarity.ivfCentroids(rb90, "vec_id", "embedding", 4)
    val model = Pq.trainResidualFlat(rb90, "vec_id", "embedding", cents, mSub = 8, ks = 32)
    val want = Pq.ivfTopKPqFromLists(cents, model,
        Pq.pqLists(rot(emb), "vec_id", "embedding", cents, model),
        rot(emb), rot(q), "vec_id", "embedding", 3, 4, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == want && served.nonEmpty,
      s"missing=${want -- served} extra=${served -- want}")
  }
}
