package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, SimilarityIndex}

/** The persisted IVF index's contract: probes serve from the LANDED
  * inverted lists (zero list-build work — proven by editing the lists
  * and watching the probe obey the edit), refresh cost follows churn
  * (verbatim-carry sentinel), and the served ranking equals the
  * recompute form under the same codebook.
  */
class SimilarityIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int): Seq[Float] =
    (0 until 8).map(j => (((seed * 31 + j * 17) % 13) - 6).toFloat)

  private def corpus(ids: Long*) =
    ids.map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")

  test("probe serves the persisted lists and matches the recompute ranking") {
    val tmp = Files.createTempDirectory("graft_ivfidx").toString
    val idx = tmp + "/ivf"
    val full = corpus(0L to 39L: _*)
    SimilarityIndex.build(full, "vec_id", "embedding", idx, nList = 4)
    val queries = full.filter(col("vec_id") % 10 === 0)

    val got = SimilarityIndex.topKInt8(full, queries, "vec_id", "embedding", idx, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.ivfTopKInt8(full, queries, "vec_id", "embedding", 3, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)

    // zero list-build at probe time: delete one id's list row directly in
    // the sidecar — a probe that rebuilt from the corpus would still rank
    // it; a probe that serves the lists cannot
    val victim = want.head._2
    val edited = spark.read.parquet(idx + "/lists").filter(col("cid") =!= victim)
    edited.write.mode("overwrite").parquet(tmp + "/edited")
    spark.read.parquet(tmp + "/edited").write.mode("overwrite").parquet(idx + "/lists")
    val after = SimilarityIndex.topKInt8(full, queries, "vec_id", "embedding", idx, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(!after.exists(_._2 == victim),
      "a probe must serve the persisted lists, not rebuild them from the corpus")
  }

  test("upsert touches only the batch; streaming feed converges to the build") {
    val tmp = Files.createTempDirectory("graft_ivfidx3").toString
    val idx = tmp + "/ivf"
    SimilarityIndex.build(corpus(0L to 19L: _*), "vec_id", "embedding", idx, nList = 4)
    val tampered = spark.read.parquet(idx + "/lists").withColumn("lo", lit(-777.0))
    tampered.write.mode("overwrite").parquet(tmp + "/t")
    spark.read.parquet(tmp + "/t").write.mode("overwrite").parquet(idx + "/lists")
    // batch: id 1 re-delivered unchanged, id 2 re-vectored, id 20 new
    val batch = corpus(1L).unionByName(
      Seq((2L, vec(200)), (20L, vec(20))).toDF("vec_id", "embedding"))
    val (kept, signed) = SimilarityIndex.upsert(batch, "vec_id", "embedding", idx)
    assert(kept == 1 && signed == 2)
    val lists = spark.read.parquet(idx + "/lists")
    assert(lists.filter(col("cid").isin(2L, 20L) && col("lo") === -777.0).count() == 0)
    assert(lists.filter(!col("cid").isin(2L, 20L) && col("lo") =!= -777.0).count() == 0,
      "out-of-batch and unchanged rows carry verbatim")

    // streaming replay == from-scratch build over the final corpus
    val tmp2 = Files.createTempDirectory("graft_ivfidx4").toString
    val feed = tmp2 + "/feed"
    val idx2 = tmp2 + "/ivf"
    val all = (0L to 20L).map(i => (i, vec(i.toInt)))
    SimilarityIndex.build(corpus(0L to 19L: _*), "vec_id", "embedding", idx2, nList = 4)
    all.grouped(7).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream.schema(corpus(0L).schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.simIndexSink(idx2, "vec_id", "embedding")(stream)
      .option("checkpointLocation", tmp2 + "/ckpt").start()
    q.awaitTermination()
    val full = all.toDF("vec_id", "embedding")
    val queries = full.filter(col("vec_id") % 10 === 0)
    val got = SimilarityIndex.topKInt8(full, queries, "vec_id", "embedding", idx2, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.ivfTopKInt8With(
        Similarity.ivfCentroids(corpus(0L to 19L: _*), "vec_id", "embedding", 4),
        full, queries, "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("refresh signs only churn under the pinned codebook") {
    val tmp = Files.createTempDirectory("graft_ivfidx2").toString
    val idx = tmp + "/ivf"
    val drop1 = corpus(0L to 19L: _*)
    SimilarityIndex.build(drop1, "vec_id", "embedding", idx, nList = 4)

    // sentinel: rewrite every row's lo — recompute would restore the
    // true quantization bound, verbatim carry preserves the tamper
    val tampered = spark.read.parquet(idx + "/lists").withColumn("lo", lit(-12345.0))
    tampered.write.mode("overwrite").parquet(tmp + "/t")
    spark.read.parquet(tmp + "/t").write.mode("overwrite").parquet(idx + "/lists")

    val (kept0, signed0) = SimilarityIndex.refresh(drop1, "vec_id", "embedding", idx)
    assert(kept0 == 20 && signed0 == 0, "no churn -> nothing signed")
    assert(spark.read.parquet(idx + "/lists").filter(col("lo") =!= -12345.0).count() == 0)

    // drop 2: id 3 re-vectored, ids 20/21 new, id 7 vanished
    val drop2 = corpus((0L to 19L).filterNot(i => i == 3 || i == 7): _*)
      .unionByName(Seq((3L, vec(300)), (20L, vec(20)), (21L, vec(21))).toDF("vec_id", "embedding"))
    val (kept1, signed1) = SimilarityIndex.refresh(drop2, "vec_id", "embedding", idx)
    assert(kept1 == 18, s"the 18 ids of 0..19 minus {3,7} carried; got $kept1")
    assert(signed1 == 3, s"exactly ids 3,20,21 signed; got $signed1")
    val lists = spark.read.parquet(idx + "/lists")
    assert(lists.filter(col("cid") === 7L).count() == 0, "vanished id dropped")
    assert(lists.filter(col("cid").isin(3L, 20L, 21L) && col("lo") === -12345.0).count() == 0,
      "churned ids freshly quantized")
    assert(lists.filter(!col("cid").isin(3L, 20L, 21L) && col("lo") =!= -12345.0).count() == 0,
      "unchanged ids carried verbatim")
    // codebook untouched by refresh
    assert(SimilarityIndex.loadCentroids(spark, idx).map(_._1) ==
      Similarity.ivfCentroids(drop1, "vec_id", "embedding", 4).map(_._1))
  }

  test("mmrTopKIndexed: index-served pool reproduces brute-pool MMR at full probe; plan never pair-scans the corpus") {
    val tmp = Files.createTempDirectory("graft_mmridx").toString
    val idx = tmp + "/ivf"
    val full = corpus(0L to 39L: _*)
    SimilarityIndex.build(full, "vec_id", "embedding", idx, nList = 4)
    val queries = full.filter(col("vec_id") % 10 === 0)
    // nProbe = nList: every cell probed -> the pool is the exact decimal
    // top-poolK = the brute pool, so the greedy ranking must hash-match
    val got = Similarity.mmrTopKIndexed(full, queries, "vec_id", "embedding", idx,
        poolK = 6, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.mmrTopK(full, queries, "vec_id", "embedding", 6, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
    // the contract that motivated the seam: the index-served pool plans
    // EQUI joins only — no nested-loop/cartesian over the corpus (the
    // brute pool's |Q|×n scoring join is exactly such a nested loop)
    val p = Similarity.mmrIndexedPool(full, queries, "vec_id", "embedding", idx, 6, 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"indexed pool must never pair-scan the corpus:\n$p")
    // a selective probe (nProbe < nList) still serves k rows per query —
    // the ANN recall trade lives in pool membership, not output shape
    val sel = Similarity.mmrTopKIndexed(full, queries, "vec_id", "embedding", idx,
        poolK = 6, k = 3, nProbe = 2)
      .groupBy(col("qid")).count().collect()
    assert(sel.nonEmpty && sel.forall(_.getLong(1) == 3L),
      "selective probe must still fill k ranks per query")
  }

  test("trained build pins the k-means codebook; probes match the recompute under it") {
    val tmp = Files.createTempDirectory("graft_ivfidx3").toString
    val idx = tmp + "/ivf"
    val full = corpus(0L to 39L: _*)
    SimilarityIndex.build(full, "vec_id", "embedding", idx, nList = 4, trained = true)
    // the landed codebook IS the distributed trainer's output
    val landed = SimilarityIndex.loadCentroids(spark, idx)
    val trained = Similarity.ivfCentroidsKMeans(full, "vec_id", "embedding", 4)
    assert(landed == trained, "trained build must pin the k-means codebook")
    // probes under the pinned trained codebook equal the recompute form
    val queries = full.filter(col("vec_id") % 10 === 0)
    val got = SimilarityIndex.topKInt8(full, queries, "vec_id", "embedding", idx, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.ivfTopKInt8With(trained, full, queries, "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
    // refresh still never retrains (churn under the TRAINED codebook)
    val drop2 = full.unionByName(Seq((40L, vec(40))).toDF("vec_id", "embedding"))
    val (kept, signed) = SimilarityIndex.refresh(drop2, "vec_id", "embedding", idx)
    assert(kept == 40L && signed == 1L)
    assert(SimilarityIndex.loadCentroids(spark, idx) == trained)
  }
}
