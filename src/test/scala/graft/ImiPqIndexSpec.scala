package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ImiPqIndex, IvfImi, Pq}

/** The persisted IMI-PQ index: book round-trip, probe parity with the
  * recompute form, churn-proportional refresh, delta-upsert carry —
  * the [[PqIndexSpec]] contract applied to the factorized tier.
  */
class ImiPqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def scratch() =
    java.nio.file.Files.createTempDirectory("graft_imipqidx").toString + "/imipq"

  test("books round-trip the lake bit-for-bit; residual flag pins; mu stays derived") {
    val idx = scratch()
    ImiPqIndex.build(emb, "vec_id", "embedding", idx, nCells = 16, mSub = 8, ks = 32)
    val wantImi = IvfImi.train(emb, "vec_id", "embedding", 16)
    val gotImi = ImiPqIndex.loadImi(spark, idx)
    assert(gotImi.sub1.map(_.toSeq) == wantImi.sub1.map(_.toSeq) &&
      gotImi.sub2.map(_.toSeq) == wantImi.sub2.map(_.toSeq),
      "persisted sub-codebooks must equal the trainer's output exactly")
    val wantModel = Pq.trainResidualImi(emb, "vec_id", "embedding", wantImi, mSub = 8, ks = 32)
    val gotModel = ImiPqIndex.loadModel(spark, idx)
    assert(gotModel.residual && gotModel.mu.isEmpty,
      "the IMI residual convention derives mu — nothing per-cell persists")
    assert(gotModel.codebooks.map(_.map(_.toSeq)) == wantModel.codebooks.map(_.map(_.toSeq)))
  }

  test("served top-k == recompute top-k under the pinned books; refresh signs only churn") {
    val idx = scratch()
    val b90 = emb.filter(col("vec_id") % 10 =!= 9).localCheckpoint(true)
    ImiPqIndex.build(b90, "vec_id", "embedding", idx, nCells = 16, mSub = 8, ks = 32)
    val (kept, signed) = ImiPqIndex.refresh(emb, "vec_id", "embedding", idx)
    assert(kept == b90.count() && signed == emb.count() - b90.count(),
      s"churn seam drifted: kept=$kept signed=$signed")
    val q = emb.filter(col("vec_id") % 25 === 0)
    val served = ImiPqIndex.topK(emb, q, "vec_id", "embedding", idx, 3, 4, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val imi = IvfImi.train(b90, "vec_id", "embedding", 16)
    val model = Pq.trainResidualImi(b90, "vec_id", "embedding", imi, mSub = 8, ks = 32)
    val want = Pq.ivfTopKPqImi(emb, q, "vec_id", "embedding", imi, model, 3, 4, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == want && served.nonEmpty,
      s"missing=${want -- served} extra=${served -- want}")
  }

  test("upsert carries re-deliveries, re-encodes changes, leaves out-of-batch rows") {
    val idx = scratch()
    ImiPqIndex.build(emb, "vec_id", "embedding", idx, nCells = 16, mSub = 8, ks = 32)
    val before = spark.read.parquet(idx + "/lists").count()
    val (kept1, signed1) = ImiPqIndex.upsert(emb.filter(col("vec_id") % 7 === 0),
      "vec_id", "embedding", idx)
    assert(signed1 == 0L && kept1 > 0L, s"re-delivery must carry: $kept1/$signed1")
    val changed = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), transform(col("embedding"), x => x + 1.0f).as("embedding"))
    val (kept2, signed2) = ImiPqIndex.upsert(changed, "vec_id", "embedding", idx)
    assert(kept2 == 0L && signed2 == changed.count(),
      s"changed batch must re-encode: $kept2/$signed2")
    assert(spark.read.parquet(idx + "/lists").count() == before)
  }

  test("drop-cycle + streaming sink maintain the IMI-PQ index at O(drop) cost") {
    val root = java.nio.file.Files.createTempDirectory("graft_imipq_drop").toString
    val b90 = emb.filter(col("vec_id") % 10 =!= 9).localCheckpoint(true)
    graft.ops.SimilarityIndex.build(b90, "vec_id", "embedding", root + "/sq8", nList = 4)
    ImiPqIndex.build(b90, "vec_id", "embedding", root + "/imipq",
      nCells = 16, mSub = 8, ks = 32)
    val drop = emb.filter(col("vec_id") % 10 === 9).localCheckpoint(true)
    val n = drop.count()
    val r1 = graft.pipeline.DropCycle.runEmbeddings(drop, "vec_id", "embedding",
      root + "/sq8", imiPqIndexPath = Some(root + "/imipq"))
    assert(r1("imipqidx") == (0L, n), s"new ids must sign: ${r1("imipqidx")}")
    val r2 = graft.pipeline.DropCycle.runEmbeddings(drop, "vec_id", "embedding",
      root + "/sq8", imiPqIndexPath = Some(root + "/imipq"))
    assert(r2("imipqidx") == (n, 0L), s"re-delivery must carry: ${r2("imipqidx")}")
    // streaming replay over a second index converges to the same lists
    val idx2 = root + "/imipq2"
    ImiPqIndex.build(b90, "vec_id", "embedding", idx2, nCells = 16, mSub = 8, ks = 32)
    emb.filter(col("vec_id") % 2 === 0).coalesce(1).write.parquet(root + "/feed/b0")
    emb.filter(col("vec_id") % 2 === 1).coalesce(1).write.parquet(root + "/feed/b1")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(root + "/feed/*")
    val q = graft.streaming.EventStreams.imiPqIndexSink(idx2, "vec_id", "embedding")(stream)
      .option("checkpointLocation", root + "/ckpt").start()
    q.awaitTermination()
    def key(p: String) = spark.read.parquet(p + "/lists")
      .select(col("cid"), col("cell"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq)).toSet
    assert(key(idx2) == key(root + "/imipq"), "streamed and drop-cycled lists must agree")
  }

  test("cli index --kind imipq: build then churn refresh") {
    val root = java.nio.file.Files.createTempDirectory("graft_imipq_cli").toString
    emb.filter(col("vec_id") % 10 =!= 9).write.parquet(root + "/emb90")
    emb.write.parquet(root + "/emb")
    graft.cli.Main.run(spark, "index", Array("--kind", "imipq",
      "--lake", root + "/emb90", "--path", root + "/idx", "--ncells", "16",
      "--ks", "32"))
    graft.cli.Main.run(spark, "index", Array("--kind", "imipq",
      "--lake", root + "/emb", "--path", root + "/idx", "--refresh"))
    val lists = spark.read.parquet(root + "/idx/lists")
    assert(lists.count() == emb.count(), "refresh must cover the full corpus")
    assert(lists.select(max(col("cell"))).head().getLong(0) < 16L)
  }

  test("OPQ+IMI: pinned rotation composes with product cells — served == rotated recompute, churn in rotated space") {
    val idx = scratch()
    val b90 = emb.filter(col("vec_id") % 10 =!= 9).localCheckpoint(true)
    ImiPqIndex.build(b90, "vec_id", "embedding", idx, nCells = 16, mSub = 8,
      ks = 32, opq = true)
    // the basis lands at the SHARED opqbasis seam; a plain build has none
    val basis = graft.ops.PqIndex.loadBasis(spark, idx)
    assert(basis.nonEmpty && basis.get.size == 64 && basis.get.head.length == 64)
    // refresh carries the unchanged 90% verbatim (fingerprints are over
    // ROTATED vectors, so the re-rotation must hash identically)
    val (kept, signed) = ImiPqIndex.refresh(emb, "vec_id", "embedding", idx)
    assert(kept == b90.count() && signed == emb.count() - b90.count(),
      s"opq+imi churn seam drifted: kept=$kept signed=$signed")
    // served == the from-scratch recompute with EVERYTHING (sub-books,
    // residual codebooks, codes, probes) in the same pinned rotated space
    val q = emb.filter(col("vec_id") % 25 === 0)
    val served = ImiPqIndex.topK(emb, q, "vec_id", "embedding", idx, 3, 8, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def rot(df: org.apache.spark.sql.DataFrame) = df.withColumn("embedding",
      Pq.opqRotateExpr(col("embedding"), basis.get))
    val rb90 = rot(b90)
    val imi = IvfImi.train(rb90, "vec_id", "embedding", 16)
    val model = Pq.trainResidualImi(rb90, "vec_id", "embedding", imi, mSub = 8, ks = 32)
    val want = Pq.ivfTopKPqImi(rot(emb), rot(q), "vec_id", "embedding",
        imi, model, 3, 8, margin = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == want && served.nonEmpty,
      s"missing=${want -- served} extra=${served -- want}")
  }
}
