package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ClfIndex, QualityClassifier}

/** The persisted trained-classifier tier: served-vs-recompute parity,
  * the model-pinning fingerprint (unchanged labeled slice → churn-only
  * rescore; changed slice → loud retrain), delta upserts under the
  * pinned model, evidence-free rows, the unbuilt-index refusal, and
  * the streaming sink's convergence.
  */
class ClfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the QualityClassifierSpec two-class fixture with a lang label and a
  // planted evidence-free doc (single token -> no bigrams -> no score)
  private lazy val docs = {
    val good = (0 until 40).map { i =>
      (i.toLong, "en", s"the quick brown fox jumps over the lazy dog number $i " +
        "and the clean corpus keeps growing with careful words")
    }
    val bad = (100 until 140).map { i =>
      (i.toLong, "xx", s"zzz$i spam spam casino jackpot winner click here " +
        "buy cheap pills casino jackpot spam offer expires")
    }
    (good ++ bad :+ ((500L, "en", "lonely"))).toDF("doc_id", "lang", "text")
  }
  private def labeled = docs.filter(col("doc_id") < 300)

  private def fromScratch(corpus: org.apache.spark.sql.DataFrame) = {
    val m = QualityClassifier.train(labeled, "doc_id", "text", col("lang") === "en")
    corpus.select(col("doc_id").as("doc"))
      .join(QualityClassifier.score(corpus, "doc_id", "text", m), Seq("doc"), "left_outer")
      .select(col("doc"), coalesce(col("n_fbuckets"), lit(0L)).as("n_fbuckets"),
        col("clf_logit"), col("clf_prob"))
      .orderBy(col("doc")).collect().map(_.toSeq).toSeq
  }

  test("build+refresh under an unchanged labeled slice: model pinned, churn-only rescore, served == recompute") {
    val tmp = Files.createTempDirectory("clfidx").toString
    val idx = tmp + "/clf"
    ClfIndex.build(labeled, docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", col("lang") === "en", idx)
    val modelBefore = ClfIndex.loadModel(spark, idx)
    val (kept, signed) = ClfIndex.refresh(labeled, docs,
      "doc_id", "text", col("lang") === "en", idx)
    val churn = docs.filter(col("doc_id") % 5 === 0).count()
    assert(kept == docs.count() - churn && signed == churn,
      s"kept=$kept signed=$signed churn=$churn")
    assert(ClfIndex.loadModel(spark, idx) == modelBefore, "unchanged slice must pin the model")
    val served = ClfIndex.serve(spark, idx)
      .select(col("doc"), col("n_fbuckets"), col("clf_logit"), col("clf_prob"))
      .orderBy(col("doc")).collect().map(_.toSeq).toSeq
    assert(served == fromScratch(docs))
    // the evidence-free doc has a ROW (carry-able), not an absence
    val lonely = ClfIndex.serve(spark, idx).filter(col("doc") === 500L).collect()
    assert(lonely.length == 1 && lonely.head.getLong(2) == 0L &&
      lonely.head.isNullAt(3) && lonely.head.isNullAt(4))
  }

  test("landed-stream training: bit-identical weights, scores and cleanup vs the pinned-block path") {
    // the service-grade posture (feature stream landed as parquet and
    // re-read each pass — recoverable on executor loss) must be a pure
    // WHERE-the-rows-are-read-from change: same model, same scores
    val tmp = Files.createTempDirectory("clfland").toString
    val mLanded = QualityClassifier.train(labeled, "doc_id", "text",
      col("lang") === "en", streamLanding = Some(tmp + "/stream"))
    val mPinned = QualityClassifier.train(labeled, "doc_id", "text",
      col("lang") === "en")
    assert(mLanded == mPinned, "landing the stream must not change the weights")
    val idx = tmp + "/clf"
    ClfIndex.build(labeled, docs, "doc_id", "text", col("lang") === "en", idx,
      landStream = true)
    val served = ClfIndex.serve(spark, idx)
      .select(col("doc"), col("n_fbuckets"), col("clf_logit"), col("clf_prob"))
      .orderBy(col("doc")).collect().map(_.toSeq).toSeq
    assert(served == fromScratch(docs))
    // the tmpstream landing is torn down once the build completes
    assert(!Files.exists(java.nio.file.Paths.get(idx + "/tmpstream")),
      "build(landStream = true) must remove its tmpstream landing")
  }

  test("a changed labeled slice retrains loudly (kept = 0) and rescores everything") {
    val tmp = Files.createTempDirectory("clfidx2").toString
    val idx = tmp + "/clf"
    ClfIndex.build(labeled, docs, "doc_id", "text", col("lang") === "en", idx)
    val modelBefore = ClfIndex.loadModel(spark, idx)
    // flip half the good docs' labels: same rows, different supervision
    val flipped = docs.withColumn("lang",
      when(col("doc_id") < 20, lit("xx")).otherwise(col("lang")))
    val (kept, signed) = ClfIndex.refresh(flipped.filter(col("doc_id") < 300), flipped,
      "doc_id", "text", col("lang") === "en", idx)
    assert(kept == 0L && signed == flipped.count())
    assert(ClfIndex.loadModel(spark, idx) != modelBefore,
      "flipped labels must produce a different model")
  }

  test("upsert: unchanged re-delivery carries, changed text rescores, out-of-batch untouched") {
    val tmp = Files.createTempDirectory("clfidx3").toString
    val idx = tmp + "/clf"
    ClfIndex.build(labeled, docs, "doc_id", "text", col("lang") === "en", idx)
    val before = ClfIndex.serve(spark, idx).filter(col("doc") === 1L)
      .collect().head.toSeq
    val batch = docs.filter(col("doc_id").isin(0L, 2L))
      .withColumn("text", when(col("doc_id") === 2L,
        lit("completely different words now appear here together"))
        .otherwise(col("text")))
    val (carried, signedUp) = ClfIndex.upsert(batch, "doc_id", "text", idx)
    assert(carried == 1L && signedUp == 1L)
    assert(ClfIndex.serve(spark, idx).filter(col("doc") === 1L)
      .collect().head.toSeq == before, "out-of-batch row must carry byte-identical")
    // the rescored doc matches a from-scratch score of the new text
    // under the SAME pinned model
    val m = ClfIndex.loadModel(spark, idx)
    val want = QualityClassifier.score(
      batch.filter(col("doc_id") === 2L), "doc_id", "text", m)
      .collect().head.toSeq
    assert(ClfIndex.serve(spark, idx).filter(col("doc") === 2L)
      .select(col("doc"), col("n_fbuckets"), col("clf_logit"), col("clf_prob"))
      .collect().head.toSeq == want)
  }

  test("upsert/refresh refuse an unbuilt index with the routing message") {
    val tmp = Files.createTempDirectory("clfidx4").toString
    val e = intercept[IllegalArgumentException] {
      ClfIndex.upsert(docs, "doc_id", "text", tmp + "/nope")
    }
    assert(e.getMessage.contains("ClfIndex.build first"), e.getMessage)
  }

  test("streaming clfScoreSink: a batched feed converges to a one-shot build's scores") {
    val tmp = Files.createTempDirectory("clfidx5").toString
    val idx = tmp + "/clf"
    // the model pins at build over the labeled slice; the stream then
    // delta-scores the rest of the corpus under it
    val labeled2 = docs.filter(col("doc_id") < 120)
    ClfIndex.build(labeled2, labeled2, "doc_id", "text", col("lang") === "en", idx)
    val rest = docs.filter(col("doc_id") >= 120)
    val feed = tmp + "/feed"
    rest.collect().grouped(7).zipWithIndex.foreach { case (rows, i) =>
      rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSeq.toDF("doc_id", "lang", "text")
        .coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.clfScoreSink(idx, "doc_id", "text")(stream)
      .option("checkpointLocation", tmp + "/ckpt")
      .start()
    q.awaitTermination()
    val got = ClfIndex.serve(spark, idx)
      .select(col("doc"), col("n_fbuckets"), col("clf_logit"), col("clf_prob"))
      .orderBy(col("doc")).collect().map(_.toSeq).toSeq
    ClfIndex.build(labeled2, docs, "doc_id", "text", col("lang") === "en", tmp + "/scratch")
    val want = ClfIndex.serve(spark, tmp + "/scratch")
      .select(col("doc"), col("n_fbuckets"), col("clf_logit"), col("clf_prob"))
      .orderBy(col("doc")).collect().map(_.toSeq).toSeq
    assert(got == want && got.size == docs.count())
  }
}
