package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TextAnalysis, TextIndex}

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "esto es un texto en castellano sobre contratos",
    3L -> "short",
    4L -> "the data lake holds many documents for the training run")

  test("refresh carries unchanged rows verbatim and signs only churn") {
    val tmp = Files.createTempDirectory("txtidx").toString
    val idx = tmp + "/stats"
    assert(TextIndex.build(corpus(base.take(3): _*), "doc_id", "text", idx) == 3L)
    // sentinel: corrupt doc 1's landed quality; a refresh that re-signs
    // unchanged docs would silently repair it — carry-verbatim keeps it
    val doctored = spark.read.parquet(idx)
      .withColumn("quality", when(col("doc") === 1L, lit(-9.0)).otherwise(col("quality")))
    doctored.write.mode("overwrite").parquet(tmp + "/stage")
    spark.read.parquet(tmp + "/stage").write.mode("overwrite").parquet(idx)
    val changed = base.toMap ++ Map(3L -> "short but now changed", 5L -> "a brand new doc")
    val (kept, signed) = TextIndex.refresh(
      corpus(changed.toSeq.sortBy(_._1): _*), "doc_id", "text", idx)
    assert(kept == 2L && signed == 3L) // 1,2 carried; 3 changed, 4+5 new-to-index
    val served = TextIndex.serve(spark, idx).orderBy("doc").collect()
    assert(served.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(served.head.getDouble(4) == -9.0, "unchanged doc 1 must carry verbatim")
    // stats agree with the one-shot kernels for a signed doc
    val row5 = served.find(_.getLong(0) == 5L).get
    val fresh = corpus(5L -> "a brand new doc")
      .select(size(TextAnalysis.tokens(col("text"))).cast("long"),
        TextAnalysis.qualityScore(col("text")), TextAnalysis.langId(col("text")))
      .collect().head
    assert(row5.getLong(2) == fresh.getLong(0))
    assert(row5.getDouble(4) == fresh.getDouble(1))
    assert(row5.getString(5) == fresh.getString(2))
  }

  test("streaming textIndexSink: a batched feed converges to the from-scratch stats") {
    val tmp = Files.createTempDirectory("txtidx3").toString
    val feed = tmp + "/feed"
    val idx = tmp + "/stats"
    base.grouped(2).zipWithIndex.foreach { case (docs, i) =>
      corpus(docs: _*).coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(corpus(base.head).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.textIndexSink(idx, "doc_id", "text")(stream)
      .option("checkpointLocation", tmp + "/ckpt")
      .start()
    q.awaitTermination()
    val got = TextIndex.serve(spark, idx).orderBy("doc").collect().map(_.toSeq).toSeq
    TextIndex.build(corpus(base: _*), "doc_id", "text", tmp + "/scratch")
    val want = TextIndex.serve(spark, tmp + "/scratch").orderBy("doc")
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 4)
  }

  test("upsert is batch-scoped: out-of-batch rows untouched, vanished docs kept") {
    val tmp = Files.createTempDirectory("txtidx2").toString
    val idx = tmp + "/stats"
    TextIndex.build(corpus(base: _*), "doc_id", "text", idx)
    val (kept, signed) = TextIndex.upsert(
      corpus(1L -> base.head._2, 3L -> "replaced text entirely"), "doc_id", "text", idx)
    assert(kept == 1L && signed == 1L)
    val served = TextIndex.serve(spark, idx).orderBy("doc").collect()
    assert(served.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      "docs outside the batch survive an upsert")
  }
}
