package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PostingsIndex, Relevance}

class PostingsIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val base = Seq(
    1L -> "spark stream merge spark spark vector",
    2L -> "vector vector merge and some other words",
    3L -> "no query terms here at all",
    4L -> "", // empty doc: counts toward N with dl=0, like the recompute
    5L -> "stream stream stream merge spark")

  private val terms = Seq("spark", "vector", "merge", "stream")

  test("indexed probe is bit-identical to the tokenize-per-query recompute") {
    val tmp = Files.createTempDirectory("postidx").toString
    val idx = tmp + "/bm25"
    assert(PostingsIndex.build(corpus(base: _*), "doc_id", "text", idx) == 5L)
    val direct = Relevance.bm25(corpus(base: _*), "doc_id", "text", terms)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val indexed = PostingsIndex.bm25(spark, idx, terms)
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(indexed.toSeq == direct.toSeq) // exact doubles, not approx
  }

  test("refresh carries unchanged docs verbatim and signs only churn") {
    val tmp = Files.createTempDirectory("postidx2").toString
    val idx = tmp + "/bm25"
    PostingsIndex.build(corpus(base.take(3): _*), "doc_id", "text", idx)
    // sentinel: doctor doc 1's landed tf for 'spark'; a refresh that
    // re-tokenized unchanged docs would silently repair it
    val doctored = spark.read.parquet(s"$idx/postings")
      .withColumn("tf", when(col("doc") === 1L && col("tok") === "spark", lit(99L))
        .otherwise(col("tf")))
    doctored.write.mode("overwrite").parquet(tmp + "/stage")
    spark.read.parquet(tmp + "/stage").write.mode("overwrite").parquet(s"$idx/postings")
    val changed = base.toMap ++ Map(3L -> "now it says spark", 6L -> "merge doc")
    val (kept, signed) = PostingsIndex.refresh(
      corpus(changed.toSeq.sortBy(_._1): _*), "doc_id", "text", idx)
    assert(kept == 2L && signed == 4L) // 1,2 carried; 3 changed, 4,5,6 new-to-index
    val tf1 = PostingsIndex.servePostings(spark, idx)
      .filter(col("doc") === 1L && col("tok") === "spark").collect()
    assert(tf1.head.getLong(2) == 99L, "unchanged doc 1's postings must carry verbatim")
    // vanished docs drop: refresh to a 2-doc corpus
    val (k2, s2) = PostingsIndex.refresh(corpus(base.take(2): _*), "doc_id", "text", idx)
    assert(k2 == 2L && s2 == 0L)
    assert(PostingsIndex.serveDocLen(spark, idx).count() == 2L)
  }

  test("streaming postingsIndexSink: a batched feed converges to the from-scratch index") {
    val tmp = Files.createTempDirectory("postidx4").toString
    val feed = tmp + "/feed"
    val idx = tmp + "/bm25"
    base.grouped(2).zipWithIndex.foreach { case (docs, i) =>
      corpus(docs: _*).coalesce(1).write.parquet(s"$feed/b$i")
    }
    val stream = spark.readStream
      .schema(corpus(base.head).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feed/*")
    val q = graft.streaming.EventStreams.postingsIndexSink(idx, "doc_id", "text")(stream)
      .option("checkpointLocation", tmp + "/ckpt")
      .start()
    q.awaitTermination()
    val got = PostingsIndex.bm25(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    PostingsIndex.build(corpus(base: _*), "doc_id", "text", tmp + "/scratch")
    val want = PostingsIndex.bm25(spark, tmp + "/scratch", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("upsert is batch-scoped: out-of-batch docs untouched") {
    val tmp = Files.createTempDirectory("postidx5").toString
    val idx = tmp + "/bm25"
    PostingsIndex.build(corpus(base: _*), "doc_id", "text", idx)
    val (kept, signed) = PostingsIndex.upsert(
      corpus(1L -> base.head._2, 3L -> "replaced text entirely"), "doc_id", "text", idx)
    assert(kept == 1L && signed == 1L)
    assert(PostingsIndex.serveDocLen(spark, idx).orderBy("doc")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "docs outside the batch survive an upsert")
  }

  test("cli bm25 build/refresh/probe round-trips") {
    val tmp = Files.createTempDirectory("postcli").toString
    corpus(base.take(3): _*).write.parquet(tmp + "/in1")
    corpus(base: _*).write.parquet(tmp + "/in2")
    graft.cli.Main.run(spark, "bm25", Array(
      "--op", "build", "--path", tmp + "/idx", "--id", "doc_id", "--in", tmp + "/in1"))
    graft.cli.Main.run(spark, "bm25", Array(
      "--op", "refresh", "--path", tmp + "/idx", "--id", "doc_id", "--in", tmp + "/in2"))
    graft.cli.Main.run(spark, "bm25", Array(
      "--op", "probe", "--path", tmp + "/idx",
      "--terms", terms.mkString(","), "--out", tmp + "/scores"))
    val got = spark.read.parquet(tmp + "/scores")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val want = Relevance.bm25(corpus(base: _*), "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("probe plan reads the index, never the corpus parquet") {
    val tmp = Files.createTempDirectory("postidx3").toString
    val idx = tmp + "/bm25"
    val corpusPath = tmp + "/documents.parquet"
    corpus(base: _*).write.parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    PostingsIndex.build(docs, "doc_id", "text", idx)
    val probe = PostingsIndex.bm25(spark, idx, terms)
    val scans = probe.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(_.contains("postings")) && scans.exists(_.contains("doclen")))
    assert(!scans.exists(_.contains("documents.parquet")),
      "an indexed probe must not re-read the corpus text")
  }

  test("landMany atomicity: a failing staging write leaves the live index fully intact") {
    import graft.lake.Staged
    val tmp = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = tmp + "/bm25"
    PostingsIndex.build(corpus(base: _*), "doc_id", "text", idx)
    val before = PostingsIndex.bm25(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // a swap whose SECOND table's write blows up mid-staging: the live
    // root must stay untouched — both tables, not just the first
    val boom = corpus(base: _*).select(col("doc_id"),
      expr("raise_error('staged write dies')").as("x"))
    intercept[Exception] {
      Staged.landMany(spark, idx, Seq(
        "postings" -> corpus(base: _*).select(col("doc_id").as("doc"),
          lit("tok").as("tok"), lit(1L).as("tf")),
        "doclen" -> boom))
    }
    val after = PostingsIndex.bm25(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(after == before, "a failed staging write must not touch the served index")
  }
}
