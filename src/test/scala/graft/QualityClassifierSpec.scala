package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualityClassifier

/** The trained quality classifier: class separation on a planted
  * two-class fixture, determinism across runs, the hard-sigmoid grid
  * contract, and evidence-free docs dropping out.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted two-class fixture: "good" docs draw bigrams from an
  // English-ish vocabulary, "bad" docs from a disjoint junk vocabulary;
  // a classifier that separates them must do it from the hashed-bigram
  // evidence alone (labels are only 1/0 on the training rows)
  private lazy val fixture = {
    val good = (0 until 40).map { i =>
      (i.toLong, 1, s"the quick brown fox jumps over the lazy dog number $i " +
        "and the clean corpus keeps growing with careful words")
    }
    val bad = (100 until 140).map { i =>
      (i.toLong, 0, s"zzz$i spam spam casino jackpot winner click here " +
        "buy cheap pills casino jackpot spam offer expires")
    }
    (good ++ bad).toDF("doc_id", "label", "text")
  }

  test("the trained model separates the planted classes completely") {
    val m = QualityClassifier.train(fixture, "doc_id", "text", col("label") === 1)
    val scored = QualityClassifier.score(fixture, "doc_id", "text", m)
      .join(fixture.select(col("doc_id").as("doc"), col("label")), Seq("doc"))
      .select(col("doc"), col("label"), col("clf_prob")).collect()
    val goodP = scored.filter(_.getInt(1) == 1).map(_.getLong(2))
    val badP = scored.filter(_.getInt(1) == 0).map(_.getLong(2))
    assert(goodP.nonEmpty && badP.nonEmpty)
    assert(goodP.min > badP.max,
      s"no separation: min(good)=${goodP.min} <= max(bad)=${badP.max}")
    // and the halving lattice bounds every weight
    assert(m.values.forall(w => math.abs(w) <= QualityClassifier.Steps.sum))
  }

  test("training is deterministic: identical model across two runs") {
    val m1 = QualityClassifier.train(fixture, "doc_id", "text", col("label") === 1)
    val m2 = QualityClassifier.train(
      fixture.repartition(7), "doc_id", "text", col("label") === 1)
    assert(m1 == m2, "model must not depend on partitioning or run order")
  }

  test("probabilities sit on the clamped 10^6 grid; logit is the mean bucket weight") {
    val m = QualityClassifier.train(fixture, "doc_id", "text", col("label") === 1)
    val s = QualityClassifier.score(fixture, "doc_id", "text", m).collect()
    s.foreach { r =>
      val z = r.getLong(2); val p = r.getLong(3)
      assert(p >= 0L && p <= QualityClassifier.Scale)
      val expect = math.max(0L, math.min(QualityClassifier.Scale,
        Math.floorDiv(z, 4L) + QualityClassifier.Scale / 2))
      assert(p == expect, s"hard sigmoid mismatch at z=$z: $p != $expect")
    }
  }

  test("cli clf: train + score lands the scored parquet") {
    val root = java.nio.file.Files.createTempDirectory("graft_clf_cli").toString
    fixture.withColumn("lang", when(col("label") === 1, "en").otherwise("xx"))
      .write.parquet(root + "/docs")
    graft.cli.Main.run(spark, "clf", Array(
      "--in", root + "/docs", "--out", root + "/scores"))
    val scored = spark.read.parquet(root + "/scores")
    assert(scored.count() == fixture.count())
    assert(scored.columns.toSet == Set("doc", "n_fbuckets", "clf_logit", "clf_prob"))
  }

  test("docs with < 2 tokens carry no features and drop out") {
    val df = Seq((1L, 1, "single"), (2L, 0, ""), (3L, 1, "two tokens here")).toDF("doc_id", "label", "text")
    val m = QualityClassifier.train(df, "doc_id", "text", col("label") === 1)
    val s = QualityClassifier.score(df, "doc_id", "text", m)
    assert(s.select("doc").as[Long].collect().toSet == Set(3L))
  }
}
