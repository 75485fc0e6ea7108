package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{NtpIds, TimeFns}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ntp id round-trip and group partition (F1-F4)") {
    val df = Seq(42L, 9999999L, 10000012L).toDF("order")
      .withColumn("_id", NtpIds.setNtpId(col("order")))
      .withColumn("back", NtpIds.parseNtpId(col("_id")))
      .withColumn("ok", NtpIds.checkNtpId(col("_id")))
      .withColumn("grp", NtpIds.group(col("_id")))
    val rows = df.orderBy("order").collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq ==
      Seq("ntp00000042", "ntp09999999", "ntp10000012"))
    assert(rows.forall(r => r.getAs[Long]("back") == r.getAs[Long]("order")))
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.map(_.getAs[Int]("grp")).toSeq == Seq(0, 0, 1))
  }

  test("string ordering of zero-padded ids matches numeric ordering") {
    val ids = Seq(3L, 17L, 9999999L, 10000001L).map(o => f"ntp$o%08d")
    assert(ids.sorted == ids)
  }

  test("id from file name + file name composition (F11, F12)") {
    val df = Seq(("ntp00000042", "Pliego", "pdf")).toDF("id", "field", "ext")
      .withColumn("name", NtpIds.fileName(col("id"), col("field"), col("ext")))
      .withColumn("back", NtpIds.idFromFileName(col("name")))
    val r = df.collect().head
    assert(r.getAs[String]("name") == "ntp00000042_Pliego.pdf")
    assert(r.getAs[String]("back") == "ntp00000042")
  }

  test("inRange with open ends (P7)") {
    val df = Seq("ntp00000005", "ntp00000500").toDF("id")
    assert(df.filter(NtpIds.inRange(col("id"), Some("ntp00000001"), None)).count() == 2)
    assert(df.filter(NtpIds.inRange(col("id"), None, Some("ntp00000010"))).count() == 1)
    assert(df.filter(NtpIds.inRange(col("id"), Some("ntp00000600"), None)).count() == 0)
  }

  test("merge_updates: union + dedupe + sort, 19-char canon (A9, F6, F21)") {
    val df = Seq((
      Seq("2024-01-02 10:00:00", "2024-01-01 09:00:00"),
      Seq("2024-01-01 09:00:00", "2024-03-01 00:00:01")))
      .toDF("a", "b")
      .withColumn("merged", TimeFns.mergeUpdates(col("a"), col("b")))
      .withColumn("overlap", TimeFns.updatesOverlap(col("a"), col("b")))
    val r = df.collect().head
    assert(r.getAs[scala.collection.Seq[String]]("merged") ==
      Seq("2024-01-01 09:00:00", "2024-01-02 10:00:00", "2024-03-01 00:00:01"))
    assert(r.getAs[Boolean]("overlap"))
  }

  test("canon truncates to 19 chars") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 09:00:00.123456")).toDF("ts")
      .select(TimeFns.canon(col("ts")).as("c"))
    assert(df.collect().head.getString(0) == "2024-01-01 09:00:00")
  }
}
