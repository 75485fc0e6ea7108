package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{CdcConsumer, SnapshotLake}

class CdcConsumerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("cdccons").toString

  private def mkLake(root: String): SnapshotLake = {
    val lake = new SnapshotLake(spark, s"$root/lake", "id")
    lake.overwrite((1 to 20).map(i => (i.toString, i * 10L)).toDF("id", "v"))
    lake
  }

  test("caught-up consumer delivers nothing; each commit delivers one interval") {
    val root = tmp()
    val lake = mkLake(root)
    val c = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    assert(c.poll((_, _, _) => fail("must not deliver")) == None)
    lake.upsert(Seq(("3", 999L), ("21", 210L)).toDF("id", "v")) // v2
    var got: Seq[(String, Long, String)] = Nil
    assert(c.poll((df, f, t) => {
      assert((f, t) == ((1L, 2L)))
      got = df.select(col("id"), coalesce(col("v"), lit(-1L)), col("change_type"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    }) == Some((1L, 2L)))
    assert(got.toSet == Set(("3", 999L, "update_post"), ("3", 30L, "update_pre"),
      ("21", 210L, "insert")))
    assert(c.poll((_, _, _) => fail("must not redeliver")) == None)
    assert(c.offset == 2L)
  }

  test("catch-up poll collapses multiple commits into one net interval") {
    val root = tmp()
    val lake = mkLake(root)
    val c = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    lake.upsert(Seq(("5", 1L)).toDF("id", "v"))   // v2
    lake.upsert(Seq(("5", 2L)).toDF("id", "v"))   // v3
    lake.deleteWhere(col("id") === "7")           // v4
    var n = 0
    assert(c.poll((df, f, t) => {
      assert((f, t) == ((1L, 4L)))
      val rows = df.collect().map(r => (r.getString(0), r.getString(2))).toSet
      // intermediate v2 state collapses: one net update for key 5
      assert(rows == Set(("5", "update_post"), ("5", "update_pre"), ("7", "delete")))
      n += 1
    }) == Some((1L, 4L)))
    assert(n == 1)
  }

  test("a fresh consumer on the same offset dir resumes, not replays") {
    val root = tmp()
    val lake = mkLake(root)
    val c1 = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    lake.upsert(Seq(("2", 0L)).toDF("id", "v")) // v2
    assert(c1.poll((_, _, _) => ()) == Some((1L, 2L)))
    lake.upsert(Seq(("4", 0L)).toDF("id", "v")) // v3
    val c2 = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    assert(c2.offset == 2L)
    assert(c2.poll((_, _, _) => ()) == Some((2L, 3L)))
    assert(c2.poll((_, _, _) => ()) == None)
  }

  test("offset claims are create-exclusive: the loser of a racing advance throws, never double-claims") {
    val root = tmp()
    val lake = mkLake(root)
    lake.upsert(Seq(("6", 0L)).toDF("id", "v")) // v2
    val c1 = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    val c2 = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    assert(c1.poll((_, _, _) => ()) == Some((1L, 2L)))
    // a racer that read offset=1 BEFORE c1's claim landed would now try
    // to claim version 2 itself — the create-exclusive file makes that
    // second claim throw instead of silently double-advancing
    intercept[java.io.IOException](c2.commitOffset(2L))
    // and a fresh poll through the public API sees the new offset: no
    // redelivery, no error
    assert(c2.offset == 2L)
    assert(c2.poll((_, _, _) => fail("caught up consumer must not deliver")) == None)
  }

  test("pruneOffsets drops claim history without moving the offset") {
    val root = tmp()
    val lake = mkLake(root)
    val c = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    lake.upsert(Seq(("2", 0L)).toDF("id", "v"))
    assert(c.poll((_, _, _) => ()).isDefined)
    lake.upsert(Seq(("4", 0L)).toDF("id", "v"))
    assert(c.poll((_, _, _) => ()).isDefined)
    assert(c.offset == 3L)
    assert(c.pruneOffsets() == 1) // the v2 claim goes, the v3 claim stays
    assert(c.offset == 3L)
    assert(c.pruneOffsets() == 0)
    lake.upsert(Seq(("6", 0L)).toDF("id", "v"))
    assert(c.poll((_, _, _) => ()) == Some((3L, 4L)), "consumption continues after pruning")
  }

  test("a handler failure leaves the offset unmoved (redelivery on next poll)") {
    val root = tmp()
    val lake = mkLake(root)
    val c = new CdcConsumer(lake, s"$root/off", startVersion = 1L)
    lake.upsert(Seq(("9", 0L)).toDF("id", "v")) // v2
    intercept[RuntimeException](c.poll((_, _, _) => throw new RuntimeException("sink down")))
    assert(c.offset == 1L)
    assert(c.poll((_, _, _) => ()) == Some((1L, 2L)))
  }
}
