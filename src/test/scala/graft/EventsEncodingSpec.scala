package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's testdata generator has already changed `events.ts`'s
  * physical parquet encoding once (TIMESTAMP(NANOS) through round 9,
  * unadjusted TIMESTAMP(MICROS) since round 10), silently breaking every
  * nanos-pinned reader. This spec freezes the contract that
  * `SparkEntry.events` / `SparkEntry.eventsStream` are ENCODING-ADAPTIVE:
  * the same instants come back whatever representation the file carries.
  * Reference semantics anchor: ntp_utils.py:71-112 — parse_parquet accepts
  * upstream dtype drift; that tolerance is the capability under test.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  // three instants, microsecond precision (the finest any encoding keeps
  // after the nanos->micros truncation both engines apply)
  private val micros = Seq(1704067200000000L, 1704070800123456L, 1706745599999999L)

  /** Lay the frame down as a SINGLE file named events.parquet (the layout
    * eventsStream's pathGlobFilter expects).
    */
  private def writeEventsFile(df: DataFrame): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_enc").toString
    val stage = s"$tmp/_stage"
    df.coalesce(1).write.parquet(stage)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(stage).getFileSystem(hconf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$tmp/events.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    tmp
  }

  private def base = {
    import spark.implicits._
    micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, s"type$i", i * 1.5, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  // int64 column holding nanos — what nanosAsLong=true yields reading a
  // true TIMESTAMP(NANOS) file (Spark cannot WRITE nanos, so the long
  // column stands in for the post-read representation; same reader path)
  private lazy val nanosDir = writeEventsFile(
    base.withColumn("ts", col("us") * 1000L).drop("us"))
  // unadjusted micros -> parquet timestamp(us, isAdjustedToUTC=false),
  // read back as TIMESTAMP_NTZ (the round-10+ testdata shape)
  private lazy val ntzDir = writeEventsFile(
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us"))
  // adjusted micros -> timestamp(us, isAdjustedToUTC=true), read back as
  // TIMESTAMP (LTZ) — the third shape a generator could emit
  private lazy val ltzDir = writeEventsFile(
    base.withColumn("ts", timestamp_micros(col("us"))).drop("us"))

  private def instants(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("batch events() decodes all three ts encodings to identical instants") {
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    for ((dir, tag) <- Seq((nanosDir, "nanos-long"), (ntzDir, "micros-ntz"), (ltzDir, "micros-ltz"))) {
      val df = SparkEntry.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"$tag: ts must normalize to TIMESTAMP")
      assert(instants(df) == expected, s"$tag: instants drifted")
    }
  }

  test("eventsStream matches batch events() on every encoding") {
    for ((dir, tag) <- Seq((nanosDir, "nanos-long"), (ntzDir, "micros-ntz"), (ltzDir, "micros-ltz"))) {
      val sink = s"enc_sink_${tag.replace('-', '_')}"
      spark.catalog.dropTempView(sink)
      val q = SparkEntry.eventsStream(spark, dir)
        .writeStream.format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = instants(spark.table(sink))
      val want = instants(SparkEntry.events(spark, dir))
      spark.catalog.dropTempView(sink)
      assert(got == want, s"$tag: stream decode != batch decode")
    }
  }

  test("decodeEventsTs rejects an unsupported encoding loudly") {
    import spark.implicits._
    val bogus = Seq(("x", "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](SparkEntry.decodeEventsTs(bogus))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }

  test("SchemaAudit surfaces exactly the ts drift this spec exists for") {
    // the round-10 incident: same columns, ts retyped nanos-long -> ntz
    val d = graft.lake.SchemaAudit.diffPaths(spark, nanosDir, ntzDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(d.toSeq == Seq(("ts", "retyped", "bigint", "timestamp_ntz")))
    // identical schemas diff empty; added/removed classified
    assert(graft.lake.SchemaAudit.diffPaths(spark, ntzDir, ntzDir).isEmpty)
    import org.apache.spark.sql.types._
    val before = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val after = StructType(Seq(StructField("a", DoubleType), StructField("c", StringType)))
    val d2 = graft.lake.SchemaAudit.diff(spark, before, after)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d2 == Set(("b", "removed"), ("c", "added"), ("a", "retyped")))
  }

  test("SchemaAudit does not collapse duplicate field names (legal in parquet)") {
    import org.apache.spark.sql.types._
    // 'a' appears twice; only the FIRST occurrence drifts — a toMap-based
    // diff would keep the last one and report nothing
    val before = StructType(Seq(
      StructField("a", LongType), StructField("a", StringType)))
    val after = StructType(Seq(
      StructField("a", DoubleType), StructField("a", StringType)))
    val d = graft.lake.SchemaAudit.diff(spark, before, after)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(d.toSeq == Seq(("a", "retyped", "bigint | string", "double | string")))
    // duplicate-count change also surfaces
    val widened = StructType(Seq(StructField("a", LongType)))
    val d2 = graft.lake.SchemaAudit.diff(spark, before, widened)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(d2.toSeq == Seq(("retyped", "bigint | string", "bigint")))
  }
}
