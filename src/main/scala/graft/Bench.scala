package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the scale factor in
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * A warmup pass (one small query + a scan of each input table) runs
  * before timing so the first measured query doesn't absorb JVM/codegen
  * warmup and file-footer reads. AQE is on; shuffle partitions match the
  * local core count rather than the 200 default.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table's footer + exercise codegen/shuffle paths
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q_customer_segments_active")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_ONLY") // debug: regex filter on query names
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.matches) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Session hygiene between queries — round-2 lesson: leftover cached
      // frames AND checkpoint/persisted RDDs (clearCache misses the
      // latter) compound in the old gen and made later queries run
      // 10-30x their isolated cost. Clear both, then GC, so each query
      // is measured against a clean heap — the bench must measure plans,
      // not accumulated session garbage.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also land the line in a file: stdout is shared with Spark/Ivy log
    // noise and the driver's scrape has come back "parsed": null before
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
