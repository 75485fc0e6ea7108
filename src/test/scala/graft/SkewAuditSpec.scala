package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join audit — the runtime half of the skew story.
  * `Skew.saltedJoin` is the plan-deterministic fix for skew the author
  * can SEE (a known hot key); AQE's skew-join split is the runtime fix
  * for skew nobody predicted. This spec machine-checks that the second
  * mechanism actually engages on our join shapes: a sort-merge join with
  * one dominant key, run under production-representative skew
  * thresholds, must come out of the adaptive replan with skew-split
  * partitions — and must return exactly the same rows.
  *
  * At 100 TB both mechanisms coexist: salting for the joins whose skew
  * is structural (a null-ish default key, one giant customer), AQE for
  * drift. If a Spark upgrade or a conf default silently disabled the
  * runtime path, this test fails instead of a production job.
  */
class SkewAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join at runtime; rows identical to the unsplit join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production-representative: the hot partition is "huge" relative to
    // the advisory size, as a 100x key would be at real scale
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep it sort-merge
    s2.conf.set("spark.sql.shuffle.partitions", "8")

    // 25% of fact rows share key 0 — the textbook hot key. Sizes matter
    // here: skew detection reads COMPRESSED map-output sizes, so the
    // hot partition must clear the byte threshold after lz4 (200k rows
    // with a repetitive payload does; a 20k-row version measured under
    // it and never split)
    val fact = s2.range(0, 200000, 1, 8)
      .select((when(col("id") % 4 =!= 0, col("id") % 97).otherwise(0L)).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
    val dim = s2.range(0, 97, 1, 8)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("d"))

    val joined = fact.join(dim, "k")
    // collect() drives THIS dataset's QueryExecution — count() would plan
    // a separate aggregate query and leave joined's adaptive plan
    // unexecuted (and so never replanned)
    val n = joined.collect().length

    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.contains("skew=true"),
      s"AQE must mark the skewed join split at runtime:\n$finalPlan")

    // identical result without the skew machinery
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.adaptive.enabled", "false")
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact3 = s3.range(0, 200000, 1, 8)
      .select((when(col("id") % 4 =!= 0, col("id") % 97).otherwise(0L)).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
    val dim3 = s3.range(0, 97, 1, 8)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("d"))
    assert(fact3.join(dim3, "k").collect().length == n,
      "skew split must not change the result")
  }
}
