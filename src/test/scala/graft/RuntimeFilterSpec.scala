package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (bloom) filter eligibility audit. At 100 TB the win for a
  * selective-dim shuffle join is Spark's InjectRuntimeFilter: a bloom
  * filter built from the filtered creation side is pushed into the fact
  * side's scan, so the shuffle carries only rows whose keys might match
  * — semi-join reduction without a second authored pass. The optimizer
  * only fires when the fact scan is big (applicationSideScanSizeThreshold,
  * default 10 GB) and the dim is small-after-filter, i.e. exactly the
  * production shape and never the local test shape. These tests pin BOTH
  * sides of that gate:
  *  1. under production-representative thresholds our q21-style
  *     filtered-orders⨝lineitem join DOES get a bloom probe on the fact
  *     scan — the query shapes keep their join keys bare (no casts or
  *     expressions that would disqualify the rewrite);
  *  2. at local scale with default thresholds nothing is injected — the
  *     bench never silently times bloom-build overhead.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("filtered-dim shuffle join injects a bloom probe on the fact scan at production thresholds") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // production-representative: any fact scan qualifies, dim stays under
    // the creation-side cap (it is, at any sf — the filter is selective)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
    val o = s2.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val l = s2.read.parquet(s"$sfDir/lineitem.parquet")
    val q = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"runtime bloom filter must inject into the fact side:\n$plan")
    // and it must not break the result
    assert(q.count() > 0)
  }

  test("default thresholds leave local-scale plans untouched (no hidden bloom-build cost in the bench)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = s2.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val l = s2.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("might_contain"),
      "a 6k-row fact scan must not pay a bloom build under default thresholds")
  }
}
