package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-location story (SURVEY §7.8): repeatedly-joined tables
  * are bucketed on the join key so the join runs exchange-free — the
  * shuffle is paid once at write time, not per query.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-by-key tables join with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.read.parquet(s"$dir/orders.parquet").write
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      spark.read.parquet(s"$dir/customer.parquet").write
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))

      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // only the final groupBy may shuffle — the join itself is co-located
      assert(shuffles.length <= 1,
        s"expected bucketed join without exchange, got ${shuffles.length} shuffles")

      // and the result matches the unbucketed plan
      val plain = spark.read.parquet(s"$dir/customer.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("c_mktsegment").collect().toSeq ==
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
