package graft.versions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequential surrogate-id assignment (SURVEY §2.6 W1 — the one genuinely
  * custom physical concern).
  *
  * The reference assigns ids serially in a driver loop (`id_num + 1`,
  * reference: read_parquet.py:108-110); its deprecated PySpark path used
  * `row_number().over(Window.orderBy(lit('A')))` — a single-partition
  * global sort that cannot scale (reference:
  * OLD/read_parquet_spark.py.deprecated:127-128).
  *
  * Here: range-partition by the ordering key, sort within partitions, and
  * `zipWithIndex` — RDD indexing is partition-major, and range
  * partitioning makes partition order = global order, so the result is
  * contiguous ids in key order with NO single-partition stage. For a
  * unique ordering key the numbering is deterministic under retries
  * (ties would be boundary-dependent — callers must order by a key).
  *
  * Contiguity is load-bearing: the id space is partitioned by group
  * (insiders/outsiders from 0, minors from 10M — ntp_constants.py:23-27),
  * so each group is numbered independently from its own watermark.
  */
object IdAssign {

  /** Append a contiguous `seq` column = startFrom, startFrom+1, ... in
    * ascending `orderCol` order.
    */
  def assignSequential(df: DataFrame, orderCol: String, startFrom: Long,
                       numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema.add("seq", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startFrom + i))
    }
    spark.createDataFrame(rdd, schema)
  }
}
