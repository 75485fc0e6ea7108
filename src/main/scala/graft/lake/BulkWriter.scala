package graft.lake

import org.apache.spark.sql.DataFrame

/** Batched side-effect sink (SURVEY §2.2 K2): the reference buffers
  * UpdateOne/DeleteOne ops and flushes `bulk_write(ordered=False)` when the
  * buffer fills (reference: mmb_data/mongo_db_bulk_write.py:17-108).
  *
  * For file sinks `df.write` already batches; this is the
  * `foreachPartition` shape for EXTERNAL side-effect stores: one
  * connection per partition, rows buffered to `batchSize`, flushed
  * unordered, final partial flush on exhaust. The flush function is
  * injected so the library stays storage-agnostic (and testable without a
  * live store).
  */
object BulkWriter {

  /** Returns the number of flush calls (via an accumulator) for
    * observability — the reference logs the same counters.
    */
  def writeBatched[T](df: DataFrame, batchSize: Int)(
      flush: Seq[org.apache.spark.sql.Row] => Unit): Long = {
    val flushes = df.sparkSession.sparkContext.longAccumulator("bulk_flushes")
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](batchSize)
      it.foreach { r =>
        buf += r
        if (buf.length >= batchSize) { flush(buf.toSeq); flushes.add(1); buf.clear() }
      }
      if (buf.nonEmpty) { flush(buf.toSeq); flushes.add(1) }
    }
    flushes.value
  }
}
