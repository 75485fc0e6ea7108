package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Field-level schema drift audit between two parquet datasets — the
  * operational guard the events `ts` incident motivates (an upstream
  * generator silently moved TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) and
  * every pinned reader broke): diff the LOADED schemas of the previous
  * and current drop BEFORE a pipeline run, and gate or adapt on the
  * result instead of discovering the drift as analysis errors mid-job.
  * Reference semantics anchor: ntp_utils.py:71-112 — parse_parquet
  * tolerates upstream dtype drift per field; this is the audit that
  * makes such tolerance observable.
  *
  * Footer-only: one schema read per side (O(1), no data IO), the diff
  * is driver-side over field lists — field counts, not row counts.
  */
object SchemaAudit {

  /** Diff `before`'s schema against `after`'s: one row per added,
    * removed or retyped field, (field, change, from_type, to_type);
    * nested fields are compared by their full JSON type (a retyped
    * struct member surfaces as a retype of the enclosing field).
    */
  def diff(spark: SparkSession, before: StructType, after: StructType): DataFrame = {
    import spark.implicits._
    // group (not toMap): duplicate field names are legal in parquet and
    // must not be collapsed — duplicated names diff positionally over
    // their ordered type lists, so drift inside the duplicates surfaces
    def byName(s: StructType): Map[String, Seq[String]] =
      s.fields.groupBy(_.name).view.mapValues(_.map(_.dataType.simpleString).toSeq).toMap
    val b = byName(before)
    val a = byName(after)
    def show(ts: Seq[String]): String = ts.mkString(" | ")
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(n =>
        (n, "removed", show(b(n)), null: String)) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(n =>
        (n, "added", null: String, show(a(n)))) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case n if b(n) != a(n) => (n, "retyped", show(b(n)), show(a(n)))
      }
    rows.toDF("field", "change", "from_type", "to_type")
  }

  /** [[diff]] over two parquet paths (footer reads only). */
  def diffPaths(spark: SparkSession, beforePath: String, afterPath: String): DataFrame =
    diff(spark, spark.read.parquet(beforePath).schema,
      spark.read.parquet(afterPath).schema)
}
