package graft.harvest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage reconciliation: compare origin/destination file listings and
  * derive the transfer manifest (reference: sync_documents.py:214-231 —
  * `new = from∖to`, `existing = from∩to`, `delete = to∖from`).
  *
  * The reference does this with Python set loops in driver memory; here it
  * is two anti-joins and a semi-join, each a single hash-shuffle on the
  * file name — at 100 TB of listings this is the only formulation that
  * doesn't OOM a driver. Listing DataFrames are expected to carry a
  * `name` column (`<ntp_id>_<field>.<ext>` convention).
  */
object StorageSync {

  /** Manifest of operations: ADD (origin-only), DEL (dest-only),
    * KEEP (both). Mirrors the reference's patch_list DEL/UPD/ADD manifest
    * (sync_documents.py:233-242).
    */
  def reconcile(origin: DataFrame, dest: DataFrame): DataFrame = {
    val o = origin.select(col("name")).distinct()
    val d = dest.select(col("name")).distinct()
    val add = o.join(d, Seq("name"), "left_anti").select(lit("ADD").as("op"), col("name"))
    val del = d.join(o, Seq("name"), "left_anti").select(lit("DEL").as("op"), col("name"))
    val keep = o.join(d, Seq("name"), "left_semi").select(lit("KEEP").as("op"), col("name"))
    add.unionByName(del).unionByName(keep)
  }
}
