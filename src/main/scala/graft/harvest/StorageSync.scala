package graft.harvest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage reconciliation: compare origin/destination file listings and
  * derive the transfer manifest (reference: sync_documents.py:214-231 —
  * `new = from∖to`, `existing = from∩to`, `delete = to∖from`).
  *
  * The reference does this with Python set loops in driver memory; here
  * both listings are tagged with a side marker, unioned, and aggregated
  * once on the file name: min/max of the side marker says whether a name
  * appears in origin only (ADD), dest only (DEL), or both (KEEP). ONE
  * hash-shuffle and one scan per listing — at 100 TB of listings this is
  * the only formulation that doesn't OOM a driver, and the groupBy
  * absorbs duplicate names without separate `distinct` passes. Listing
  * DataFrames are expected to carry a `name` column
  * (`<ntp_id>_<field>.<ext>` convention).
  */
object StorageSync {

  /** Manifest of operations: ADD (origin-only), DEL (dest-only),
    * KEEP (both). Mirrors the reference's patch_list DEL/UPD/ADD manifest
    * (sync_documents.py:233-242).
    */
  def reconcile(origin: DataFrame, dest: DataFrame): DataFrame = {
    // listings never legitimately carry null names; drop them rather than
    // let groupBy collapse nulls from both sides into one bogus KEEP row
    // (the earlier anti/semi-join form silently classified them ADD+DEL)
    val tagged = origin.select(col("name"), lit(1).as("__side"))
      .unionByName(dest.select(col("name"), lit(2).as("__side")))
      .filter(col("name").isNotNull)
    tagged.groupBy(col("name"))
      .agg(min(col("__side")).as("__lo"), max(col("__side")).as("__hi"))
      .select(
        when(col("__lo") === 1 && col("__hi") === 2, lit("KEEP"))
          .when(col("__hi") === 1, lit("ADD"))
          .otherwise(lit("DEL")).as("op"),
        col("name"))
  }
}
