package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.versions.Versions

/** Lake maintenance: repoint stale tombstone pointers to their key's
  * current active version (reference:
  * checking/check_versions_completness.py:86-117, which repairs the live
  * DB the same way per-row).
  *
  * Incremental ingest carries prior tombstones forward untouched, so a
  * tombstone's `updated_to` goes one hop stale every time its key
  * versions again — readers recover the truth through chain resolution
  * (J3), but the operational loop the reference closes with its checking
  * script is rewriting the pointers at rest. Actions mirror the
  * reference: REPOINTED (an active head exists — pointer rewritten),
  * NO_ACTIVE (the key currently has no active version), NOT_IN_LEGACY
  * (the dangling target is unknown to the optional legacy lookup).
  *
  * Set-level and partition-scoped: one anti-join finds the stale set
  * (pointer does not hit an active id), one key join resolves the new
  * head, and the rewrite lands through the partition-scoped `upsert`
  * path — repaired rows carry their `grp`/`bucket` columns, so only the
  * buckets holding stale tombstones are rewritten. At 100 TB a repair
  * pass after N drops moves the stale slice, not the lake.
  */
object RepairJob {

  /** Repair the lake's tombstone pointers in place.
    *
    * @param naturalId natural-key column of the lake rows
    * @param legacy    optional legacy lookup (J7 semantics): rows with at
    *                  least (`_id`, naturalId); consulted for stale
    *                  tombstones whose own key has no active version —
    *                  the dangling TARGET id is looked up there and its
    *                  key's active adopted (reference:
    *                  check_versions_completness.py:100-117)
    * @return report, one row per stale tombstone:
    *         (_id, nk, old_to, new_to, action) — materialized before any
    *         rewrite so it survives the touched buckets being replaced
    */
  def run(spark: SparkSession, lake: LakeTable, naturalId: String,
          legacy: Option[DataFrame] = None): DataFrame = lake.locked {
    val state = lake.read
    val actives = state.filter(col("obsolete_version").isNull)
      .select(col("_id").as("__aid"), col(naturalId).as("__ank"))
    val tombs = state.filter(col("obsolete_version") === true)

    // stale = the pointer does not hit an active id (one anti-join)
    val stale = tombs.select(col("_id"), col(naturalId), col("updated_to"))
      .join(actives.select(col("__aid")), col("updated_to") === col("__aid"), "left_anti")

    // primary repair: the tombstone's own key still has an active head
    val byKey = stale.join(actives, col(naturalId) === col("__ank"), "left_outer")
    val inLake = byKey.filter(col("__aid").isNotNull)
      .select(col("_id"), col(naturalId).as("nk"), col("updated_to").as("old_to"),
        col("__aid").as("new_to"), lit("REPOINTED").as("action"))

    // J7 arm: key has no active — look the dangling TARGET up in legacy
    val unresolved = byKey.filter(col("__aid").isNull)
      .select(col("_id"), col(naturalId), col("updated_to"))
    val viaLegacy = legacy match {
      case Some(lg) =>
        val rl = Versions.recoverLegacy(
          unresolved.select(col("updated_to").as("_id")).distinct(),
          lg, state.filter(col("obsolete_version").isNull), "_id", naturalId)
          .select(col("_id").as("__tgt"), col("updated_to").as("__new"),
            col("action").as("__act"))
        unresolved.join(rl, col("updated_to") === col("__tgt"), "left_outer")
          .select(col("_id"), col(naturalId).as("nk"), col("updated_to").as("old_to"),
            col("__new").as("new_to"),
            coalesce(col("__act"), lit("NOT_IN_LEGACY")).as("action"))
      case None =>
        unresolved.select(col("_id"), col(naturalId).as("nk"),
          col("updated_to").as("old_to"), lit(null).cast("string").as("new_to"),
          lit("NO_ACTIVE").as("action"))
    }

    // materialize the report BEFORE the rewrite: its plan reads the very
    // files the scoped land replaces
    val report = inLake.unionByName(viaLegacy).localCheckpoint(eager = true)

    val repointed = report.filter(col("action") === "REPOINTED" && col("new_to").isNotNull)
    if (!repointed.isEmpty) {
      // full repaired rows keep everything (incl. grp/bucket on a
      // partitioned lake) except the rewritten pointer — the batch rides
      // the partition-scoped upsert, touching only the stale buckets
      val batch = tombs
        .join(repointed.select(col("_id").as("__rid"), col("new_to")), col("_id") === col("__rid"))
        .withColumn("updated_to", col("new_to")).drop("__rid", "new_to")
        .localCheckpoint(eager = true) // same self-read rule as the report
      lake.upsert(batch)
    }
    report
  }
}
