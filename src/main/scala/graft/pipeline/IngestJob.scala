package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{NtpIds, TimeFns}
import graft.ingest.ColumnMapping
import graft.lake.LakeTable
import graft.versions.{IdAssign, Versions}

/** The flagship composed job (SURVEY §3.1): one parquet drop -> renamed,
  * normalized, id-assigned, version-merged lake state.
  *
  * The reference processes this row-at-a-time with three network
  * round-trips per row (per-row find / merge / commit,
  * reference: read_parquet.py:85-123). Here the whole drop is one Spark
  * job: rename is plan-time metadata, id assignment is one
  * range-partitioned pass, version resolution is one window over the
  * natural key, and the lake upsert is one anti-join rewrite — a fixed
  * number of shuffles regardless of drop size.
  *
  * Incremental semantics preserved (§2.10): the id watermark is the max
  * existing order per group (A1); re-delivered versions whose `updated`
  * overlaps an active version merge into it rather than spawning a new
  * version (J2/F21).
  */
object IngestJob {

  /** Ingest one drop into the lake table.
    *
    * @param drop      raw upstream rows (upstream column names)
    * @param codes     ORIGINAL -> DBFIELD mapping (S3)
    * @param naturalId upstream natural-key column (the PLACE URL `id`)
    * @param updated   upstream version-timestamp column
    * @param group     0 (insiders/outsiders) or 1 (minors) — selects the
    *                  id sub-space (ntp_constants MIN_ORDER semantics)
    */
  def run(spark: SparkSession, lake: LakeTable, drop: DataFrame,
          codes: Map[String, String], naturalId: String, updated: String,
          group: Int): Unit = {
    // 1. rename via codes table + fallback naming (plan-time only)
    val renamed = ColumnMapping.applyMapping(drop, codes)

    // 2. normalize: canonical 19-char updated timeline
    val normalized = renamed
      .withColumn("updated_arr", TimeFns.toUpdatesArray(col(updated)))
      .withColumn("updated_key", element_at(col("updated_arr"), -1))

    // 3. id watermark per group (A1): continue the sequence
    val base = if (group == 1) NtpIds.MinOrderMinors else 0L
    val watermark: Long =
      if (lake.exists)
        lake.read.filter(NtpIds.group(col("_id")) === group)
          .agg(max(NtpIds.parseNtpId(col("_id")))).collect().head match {
          case r if r.isNullAt(0) => base
          case r => r.getLong(0) + 1
        }
      else base

    // 4. assign contiguous ids in natural-key order (W1)
    val withIds = IdAssign.assignSequential(normalized, naturalId, watermark)
      .withColumn("_id", NtpIds.setNtpId(col("seq"))).drop("seq")

    // 5. version-merge against existing actives (J1 + J2 + W2):
    //    union new rows with current state, resolve one active per key
    val incoming = withIds.withColumn("obsolete_version", lit(null).cast("boolean"))
      .withColumn("updated_to", lit(null).cast("string"))
    val all =
      if (lake.exists)
        lake.read.unionByName(incoming, allowMissingColumns = true)
      else incoming
    val active = Versions.resolveLatest(
      all.filter(col("obsolete_version").isNull), naturalId, "_id", "updated_key")
    val tombstones = Versions.tombstones(
      all.filter(col("obsolete_version").isNull), naturalId, "_id", "updated_key")
      .withColumnRenamed(naturalId, naturalId)

    // 6. land: active rows + new tombstones + carried-forward prior
    //    tombstones (their updated_to pointers may now be one hop stale —
    //    chain resolution (J3, Versions.resolveChains) follows them to the
    //    current active, mirroring the reference's follow_version)
    val priorTombstones = all.filter(col("obsolete_version") === true)
    val state = active
      .unionByName(
        tombstones.withColumn("updated_arr", lit(null).cast("array<string>"))
          .withColumn("updated_key", lit(null).cast("string")),
        allowMissingColumns = true)
      .unionByName(priorTombstones, allowMissingColumns = true)
    lake.replace(state)  // state reads the current lake — staged swap, not in-place overwrite
  }

  /** calc_summary (SURVEY §3.3 footnote, A2/K8): one GROUPING SETS pass
    * over the configured dimensions instead of 6 sequential aggregations.
    */
  def summarize(spark: SparkSession, records: DataFrame, dims: Seq[String]): DataFrame = {
    records.createOrReplaceTempView("summary_in")
    val sets = dims.map(d => s"($d)").mkString(", ")
    val coalesced = dims.map(d => s"coalesce(CAST($d AS STRING), '(all)') AS $d").mkString(", ")
    spark.sql(
      s"""SELECT $coalesced, count(*) AS n
         |FROM summary_in
         |GROUP BY GROUPING SETS ($sets, ())""".stripMargin)
  }
}
