package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.NtpIds
import graft.harvest.{Fetch, StorageSync}

/** Composed harvest-side jobs (SURVEY §3.2, §3.3): document fetch, storage
  * reconciliation, and purge-with-backup — each a thin composition of the
  * harvest operators with the reference CLI's job modes (id ranges,
  * check-only/dry-run) as parameters.
  */
object HarvestJobs {

  /** get_documents (§3.2): extract URL columns from active records in an
    * id range, drop skip-listed fields/servers, fetch host-partitioned.
    * `urlFields`: the record columns carrying URLs (P8's melt set).
    */
  def harvest(records: DataFrame, idCol: String, urlFields: Seq[String],
              idRange: (Option[String], Option[String]) = (None, None),
              skipFields: Set[String] = Set.empty,
              skipServers: Set[String] = Set.empty,
              delayMs: Long = 0L,
              scanOnly: Boolean = false,
              fetcher: String => Fetch.FetchResult = Fetch.stubFetcher): DataFrame = {
    val fields = urlFields.filterNot(skipFields)
    val stackExpr = s"stack(${fields.length}, " +
      fields.map(f => s"'$f', `$f`").mkString(", ") + ") AS (field, url)"
    val urls = records
      .filter(NtpIds.inRange(col(idCol), idRange._1, idRange._2))
      .selectExpr(idCol, stackExpr)
      .filter(col("url").isNotNull && col("url").startsWith("http"))
    if (scanOnly) urls
    else Fetch.fetchAll(urls, "url", delayMs = delayMs, skipServers = skipServers,
      fetcher = fetcher)
  }

  /** sync_documents (§3.3): reconcile two listings within an id range and
    * emit the ADD/DEL/KEEP manifest; `checkOnly` stops at the manifest
    * (the reference's --check_only + patch_list).
    */
  def sync(origin: DataFrame, dest: DataFrame,
           idRange: (Option[String], Option[String]) = (None, None)): DataFrame = {
    def inRange(df: DataFrame) =
      df.filter(NtpIds.inRange(NtpIds.idFromFileName(col("name")), idRange._1, idRange._2))
    StorageSync.reconcile(inRange(origin), inRange(dest))
  }

  /** purge_documents (§2.2 K7): move blobs for obsolete records to a
    * backup listing; `recover` inverts. Pure listing algebra here — the
    * byte move is `purge` below.
    */
  def purgeManifest(listing: DataFrame, obsoleteIds: DataFrame,
                    recover: Boolean = false): DataFrame = {
    val tagged = listing.withColumn("ntp_id", NtpIds.idFromFileName(col("name")))
    val op = if (recover) "RESTORE" else "BACKUP_DELETE"
    tagged.join(obsoleteIds, Seq("ntp_id"), "left_semi")
      .select(lit(op).as("op"), col("name"))
  }

  /** purge_documents with REAL bytes (K7; reference purge_documents.py:
    * 97-118): derive the manifest, then move each blob storage -> backup
    * (backup-then-delete) or copy backup -> storage (`recover`),
    * distributed via BlobStore.moveAll. `dryRun` reports the manifest
    * without touching bytes. Returns (name, action, ok) per blob.
    */
  def purge(listing: DataFrame, obsoleteIds: DataFrame,
            storageDir: String, backupDir: String,
            dryRun: Boolean = false, recover: Boolean = false): DataFrame = {
    val manifest = purgeManifest(listing, obsoleteIds, recover)
    if (recover)
      graft.lake.BlobStore.moveAll(manifest, "name", backupDir, storageDir,
        deleteSrc = false, dryRun = dryRun)
    else
      graft.lake.BlobStore.moveAll(manifest, "name", storageDir, backupDir,
        deleteSrc = true, dryRun = dryRun)
  }
}
