package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K6/K7 byte-level blob storage on any Hadoop filesystem.
  *
  * The reference stores harvested documents as loose files under a data
  * dir with per-file store/read/delete/exists (ntp_storage.py:42-80
  * NtpStorageDisk) and purges obsolete documents by copying each blob to
  * a backup store before deleting it, with dry-run and recover modes
  * (purge_documents.py:97-118).
  *
  * Two layers here:
  *  - [[BlobStore]] instance: the reference's single-file API verbatim —
  *    driver-side, for tooling parity (store/read/delete/exists);
  *  - [[BlobStore.moveAll]]: the SET-level byte mover — the manifest of
  *    file names is a DataFrame, and the copy/delete runs inside
  *    `mapPartitions`, one filesystem handle per partition, so a purge of
  *    millions of blobs fans out across executors instead of looping on
  *    the driver (the reference moves bytes one file at a time through
  *    the driver process). Copy+delete per file is FileUtil.copy with
  *    deleteSource — the delete happens only after its copy succeeded,
  *    per file, so a mid-job crash leaves every blob in at least one of
  *    the two stores (same recovery contract as the reference).
  */
class BlobStore(spark: SparkSession, dataDir: String) {
  private val dir = new Path(dataDir)
  private def fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def store(name: String, contents: Array[Byte]): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, name), true)
    try out.write(contents) finally out.close()
  }

  def read(name: String): Array[Byte] = {
    val in = fs.open(new Path(dir, name))
    try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
  }

  def exists(name: String): Boolean = fs.exists(new Path(dir, name))

  def delete(name: String): Boolean = fs.delete(new Path(dir, name), false)

  /** S9 listing of this store as a DataFrame (metadata only). */
  def list(): DataFrame = graft.sources.Sources.listStorage(spark, dataDir)
}

object BlobStore {

  /** Distributed byte move of `manifest[nameCol]` from `srcDir` to
    * `dstDir`. `deleteSrc = true` is backup-then-delete (K7 purge);
    * `false` is plain copy (K7 recover). `dryRun` returns the would-be
    * manifest without touching bytes. Returns (name, action, ok) — a
    * failed file reports `ok = false` rather than failing the job, so one
    * missing blob doesn't abort a million-file purge (the reference logs
    * and continues the same way).
    */
  def moveAll(manifest: DataFrame, nameCol: String, srcDir: String, dstDir: String,
              deleteSrc: Boolean, dryRun: Boolean = false): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    val names = manifest.select(col(nameCol).cast("string")).as[String]
    if (dryRun) {
      names.map(n => (n, "DRY_RUN", true)).toDF("name", "action", "ok")
    } else {
      names.mapPartitions { it =>
        // executor-side conf: loads cluster site files from the classpath
        // (identical to how any Hadoop task resolves its filesystems)
        val conf = new Configuration()
        val src = new Path(srcDir)
        val dst = new Path(dstDir)
        val sfs = src.getFileSystem(conf)
        val dfs = dst.getFileSystem(conf)
        dfs.mkdirs(dst)
        it.map { n =>
          try {
            FileUtil.copy(sfs, new Path(src, n), dfs, new Path(dst, n),
              deleteSrc, true, conf)
            (n, if (deleteSrc) "MOVED" else "COPIED", true)
          } catch {
            case e: Exception => (n, s"ERROR:${e.getClass.getSimpleName}", false)
          }
        }
      }.toDF("name", "action", "ok")
    }
  }
}
