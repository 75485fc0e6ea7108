package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged-swap parquet landing, shared by every sidecar/index tier
  * ([[BloomIndex]], [[graft.ops.DedupIndex]],
  * [[graft.ops.SimilarityIndex]], [[MaterializedAgg]]): write
  * `<path>.staging`, delete the destination, rename. A crash leaves the
  * old artifact, the new one, or none — "none" means rebuild, never a
  * torn artifact that silently serves wrong answers.
  */
object Staged {

  def land(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    require(dest.getParent != null, s"cannot stage-land at a filesystem root: $path")
    // dot-prefixed staging: invisible to Spark's file listing AND to
    // partition discovery — a `seg=1.staging` sibling would otherwise be
    // inferred as partition seg='1.staging' by readers of the parent dir
    val staging = new org.apache.hadoop.fs.Path(
      dest.getParent, "." + dest.getName + ".staging")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    fs.delete(dest, true)
    renameOrThrow(fs, staging, dest)
  }

  /** `FileSystem.rename` signals most failures (cross-filesystem move,
    * concurrent re-creation of dest, object-store rename fallback) by
    * returning FALSE, not by throwing. Swallowing that false would
    * report success while NO live artifact exists — fail loudly instead
    * so the caller's "old, new, or none → rebuild" contract holds.
    */
  private[graft] def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            from: org.apache.hadoop.fs.Path,
                            to: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(
        s"staged swap failed: rename($from -> $to) returned false; " +
          "the destination is absent — rebuild the artifact")

  /** Land SEVERAL tables under one root in a SINGLE swap: every table
    * writes to `.root.staging/<name>`, then the root is replaced by one
    * rename. For an index whose tables must agree (e.g. a posting list
    * and its length norms), two independent [[land]] calls would leave a
    * crash window between the swaps where new postings pair with old
    * norms — a torn index that serves wrong answers with no error. One
    * root rename gives old index, new index, or none.
    *
    * Plans may read the CURRENT tables under `root`: staging writes
    * materialize them before the old root is touched.
    */
  def landMany(spark: SparkSession, root: String, tables: Seq[(String, DataFrame)]): Unit = {
    val dest = new org.apache.hadoop.fs.Path(root)
    require(dest.getParent != null, s"cannot stage-land at a filesystem root: $root")
    val staging = new org.apache.hadoop.fs.Path(
      dest.getParent, "." + dest.getName + ".staging")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$staging/$name")
    }
    fs.delete(dest, true)
    renameOrThrow(fs, staging, dest)
  }

  /** Swap an ENTIRE segmented root (`path/seg=...`) for one folded
    * segment in a single rename — the compaction posture shared by
    * [[MaterializedAgg.compact]] and the [[graft.ops.Sketches]] tiers.
    * A per-segment delete sequence would give a concurrent reader a
    * double-counting window; this gives old root, new root, or none.
    * `folded` must already be materialized (e.g. localCheckpoint) — the
    * root it was computed from is deleted before the rename.
    */
  def swapRoot(spark: SparkSession, path: String, folded: DataFrame,
               segName: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    require(root.getParent != null, s"cannot swap a filesystem root: $path")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".compact.staging")
    fs.delete(staging, true)
    folded.write.parquet(s"$staging/$segName")
    fs.delete(root, true)
    renameOrThrow(fs, staging, root)
  }
}
