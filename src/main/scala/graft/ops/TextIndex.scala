package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Staged

/** Persisted per-document text-stats sidecar — the text tier's member
  * of the churn-proportional index family ([[DedupIndex]] for near-dup,
  * [[SimilarityIndex]] for ANN, [[graft.lake.MaterializedAgg]] for
  * summaries).
  *
  * The txt_* queries tokenize the corpus per run; correct for an audit,
  * O(corpus) per monthly drop at 100 TB when the churn is O(drop). This
  * sidecar lands one row per document — `(doc, fp, n_tokens, rhash,
  * quality, lang)`, everything a curation gate filters on — computed in
  * ONE tokenize pass, and `refresh` re-tokenizes only documents whose
  * md5 text fingerprint changed (digest-sized anti-join), carrying every
  * unchanged document's row verbatim and dropping vanished ones.
  * Curation then reads the stats table (`serve`) instead of re-running
  * the kernels corpus-wide.
  *
  * Landing is staged-swap ([[graft.lake.Staged]]): old, new, or none —
  * never a torn stats table.
  */
object TextIndex {

  /** One signing pass: every per-doc stat from a single tokenization. */
  def statsRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc"), md5(col(textCol)).as("fp"),
        col(textCol).as("__text"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc"), col("fp"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.rollingHashT(col("__toks")).as("rhash"),
        TextAnalysis.qualityScoreT(col("__toks"), col("__text")).as("quality"),
        TextAnalysis.langIdT(col("__toks")).as("lang"))

  def build(docs: DataFrame, idCol: String, textCol: String, path: String): Long = {
    val spark = docs.sparkSession
    Staged.land(spark, path, statsRows(docs, idCol, textCol))
    spark.read.parquet(path).count()
  }

  /** Churn-proportional refresh: carry unchanged documents' stats rows
    * verbatim, tokenize only new/changed documents, drop vanished ones.
    * Returns (keptDocs, signedDocs).
    */
  def refresh(docs: DataFrame, idCol: String, textCol: String, path: String): (Long, Long) = {
    val spark = docs.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, build(docs, idCol, textCol, path))
    val old = spark.read.parquet(path)
    // shared churn seam: unchanged stats rows carry verbatim, only
    // fingerprint-drifted/new docs re-tokenize
    val s = graft.lake.ChurnSplit.split(old, "doc", "fp",
      docs, idCol, md5(docs(textCol)))
    val kept = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshRows = statsRows(s.fresh, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = kept.count()
    val signedN = freshRows.count()
    Staged.land(spark, path, kept.unionByName(freshRows))
    kept.unpersist()
    freshRows.unpersist()
    (keptN, signedN)
  }

  /** Delta UPSERT — the batch/streaming form of [[refresh]]: add or
    * replace exactly the batch's documents (re-delivered unchanged docs
    * carry verbatim), out-of-batch rows untouched, no drop semantics.
    * Cost follows the BATCH — no corpus-wide fingerprint pass. Returns
    * (carriedBatchDocs, signedBatchDocs).
    */
  def upsert(batch: DataFrame, idCol: String, textCol: String, path: String): (Long, Long) = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, build(batch, idCol, textCol, path))
    val old = spark.read.parquet(path)
    // delta semantics over the shared seam (out-of-batch untouched,
    // re-delivered unchanged verbatim, drifted/new re-tokenized)
    val s = graft.lake.ChurnSplit.split(old, "doc", "fp",
      batch, idCol, md5(batch(textCol)))
    val keptBatch = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshRows = statsRows(s.fresh, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = keptBatch.count()
    val signedN = freshRows.count()
    Staged.land(spark, path, s.others.unionByName(keptBatch).unionByName(freshRows))
    keptBatch.unpersist(); freshRows.unpersist()
    (keptN, signedN)
  }

  /** The landed stats table. */
  def serve(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
