package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Staged

/** Persisted inverted (posting-list) index — incremental BM25 serving,
  * the relevance tier's member of the churn-proportional index family
  * ([[DedupIndex]] near-dup, [[SimilarityIndex]] ANN, [[TextIndex]]
  * per-doc stats, [[graft.lake.MaterializedAgg]] summaries).
  *
  * [[Relevance.bm25]] tokenizes the whole corpus per query — right for
  * a one-shot audit, O(corpus) per probe at 100 TB when the index is
  * the classic search-engine artifact: build once, refresh on churn,
  * probe many times. This sidecar lands two tables under `path`:
  *
  *  - `postings/` — (doc, tok, tf): one row per distinct (document,
  *    token); the query-time read is `tok IN terms`, posting-list-sized;
  *  - `doclen/` — (doc, fp, dl): one row per document with its token
  *    count (the BM25 length norm; dl=0 rows keep empty documents in
  *    the corpus stats N/avgdl exactly as the recompute counts them)
  *    and `fp = md5(text)` as the change fingerprint.
  *
  * `refresh` re-tokenizes ONLY new/changed documents (digest-sized
  * (doc, fp) anti-join — the fingerprint discipline of
  * [[TextIndex.refresh]]); unchanged documents' postings and length
  * rows are carried verbatim, vanished documents' rows drop out.
  *
  * [[Relevance.bm25FromPostings]] probes the served tables through the
  * SAME arithmetic core as the recompute path, so scores are
  * bit-identical whenever the index reflects the corpus — the spec
  * property, and what lets an indexed probe replace the recompute in
  * any downstream ranking.
  *
  * Landing is one ATOMIC whole-root swap ([[Staged.landMany]]): both
  * tables replace together, so a crash leaves the old index, the new
  * one, or none — never new postings paired with old length norms (two
  * independent swaps had exactly that torn window).
  */
object PostingsIndex {

  /** Both index tables from ONE tokenize pass over `docs` (the exploded
    * token stream aggregates to postings; doclen's dl comes from the
    * same token arrays). The shared token frame comes back PERSISTED —
    * both returned tables consume it, and without the pin the doclen
    * write would re-run the whole scan+tokenize (the postings aggregate
    * alone can't be reused: it has already exploded the arrays away).
    * Callers unpersist it after landing.
    */
  private def indexRows(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("doc"), md5(col(textCol)).as("fp"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = base
      .select(col("doc"), explode(col("__toks")).as("tok"))
      .groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("tf"))
    val doclen = base.select(col("doc"), col("fp"), size(col("__toks")).cast("long").as("dl"))
    (postings, doclen, base)
  }

  def build(docs: DataFrame, idCol: String, textCol: String, path: String): Long = {
    val spark = docs.sparkSession
    val (postings, doclen, base) = indexRows(docs, idCol, textCol)
    Staged.landMany(spark, path, Seq("postings" -> postings, "doclen" -> doclen))
    base.unpersist()
    spark.read.parquet(s"$path/doclen").count()
  }

  /** Churn-proportional refresh: carry unchanged documents' postings and
    * length rows verbatim, tokenize only new/changed documents, drop
    * vanished ones. Returns (keptDocs, signedDocs) — spec-observable
    * proof that cost follows churn.
    */
  def refresh(docs: DataFrame, idCol: String, textCol: String, path: String): (Long, Long) = {
    val spark = docs.sparkSession
    val root = new org.apache.hadoop.fs.Path(s"$path/doclen")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0L, build(docs, idCol, textCol, path))
    val oldLen = spark.read.parquet(s"$path/doclen")
    val oldPost = spark.read.parquet(s"$path/postings")
    // shared churn seam on the doclen table (the fingerprint carrier);
    // postings follow their doc's length row with one semi-join. md5 is
    // evaluated once per seam join — two scans of `docs`, and the scan
    // dominates the hash; collapsing them needs a corpus-sized persist
    // that costs more than it saves
    val s = graft.lake.ChurnSplit.split(oldLen, "doc", "fp",
      docs, idCol, md5(docs(textCol)))
    val keptLen = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptPost = oldPost.join(keptLen.select(col("doc")), Seq("doc"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (freshPost, freshLen, freshBase) = indexRows(s.fresh, idCol, textCol)
    val freshLenP = freshLen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = keptLen.count()
    val signedN = freshLenP.count()
    Staged.landMany(spark, path, Seq(
      "postings" -> keptPost.unionByName(freshPost),
      "doclen" -> keptLen.unionByName(freshLenP)))
    keptLen.unpersist(); keptPost.unpersist(); freshBase.unpersist(); freshLenP.unpersist()
    (keptN, signedN)
  }

  /** Delta UPSERT — the drop/streaming form of [[refresh]]: add or
    * replace exactly the batch's documents (re-delivered unchanged docs
    * carry verbatim), out-of-batch rows untouched, no drop semantics.
    * Cost follows the BATCH. Returns (carriedBatchDocs, signedBatchDocs).
    */
  def upsert(batch: DataFrame, idCol: String, textCol: String, path: String): (Long, Long) = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(s"$path/doclen")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0L, build(batch, idCol, textCol, path))
    val oldLen = spark.read.parquet(s"$path/doclen")
    val oldPost = spark.read.parquet(s"$path/postings")
    // delta semantics over the shared seam on doclen; postings keep
    // every doc whose length row survives (out-of-batch or carried):
    // one semi-join against the union of the two kept sets
    val s = graft.lake.ChurnSplit.split(oldLen, "doc", "fp",
      batch, idCol, md5(batch(textCol)))
    val keptLen = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepDocs = s.others.select(col("doc")).unionByName(keptLen.select(col("doc")))
    val keptPost = oldPost.join(keepDocs, Seq("doc"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (freshPost, freshLen, freshBase) = indexRows(s.fresh, idCol, textCol)
    val freshLenP = freshLen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = keptLen.count()
    val signedN = freshLenP.count()
    Staged.landMany(spark, path, Seq(
      "postings" -> keptPost.unionByName(freshPost),
      "doclen" -> s.others.unionByName(keptLen).unionByName(freshLenP)))
    keptLen.unpersist(); keptPost.unpersist()
    freshBase.unpersist(); freshLenP.unpersist()
    (keptN, signedN)
  }

  def servePostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/postings")

  def serveDocLen(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/doclen")

  /** BM25 over the landed index — no corpus text read, no tokenize:
    * the plan is the terms' posting lists + the doclen aggregate.
    */
  def bm25(spark: SparkSession, path: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    Relevance.bm25FromPostings(servePostings(spark, path),
      serveDocLen(spark, path).select(col("doc"), col("dl")), terms, k1, b)
}
