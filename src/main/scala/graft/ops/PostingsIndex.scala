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
    // md5(text) appears in both the kept semi-join (here) and the fresh
    // anti-join below — two expressions but also two separate SCANS of
    // `docs`, and the scan dominates the hash. Collapsing them needs a
    // corpus-sized persist of (doc, fp), which costs more than it saves;
    // the churn-sized indexRows pass re-hashing fresh docs is noise.
    val curFp = docs.select(col(idCol).as("doc"), md5(col(textCol)).as("fp"))
    // unchanged docs: length rows carried verbatim (semi-join on doc+fp)
    val keptLen = oldLen.join(curFp, Seq("doc", "fp"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptPost = oldPost.join(keptLen.select(col("doc")), Seq("doc"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // churn: docs with no verbatim fingerprint match (new, or fp drifted)
    val oldFp = oldLen.select(col("doc").as("__odoc"), col("fp").as("__ofp"))
    val fresh = docs.join(oldFp,
      docs(idCol) === col("__odoc") && md5(docs(textCol)) === col("__ofp"), "left_anti")
    val (freshPost, freshLen, freshBase) = indexRows(fresh, idCol, textCol)
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
    val curFp = batch.select(col(idCol).as("doc"), md5(col(textCol)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val othersLen = oldLen.join(curFp.select(col("doc")), Seq("doc"), "left_anti")
    val keptLen = oldLen.join(curFp, Seq("doc", "fp"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // postings keep every doc whose length row survives (out-of-batch or
    // carried): one semi-join against the union of the two kept sets
    val keepDocs = othersLen.select(col("doc")).unionByName(keptLen.select(col("doc")))
    val keptPost = oldPost.join(keepDocs, Seq("doc"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oldFp = oldLen.select(col("doc").as("__odoc"), col("fp").as("__ofp"))
    val fresh = batch.join(oldFp,
      batch(idCol) === col("__odoc") && md5(batch(textCol)) === col("__ofp"), "left_anti")
    val (freshPost, freshLen, freshBase) = indexRows(fresh, idCol, textCol)
    val freshLenP = freshLen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = keptLen.count()
    val signedN = freshLenP.count()
    Staged.landMany(spark, path, Seq(
      "postings" -> keptPost.unionByName(freshPost),
      "doclen" -> othersLen.unionByName(keptLen).unionByName(freshLenP)))
    curFp.unpersist(); keptLen.unpersist(); keptPost.unpersist()
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
