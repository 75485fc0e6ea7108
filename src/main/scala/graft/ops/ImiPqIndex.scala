package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IMI-PQ index — the fully factorized 10^10+-vector serving
  * tier as a lake artifact: product cells from two √nCells
  * sub-codebooks ([[IvfImi]] — O(√nCells·dim) task/driver state),
  * 8-byte residual codes under the DERIVED μ = [sub1_i ++ sub2_j]
  * (zero per-cell state anywhere), the [[PqIndex]] churn contract.
  *
  * Layout at `path` (staged-swap, never torn):
  *  - `path/subbooks` — (side 1|2, idx, cent): both sub-codebooks,
  *    PINNED at build (a cell id is only meaningful under its books);
  *  - `path/codebooks` — the residual PQ codebooks, PINNED at build;
  *  - `path/meta` — (residual): the coding convention;
  *  - `path/lists` — (cid, cell, codes, vfp) with the xxhash64 churn
  *    fingerprint — mSub bytes + a cell id per vector.
  *
  * refresh/upsert ride [[graft.lake.ChurnSplit]]: unchanged vectors
  * carry verbatim, drifted/new ids re-encode under the pinned books,
  * vanished ids drop (refresh) or persist (upsert). The probe serves
  * [[Pq.ivfTopKPqImiFromLists]] off the landed lists — zero training,
  * encoding or assignment at probe time.
  */
object ImiPqIndex {

  private def sbPath(path: String) = path + "/subbooks"
  private def cbPath(path: String) = path + "/codebooks"
  private def listsPath(path: String) = path + "/lists"

  private def vecFp(vec: org.apache.spark.sql.Column) = xxhash64(vec)

  private def listRows(corpus: DataFrame, idCol: String, vecCol: String,
                       imi: IvfImi, model: PqModel): DataFrame =
    Pq.pqListsImi(corpus, idCol, vecCol, imi, model,
      extraCols = Seq(vecFp(col(vecCol)).as("vfp")))

  /** Build from scratch. `nCells` is the product-cell target (k =
    * ⌈√nCells⌉ per side). Returns indexed rows.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            nCells: Long, mSub: Int = 8, ks: Int = 256,
            residual: Boolean = true): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val imi = IvfImi.train(corpus, idCol, vecCol, nCells)
    val model =
      if (residual) Pq.trainResidualImi(corpus, idCol, vecCol, imi, mSub, ks)
      else Pq.train(corpus, idCol, vecCol, mSub, ks)
    graft.lake.Staged.landMany(spark, path, Seq(
      "subbooks" -> (imi.sub1.zipWithIndex.map { case (c, i) => (1, i, c.toSeq) } ++
        imi.sub2.zipWithIndex.map { case (c, i) => (2, i, c.toSeq) })
        .toDF("side", "idx", "cent"),
      "codebooks" -> model.codebooks.zipWithIndex.flatMap { case (cb, m) =>
        cb.zipWithIndex.map { case (cent, c) => (m, c, cent.toSeq) }
      }.toDF("sub", "code", "cent"),
      "meta" -> Seq(residual).toDF("residual"),
      "lists" -> listRows(corpus, idCol, vecCol, imi, model)))
    spark.read.parquet(listsPath(path)).count()
  }

  /** The pinned sub-codebooks, collected back √nCells-sized. */
  def loadImi(spark: SparkSession, path: String): IvfImi = {
    val rows = spark.read.parquet(sbPath(path))
      .orderBy(col("side"), col("idx")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](2).toArray))
    IvfImi(rows.filter(_._1 == 1).map(_._2).toIndexedSeq,
      rows.filter(_._1 == 2).map(_._2).toIndexedSeq)
  }

  /** The pinned PQ codebooks + coding convention (mu stays empty — the
    * IMI serve derives it from the sub-codebooks).
    */
  def loadModel(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(cbPath(path))
      .orderBy(col("sub"), col("code")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](2).toArray))
    val books = rows.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, rs) => rs.map(_._2).toIndexedSeq }
    val residual = spark.read.parquet(path + "/meta").collect().head.getBoolean(0)
    PqModel(books.head.head.length, books, residual)
  }

  /** Churn-proportional refresh under the PINNED books. Returns
    * (keptRows, signedRows).
    */
  def refresh(corpus: DataFrame, idCol: String, vecCol: String, path: String)
      : (Long, Long) = {
    val spark = corpus.sparkSession
    val imi = loadImi(spark, path)
    val model = loadModel(spark, path)
    val old = spark.read.parquet(listsPath(path))
    val s = graft.lake.ChurnSplit.split(old, "cid", "vfp",
      corpus, idCol, vecFp(corpus(vecCol)))
    val kept = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshRows = listRows(s.fresh, idCol, vecCol, imi, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = kept.count()
    val signedN = freshRows.count()
    graft.lake.Staged.land(spark, listsPath(path), kept.unionByName(freshRows))
    kept.unpersist(); freshRows.unpersist()
    (keptN, signedN)
  }

  /** Delta upsert — the batch's vectors re-encode (or carry if
    * unchanged); out-of-batch rows untouched. Returns (carried, signed).
    */
  def upsert(batch: DataFrame, idCol: String, vecCol: String, path: String)
      : (Long, Long) = {
    val spark = batch.sparkSession
    val imi = loadImi(spark, path)
    val model = loadModel(spark, path)
    val old = spark.read.parquet(listsPath(path))
    val s = graft.lake.ChurnSplit.split(old, "cid", "vfp",
      batch, idCol, vecFp(batch(vecCol)))
    val keptBatch = s.kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshRows = listRows(s.fresh, idCol, vecCol, imi, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptN = keptBatch.count()
    val signedN = freshRows.count()
    graft.lake.Staged.land(spark, listsPath(path),
      s.others.unionByName(keptBatch).unionByName(freshRows))
    keptBatch.unpersist(); freshRows.unpersist()
    (keptN, signedN)
  }

  /** IMI-PQ top-k served FROM the persisted index — identical result
    * to the recompute form under the same (deterministic) books.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           path: String, k: Int, nProbe: Int, margin: Int): DataFrame = {
    val spark = corpus.sparkSession
    Pq.ivfTopKPqImiFromLists(loadImi(spark, path), loadModel(spark, path),
      spark.read.parquet(listsPath(path)).select(col("cid"), col("cell"), col("codes")),
      corpus, queries, idCol, vecCol, k, nProbe, margin)
  }
}
