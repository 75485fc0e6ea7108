package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup CLUSTER LABELS with churn-proportional
  * maintenance — the missing incremental member of the dedup tier:
  * [[DedupIndex]] maintains the band rows (candidate generator) per
  * drop, but cluster labels were recomputed corpus-wide. At 100 TB a
  * monthly drop touching 1% of documents must not re-run connected
  * components over every candidate pair.
  *
  * Layout: `path/bands` (the [[DedupIndex]] sidecar) + `path/labels`
  * (doc, fp, label) where `label` = the component-min doc id under the
  * band-index candidate graph — identical to
  * [[Dedup.connectedComponents]] over the full pair set.
  *
  * Refresh contract (docs = the FULL current corpus, like
  * [[DedupIndex.refresh]]): band rows refresh first (fingerprint-gated),
  * then labels update on the DELTA only, exploiting two structural
  * facts about the candidate graph:
  *
  *  1. an edge can appear or disappear ONLY at a document whose band
  *     rows changed (new / text-drifted / vanished docs) — every other
  *     edge is already reflected in the old labels;
  *  2. a component is at risk of SPLITTING only if it LOST a member's
  *     edges — i.e. it contains a changed or vanished doc.
  *
  * So the recompute graph is: members of split-candidate components at
  * doc granularity, changed/new docs at doc granularity, and every
  * OTHER component CONTRACTED to its label node (its internal edges are
  * intact, so it stays connected; its label IS its min member id, so
  * component-mins over the contracted graph equal the full graph's).
  * Delta edges come from [[DedupIndex.candidatePairsInvolving]] —
  * output scales with the delta's band collisions, never the corpus.
  * Label-node ids cannot collide with doc-granularity nodes: label L
  * means doc L is that component's min member, so if doc L is in the
  * delta its component is a split candidate, not intact.
  *
  * Cost per drop: O(churn + Σ|split-candidate components| + contracted
  * edges). Deletion-heavy drops degrade gracefully (their components
  * recompute at doc granularity); everything else carries.
  */
object ClusterIndex {

  private def bandsPath(path: String) = s"$path/bands"
  private def labelsPath(path: String) = s"$path/labels"

  /** Build from scratch: band index + labels. Returns labeled docs. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            bands: Int = 4, rowsPerBand: Int = 2): Long = {
    val spark = docs.sparkSession
    DedupIndex.build(docs, idCol, textCol, bandsPath(path), bands, rowsPerBand)
    val pairs = DedupIndex.candidatePairs(spark, bandsPath(path))
    val comp = Dedup.connectedComponents(pairs)
    val labels = docs
      .select(col(idCol).cast("long").as("doc"), md5(col(textCol)).as("fp"))
      .join(comp, col("doc") === col("node"), "left_outer")
      .select(col("doc"), col("fp"), coalesce(col("component"), col("doc")).as("label"))
    graft.lake.Staged.land(spark, labelsPath(path), labels)
    spark.read.parquet(labelsPath(path)).count()
  }

  /** Churn-proportional refresh to the current corpus state. Returns
    * (carriedDocs, relabeledDocs) — the observable proof that label
    * maintenance followed the churn, not the corpus.
    */
  def refresh(docs: DataFrame, idCol: String, textCol: String, path: String,
              bands: Int = 4, rowsPerBand: Int = 2): (Long, Long) = {
    val spark = docs.sparkSession
    val lp = new org.apache.hadoop.fs.Path(labelsPath(path))
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lp))
      return (0L, build(docs, idCol, textCol, path, bands, rowsPerBand))
    DedupIndex.refresh(docs, idCol, textCol, bandsPath(path), bands, rowsPerBand)
    // delta edges: >= 1 endpoint in the delta, from the refreshed band
    // index; label maintenance is the shared [[IncrementalLabels]] core
    IncrementalLabels.refresh(spark, labelsPath(path),
      docs.select(col(idCol).cast("long").as("doc"), md5(col(textCol)).as("fp")),
      "fp",
      docGran => DedupIndex.candidatePairsInvolving(spark, bandsPath(path), docGran, "doc"))
  }

  /** Current labels (doc, label): label = component-min doc id,
    * identical to a from-scratch [[Dedup.connectedComponents]] over the
    * corpus the index reflects. Zero clustering at serve time.
    */
  def serve(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(labelsPath(path)).select(col("doc"), col("label"))
}
