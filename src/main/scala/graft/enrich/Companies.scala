package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Company-extraction enrichment (SURVEY §2.1 S5, §2.4 J4, §2.3 P10).
  *
  * The reference reads a JSONL file of per-document company-extraction
  * results, skips rows with neither SINGLE_COMPANY nor UTE, resolves the
  * target record (following tombstones to the active version), routes by
  * id prefix to the right collection, and writes a nested
  * `empresas_en_docs.{doc}.{kind}` map (reference:
  * parse_bsc_companies.py:71-104).
  */
object Companies {

  val companiesSchema: StructType = StructType(Seq(
    StructField("procurement_id", StringType),
    StructField("doc_name", StringType),
    StructField("SINGLE_COMPANY", ArrayType(StringType)),
    StructField("UTE", ArrayType(ArrayType(StringType)))))

  /** S5: JSONL scan with explicit schema (no sampling pass). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(companiesSchema).json(path)

  /** P10: keep only rows that actually carry companies. */
  def withCompanies(df: DataFrame): DataFrame =
    df.filter(col("SINGLE_COMPANY").isNotNull || col("UTE").isNotNull)

  /** J4: enrich active records with the per-document company map.
    * `resolved`: (obsolete id -> active id) pointer table from
    * Versions.resolveChains; ids with no pointer row are already active.
    * One equi-join to re-point + one groupBy to nest + one join to land —
    * the reference's per-row find/update loop collapses to three
    * shuffles total regardless of corpus size.
    */
  def enrich(records: DataFrame, recordId: String, companies: DataFrame,
             resolved: DataFrame, resolvedSrcCol: String = "src"): DataFrame = {
    // resolvedSrcCol: Versions.resolveChains names its pointer column
    // after ITS caller's id argument — pass that name when wiring the two
    // (the default matches the hand-built (src, resolved_to) shape).
    val repointed = withCompanies(companies)
      .join(resolved, companies("procurement_id") === resolved(resolvedSrcCol), "left_outer")
      .withColumn("target_id", coalesce(col("resolved_to"), col("procurement_id")))
    // one payload per (target, doc_name) BEFORE the map: map_from_entries
    // throws on duplicate keys (two obsolete versions repointing to one
    // active, or a re-delivered JSONL row) and on null keys. The winner
    // is the content-max payload — deterministic where "last read" is not.
    val perDoc = repointed.filter(col("doc_name").isNotNull)
      .groupBy(col("target_id"), col("doc_name"))
      .agg(max(struct(
        coalesce(col("SINGLE_COMPANY"), array().cast("array<string>")).as("single_company"),
        coalesce(col("UTE"), array().cast("array<array<string>>")).as("ute"))).as("__p"))
    val nested = perDoc.groupBy(col("target_id"))
      .agg(map_from_entries(collect_list(struct(col("doc_name"), col("__p"))))
        .as("empresas_en_docs"))
    records.join(nested, records(recordId) === nested("target_id"), "left_outer")
      .drop("target_id")
  }
}
