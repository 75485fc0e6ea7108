package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-side source loaders (SURVEY §2.1).
  *
  * S1/S2 parquet scans are `spark.read.parquet` directly; this object
  * holds the non-trivial ones: the column-codes TSV (S3), the CPV
  * taxonomy CSV with single-quoted values (S4), storage listings (S9),
  * and the gzip-transparent text reader (S12). The JSONL companies scan
  * (S5) lives in enrich.Companies.
  */
object Sources {

  /** S3: (ORIGINAL, DBFIELD, TYPE) column-mapping TSV -> driver-side map
    * (a few hundred rows — plan-time metadata, broadcast by value;
    * reference: read_parquet.py:72, data/columns_consolidated.tsv).
    */
  def loadColumnCodes(spark: SparkSession, path: String): Map[String, String] =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(regexp_replace(col("ORIGINAL"), "\"", "").as("o"),
        regexp_replace(col("DBFIELD"), "\"", "").as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** S4: CPV taxonomy `;`-separated CSV `_id;control;descripcion` with
    * single-quoted strings and int control code (reference:
    * data/load_cpv.py:56-72).
    */
  def loadCpv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", ";").option("header", "true").csv(path)
      .select(
        regexp_replace(col("_id"), "'", "").as("cpv_id"),
        col("control").cast("int").as("control"),
        regexp_replace(col("descripcion"), "'", "").as("descripcion"))

  /** S1-alt: ORC lake scan — the mixed-format lake surface (Parquet/ORC).
    * ORC rides the same vectorized columnar reader stack as parquet:
    * predicate pushdown (`spark.sql.orc.filterPushdown`, on by default)
    * and column pruning both reach the stripe reader, so `.explain`
    * shows PushedFilters/ReadSchema exactly like a parquet scan. Pin
    * `schema` to skip footer inference over wide directories (the same
    * contract as the lake readers' manifest-pinned schemas).
    */
  def loadOrc(spark: SparkSession, path: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format("orc")
    schema.fold(r)(r.schema).load(path)
  }

  /** S9: storage listing scan — enumerate stored blobs as a DataFrame of
    * (path, name, ntp_id, length), via the built-in binaryFile source
    * (metadata only: payloads are not read unless the content column is
    * selected — column pruning keeps listings cheap).
    */
  def listStorage(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), element_at(split(col("path"), "/"), -1).as("name"),
        col("length"))
      .withColumn("ntp_id", substring_index(col("name"), "_", 1))

  /** S12: sequential text reader with line numbers (gzip transparent;
    * reference: mmb_data/file_mgr.py:8-79). Line ranges replace the
    * reference's skip-to-line logic.
    *
    * `textFile.zipWithIndex` — RDD indexing is partition-major and
    * Hadoop text splits are enumerated in (file, offset) order, so the
    * numbering is the file's line order with NO single-partition stage
    * (the previous global `Window.orderBy` funneled the whole file
    * through one task). zipWithIndex costs one extra lightweight job to
    * learn per-partition counts; gzip inputs arrive as one split per
    * file, exactly like any sequential gzip reader.
    */
  def readTextWithLineNumbers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path)
      .zipWithIndex()
      .toDF("value", "line_no")
  }
}
