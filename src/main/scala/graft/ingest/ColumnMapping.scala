package graft.ingest

import org.apache.spark.sql.DataFrame

/** Config-driven column renaming: an external (ORIGINAL, DBFIELD, TYPE)
  * mapping table renames upstream columns; unknown columns do NOT fail the
  * pipeline — a fallback DBFIELD is derived mechanically and the column
  * flows through (reference: data/columns_consolidated.tsv;
  * nextplib/ntp_utils.py:43-49 `get_new_dbfield`, :108-110 fallback path).
  *
  * The mapping is driver-side metadata (a few hundred rows) — it is applied
  * as plan-time renames, never a data-path join, so it costs nothing at
  * 100 TB.
  */
object ColumnMapping {

  /** Spanish-character transliteration table (the reference shells out to
    * unidecode; the es-relevant subset is a fixed char map, which keeps the
    * rename pure-metadata).
    */
  private val accented = "áéíóúüñÁÉÍÓÚÜÑàèìòùÀÈÌÒÙâêîôûÂÊÎÔÛçÇ"
  private val plain    = "aeiouunAEIOUUNaeiouAEIOUaeiouAEIOUcC"

  def unidecodeEs(s: String): String = s.map { ch =>
    val i = accented.indexOf(ch.toInt)
    if (i >= 0) plain(i) else ch
  }

  /** Fallback DBFIELD derivation for unmapped columns (reference:
    * ntp_utils.py:43-49): strip the `ContractFolderStatus - ` prefix,
    * spaces -> `_`, trailing `X_(Y)` -> `Y/X`, transliterate accents.
    */
  def fallbackName(original: String): String = {
    val stripped = original.stripPrefix("ContractFolderStatus - ")
    val joined = stripped.replace(" - ", "_").replace(" ", "_")
    val parens = "^(.*)_\\((.*)\\)$".r
    val reordered = joined match {
      case parens(x, y) => s"$y/$x"
      case other        => other
    }
    unidecodeEs(reordered)
  }

  /** Rename every column through the mapping, falling back to
    * `fallbackName` for unknown columns (which are kept, mirroring the
    * reference's log-and-continue behavior).
    */
  def applyMapping(df: DataFrame, codes: Map[String, String]): DataFrame = {
    val renamed = df.columns.map { c => c -> codes.getOrElse(c, fallbackName(c)) }
    renamed.foldLeft(df) { case (acc, (from, to)) => acc.withColumnRenamed(from, to) }
  }

  /** Nest slash-named columns into structs (SURVEY §1.4): `A/B`, `A/C`
    * become struct column `A{B, C}`; flat columns pass through. Struct
    * layout gives idiomatic column pruning — a query touching only
    * `Adjudicatario.Ciudad` reads one leaf from parquet.
    */
  def nestSlashColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct}
    val (nested, flat) = df.columns.partition(_.contains("/"))
    val groups = nested.groupBy(_.split("/", 2)(0)).toSeq.sortBy(_._1)
    val structCols = groups.map { case (parent, cols) =>
      struct(cols.sorted.toIndexedSeq.map(c => col(s"`$c`").as(c.split("/", 2)(1))): _*).as(parent)
    }
    df.select(flat.toIndexedSeq.map(c => col(s"`$c`")) ++ structCols: _*)
  }
}
