package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Value normalization applied to every ingested cell (reference:
  * nextplib/ntp_utils.py:71-112 `parse_parquet`): string-encoded lists are
  * parsed (the reference uses `eval`; we use `from_json` — never eval),
  * null/NaN becomes '', single-element lists unwrap to scalars, and field
  * collisions promote scalars to lists.
  */
object Normalize {

  /** Parse a Python-style string-encoded list `"['a','b']"` into
    * `array<string>` (reference: ntp_utils.py:82-89). Single quotes are
    * rewritten to JSON double quotes; non-list strings pass through as a
    * 1-element array; null stays null.
    */
  def parseListString(c: Column): Column =
    when(c.startsWith("["), from_json(regexp_replace(c, "'", "\""), ArrayType(StringType)))
      .otherwise(array(c))

  /** null/NaN -> '' (reference: ntp_utils.py:95-99). */
  def nullToEmpty(c: Column): Column = coalesce(c, lit(""))

  /** Single-element list unwrap: list of 1 -> scalar, else keep the join of
    * the array form (reference: ntp_utils.py:92-93). For columns that stay
    * arrays use `unwrapOrNull`.
    */
  def unwrapSingle(c: Column): Column =
    when(size(c) === 1, element_at(c, 1)).otherwise(c.cast(StringType))

  /** Field collision handling: two source columns landing on one DBFIELD
    * merge into an array (reference: ntp_utils.py:101-105).
    */
  def collide(a: Column, b: Column): Column =
    array_compact(array(a, b))

  /** One ingested cell, normalized to StringType (the reference's schema
    * declares every field but `updated` as string — SURVEY §1.2):
    * scalars null->''; array cells get their string-encoded list items
    * parsed and flattened, unwrap to the scalar when one element remains,
    * JSON-encode otherwise (the typed stand-in for Python's heterogeneous
    * list cell). Non-string scalar types pass through untouched.
    */
  def normalizeCell(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case StringType => nullToEmpty(c)
    case ArrayType(StringType, _) =>
      val parsed = flatten(transform(c, i => parseListString(i)))
      when(c.isNull, lit(""))
        .when(size(parsed) === 1, element_at(parsed, 1))
        .otherwise(to_json(parsed))
    case _ => c
  }

  /** The full parse_parquet pass (reference: ntp_utils.py:71-112) as ONE
    * plan-time projection over the drop:
    *  - known columns rename through `codes` and normalize via
    *    [[normalizeCell]];
    *  - two source columns landing on one DBFIELD merge into an array
    *    (collision -> list promotion, ntp_utils.py:101-105);
    *  - unknown columns leave the top-level schema and land in an
    *    `extra: map<string,string>` residue column keyed by their
    *    mechanically-derived fallback name (SURVEY §1.2/§1.4 — the
    *    pipeline never fails on new upstream columns, and the lake schema
    *    stays stable while retaining every value).
    * Zero data movement: renames, map construction and normalization are
    * all expression-level.
    */
  def normalizeDrop(df: DataFrame, codes: Map[String, String]): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val (known, unknown) = df.columns.partition(codes.contains)
    val byTarget: Seq[(String, Seq[String])] =
      known.groupBy(codes).view.mapValues(_.toSeq.sorted).toSeq.sortBy(_._1)
    val knownCols = byTarget.map {
      case (target, Seq(src)) => normalizeCell(col(s"`$src`"), fields(src)).as(target)
      case (target, srcs) =>
        array_compact(array(srcs.map(s =>
          normalizeCell(col(s"`$s`"), fields(s)).cast(StringType)): _*)).as(target)
    }
    val extraEntries = unknown.toSeq.sorted.flatMap { c =>
      Seq(lit(ColumnMapping.fallbackName(c)),
        nullToEmpty(col(s"`$c`").cast(StringType)))
    }
    val extra =
      (if (extraEntries.isEmpty) typedLit(Map.empty[String, String])
       else map(extraEntries: _*)).as("extra")
    df.select(knownCols :+ extra: _*)
  }
}
