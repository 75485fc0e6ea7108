package graft.ingest

import org.apache.spark.sql.Column
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
}
