package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-id codec for versioned records.
  *
  * Re-expresses the reference's ntp-id scheme (reference:
  * nextplib/ntp_utils.py:14-32 `parse_ntp_id`/`check_ntp_id`/`get_group`,
  * nextplib/ntp_entry.py:48-50 `set_ntp_id`, nextplib/ntp_constants.py:23-27
  * `MIN_ORDER`) as pure codegen'd Column expressions — no UDFs, so every
  * use stays inside whole-stage codegen and is pushdown-friendly.
  *
  * Id space: `ntp%08d`, zero-padded so STRING ordering == numeric ordering
  * (load-bearing: min/max pruning on parquet and range predicates on the
  * string column behave like numeric range scans). The id space is
  * partitioned by group: group 0 (insiders/outsiders) starts at 0, group 1
  * (minors) at 10,000,000 — i.e. `ntp0…` vs `ntp1…` prefixes.
  */
object NtpIds {
  /** Minors group id offset (reference: ntp_constants.py:23-27). */
  val MinOrderMinors: Long = 10000000L

  /** 42L -> "ntp00000042" (reference: ntp_entry.py:48-50). */
  def setNtpId(order: Column): Column = format_string("ntp%08d", order)

  /** "ntp00000042" -> 42L (reference: ntp_utils.py:14-19). */
  def parseNtpId(id: Column): Column = substring(id, 4, 8).cast("long")

  /** `^ntp[0-9]{8}` validity (reference: ntp_utils.py:21-26). */
  def checkNtpId(id: Column): Column = id.rlike("^ntp[0-9]{8}$")

  /** Id group = the leading digit of the 8-digit minor: group g owns
    * [g·10M, (g+1)·10M). The reference populates groups 0 and 1
    * (ntp0…/ntp1…, ntp_utils.py:28-32, read_parquet.py --group) and
    * this generalizes the
    * same prefix rule to the codec's full 10-group capacity — the
    * round-15 ~sf10 smoke showed a single group's 10M-id window is a
    * REAL wall for a 13.5M-row bulk load, and the reference's own
    * answer is more groups, not wider ids.
    *
    * Malformed ids classify as group 0 (the reference's get_group
    * returns 0 for anything that is not a well-formed group-1 id) —
    * never NULL, so a `group === 0` predicate cannot silently drop
    * them (advisor finding). Deliberate, parity-relevant divergence:
    * valid ntp2…-ntp9… ids classify as groups 2-9 here where the
    * reference would say 0 — the reference never MINTS such ids, but a
    * lake partitioned under the old everything-is-0 rule must be
    * rewritten before serving group-pruned reads at groups ≥ 2.
    */
  def group(id: Column): Column =
    when(checkNtpId(id), substring(id, 4, 1).cast("int")).otherwise(lit(0))

  /** Half-open / closed range membership with null-safe open ends
    * (reference: ntp_storage.py:12-23 `is_in_range`).
    */
  def inRange(id: Column, lo: Option[String], hi: Option[String]): Column = {
    val loOk = lo.map(l => id >= lit(l)).getOrElse(lit(true))
    val hiOk = hi.map(h => id <= lit(h)).getOrElse(lit(true))
    loOk && hiOk
  }

  /** ntp id from a stored file name `<ntp_id>_<field>.<ext>`
    * (reference: ntp_storage.py:25-30).
    */
  def idFromFileName(name: Column): Column = substring_index(name, "_", 1)

  /** File-name composition `<ntp_id>_<field>.<ext>` (reference: ntp_utils.py:225-227). */
  def fileName(ntpId: Column, field: Column, ext: Column): Column =
    concat_ws(".", concat_ws("_", ntpId, field), ext)
}
