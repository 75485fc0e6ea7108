package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional file clustering.
  *
  * The reference's store answers multi-predicate lookups through MongoDB
  * secondary indexes (reference: nextplib/ntp_entry.py `find()` filters
  * beyond the primary id range). A parquet lake has no secondary index;
  * what it has is per-file / per-row-group column min-max statistics.
  * Rewriting a table sorted by the interleaved bits of several bounded
  * columns (a Morton curve) makes every output file cover a small
  * hyper-rectangle of the value space, so a selective predicate on ANY
  * of the interleaved columns prunes most files at the footer — the
  * lakehouse substitute for a secondary index at 100 TB, where "read
  * 1/sqrt(n) of the files" vs "read all of them" is the whole game.
  *
  * Everything here is pure Column algebra (shifts and masks), so it is
  * codegen'd by Catalyst for free — no UDFs, no custom expressions.
  */
object Zorder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit word (magic-shift bit spreading; values must be in
    * [0, 65535]).
    */
  private[lake] def spread16(c: Column): Column = {
    val x0 = c.cast("bigint")
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two columns already bounded to [0, 65535]: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Exactly the
    * magic-shift interleave, 8 shift/mask ops per side.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Morton key of n columns at `bits` bits each (n*bits <= 63): bit i
    * of column j lands at position i*n + j. The generic form builds a
    * bit-gather expression tree (3 ops per bit) — bigger than the
    * magic-shift pair but still straight-line codegen'd arithmetic.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "zValueN needs at least two columns")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits must fit in a signed 64-bit key")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("bigint"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Linearly scale a numeric column with known bounds onto the integer
    * grid [0, 2^bits - 1] (the domain `zValue2`/`zValueN` interleave).
    * Clamped, so rows outside [lo, hi] (late data after the bounds agg)
    * land on the grid edge instead of corrupting the key. A degenerate
    * domain (hi <= lo) maps everything to 0 — a constant column simply
    * stops contributing order.
    */
  def zScale(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val top = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * top).cast("bigint")))
  }
}
