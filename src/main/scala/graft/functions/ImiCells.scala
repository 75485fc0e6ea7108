package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.ops.IvfImi

/** Product-coarse (IMI) cell probe as ONE compiled expression: the
  * `nOut` best product cells of a float-vector column under an
  * [[IvfImi]] codebook, best-first (summed dot desc, cell id asc).
  *
  * Cost per row: k1 + k2 half-dots (= k·dim multiplies — the SAME
  * per-row arithmetic as [[HierCells]] at equal nList) plus an
  * nOut²-pair rank, with task reference state O(k·dim) instead of
  * O(nList·dim): at nList = 10^6 that is KB, not the hundreds of MB
  * the materialized fine codebook would ship per task (the round-16
  * weak-#1 seam). Both the top-1 assignment and the top-nOut probe are
  * EXACT for the product codebook (each global top-nOut pair has both
  * components in its side's top-nOut — see [[IvfImi]]).
  */
case class ImiCells(child: Expression, imi: IvfImi, nOut: Int)
    extends UnaryExpression {
  require(nOut >= 1, s"nOut must be >= 1: $nOut")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Public for the codegen callback. */
  def probe(v: ArrayData): GenericArrayData = {
    val d1 = imi.dSplit
    val k1 = imi.k1
    val k2 = imi.k2
    val dim = d1 + imi.sub2(0).length
    // fail loudly on a dim mismatch (e.g. a corpus column mixing vector
    // widths) instead of silently assigning with a truncated dot
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"imi_cells: vector has ${v.numElements()} dims, codebook expects $dim")
    // side scores: sequential double folds, fixed order
    val s1 = new Array[Double](k1)
    var i = 0
    while (i < k1) {
      val c = imi.sub1(i)
      var s = 0.0
      var x = 0
      while (x < d1) { s += v.getFloat(x).toDouble * c(x).toDouble; x += 1 }
      s1(i) = s
      i += 1
    }
    val s2 = new Array[Double](k2)
    var j = 0
    while (j < k2) {
      val c = imi.sub2(j)
      var s = 0.0
      var x = 0
      while (x < c.length) { s += v.getFloat(d1 + x).toDouble * c(x).toDouble; x += 1 }
      s2(j) = s
      j += 1
    }
    // top-t per side (t = min(nOut, k)): repeated argmax, ties to the
    // lower index — t is small (the probe width), k can be 1000+
    def topT(sc: Array[Double], t: Int): Array[Int] = {
      val taken = new Array[Boolean](sc.length)
      val out = new Array[Int](t)
      var o = 0
      while (o < t) {
        var best = -1
        var bestD = Double.NegativeInfinity
        var c = 0
        while (c < sc.length) {
          if (!taken(c) && sc(c) > bestD) { best = c; bestD = sc(c) }
          c += 1
        }
        // every score NaN (a non-finite input vector) leaves best at -1:
        // name the cause instead of an opaque index-out-of-bounds
        if (best < 0)
          throw new IllegalArgumentException(
            "imi_cells: all side scores are NaN — the input vector contains " +
              "a non-finite value")
        taken(best) = true
        out(o) = best
        o += 1
      }
      out
    }
    val t1 = topT(s1, math.min(nOut, k1))
    val t2 = topT(s2, math.min(nOut, k2))
    // rank the t1×t2 pairs by summed dot (desc), cell id (asc)
    val nPairs = t1.length * t2.length
    val pairId = new Array[Long](nPairs)
    val pairD = new Array[Double](nPairs)
    var w = 0
    i = 0
    while (i < t1.length) {
      j = 0
      while (j < t2.length) {
        pairId(w) = t1(i).toLong * k2 + t2(j)
        pairD(w) = s1(t1(i)) + s2(t2(j))
        w += 1
        j += 1
      }
      i += 1
    }
    val lim = math.min(nOut, nPairs)
    val out = new Array[Long](lim)
    val used = new Array[Boolean](nPairs)
    var o = 0
    while (o < lim) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var p = 0
      while (p < nPairs) {
        if (!used(p) && (pairD(p) > bestD ||
          (pairD(p) == bestD && pairId(p) < bestId))) {
          best = p; bestD = pairD(p); bestId = pairId(p)
        }
        p += 1
      }
      if (best < 0)
        throw new IllegalArgumentException(
          "imi_cells: all pair scores are NaN — the input vector contains " +
            "a non-finite value")
      used(best) = true
      out(o) = pairId(best)
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imiCells", this, classOf[ImiCells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): ImiCells =
    copy(child = newChild)
  override def prettyName: String = "imi_cells"
}

object ImiCells {
  def imi_cells(vec: Column, imi: IvfImi, nOut: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ImiCells(org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        imi, nOut))
}
