package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

import graft.ops.PqModel

/** Product-quantization encode as ONE compiled expression: each vector
  * splits into `mSub` contiguous `dsub`-dim subvectors and every
  * subvector maps to the index of its L2-NEAREST centroid in that
  * subspace's codebook (ties to the lower code) — the PQ code layout of
  * Jégou, Douze & Schmid, "Product quantization for nearest neighbor
  * search" (TPAMI 2011, public). A 64-float embedding becomes `mSub`
  * BYTES (stored offset by -128 like the SQ8 tier's codes): the
  * 100 TB memory lever one step past SQ8 — 8 bytes/vector instead of
  * 64, so a 10^11-vector corpus's candidate codes fit a serving tier's
  * RAM.
  *
  * The codebook rides the plan as a task reference object (same shape
  * as [[HierCells]]); cost is mSub·ks·dsub multiplies per row inside
  * one monomorphic loop in whole-stage codegen.
  */
case class PqCodes(child: Expression, model: PqModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Public for the codegen callback. */
  def encode(v: ArrayData): GenericArrayData = {
    val mSub = model.codebooks.length
    val dsub = model.dsub
    val out = new Array[Byte](mSub)
    var m = 0
    while (m < mSub) {
      val cb = model.codebooks(m)
      val off = m * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val x = v.getFloat(off + j).toDouble - cent(j).toDouble
          d += x * x
          j += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      out(m) = (best - 128).toByte
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

/** Asymmetric-distance (ADC) scoring as ONE compiled expression: the
  * approximate inner product of a full-precision QUERY against a
  * PQ-coded candidate, Σ_m dot(q_m, codebook_m[code_m]) — the query
  * side stays exact, only the candidate is reconstructed (the ADC of
  * the PQ paper, inner-product form).
  *
  * The per-query lookup table (mSub × ks dots — the thing that makes
  * ADC cheap: ks·dim multiplies ONCE per query, then mSub ADDS per
  * candidate) is memoized per qid in a thread-local cache, so the
  * candidate stream after the cell join pays table lookups, not dot
  * products, whatever order the rows arrive in. The cache is bounded
  * (cleared past 4096 queries) — query sets in this engine are the
  * small/broadcast side by contract.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression,
                 model: PqModel) extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val luts =
    new ThreadLocal[java.util.HashMap[Long, (Long, Array[Array[Double]])]] {
      override def initialValue() = new java.util.HashMap[Long, (Long, Array[Array[Double]])]()
    }

  // vector digest guarding the qid-keyed cache: two rows sharing a qid
  // (duplicate ids, or distinct ids colliding after cast("long")) with
  // DIFFERENT vectors must never score against each other's table. The
  // digest folds EVERY element's raw bits (FNV-1a over the float words),
  // so any bit-level divergence recomputes. Honest cost accounting: the
  // fold runs on every EVALUATED row — a cache HIT still pays O(dim)
  // xor-multiplies, because each row deserializes a fresh ArrayData (no
  // stable reference to memoize against). That per-candidate guard is
  // ~dim integer ops vs the dim float-multiply dot it replaces and the
  // mSub·ks·dsub LUT rebuild it prevents — the cheap part of the row,
  // but NOT free; dropping the guard would trade it for silent
  // wrong-table scoring on qid collisions, which is never worth it.
  private def qvDigest(qv: ArrayData): Long = PqAdcRes.digest(qv)

  private def lutFor(qid: Long, qv: ArrayData): Array[Array[Double]] = {
    val cache = luts.get()
    val dig = qvDigest(qv)
    val hit = cache.get(qid)
    if (hit != null && hit._1 == dig) return hit._2
    if (cache.size() > 4096) cache.clear()
    val mSub = model.codebooks.length
    val dsub = model.dsub
    val lut = new Array[Array[Double]](mSub)
    var m = 0
    while (m < mSub) {
      val cb = model.codebooks(m)
      val off = m * dsub
      val row = new Array[Double](cb.length)
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var s = 0.0
        var j = 0
        while (j < dsub) { s += qv.getFloat(off + j).toDouble * cent(j).toDouble; j += 1 }
        row(c) = s
        c += 1
      }
      lut(m) = row
      m += 1
    }
    cache.put(qid, (dig, lut))
    lut
  }

  /** Public for the codegen callback. */
  def adc(qid: Long, qv: ArrayData, codes: ArrayData): Double = {
    val lut = lutFor(qid, qv)
    var s = 0.0
    var m = 0
    while (m < lut.length) { s += lut(m)(codes.getByte(m) + 128); m += 1 }
    s
  }

  override protected def nullSafeEval(q: Any, v: Any, c: Any): Any =
    adc(q.asInstanceOf[Long], v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (q, v, c) => s"${ev.value} = $ref.adc($q, $v, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "pq_adc"
}

/** RESIDUAL product-quantization encode (the standard IVFADC posture,
  * Jégou et al. TPAMI 2011 §IV): the codes quantize x − μ_cell instead
  * of x, concentrating the codebook's 256 entries per subspace on
  * WITHIN-CELL variation — at the same 8 bytes/vector the
  * reconstruction error drops by roughly the between-cell variance,
  * which is most of the energy once cells are tight. Implemented as
  * one compiled binary expression (vector, cell id): the subtraction
  * folds into the distance loop (x_j − μ_j − cent_j), no intermediate
  * residual array is materialized. Fails loudly on a cell id outside
  * the codebook — a residual code is meaningless under the wrong μ.
  */
case class PqCodesRes(left: Expression, right: Expression, model: PqModel,
                      mu: Map[Long, Array[Float]]) extends BinaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Public for the codegen callback. */
  def encode(v: ArrayData, cell: Long): GenericArrayData = {
    val m0 = mu.getOrElse(cell,
      throw new IllegalArgumentException(s"pq_codes_res: unknown cell id $cell"))
    val mSub = model.codebooks.length
    val dsub = model.dsub
    val out = new Array[Byte](mSub)
    var m = 0
    while (m < mSub) {
      val cb = model.codebooks(m)
      val off = m * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val x = v.getFloat(off + j).toDouble - m0(off + j).toDouble - cent(j).toDouble
          d += x * x
          j += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      out(m) = (best - 128).toByte
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    encode(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesRes", this, classOf[PqCodesRes].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.encode($v, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqCodesRes =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_codes_res"
}

/** Residual-mode ADC scoring: the approximate inner product of a
  * full-precision query against a candidate whose codes quantize
  * x − mu(cell) is q·mu(cell) + Σ_m lut_m[code_m] — the same per-query
  * lookup table as [[PqAdc]] (built over the RESIDUAL codebooks) plus
  * a per-(query, cell) centroid-dot offset, memoized separately so the
  * candidate stream still pays mSub adds + two map hits per row, never
  * a dim-length dot. Both caches carry the query-vector digest guard.
  */
case class PqAdcRes(first: Expression, second: Expression, third: Expression,
                    fourth: Expression, model: PqModel,
                    mu: Map[Long, Array[Float]]) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val inner = PqAdc(first, second, third, model)

  @transient private lazy val cellDots =
    new ThreadLocal[java.util.HashMap[(Long, Long), (Long, Double)]] {
      override def initialValue() = new java.util.HashMap[(Long, Long), (Long, Double)]()
    }

  private def cellDot(qid: Long, qv: ArrayData, cell: Long): Double = {
    val cache = cellDots.get()
    val dig = PqAdcRes.digest(qv)
    val key = (qid, cell)
    val hit = cache.get(key)
    if (hit != null && hit._1 == dig) return hit._2
    if (cache.size() > 65536) cache.clear()
    val m0 = mu.getOrElse(cell,
      throw new IllegalArgumentException(s"pq_adc_res: unknown cell id $cell"))
    var s = 0.0
    var j = 0
    val n = math.min(m0.length, qv.numElements())
    while (j < n) { s += qv.getFloat(j).toDouble * m0(j).toDouble; j += 1 }
    cache.put(key, (dig, s))
    s
  }

  /** Public for the codegen callback. */
  def adc(qid: Long, qv: ArrayData, codes: ArrayData, cell: Long): Double =
    inner.adc(qid, qv, codes) + cellDot(qid, qv, cell)

  override protected def nullSafeEval(q: Any, v: Any, c: Any, cl: Any): Any =
    adc(q.asInstanceOf[Long], v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], cl.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcRes", this, classOf[PqAdcRes].getName)
    nullSafeCodeGen(ctx, ev, (q, v, c, cl) => s"${ev.value} = $ref.adc($q, $v, $c, $cl);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqAdcRes =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
  override def prettyName: String = "pq_adc_res"
}

object PqAdcRes {
  /** FNV-1a fold over every element's raw float bits plus the length —
    * the cache guard must see ANY divergence between two vectors that
    * collide on a qid, not just first/last-element drift.
    */
  private[functions] def digest(qv: ArrayData): Long = {
    val n = qv.numElements()
    var h = 0xcbf29ce484222325L ^ (n.toLong << 17)
    var i = 0
    while (i < n) {
      h = (h ^ (java.lang.Float.floatToRawIntBits(qv.getFloat(i)).toLong & 0xffffffffL)) *
        0x100000001b3L
      i += 1
    }
    h
  }
}

/** Residual PQ encode under PRODUCT (IMI) cells: the subtraction
  * reference μ_cell = [sub1_i ++ sub2_j] is DERIVED from the two
  * O(√nCells) sub-codebooks instead of looked up in a per-cell map —
  * the piece that lets residual coding survive nCells = 10^6+ where a
  * materialized mu map would be GB-scale task state (the Multi-D-ADC
  * layout of Babenko & Lempitsky, CVPR 2012).
  */
case class PqCodesImiRes(left: Expression, right: Expression, model: PqModel,
                         imi: graft.ops.IvfImi) extends BinaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Public for the codegen callback. */
  def encode(v: ArrayData, cell: Long): GenericArrayData = {
    val k2 = imi.k2
    val ci = (cell / k2).toInt
    val cj = (cell % k2).toInt
    require(ci < imi.k1 && cj < k2 && cell >= 0,
      s"pq_codes_imi_res: cell $cell outside the ${imi.k1}x$k2 product")
    val a = imi.sub1(ci)
    val b = imi.sub2(cj)
    val d1 = imi.dSplit
    val mSub = model.codebooks.length
    val dsub = model.dsub
    // fail loudly before reading past numElements (ArrayData reads past
    // the end are undefined, not an exception)
    if (v.numElements() != d1 + b.length || v.numElements() != mSub * dsub)
      throw new IllegalArgumentException(
        s"pq_codes_imi_res: vector has ${v.numElements()} dims, expected " +
          s"${d1 + b.length} (IMI) = ${mSub * dsub} (PQ)")
    val out = new Array[Byte](mSub)
    var m = 0
    while (m < mSub) {
      val cb = model.codebooks(m)
      val off = m * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val p = off + j
          val mu = if (p < d1) a(p).toDouble else b(p - d1).toDouble
          val x = v.getFloat(p).toDouble - mu - cent(j).toDouble
          d += x * x
          j += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      out(m) = (best - 128).toByte
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    encode(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesImiRes", this, classOf[PqCodesImiRes].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.encode($v, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqCodesImiRes =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_codes_imi_res"
}

/** Residual ADC under product cells: q·μ_cell factorizes into
  * lut1(i) + lut2(j) — two per-query side tables of k dots each (built
  * once per query, the same arithmetic the IMI probe already pays), so
  * the candidate stream costs mSub adds + two array reads per row with
  * ZERO per-cell state. This is what makes the 8-byte residual tier
  * serveable at 10^6+ cells.
  */
case class PqAdcImiRes(first: Expression, second: Expression, third: Expression,
                       fourth: Expression, model: PqModel,
                       imi: graft.ops.IvfImi) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val inner = PqAdc(first, second, third, model)

  @transient private lazy val sideLuts =
    new ThreadLocal[java.util.HashMap[Long, (Long, Array[Double], Array[Double])]] {
      override def initialValue() =
        new java.util.HashMap[Long, (Long, Array[Double], Array[Double])]()
    }

  private def lutsFor(qid: Long, qv: ArrayData): (Array[Double], Array[Double]) = {
    val cache = sideLuts.get()
    val dig = PqAdcRes.digest(qv)
    val hit = cache.get(qid)
    if (hit != null && hit._1 == dig) return (hit._2, hit._3)
    if (cache.size() > 4096) cache.clear()
    val d1 = imi.dSplit
    val dim = d1 + imi.sub2(0).length
    if (qv.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_adc_imi_res: query vector has ${qv.numElements()} dims, " +
          s"codebook expects $dim")
    val l1 = new Array[Double](imi.k1)
    var i = 0
    while (i < imi.k1) {
      val c = imi.sub1(i)
      var s = 0.0
      var x = 0
      while (x < d1) { s += qv.getFloat(x).toDouble * c(x).toDouble; x += 1 }
      l1(i) = s
      i += 1
    }
    val l2 = new Array[Double](imi.k2)
    var j = 0
    while (j < imi.k2) {
      val c = imi.sub2(j)
      var s = 0.0
      var x = 0
      while (x < c.length) { s += qv.getFloat(d1 + x).toDouble * c(x).toDouble; x += 1 }
      l2(j) = s
      j += 1
    }
    cache.put(qid, (dig, l1, l2))
    (l1, l2)
  }

  /** Public for the codegen callback. */
  def adc(qid: Long, qv: ArrayData, codes: ArrayData, cell: Long): Double = {
    val (l1, l2) = lutsFor(qid, qv)
    inner.adc(qid, qv, codes) + l1((cell / imi.k2).toInt) + l2((cell % imi.k2).toInt)
  }

  override protected def nullSafeEval(q: Any, v: Any, c: Any, cl: Any): Any =
    adc(q.asInstanceOf[Long], v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], cl.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcImiRes", this, classOf[PqAdcImiRes].getName)
    nullSafeCodeGen(ctx, ev, (q, v, c, cl) => s"${ev.value} = $ref.adc($q, $v, $c, $cl);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqAdcImiRes =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
  override def prettyName: String = "pq_adc_imi_res"
}

object PqCodes {
  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def col(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** PQ codes (array<tinyint>, one byte per subspace) of a float-vector
    * column under a trained [[PqModel]].
    */
  def pq_codes(vec: Column, model: PqModel): Column =
    col(PqCodes(bridge(vec), model))

  /** ADC approximate inner product of (qid, query vector) against a
    * candidate's PQ codes.
    */
  def pq_adc(qid: Column, qv: Column, codes: Column, model: PqModel): Column =
    col(PqAdc(bridge(qid), bridge(qv), bridge(codes), model))

  /** Residual PQ codes of (vector, cell id) under a residual-trained
    * model and the per-cell subtraction reference (mu).
    */
  def pq_codes_res(vec: Column, cell: Column, model: PqModel,
                   mu: Map[Long, Array[Float]]): Column =
    col(PqCodesRes(bridge(vec), bridge(cell), model, mu))

  /** Residual-mode ADC: q·μ_cell + the residual lookup-table sum. */
  def pq_adc_res(qid: Column, qv: Column, codes: Column, cell: Column,
                 model: PqModel, mu: Map[Long, Array[Float]]): Column =
    col(PqAdcRes(bridge(qid), bridge(qv), bridge(codes), bridge(cell), model, mu))

  /** Residual PQ codes under PRODUCT (IMI) cells — μ derived from the
    * sub-codebooks, no per-cell map.
    */
  def pq_codes_imi_res(vec: Column, cell: Column, model: PqModel,
                       imi: graft.ops.IvfImi): Column =
    col(PqCodesImiRes(bridge(vec), bridge(cell), model, imi))

  /** Residual ADC under product cells: side-factorized centroid dots. */
  def pq_adc_imi_res(qid: Column, qv: Column, codes: Column, cell: Column,
                     model: PqModel, imi: graft.ops.IvfImi): Column =
    col(PqAdcImiRes(bridge(qid), bridge(qv), bridge(codes), bridge(cell), model, imi))
}
