package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `sum_i (codes[i] + 128) * (double)q[i]` over an `array<tinyint>` code
  * column and an `array<float>` query vector — the compiled per-pair
  * kernel of the int8-quantized ANN tier ([[graft.ops.Similarity.ivfTopKInt8]]).
  *
  * The affine int8 scheme stores a vector as 1-byte codes plus (lo, hi);
  * its dot with a query decomposes as
  * `lo * sum(q) + scale * sum((code_i + 128) * q_i)` — everything outside
  * this expression is per-row Column algebra. Keeping the codes as
  * tinyint end-to-end is the point: the probe join shuffles 1 byte per
  * component instead of 4, and this loop reads bytes straight out of the
  * unsafe array.
  */
case class DotByteFloat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += (a.getByte(i).toInt + 128) * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (((int) $a.getByte($i)) + 128) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotByteFloat =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_byte_float"
}

object DotByteFloat {
  def dot_byte_float(codes: Column, q: Column): Column =
    ColumnBridgeAccess.column(DotByteFloat(
      ColumnBridgeAccess.expression(codes), ColumnBridgeAccess.expression(q)))

  private object ColumnBridgeAccess {
    def column(e: Expression): Column = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
    def expression(c: Column): Expression = org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  }
}
