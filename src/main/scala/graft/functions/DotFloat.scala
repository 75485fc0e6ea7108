package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential-double dot product of two float arrays as a native
  * codegen'd expression: `sum_i (double)a[i] * (double)b[i]`, left fold.
  *
  * This is the hot per-pair gate of the similarity operators. The
  * `aggregate(zip_with(...))` lambda form is interpreted and its eval
  * path degrades badly in long multi-query sessions (megamorphic
  * dispatch); a compiled tight loop is ~50x faster and stable. Semantics
  * are identical to the lambda form (same op order), so it can gate the
  * exact decimal pass with a fixed error margin.
  */
case class DotFloat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two DotFloat instances in one codegen scope must not
      // collide (fixed identifiers made the second fall back to the
      // interpreted path this expression exists to avoid)
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotFloat =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_float"
}

object DotFloat {
  def dot_float(a: Column, b: Column): Column =
    ColumnBridgeAccess.column(DotFloat(ColumnBridgeAccess.expression(a), ColumnBridgeAccess.expression(b)))

  private object ColumnBridgeAccess {
    def column(e: Expression): Column = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
    def expression(c: Column): Expression = org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  }
}
