package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column<->Expression conversions
  * (the classic `new Column(expr)` constructor is gone in the
  * ColumnNode-based API). Lives under the org.apache.spark.sql namespace
  * solely to access the package-private utils — standard practice for
  * libraries shipping native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
