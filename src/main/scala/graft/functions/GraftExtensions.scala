package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the library's native
  * expressions for SQL use.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  ... or
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * SQL: SELECT unidecode_es(name) FROM t
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("unidecode_es"),
      new ExpressionInfo(classOf[UnidecodeEs].getName, "unidecode_es"),
      (children: Seq[Expression]) => UnidecodeEs(children.head)))
  }
}
