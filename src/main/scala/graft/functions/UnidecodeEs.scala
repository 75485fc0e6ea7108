package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Spanish-accent transliteration as a native Catalyst expression with
  * whole-stage codegen (SURVEY §2.11 — the one custom-expression
  * candidate; the reference shells out to Python's unidecode,
  * ntp_utils.py:49).
  *
  * A Scala UDF here would box every row and break the codegen span of the
  * rename/normalize projection; a native expression keeps the ingest
  * pipeline fully codegen'd. The char table is the es-relevant subset —
  * the full unidecode table is overkill for PLACE field names.
  */
case class UnidecodeEs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unidecode_es requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UnidecodeEs.transliterate(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnidecodeEs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($cls.transliterate($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): UnidecodeEs =
    copy(child = newChild)
  override def prettyName: String = "unidecode_es"
}

object UnidecodeEs {
  private val accented = "áéíóúüñÁÉÍÓÚÜÑàèìòùÀÈÌÒÙâêîôûÂÊÎÔÛçÇ"
  private val plain    = "aeiouunAEIOUUNaeiouAEIOUaeiouAEIOUcC"
  private val table: Map[Char, Char] = accented.zip(plain).toMap

  /** Public static hook used by both interpreted eval and generated code. */
  def transliterate(s: String): String = {
    var i = 0
    var changed = false
    while (i < s.length && !changed) { changed = table.contains(s.charAt(i)); i += 1 }
    if (!changed) s
    else {
      val out = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) { out.append(table.getOrElse(s.charAt(j), s.charAt(j))); j += 1 }
      out.toString
    }
  }

  def unidecode_es(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(UnidecodeEs(ColumnBridge.expression(c)))
  }
}
