package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The byte-level BPE alphabet map as a native codegen'd expression:
  * every UTF-8 byte of the input becomes one mapped printable char
  * ([[graft.ops.ByteAlphabet]] — GPT-2's `bytes_to_unicode` posture
  * with '|'/'<' reserved for the symbol-sequence machinery). Applied
  * to pre-tokens right after extraction, it is the boundary between
  * raw corpus text and the mapped-alphabet strings every trainer,
  * encoder and persisted word cache operates on.
  *
  * Operates on the UTF8String's raw bytes (no String round-trip on the
  * input side) and stays inside whole-stage codegen like the other
  * graft expressions.
  */
case class ByteMap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_map requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ByteMap.mapUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ByteMap.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.mapUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteMap =
    copy(child = newChild)
  override def prettyName: String = "byte_map"
}

object ByteMap {
  /** Public static hook used by both interpreted eval and generated code. */
  def mapUtf8(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = graft.ops.ByteAlphabet.charOf(bytes(i) & 0xff)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  def byte_map(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ByteMap(ColumnBridge.expression(c)))
  }
}
