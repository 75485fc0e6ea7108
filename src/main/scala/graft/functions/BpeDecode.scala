package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pinned-vocab BPE DETOKENIZATION — the inverse of
  * [[BpeEncode]]'s `emitIds` mode, completing the round trip a
  * training-data pipeline needs for inspection and debugging: id 0 is
  * the '</w>' word boundary, 1..256 are base bytes (via
  * [[graft.ops.ByteAlphabet]]), 256+r is merge r's merged string.
  * The byte bijection makes decoding LOSSLESS at pre-token
  * granularity: every non-whitespace character of the source text
  * lives in exactly one pre-token, so decode rebuilds the pre-token
  * stream exactly; only the inter-token whitespace runs (which the
  * pre-tokenizer drops) collapse to single spaces.
  *
  * Merged symbols may CONTAIN embedded '</w>' markers (a merge whose
  * rhs absorbed the terminator), so the decoder accumulates the full
  * mapped-symbol stream and splits on the literal marker — safe
  * because '<' is never a mapped alphabet char.
  */
case class BpeDecode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode_ids requires array<int>, got ${other.catalogString}")
    }

  @transient private lazy val mergedOf: Array[String] =
    merges.map { case (x, y) => x + y }.toArray

  /** Public for the codegen callback. */
  def decode(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder(ids.numElements() * 2)
    var i = 0
    while (i < ids.numElements()) {
      val id = ids.getInt(i)
      if (id == 0) sb.append(graft.ops.Bpe.Eow)
      else if (id >= 1 && id <= graft.ops.ByteAlphabet.BaseIds)
        sb.append(graft.ops.ByteAlphabet.charOf(id - 1))
      else if (id > graft.ops.ByteAlphabet.BaseIds &&
        id <= graft.ops.ByteAlphabet.BaseIds + mergedOf.length)
        sb.append(mergedOf(id - graft.ops.ByteAlphabet.BaseIds - 1))
      else throw new IllegalArgumentException(
        s"bpe_decode_ids: id $id outside the ${mergedOf.length}-merge vocab")
      i += 1
    }
    val out = new java.lang.StringBuilder(sb.length)
    var first = true
    sb.toString.split(java.util.regex.Pattern.quote(graft.ops.Bpe.Eow), -1)
      .foreach { w =>
        if (w.nonEmpty) {
          if (!first) out.append(' ')
          out.append(graft.ops.ByteAlphabet.unmap(w))
          first = false
        }
      }
    UTF8String.fromString(out.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecode", this, classOf[BpeDecode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.decode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecode =
    copy(child = newChild)
  override def prettyName: String = "bpe_decode_ids"
}

object BpeDecode {
  /** The pre-token text of an id-stream column under a rank-ordered
    * merge list (words joined with single spaces).
    */
  def bpe_decode_ids(ids: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeDecode(ColumnBridge.expression(ids), merges))
  }
}
