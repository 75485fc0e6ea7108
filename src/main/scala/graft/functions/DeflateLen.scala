package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed size of a string — the compression-ratio quality
  * signal of web-scale corpus curation (Gopher/C4-style filters):
  * near-random text barely compresses (ratio → 1), templated/repetitive
  * boilerplate compresses extremely well (ratio → 0), and both tails
  * are what a training-data filter wants to cut. The DEFLATE stream
  * (RFC 1951 via `java.util.zip.Deflater`, fixed level 6, nowrap) is a
  * cheap proxy for Kolmogorov complexity that needs no model.
  *
  * Not part of the DuckDB-oracle surface (SQL engines don't expose
  * deflate): the driver row is a per-source contract query
  * (txt_compress_ratio) whose exact numeric behavior is spec-pinned on
  * crafted strings instead.
  */
object Compress {

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    // nowrap: raw DEFLATE, no zlib header/checksum — the 2-6 header
    // bytes would wash out ratios of very short strings
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Size in bytes of deflate(utf8 bytes of `s`) at level 6. */
  def deflateLen(s: UTF8String): Int = {
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflate_len(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DeflateLen(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}

/** deflate-compressed byte length of a string (level 6, nowrap). */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Compress.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
  override def prettyName: String = "deflate_len"
}
