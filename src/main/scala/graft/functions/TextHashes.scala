package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MinHash / SimHash kernels.
  *
  * These replace the `aggregate`/`zip_with` HOF formulations in
  * `graft.ops.Dedup`: the lambda forms are interpreted (one Expression
  * tree walk per array element per row) and their megamorphic eval
  * dispatch degrades ~50x late in long multi-query JVM sessions —
  * measured as the round-2 bench pollution where queries *after* the
  * dedup block ran 10-30x their isolated cost. A compiled tight loop is
  * monomorphic, allocation-light, and session-stable (same pattern as
  * [[DotFloat]]).
  *
  * Byte-identical to the HOF forms (and therefore to the DuckDB oracle
  * CTEs in CorpusQueries): same md5-over-UTF8 inputs, same seed prefixes,
  * same lexicographic-min / majority-vote semantics.
  */
object TextHashes {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".getBytes

  /** Seed prefixes "<i>|" as UTF8 bytes, cached for the small seed space. */
  private val seedPrefix: Array[Array[Byte]] =
    (0 until 64).map(i => s"$i|".getBytes("UTF-8")).toArray

  private def hex32(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(digest(i) & 0xf)
      i += 1
    }
    out
  }

  /** `k` element-wise-min md5 hex digests over the shingle array — the
    * kernel behind `Dedup.minhashSignature`. Identity element is "~"
    * (0x7e sorts after every hex digit). Null shingles contribute
    * nothing, matching `least`'s null-skipping in the HOF form.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Array[Byte]](k)
    val md = md5Local.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val sh = shingles.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(if (s < 64) seedPrefix(s) else s"$s|".getBytes("UTF-8"))
          md.update(sh)
          val h = hex32(md.digest())
          val cur = mins(s)
          if (cur == null || byteLt(h, cur)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = if (mins(s) == null) UTF8String.fromString("~") else UTF8String.fromBytes(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i) // hex is ASCII: signed compare == lexicographic
      i += 1
    }
    false
  }

  /** 64-bit SimHash bit-string over the token multiset — the kernel
    * behind `Dedup.simhashBits`. Bit b (MSB first) is '1' iff bit b of
    * the top-64 md5 bits is set in the weighted majority of tokens.
    */
  def simhash64(tokens: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val d = md.digest()
        var word = 0L
        var j = 0
        while (j < 8) { word = (word << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((word >>> (63 - b)) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    val bits = new Array[Byte](64)
    var b = 0
    while (b < 64) { bits(b) = if (votes(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromBytes(bits)
  }

  /** Polynomial rolling hash over the token array: fold of
    * (h * 31 + firstCodePoint(token)) mod 1e9+7 — byte-identical to the
    * `aggregate(transform(tokens, ascii))` HOF form (Spark's `ascii` is
    * the first CODE POINT of the string, 0 for empty; a null token nulls
    * the whole fold, matching null propagation through the lambda).
    * Returns null boxed as java.lang.Long for that case.
    */
  def rolling31(tokens: ArrayData): java.lang.Long = {
    var h = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val s = tokens.getUTF8String(i)
      val cp = if (s.numChars() > 0) s.substring(0, 1).toString.codePointAt(0) else 0
      h = (h * 31L + cp) % 1000000007L
      i += 1
    }
    h
  }

  def minhash_signature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(shingles), k))

  def simhash_bits(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHashBits(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))

  def rolling_hash(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RollingHash31(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))

  def stopword_count(tokens: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      StopwordCount(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens), words))
}

/** MinHash signature of a shingle array: `k` hex digests, each the
  * lexicographic min of `md5("<seed>|" + shingle)` over the array.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "MinHashSig: k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** 64-char '0'/'1' SimHash bit-string of a token array (MSB first). */
case class SimHashBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
  override def prettyName: String = "simhash_bits"
}

/** Rolling 31-polynomial hash of a token array (see TextHashes.rolling31).
  * Nullable even for non-null input: a null ELEMENT nulls the fold.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.rolling31(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("rh")
      s"""
         |java.lang.Long $boxed = graft.functions.TextHashes.rolling31($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash31"
}

/** Count of tokens contained in a fixed word list (repeats counted; null
  * tokens don't count) — byte-identical to size(filter(toks, isin(words))).
  */
case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(tokens: ArrayData): Int = {
    var c = 0
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && wordSet.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordExpr", this, classOf[StopwordCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
  override def prettyName: String = "stopword_count"
}
