package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE word encoder — the production-vocab serve path of
  * [[graft.ops.Bpe]] (round-15 verdict ask: the `applySeq` fold builds
  * one string-replace expression PER MERGE, so a real 32k-merge vocab
  * would be a 32k-deep expression tree; this is one compiled expression
  * whatever the vocab size).
  *
  * Semantics are EXACTLY the rank-order fold's (greedy left-to-right
  * pass per merge, ranks ascending), implemented without touching the
  * merges that cannot apply: a pending set holds the ranks of merge
  * rules whose symbol pair is currently adjacent somewhere; each step
  * pops the LOWEST pending rank r and performs rule r's greedy
  * left-to-right pass; an adjacency created by that pass enqueues its
  * rule only when its rank is ABOVE r — a pair whose rank is below r
  * had its turn before the adjacency existed, exactly as the fold
  * (which is already past rank r) would see it. Each pass is O(|word|),
  * passes are bounded by initial adjacencies + 2 per applied merge, so
  * encoding is O(|word|²) with tiny constants and INDEPENDENT of vocab
  * size — vs the fold's O(|word|·nMerges).
  *
  * Output mode: `emitIds = false` returns the token strings (the
  * [[graft.ops.Bpe.encodeWord]] shape, `</w>`-marked final symbol
  * included); `emitIds = true` returns the pinned-vocab integer ids the
  * sequence-packing tier consumes — '</w>' = 0, base byte b = b + 1
  * (1..256: the input word is in [[graft.ops.ByteAlphabet]] mapped
  * space, so a single-char symbol IS a byte), merged symbol = 256 +
  * rank of the FIRST merge producing that string (two merges can build
  * the same string; the min rank is the vocab row, deterministic in
  * any engine). Ids mode fails loudly on a single char outside the
  * byte alphabet — the caller forgot to map the word.
  *
  * Codegen calls back into [[encode]] via a plan reference object — the
  * loop is one monomorphic JVM method, and the expression stays inside
  * whole-stage codegen.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     emitIds: Boolean) extends UnaryExpression {
  override def dataType: DataType =
    if (emitIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // rank lookup by adjacent pair; ranks are 1-based positions in `merges`
  @transient private lazy val pairRank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      m.putIfAbsent(x + "\u0000" + y, Integer.valueOf(i + 1))
    }
    m
  }
  // merged-string id: 256 + min rank producing it (ids mode)
  @transient private lazy val mergedId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      m.putIfAbsent(x + y, Integer.valueOf(graft.ops.ByteAlphabet.BaseIds + i + 1))
    }
    m
  }

  /** One word's symbol list after every merge, in rank order. */
  private def mergedSymbols(word: String): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    syms.add(graft.ops.Bpe.Eow)
    val pending = new java.util.TreeSet[Integer]()
    var j = 0
    while (j + 1 < syms.size) {
      val r = pairRank.get(syms.get(j) + "\u0000" + syms.get(j + 1))
      if (r != null) pending.add(r)
      j += 1
    }
    while (!pending.isEmpty) {
      val r = pending.pollFirst()
      val (x, y) = merges(r - 1)
      var k = 0
      while (k + 1 < syms.size) {
        if (syms.get(k) == x && syms.get(k + 1) == y) {
          syms.set(k, x + y)
          syms.remove(k + 1)
          // new adjacencies; enqueue only ranks ABOVE r (a lower rank
          // already had its fold turn before this adjacency existed)
          if (k > 0) {
            val q = pairRank.get(syms.get(k - 1) + "\u0000" + syms.get(k))
            if (q != null && q > r) pending.add(q)
          }
          if (k + 1 < syms.size) {
            val q = pairRank.get(syms.get(k) + "\u0000" + syms.get(k + 1))
            if (q != null && q > r) pending.add(q)
          }
          // the replace consumed both symbols: resume AFTER the merged one
        }
        k += 1
      }
    }
    syms
  }

  /** Public for the codegen callback. */
  def encode(word: UTF8String): GenericArrayData = {
    val syms = mergedSymbols(word.toString)
    if (emitIds) {
      val out = new Array[Int](syms.size)
      var i = 0
      while (i < syms.size) {
        val s = syms.get(i)
        out(i) =
          if (s == graft.ops.Bpe.Eow) 0
          else if (s.length == 1) {
            val b = graft.ops.ByteAlphabet.byteValue(s.charAt(0))
            require(b >= 0, s"bpe_encode_ids: char U+${s.charAt(0).toInt.toHexString} " +
              "is not in the byte alphabet — pass byte_map()'d words")
            b + 1
          } else mergedId.get(s).intValue()
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](syms.size)
      var i = 0
      while (i < syms.size) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def col(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Token strings of a word column under a rank-ordered merge list. */
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    col(BpeEncode(bridge(word), merges, emitIds = false))

  /** Pinned-vocab token ids of a word column (see class doc id scheme). */
  def bpe_encode_ids(word: Column, merges: Seq[(String, String)]): Column =
    col(BpeEncode(bridge(word), merges, emitIds = true))

  /** Parse the SQL-surface merge-list literal: rank-ordered pairs
    * "lhs rhs" joined with ';' (e.g. 't h;a t').
    */
  def parseMerges(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(';').toIndexedSeq.map { p =>
      val q = p.split(' ')
      require(q.length == 2 && q(0).nonEmpty && q(1).nonEmpty,
        s"bpe_encode merges: expected 'lhs rhs' pairs joined by ';', got '$p'")
      (q(0), q(1))
    }
}
