package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Session-extension entry point: registers every native expression the
  * library ships for plain-SQL use, so `spark.sql` users get the same
  * codegen'd kernels the Column API exposes.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)   ... or
  *   spark.sql.extensions=graft.functions.GraftExtensions         ... or
  *   GraftExtensions.registerAll(spark)    // an already-built session
  *
  * SQL surface:
  *   unidecode_es(str)                  accent-fold (es), native codegen
  *   dot_float(arr, arr)                float dot product (ANN coarse gate)
  *   dot_byte_float(codes, arr)         int8-code x float dot (IVF-SQ8)
  *   minhash_sig(shingles, k)           k-hash MinHash signature
  *   simhash_bits(tokens)               64-bit SimHash as '0'/'1' string
  *   rolling_hash(tokens)               31-polynomial order-sensitive hash
  *   stopword_count(tokens, array(...)) tokens contained in a word list
  *   deflate_len(str)                   deflate-compressed byte length
  *   nfc_normalize(str)                 Unicode NFC canonicalization
  *   canonical_url(str)                 RFC 3986-style URL canonical key
  *   byte_map(str)                      byte-level BPE alphabet map
  *   bpe_encode(word, 'x y;a b')        learned-BPE tokens of a word
  *   bpe_encode_ids(word, 'x y;a b')    ...as pinned-vocab integer ids
  *   bpe_decode_ids(ids, 'x y;a b')     ...and back to pre-token text
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inventory.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(this.getClass.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Register the SQL functions on an ALREADY-BUILT session (the
    * extension class only applies at session construction).
    */
  def registerAll(spark: SparkSession): Unit =
    inventory.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private def intLit(e: Expression, usage: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$usage: expected an integer literal, got $e")
  }

  /** array('a','b',...) of string literals -> Seq[String]. */
  private def stringArrayLit(e: Expression, usage: String): Seq[String] = e match {
    case CreateArray(items, _) if items.forall {
      case Literal(v, StringType) => v != null; case _ => false
    } => items.map(_.eval(null).toString)
    case _ => throw new IllegalArgumentException(
      s"$usage: expected array('w1', 'w2', ...) of string literals, got $e")
  }

  private def arity(name: String, n: Int)(c: Seq[Expression]): Seq[Expression] = {
    require(c.length == n, s"$name expects $n argument(s), got ${c.length}")
    c
  }

  private[functions] val inventory: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "unidecode_es" -> (c => UnidecodeEs(arity("unidecode_es", 1)(c).head)),
    "dot_float" -> (c => { val a = arity("dot_float", 2)(c); DotFloat(a(0), a(1)) }),
    "dot_byte_float" -> (c => { val a = arity("dot_byte_float", 2)(c); DotByteFloat(a(0), a(1)) }),
    "minhash_sig" -> (c => { val a = arity("minhash_sig", 2)(c)
      MinHashSig(a(0), intLit(a(1), "minhash_sig(shingles, k)")) }),
    "simhash_bits" -> (c => SimHashBits(arity("simhash_bits", 1)(c).head)),
    "rolling_hash" -> (c => RollingHash31(arity("rolling_hash", 1)(c).head)),
    "stopword_count" -> (c => { val a = arity("stopword_count", 2)(c)
      StopwordCount(a(0), stringArrayLit(a(1), "stopword_count(tokens, words)")) }),
    "deflate_len" -> (c => DeflateLen(arity("deflate_len", 1)(c).head)),
    "nfc_normalize" -> (c => NfcNormalize(arity("nfc_normalize", 1)(c).head)),
    "canonical_url" -> (c => CanonicalUrl(arity("canonical_url", 1)(c).head)),
    "byte_map" -> (c => ByteMap(arity("byte_map", 1)(c).head)),
    "bpe_encode" -> (c => { val a = arity("bpe_encode", 2)(c)
      BpeEncode(a(0), BpeEncode.parseMerges(
        stringLit(a(1), "bpe_encode(word, merges)")), emitIds = false) }),
    "bpe_encode_ids" -> (c => { val a = arity("bpe_encode_ids", 2)(c)
      BpeEncode(a(0), BpeEncode.parseMerges(
        stringLit(a(1), "bpe_encode_ids(word, merges)")), emitIds = true) }),
    "bpe_decode_ids" -> (c => { val a = arity("bpe_decode_ids", 2)(c)
      BpeDecode(a(0), BpeEncode.parseMerges(
        stringLit(a(1), "bpe_decode_ids(ids, merges)"))) }))

  private def stringLit(e: Expression, usage: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ => throw new IllegalArgumentException(
      s"$usage: expected a string literal merge list, got $e")
  }
}
