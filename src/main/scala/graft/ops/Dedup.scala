package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation at 100 TB scale:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Design for scale:
  *  - exact dedup is one hash-shuffle on a 16-byte digest (not the text);
  *  - MinHash/LSH turns O(n^2) pair comparison into a band-bucket
  *    self-join whose shuffle key is the band signature — only documents
  *    sharing a band ever meet, and AQE handles hot buckets;
  *  - SimHash is per-row Column algebra (shuffle-free until the
  *    band-join), with 64-bit signatures packed as bit-strings;
  *  - Jaccard verification runs only on LSH candidates, never all pairs.
  *
  * All hashing is md5-based so the operators are engine-agnostic and
  * exactly reproducible (same candidates on any backend — the
  * correctness oracle relies on this).
  */
object Dedup {
  import TextAnalysis.tokens

  /** Word w-shingles of the token stream, space-joined, deduplicated. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= w,
        transform(sequence(lit(1), size(toks) - (w - 1)), i =>
          concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** One MinHash value: lexicographic min of md5("<seed>|" + shingle).
    * The md5-hex min is a valid min-wise hash (uniform over shingles) and
    * is reproducible in any engine with md5.
    */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$seed|"), s))))

  /** MinHash signature as an array of `k` hex digests. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(minhash(sh, _)): _*)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * hashes, each group concatenated into one bucket key. Two documents
    * collide on a band iff that band's hashes all match.
    */
  def bandKeys(text: Column, bands: Int, rowsPerBand: Int): Seq[Column] = {
    val sh = shingles(text)
    (0 until bands).map { b =>
      concat_ws("#", (0 until rowsPerBand).map(r => minhash(sh, b * rowsPerBand + r)): _*)
    }
  }

  /** Candidate near-duplicate pairs via MinHash LSH: documents sharing at
    * least one band. Returns distinct (a, b) with a < b.
    * One shuffle on the band key; candidate count is data-dependent, not
    * O(n^2).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val keys = bandKeys(col(textCol), bands, rowsPerBand)
    val banded = docs
      .filter(size(tokens(col(textCol))) >= 3)
      .select(col(idCol).as("doc"),
        posexplode(array(keys: _*)).as(Seq("band", "key")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
  }

  /** n-gram Jaccard similarity between two shingle-set columns. Exact
    * rational arithmetic (intersection/union sizes) until the final
    * division, so it's deterministic.
    */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    val union = size(array_union(shA, shB)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** 64-bit SimHash over the token multiset, returned as a 64-char '0'/'1'
    * bit-string (MSB first). Bit b is 1 iff the b-th bit of md5(token)
    * (taken from the first 16 hex chars) is set in the weighted majority
    * of tokens. Pure Column algebra, no shuffle.
    */
  def simhashBits(text: Column): Column = {
    val hs = transform(tokens(text), t => substring(md5(t), 1, 16))
    val bitCols = (0 until 64).map { b =>
      val hexPos = b / 4 + 1            // 1-based hex char index, MSB first
      val mask = 8 >> (b % 4)           // bit within the hex nibble, MSB first
      val votes = aggregate(hs, lit(0L), (acc, h) =>
        acc + when((instr(lit("0123456789abcdef"), substring(h, hexPos, 1)) - 1)
          .bitwiseAND(lit(mask)) > 0, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** Hamming distance between two equal-length bit-strings. */
  def hammingBits(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), d => d))

  /** SimHash near-duplicate candidates: split the 64-bit signature into
    * `chunks` contiguous blocks; by pigeonhole, any pair within Hamming
    * distance < chunks shares at least one identical block — so the
    * block value is a correct LSH bucket key for that radius.
    */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        chunks: Int = 4, maxHamming: Int = 3): DataFrame = {
    val width = 64 / chunks
    val sig = docs.select(col(idCol).as("doc"), simhashBits(col(textCol)).as("sig"))
    val banded = sig.select(col("doc"), col("sig"),
      posexplode(array((0 until chunks).map(c => substring(col("sig"), c * width + 1, width)): _*))
        .as(Seq("chunk", "key")))
    banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        hammingBits(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
