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

  /** Word 3-shingles of the token stream, space-joined, deduplicated.
    *
    * Built with `zip_with` over shifted copies of the token array so the
    * (expensive) tokenization chain only ever appears in HOF *argument*
    * position — argument arrays are evaluated once per row, while any
    * expression inside a lambda body is re-evaluated per element (an
    * `element_at(tokens(text), i)` formulation is O(tokens^2) per row and
    * was measured 25x slower). Trailing positions where the shifted
    * copies run out null-propagate through concat and are filtered.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    require(w == 3, "shingles: only w=3 is implemented (zip_with construction)")
    val toks = tokens(text)
    val t2 = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val t3 = slice(toks, lit(3), greatest(size(toks) - 2, lit(0)))
    val pairs = zip_with(toks, t2, (a, b) => concat(a, lit(" "), b))
    val triples = zip_with(pairs, t3, (p, c) => concat(p, lit(" "), c))
    array_distinct(filter(triples, x => x.isNotNull))
  }

  /** One MinHash value: lexicographic min of md5("<seed>|" + shingle).
    * The md5-hex min is a valid min-wise hash (uniform over shingles) and
    * is reproducible in any engine with md5. (Single-seed form — for a
    * full signature use `minhashSignature`, which folds every seed into
    * ONE pass over the shingle array.)
    */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$seed|"), s))))

  /** MinHash signature as an array of `k` hex digests, computed in a
    * SINGLE `aggregate` fold over the shingles: each element contributes
    * its k seed-hashes to a running element-wise minimum. A
    * k-separate-`transform`s formulation scans (and re-materializes) the
    * shingle array k times — measured 28 s for the sf0.1 pair query vs
    * one pass here. '~' (0x7e) sorts after every hex digit, so it is a
    * safe identity for the lexicographic min; empty shingle arrays yield
    * the identity array (callers filter size >= 1).
    */
  def minhashSignature(sh: Column, k: Int): Column =
    aggregate(
      sh,
      array_repeat(lit("~"), k),
      (acc, s) => zip_with(
        acc,
        array((0 until k).map(i => md5(concat(lit(s"$i|"), s))): _*),
        (a, h) => least(a, h)))

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * hashes, each group concatenated into one bucket key. Two documents
    * collide on a band iff that band's hashes all match. `sig` is a
    * `minhashSignature(_, bands * rowsPerBand)` column.
    */
  def bandKeysFromSignature(sig: Column, bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      concat_ws("#", (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }

  /** Candidate near-duplicate pairs via MinHash LSH: documents sharing at
    * least one band. Returns distinct (a, b) with a < b.
    * One shuffle on the band key; candidate count is data-dependent, not
    * O(n^2). The shingle set is materialized as a column first so the
    * bands*rowsPerBand hash expressions share one tokenization (multi-use
    * attributes are not inlined by CollapseProject).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val withSh = docs.withColumn("__sh", shingles(col(textCol)))
      .filter(size(col("__sh")) >= 1)
      .withColumn("__sig", minhashSignature(col("__sh"), bands * rowsPerBand))
    val keys = bandKeysFromSignature(col("__sig"), bands, rowsPerBand)
    // persist: the self-join would otherwise evaluate the whole
    // shingle+minhash pipeline once per side
    val banded = withSh
      .select(col(idCol).as("doc"),
        posexplode(array(keys: _*)).as(Seq("band", "key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    *
    * Single-pass: one aggregate folds every token's 64-bit vote vector
    * into a 64-long accumulator (md5 is computed once per token; a
    * 64-separate-aggregates formulation recomputes it 64x).
    */
  def simhashBits(text: Column): Column = {
    val hs = transform(tokens(text), t => substring(md5(t), 1, 16))
    val votes = aggregate(
      hs,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (a, b) => {
        val hexPos = (b / 4).cast("int") + 1                          // 1-based hex char, MSB first
        val mask = element_at(array(lit(8), lit(4), lit(2), lit(1)),  // bit in nibble, MSB first
          pmod(b, lit(4)).cast("int") + 1)
        a + when((instr(lit("0123456789abcdef"), h.substr(hexPos, lit(1))) - 1)
          .bitwiseAND(mask) > 0, lit(1L)).otherwise(lit(-1L))
      }))
    array_join(transform(votes, v => when(v > 0, lit("1")).otherwise(lit("0"))), "")
  }

  /** Hamming distance between two equal-length bit-strings. */
  def hammingBits(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), d => d))

  /** SimHash near-duplicate candidates: split the 64-bit signature into
    * `chunks` contiguous blocks; by pigeonhole, any pair within Hamming
    * distance < chunks shares at least one identical block — so the
    * block value is a correct LSH bucket key for that radius.
    *
    * The signature is carried as `chunks` int64 words (parsed once per
    * doc), so per-pair Hamming is xor + bit_count — the bit-string
    * zip_with form costs ~1 ms/pair interpreted and dominated the whole
    * query on clustered corpora where buckets produce 100k+ raw pairs.
    */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        chunks: Int = 4, maxHamming: Int = 3): DataFrame = {
    val width = 64 / chunks
    val wordCols = (0 until chunks).map { c =>
      conv(substring(col("sig"), c * width + 1, width), 2, 10).cast("long").as(s"w$c")
    }
    val sig = docs.select(col(idCol).as("doc"), simhashBits(col(textCol)).as("sig"))
      .select(col("doc") +: wordCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(col("doc"),
      posexplode(array((0 until chunks).map(c => col(s"w$c")): _*)).as(Seq("chunk", "key")))
    val hamming = (0 until chunks)
      .map(c => bit_count(col(s"x.w$c").bitwiseXOR(col(s"y.w$c"))))
      .reduce(_ + _)
    banded.as("bx").join(banded.as("by"),
        col("bx.chunk") === col("by.chunk") && col("bx.key") === col("by.key") &&
          col("bx.doc") < col("by.doc"))
      .select(col("bx.doc").as("a"), col("by.doc").as("b"))
      .distinct()
      .join(sig.as("x"), col("a") === col("x.doc"))
      .join(sig.as("y"), col("b") === col("y.doc"))
      .select(col("a"), col("b"), hamming.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
