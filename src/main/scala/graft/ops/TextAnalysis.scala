package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language id, quality scoring, fingerprinting.
  *
  * Everything here is pure `functions._` Column algebra — codegen'd,
  * shuffle-free (per-row), and therefore scan-bound at 100 TB: these run
  * at parquet read throughput with no exchange. No UDFs.
  */
object TextAnalysis {

  /** Whitespace tokenization with empty-token filtering (so leading /
    * trailing whitespace can't produce phantom tokens).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer regex, ASCII classes only: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs.
    * ASCII (not \p{L}) keeps Java (Spark) and RE2 (DuckDB/Go) dialects
    * byte-identical; no lookaheads for the same reason.
    */
  val BpeTokenRegex: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

  /** BPE-ish token segments of lowercased text (the pre-tokenization a
    * byte-pair encoder would merge within). A truer proxy for LLM token
    * budgets than whitespace words: punctuation and digit runs segment
    * separately, contractions split.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeTokenRegex), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Language-id by stopword voting: score(lang) = # tokens in that
    * language's stopword list (counting repeats); winner = max score,
    * ties broken by lexicographically smallest language code.
    * An n-gram-free heuristic that is exactly reproducible in SQL.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "del", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"))

  def langScores(toks: Column): Seq[(String, Column)] =
    stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> graft.functions.TextHashes.stopword_count(toks, words)
    }

  /** Predicted language code, or "und" when no stopword hits at all. */
  def langId(text: Column): Column = langIdT(tokens(text))

  /** [[langId]] over a pre-tokenized column — callers computing several
    * signals should materialize tokens ONCE in a prior projection and
    * use the `...T` variants: the HOF expression tree is interpreted,
    * so every inlined `tokens(text)` re-splits the text per row.
    */
  def langIdT(toks: Column): Column = {
    val scored = langScores(toks).map { case (lang, s) => struct((-s).as("neg"), lit(lang).as("lang"), s.as("s")) }
    val best = array_min(array(scored: _*))
    when(best.getField("s") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality score in [0,1]: blend of length saturation, stopword ratio and
    * alpha-char ratio — the shape of heuristic quality filters used by
    * large-scale corpus pipelines (C4/Gopher-style rules), kept to exact
    * integer-ratio arithmetic so it is bit-reproducible.
    */
  def qualityScore(text: Column): Column = qualityScoreT(tokens(text), text)

  /** [[qualityScore]] over a pre-tokenized column (see [[langIdT]]). */
  def qualityScoreT(toks: Column, text: Column): Column = {
    val ntok = size(toks).cast("double")
    val lenSat = least(ntok / lit(100.0), lit(1.0))
    val stopHits = graft.functions.TextHashes.stopword_count(toks, stopwords("en")).cast("double")
    val stopRatio = when(ntok > 0, stopHits / ntok).otherwise(lit(0.0))
    val alpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    val alphaRatio = when(length(text) > 0, alpha / length(text).cast("double")).otherwise(lit(0.0))
    lit(0.4) * lenSat + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)) + lit(0.3) * alphaRatio
  }

  /** Order-preserving token n-grams, space-joined; empty for documents
    * with fewer than `n` tokens. Per-row array algebra — no explode, no
    * shuffle.
    */
  def ngrams(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1, transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Duplicate-n-gram fraction — a Gopher-style repetition signal:
    * (total n-grams - distinct n-grams) / total n-grams, 0 for short
    * docs. One IEEE division of exact integer counts, so the value is
    * bit-reproducible across engines.
    */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val g = ngrams(toks, n)
    val total = size(g)
    when(total > 0,
        (total - size(array_distinct(g))).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Most-frequent-token fraction (Gopher's top-1-gram signal): count of
    * the modal token / total tokens. Per-row O(distinct x tokens)
    * interpreted array algebra — shuffle-free and fine at document
    * lengths; a corpus of pathologically long documents would swap in
    * the explode + map-side-combine count instead.
    */
  def topTokenFrac(toks: Column): Column = {
    val ntok = size(toks)
    val modal = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    when(ntok > 0, modal.cast("double") / ntok.cast("double")).otherwise(lit(0.0))
  }

  /** PII patterns for scrub/redact passes — ASCII-only, no alternation
    * beyond an optional literal, no lookarounds, so the Java (Spark) and
    * RE2 (DuckDB/Go) engines find identical matches and the same
    * pattern strings are shared verbatim with the oracle SQL.
    */
  val EmailRegex: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Regex: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRegex: String = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** Per-class PII match counts (emails, IPv4s, phone-like runs) over
    * the lowercased text. Per-row, shuffle-free, scan-bound.
    */
  def piiCounts(text: Column): Column = {
    val lo = lower(text)
    struct(
      size(regexp_extract_all(lo, lit(EmailRegex), lit(0))).as("n_emails"),
      size(regexp_extract_all(lo, lit(Ipv4Regex), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(lo, lit(PhoneRegex), lit(0))).as("n_phones"))
  }

  /** PII-redacted text: emails, then IPv4s, then phone runs replaced by
    * fixed tokens, in that order (emails first so their digit runs can't
    * be half-eaten by the phone pass). Deterministic and idempotent —
    * the replacement tokens contain no redactable substrings.
    */
  def redactPii(text: Column): Column =
    // (?i) on the ORIGINAL text: redaction must surgically replace the
    // PII spans, not return a lowercased copy of the whole document (a
    // curation pipeline rewriting textCol with this output would
    // case-mangle the corpus). Counting above still matches on lower()
    // — same occurrence set, no behavioral gap between the two.
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "(?i)" + EmailRegex, "[email]"),
        "(?i)" + Ipv4Regex, "[ip]"),
      "(?i)" + PhoneRegex, "[phone]")

  /** Canonical-form content fingerprint: md5 of lowercased,
    * punctuation-stripped, whitespace-collapsed text. Equal fingerprints =
    * near-exact duplicates modulo casing/punctuation/spacing.
    */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")))

  /** Deflate compression ratio in integer percent: `(100 * deflate_len)
    * div octet_length`, 100 for empty text. The Gopher/C4-style
    * Kolmogorov-proxy quality signal — near-random text sits near 100,
    * templated boilerplate near 0, and a curation filter cuts both
    * tails. Native codegen'd kernel ([[graft.functions.Compress]]);
    * integer floor-division so thresholds are exact.
    */
  def compressRatioPct(text: Column): Column = {
    // exact integer floor-div via pmod: the numerator made exactly
    // divisible divides without rounding (both operands < 2^53)
    val num = lit(100L) * graft.functions.Compress.deflate_len(text).cast("long")
    val len = octet_length(text).cast("long")
    when(len === 0, lit(100L))
      .otherwise(((num - pmod(num, len)) / len).cast("long"))
  }

  /** Duplicate-n-gram fraction — the Gopher-family curation signal
    * "how much of this document is boilerplate shared with the rest of
    * the corpus": per document, among its SLIDING n-gram occurrences
    * (multiplicity kept — repeated within-doc n-grams of a
    * corpus-shared string all count), the fraction whose n-gram occurs
    * in MORE THAN ONE document. Returned as (id, n_ngrams, n_dup,
    * dup_ppm) with dup_ppm on the exact integer grid (floor of
    * 10⁶·n_dup/n_ngrams) so curation thresholds are engine-exact;
    * documents shorter than n tokens report zeros.
    *
    * Scale shape: the shuffle carries md5 DIGESTS of n-grams, never
    * the text; document frequency is one groupBy over digests and the
    * per-doc fold is a digest equi-join back — both AQE-skew-splittable
    * (a boilerplate n-gram shared by 10⁸ docs is a hot KEY, not a hot
    * row group, after the map-side combine).
    */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => md5(concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val ex = docs.select(col(idCol).as("__doc"), explode(grams).as("__h"))
    val dfh = ex.groupBy(col("__h")).agg(count_distinct(col("__doc")).as("__nd"))
    val per = ex.join(dfh, Seq("__h"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup"))
    val joined = docs.select(col(idCol))
      .join(per, docs(idCol) === per("__doc"), "left_outer")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
    // exact integer floor-div (see compressRatioPct)
    val num = lit(1000000L) * col("n_dup")
    joined.withColumn("dup_ppm", when(col("n_ngrams") === 0, lit(0L))
      .otherwise(((num - pmod(num, col("n_ngrams"))) / col("n_ngrams")).cast("long")))
  }

  /** Feature-hashed sparse term-frequency vectors — the model-free
    * text→vector bridge: bucket = first three hex nibbles of
    * md5(token) (0..4095, engine-reproducible like every hash in this
    * tier), count = term frequency. Returns (id, bucket, cnt) POSTING
    * rows: the sparse representation feeds the inverted-index
    * similarity join ([[Similarity.sparseCosineTopK]]) directly — at
    * 100 TB a dense 4096-wide array per document is never
    * materialized, and the explode/groupBy pair is one shuffle with
    * map-side combine.
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"),
        conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("long").as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Polynomial rolling-hash fingerprint over the token stream
    * (order-sensitive, unlike the md5 canon form): h = fold(tokens,
    * h*31 + firstCodePoint) mod 1e9+7. Exact int64 arithmetic; native
    * codegen'd kernel (functions.RollingHash31), byte-identical to the
    * `aggregate(transform(tokens, ascii))` HOF form it replaces.
    */
  def rollingHash(text: Column): Column = rollingHashT(tokens(text))

  /** [[rollingHash]] over a pre-tokenized column (see [[langIdT]]). */
  def rollingHashT(toks: Column): Column =
    graft.functions.TextHashes.rolling_hash(toks)

  /** Concat-and-chunk sequence packing — the batch layout used for LLM
    * pretraining: documents, in a deterministic per-shard order, are laid
    * head-to-tail on a token stream that is chopped into fixed
    * `budget`-token bins; each document reports its bin and in-bin token
    * offset (a document may straddle a bin boundary — the trainer's
    * attention mask owns boundaries, the packer owns placement). One
    * exclusive prefix-sum window per shard; deterministic given
    * (shardCol, orderCol).
    *
    * Scale: the window partitions by `shardCol`, so parallelism and
    * memory are per-shard — shard the corpus (source, date, hash bucket)
    * so no single shard's token stream is driver-relevant. A global
    * (unsharded) pack would be a single-partition window; this API
    * deliberately requires the shard column.
    */
  /** Overlapping token-window chunks — the RAG/embedding slicing layout
    * (window tokens per chunk, a new chunk every `step`, so consecutive
    * chunks share `window - step` tokens of context). Pure per-row
    * Column algebra: an array of (chunk_id, chunk, n_tokens) structs,
    * scan-bound like the rest of this file — explode at the call site.
    * The tail chunk may be short (the trainer owns padding); an empty
    * document yields no chunks.
    */
  def chunkTokens(text: Column, window: Int, step: Int): Column = {
    require(window > 0 && step > 0 && step <= window,
      "need 0 < step <= window (step > window would drop tokens)")
    val toks = tokens(text)
    val n = size(toks)
    // chunks start at 0, step, 2*step, ...: floor((n-1)/step) + 1 of them.
    // sequence(0, nChunks-1) must stay guarded: Spark's sequence infers a
    // NEGATIVE step for start > stop, so an empty doc would yield [0,-1]
    val nChunks = ((n - 1).cast("long") / step).cast("long") + 1
    val chunks = transform(sequence(lit(0L), nChunks - 1), i => {
      val part = slice(toks, (i * step + 1).cast("int"), lit(window))
      struct(i.as("chunk_id"), concat_ws(" ", part).as("chunk"),
        size(part).cast("long").as("n_tokens"))
    })
    when(n > 0, chunks).otherwise(
      array().cast("array<struct<chunk_id:bigint,chunk:string,n_tokens:bigint>>"))
  }

  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
                    textCol: String, budget: Int): DataFrame =
    packSequencesOn(
      docs.select(col(shardCol), col(orderCol),
        tokenCount(col(textCol)).cast("long").as("__nt")),
      shardCol, orderCol, "__nt", budget)

  /** [[packSequences]] over a PRECOMPUTED token-count column — the seam
    * that lets packing run on learned-BPE counts ([[Bpe.docTokenCounts]]
    * / [[BpeIndex.tokenCounts]]) instead of the whitespace proxy.
    */
  def packSequencesOn(counts: DataFrame, shardCol: String, orderCol: String,
                      nTokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null count = zero tokens: a null must not poison the prefix sum
    // (every later document in the shard would get a null start)
    counts.select(col(shardCol), col(orderCol),
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(shardCol), col(orderCol), col("n_tokens"),
        // integer div, not double `/`: a prefix sum past 2^53 would round
        // through double and put bin and offset in different buckets
        expr(s"__start div $budget").as("bin"),
        (col("__start") % budget).as("offset"))
  }

  /** First-fit no-straddle packing — the OTHER trainer layout: a
    * document never splits across bins; one that would overflow the
    * current bin starts the next (an oversize document still gets a bin
    * to itself — the trainer owns truncation). Bin assignment is a
    * sequential recurrence (each document's bin depends on the previous
    * fill), so unlike [[packSequences]]'s prefix-sum window it runs as
    * one ordered fold per shard: repartition by shard, sort within
    * partitions by (shard, order), fold with a shard-change reset.
    * Shards stay data-parallel — the per-shard scan is the same work a
    * trainer's loader does, distributed across executors.
    *
    * `shardCol` is surfaced as string and `orderCol` as long (cast at
    * the select, like the multimodal ops pin their id type).
    */
  def packSequencesFirstFit(docs: DataFrame, shardCol: String, orderCol: String,
                            textCol: String, budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField(shardCol, StringType), StructField(orderCol, LongType),
      StructField("n_tokens", LongType), StructField("bin", LongType),
      StructField("offset", LongType)))
    val base = docs.select(col(shardCol).cast("string").as("__s"),
        col(orderCol).cast("long").as("__o"),
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("__n"))
      .repartition(col("__s"))
      .sortWithinPartitions(col("__s"), col("__o"))
    val rdd = base.rdd.mapPartitions { it =>
      var shard: String = null
      var bin = 0L; var off = 0L
      it.map { r =>
        val s = r.getString(0); val o = r.getLong(1); val n = r.getLong(2)
        if (s != shard) { shard = s; bin = 0L; off = 0L }
        else if (off > 0 && off + n > budget) { bin += 1; off = 0L }
        val row = org.apache.spark.sql.Row(s, o, n, bin, off)
        off += n
        row
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
