package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer (Sennrich et al. 2016, ACL —
  * public): train a merge list on corpus word frequencies, apply it to
  * count/emit learned tokens. The reference pipeline has no tokenizer;
  * this is the beyond-reference LLM-pipeline tier the regex pre-token
  * counter ([[TextAnalysis.bpeTokenCount]]) approximates — packing and
  * token-budget decisions should run on LEARNED tokens.
  *
  * Distributed posture (the part that matters at 100 TB): BPE training
  * never iterates the corpus — it iterates the WORD-FREQUENCY table.
  * One corpus-wide pre-token count (map-side combined aggregate,
  * Heaps'-law vocab-sized result) runs first; every merge round then
  * touches only (word, cnt, seq) rows: one pair-count aggregate over
  * the vocab, one driver-side argmax row, one column rewrite. Rounds
  * are vocab-sized jobs regardless of corpus bytes.
  *
  * Symbol-sequence representation — shared with the DuckDB oracle: a
  * word's symbols are space-joined with a LEADING space and a TRAILING
  * '|' terminator per symbol (" l| o| w| </w>|"). Applying merge (x, y)
  * is the plain string replace of " x| y|" with " xy|": the pattern is
  * left-bounded by x's leading space and right-bounded by y's
  * terminator, so a merge can never fire where y is a proper PREFIX of
  * the next symbol (the round-15 advisor finding: under leading-space-
  * only symbols, merges (t,h) then (a,t) turned 'bath' into [b, ath]
  * because ' a t' matched inside ' a th'). The match consumes through
  * y's terminator but NOT the next symbol's leading space, so
  * left-to-right non-overlapping replace still coincides with BPE's
  * greedy merge scan in BOTH engines (consecutive occurrences like
  * ' a| a| a| a|' collapse pairwise left-to-right). '|', ' ' and '<'
  * are reserved — which is safe because symbols are never raw text:
  * every pre-token passes through the BYTE-LEVEL alphabet
  * ([[ByteAlphabet]], the GPT-2 `bytes_to_unicode` posture) first, so
  * base symbols are the 256 mapped byte chars (none of which is a
  * reserved char) and the only multi-char primitive is "</w>", which
  * no merged symbol can spell ('<' never maps). Digits, punctuation,
  * uppercase, accents and non-Latin scripts are all first-class: there
  * is no out-of-alphabet text. Pair argmax ties break (count DESC,
  * left ASC, right ASC) — binary string order, identical across
  * engines.
  */
object Bpe {

  /** One learned merge: rank is 1-based application order. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long) {
    def merged: String = lhs + rhs
  }

  /** Pre-token regex — letter runs, digit runs, and non-space
    * symbol/punctuation runs (the GPT-2 pre-tokenizer shape, minus the
    * lookahead RE2 lacks): EVERY non-whitespace character lands in
    * exactly one pre-token, case preserved. The whitespace class is
    * spelled explicitly because Java's \s and RE2's \s disagree on
    * \x0B; \p{L}/\p{N} are Unicode categories in both dialects, so the
    * Spark side and the DuckDB oracle split text identically.
    */
  val PreTokenRegex = "\\p{L}+|\\p{N}+|[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"

  /** A raw pre-token column mapped through the byte alphabet — the form
    * every downstream surface stores/joins/encodes as `word`. Merge-list
    * symbols, persisted word caches and token strings all live in
    * mapped-alphabet space (exactly like GPT-2 vocab files).
    */
  def mapWord(w: Column): Column = graft.functions.ByteMap.byte_map(w)

  /** End-of-word marker symbol (the standard BPE word terminator: it
    * lets merges learn suffixes without crossing word boundaries).
    */
  val Eow = "</w>"

  private def sqlReplace(c: Column, find: Column, repl: Column): Column =
    call_function("replace", c, find, repl)

  /** Exploded byte-mapped pre-tokens of a text column (docs with no
    * non-whitespace character drop).
    */
  def preTokens(df: DataFrame, textCol: String, as: String = "word"): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenRegex), lit(0))).as("__rw"))
      .select(mapWord(col("__rw")).as(as))

  /** The corpus word-frequency table — the ONLY corpus-wide pass of
    * training.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    preTokens(df, textCol)
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("cnt"))

  /** Initial symbol sequence of a (byte-mapped) word: every mapped char
    * becomes " <char>|", then the terminated end-of-word marker
    * (" l| o| w| </w>|"). Valid because mapped chars are never ' ',
    * '|', '<' or a line terminator ('(.)' matches each one).
    */
  def seqInit(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1|"), lit(" " + Eow + "|"))

  /** Apply a merge list (in rank order) to a symbol sequence column —
    * a fold of codegen'd string replaces, no UDF. The " x| y|" pattern
    * is bounded on both sides (see the object doc), so a replace is
    * exactly one greedy left-to-right merge pass.
    */
  def applySeq(seq: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(seq)((c, m) =>
      sqlReplace(c, lit(" " + m.lhs + "| " + m.rhs + "|"), lit(" " + m.merged + "|")))

  /** Symbol count of a sequence = its space count (every symbol is
    * preceded by exactly one space) — O(len), no split/array.
    */
  def seqTokenCount(seq: Column): Column =
    (length(seq) - length(sqlReplace(seq, lit(" "), lit("")))).cast("long")

  /** Train `nMerges` merge rounds on a word-frequency table
    * (word, cnt). Per round: adjacent-pair weighted count over the
    * vocab, argmax to the driver (one row), merge applied as a string
    * replace, lineage truncated. Stops early when no adjacent pair
    * remains (fully merged vocab). Returns merges in rank order.
    */
  def trainOnCounts(words: DataFrame, nMerges: Int): Seq[Merge] = {
    // each round applies ONE merge (fold depth 1 + checkpoint), so the
    // ceiling is about sequential round count, not expression depth —
    // production vocabs whose word-count table fits the driver should
    // use [[trainLocalOnCounts]] (identical output, no per-round job)
    require(nMerges >= 1 && nMerges <= 65536, s"nMerges must be in [1, 65536]: $nMerges")
    var w = words
      .select(col("word"), col("cnt").cast("long").as("cnt"),
        seqInit(col("word")).as("seq"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val top = w
        // strip the '|' terminators before splitting: pair (x, y) rows
        // carry the bare symbols the merge list publishes
        .select(col("cnt"), split(expr("substring(replace(seq, '|', ''), 2)"), " ").as("sy"))
        .select(col("cnt"), explode(expr(
          "transform(slice(sy, 1, size(sy) - 1), " +
            "(s, i) -> named_struct('x', s, 'y', element_at(sy, i + 2)))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(r, top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        out += m
        val prev = w
        w = w.withColumn("seq", applySeq(col("seq"), Seq(m)))
          .localCheckpoint(true) // vocab-sized; truncates the per-round lineage
        prev.unpersist()
        r += 1
      }
    }
    w.unpersist()
    out.toSeq
  }

  /** End-to-end training over a corpus text column. */
  def train(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    trainOnCounts(wordCounts(df, textCol), nMerges)

  /** Driver-local trainer over a collected word-frequency table —
    * IDENTICAL output to [[trainOnCounts]] (same greedy pass, same
    * (count DESC, lhs, rhs) tie-break; spec-pinned), without the
    * per-round Spark job. The vocab is Heaps'-law-sized, so at
    * production vocab targets (8k-64k merges) this is the practical
    * path: ONE distributed corpus pass builds the counts
    * ([[wordCounts]]), the merge rounds run in-memory. HF-style
    * tokenizer trainers make exactly this trade.
    */
  def trainLocalOnCounts(words: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 65536, s"nMerges must be in [1, 65536]: $nMerges")
    val seqs = words.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer(
        (w.map(String.valueOf(_)) :+ Eow): _*), c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      seqs.foreach { case (sy, c) =>
        var i = 0
        while (i + 1 < sy.length) {
          counts.merge((sy(i), sy(i + 1)), c, (a, b) => a + b); i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
        }
        val (x, y) = best._1
        out += Merge(r, x, y, best._2)
        seqs.foreach { case (sy, _) =>
          var i = 0
          while (i + 1 < sy.length) {
            if (sy(i) == x && sy(i + 1) == y) { sy(i) = x + y; sy.remove(i + 1) }
            i += 1
          }
        }
        r += 1
      }
    }
    out.toSeq
  }

  /** Largest word-count table [[trainLocal]] may collect. */
  val LocalTrainVocabCap = 4000000

  /** End-to-end driver-local training: one distributed word-count pass,
    * then in-memory merge rounds. Fails loudly if the vocab exceeds
    * [[LocalTrainVocabCap]] rows (beyond that, the distributed
    * [[train]] path is the honest choice).
    */
  def trainLocal(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val rows = wordCounts(df, textCol).limit(LocalTrainVocabCap + 1).collect()
    require(rows.length <= LocalTrainVocabCap,
      s"vocab exceeds the local-train cap ($LocalTrainVocabCap rows) — use train()")
    trainLocalOnCounts(
      rows.map(r => (r.getString(0), r.getLong(1))).toSeq, nMerges)
  }

  /** Merge list as a DataFrame (the oracle-facing shape). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.lhs, m.rhs, m.merged, m.cnt))
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Above this merge count the encode surfaces switch from the
    * replace fold (one expression node per merge — the oracle-shared
    * shape) to the native [[graft.functions.BpeEncode]] expression
    * (one compiled node regardless of vocab size). The two are
    * spec-pinned equivalent; 64 keeps every oracle query (12 merges)
    * on the provably-oracle-identical fold while production vocabs
    * never build a 32k-deep expression tree.
    */
  val FoldMergeLimit = 64

  private def rankPairs(merges: Seq[Merge]): Seq[(String, String)] =
    merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))

  /** Per-word learned-token counts of a vocab DataFrame (col `word`):
    * the merge fold runs once per DISTINCT word — vocab-sized, never
    * corpus-sized.
    */
  def wordTokenCounts(vocab: DataFrame, merges: Seq[Merge]): DataFrame =
    if (merges.size <= FoldMergeLimit)
      vocab.select(col("word"),
        seqTokenCount(applySeq(seqInit(col("word")), merges)).as("n_tokens"))
    else
      vocab.select(col("word"),
        size(encodeWord(col("word"), merges)).cast("long").as("n_tokens"))

  /** The learned TOKENS of a word column (array<string>, `</w>`-marked
    * final symbols included) — the encode surface trainers consume.
    * Fold path for small merge lists (the oracle shape); the native
    * expression above [[FoldMergeLimit]].
    */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    if (merges.size <= FoldMergeLimit)
      split(call_function("substring",
        translate(applySeq(seqInit(word), merges), "|", ""), lit(2)), " ")
    else
      graft.functions.BpeEncode.bpe_encode(word, rankPairs(merges))

  /** Pinned-vocab token IDS of a word column — the shape sequence
    * packing / trainers consume: '</w>' = 0, base byte b = b + 1
    * (1..256, via [[ByteAlphabet.byteValue]] on the mapped char),
    * merged symbol = 256 + rank of the FIRST merge producing that
    * string (two merges can build the same string; min rank wins —
    * deterministic in any engine). Always the native expression: id
    * emission has no oracle-shared fold form; the SQL oracle maps token
    * strings through the same CASE + min-rank vocab join.
    */
  def encodeWordIds(word: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeEncode.bpe_encode_ids(word, rankPairs(merges))

  /** Per-document learned token STREAMS: pre-tokens in order, each
    * encoded under the merge list via a vocab-sized dictionary join
    * (the fold never runs per occurrence), re-assembled in document
    * order. Returns (idCol, tokens array<string>).
    */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge]): DataFrame =
    encodeDocsWith(df, idCol, textCol, encodeWord(col("word"), merges), "tokens")

  /** [[encodeDocs]] emitting pinned-vocab integer id streams
    * ([[encodeWordIds]] scheme) — what a sequence-packing stage feeds a
    * trainer. Returns (idCol, token_ids array<int>).
    */
  def encodeDocsIds(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[Merge]): DataFrame =
    encodeDocsWith(df, idCol, textCol, encodeWordIds(col("word"), merges), "token_ids")

  /** DETOKENIZE a pinned-vocab id stream back to pre-token text (words
    * joined with single spaces — lossless at pre-token granularity,
    * see [[graft.functions.BpeDecode]]).
    */
  def decodeIds(ids: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeDecode.bpe_decode_ids(ids, rankPairs(merges))

  private def encodeDocsWith(df: DataFrame, idCol: String, textCol: String,
                             wordEnc: Column, outCol: String): DataFrame = {
    val words = df.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol),
          lit(PreTokenRegex), lit(0))).as(Seq("__p", "__rw")))
      .select(col(idCol), col("__p"), mapWord(col("__rw")).as("word"))
    val wt = words.select(col("word")).distinct()
      .select(col("word"), wordEnc.as("__wtoks"))
    words.join(wt, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(array_sort(collect_list(
        struct(col("__p"), col("__wtoks")))),
        s => s.getField("__wtoks"))).as(outCol))
  }

  /** Per-document learned-token counts: explode pre-tokens, count per
    * (doc, word), tokenize the DISTINCT vocab under the merge list,
    * join back and sum — the replace fold cost scales with vocab, the
    * rest is one aggregate + one equi-join. Documents with no
    * pre-token (all-whitespace/empty text) drop — no tokens to count.
    */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val perDocWord = df
      .select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(PreTokenRegex), lit(0))).as("__rw"))
      .select(col(idCol), mapWord(col("__rw")).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("__n"))
    val wt = wordTokenCounts(perDocWord.select(col("word")).distinct(), merges)
    perDocWord.join(wt, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__n") * col("n_tokens")).cast("long").as("n_bpe_tokens"))
  }
}
