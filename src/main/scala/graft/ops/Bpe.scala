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
  * ' a| a| a| a|' collapse pairwise left-to-right). '|' and ' ' are
  * reserved: pre-tokens are [a-z]+ and the only non-letter symbol is
  * "</w>". Pair argmax ties break (count DESC, left ASC, right ASC) —
  * binary string order, identical across engines.
  */
object Bpe {

  /** One learned merge: rank is 1-based application order. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long) {
    def merged: String = lhs + rhs
  }

  /** Pre-token regex — [a-z]+ over lowercased text: the trainer's
    * alphabet must exclude the space delimiter and not collide with the
    * "</w>" end-of-word marker, so the learned-tokenizer tier trains on
    * letter runs (digits/punctuation ride the regex pre-token counter).
    */
  val PreTokenRegex = "[a-z]+"

  /** End-of-word marker symbol (the standard BPE word terminator: it
    * lets merges learn suffixes without crossing word boundaries).
    */
  val Eow = "</w>"

  private def sqlReplace(c: Column, find: Column, repl: Column): Column =
    call_function("replace", c, find, repl)

  /** Exploded [a-z]+ pre-tokens of a text column (docs with none drop). */
  def preTokens(df: DataFrame, textCol: String, as: String = "word"): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
      lit(PreTokenRegex), lit(0))).as(as))

  /** The corpus word-frequency table — the ONLY corpus-wide pass of
    * training.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    preTokens(df, textCol)
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("cnt"))

  /** Initial symbol sequence of a word: every character becomes
    * " <char>|", then the terminated end-of-word marker
    * (" l| o| w| </w>|").
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
    require(nMerges >= 1 && nMerges <= 4096, s"nMerges must be in [1, 4096]: $nMerges")
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

  /** Merge list as a DataFrame (the oracle-facing shape). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.lhs, m.rhs, m.merged, m.cnt))
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Per-word learned-token counts of a vocab DataFrame (col `word`):
    * the merge fold runs once per DISTINCT word — vocab-sized, never
    * corpus-sized.
    */
  def wordTokenCounts(vocab: DataFrame, merges: Seq[Merge]): DataFrame =
    vocab.select(col("word"),
      seqTokenCount(applySeq(seqInit(col("word")), merges)).as("n_tokens"))

  /** The learned TOKENS of a word column (array<string>, `</w>`-marked
    * final symbols included) — the encode surface trainers consume.
    * Same fold as [[applySeq]]; the split drops the leading empty from
    * the sentinel space.
    */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    split(call_function("substring",
      translate(applySeq(seqInit(word), merges), "|", ""), lit(2)), " ")

  /** Per-document learned token STREAMS: pre-tokens in order, each
    * encoded under the merge list via a vocab-sized dictionary join
    * (the fold never runs per occurrence), re-assembled in document
    * order. Returns (idCol, tokens array<string>).
    */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge]): DataFrame = {
    val words = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit(PreTokenRegex), lit(0))).as(Seq("__p", "word")))
    val wt = words.select(col("word")).distinct()
      .select(col("word"), encodeWord(col("word"), merges).as("__wtoks"))
    words.join(wt, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(array_sort(collect_list(
        struct(col("__p"), col("__wtoks")))),
        s => s.getField("__wtoks"))).as("tokens"))
  }

  /** Per-document learned-token counts: explode pre-tokens, count per
    * (doc, word), tokenize the DISTINCT vocab under the merge list,
    * join back and sum — the replace fold cost scales with vocab, the
    * rest is one aggregate + one equi-join. Documents with no [a-z]
    * pre-token drop (no tokens to count).
    */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val perDocWord = df
      .select(col(idCol), explode(regexp_extract_all(lower(col(textCol)),
        lit(PreTokenRegex), lit(0))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("__n"))
    val wt = wordTokenCounts(perDocWord.select(col("word")).distinct(), merges)
    perDocWord.join(wt, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__n") * col("n_tokens")).cast("long").as("n_bpe_tokens"))
  }
}
