package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus relevance scoring (BM25) — the ranking half of training-data
  * curation: "which documents best match this probe query" drives
  * targeted-domain mixes, seed-set expansion and eval-set mining the
  * same way the quality score drives filtering.
  *
  * Scale shape (the inverted-index probe as dataframes): the ONLY
  * full-corpus work is the tokenize + per-row length scan; everything
  * after `filter(tok in terms)` is proportional to the query terms'
  * posting lists, not the corpus. Per-term document frequencies and the
  * corpus stats are broadcast scalars; the per-(doc, term) contribution
  * is one narrow join; the final score is a fixed-order sum over a
  * pivoted row — no shuffle wider than the matched postings anywhere.
  *
  * Numeric parity: the idf is the RATIONAL BM25 idf
  * `(N - df + 0.5) / (df + 0.5)` rather than the usual `ln` of it —
  * a transcendental would be libm-dependent and break bit-identical
  * cross-engine comparison, while rational arithmetic under one fixed
  * parenthesization is IEEE-deterministic everywhere. Monotone in the
  * true idf, so rankings are BM25 rankings.
  */
object Relevance {

  /** BM25 scores for every document matching >= 1 of `terms`
    * (whitespace-lowercase tokenization, [[TextAnalysis.tokens]]).
    * Returns (idCol, score) — callers order/limit.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be non-empty and distinct")
    // the fixed-order sum pivots ONE agg column per term — right for
    // probe-sized queries, O(terms) in plan width: large term sets go
    // through [[bm25Fold]] (same scores bit-for-bit, constant-width plan)
    require(terms.length <= 64,
      s"bm25 pivots one aggregate column per term (fixed-order summation); " +
        s"got ${terms.length} terms, max 64 — use bm25Fold for large term sets")
    val pivoted = contributions(docs, idCol, textCol, terms, k1, b)
      .groupBy(col(idCol)).agg(
        max(when(col("__tok") === terms.head, col("__c"))).as(s"__c_0"),
        terms.tail.zipWithIndex.map { case (t, i) =>
          max(when(col("__tok") === t, col("__c"))).as(s"__c_${i + 1}")
        }: _*)
    val score = terms.indices.map(i => coalesce(col(s"__c_$i"), lit(0.0)))
      .reduceLeft[Column](_ + _)
    pivoted.select(col(idCol), score.as("score"))
  }

  /** BM25 with a CONSTANT-WIDTH plan for large term sets: the per-term
    * contributions collect as (term index, contribution) pairs, sort by
    * term index, and fold left-associated — the same reduction order as
    * the pivot (adding 0.0 for an absent term is the IEEE identity), so
    * scores match [[bm25]] bit-for-bit while plan width stays O(1) in
    * the term count.
    */
  def bm25Fold(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be non-empty and distinct")
    val termIdx = array_position(array(terms.map(lit): _*), col("__tok"))
    contributions(docs, idCol, textCol, terms, k1, b)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(termIdx.as("i"), col("__c").as("c")))).as("__cs"))
      .select(col(idCol),
        aggregate(col("__cs"), lit(0.0), (acc, s) => acc + s.getField("c")).as("score"))
  }

  /** Corpus-trained bigram language-model likelihood score per document
    * — the KenLM-shaped fluency signal of the curation tier (beside the
    * heuristic quality score): gibberish and boilerplate-shuffled text
    * scores low because its token transitions are rare in the corpus,
    * fluent text scores high.
    *
    * The model is the corpus itself (train == score set, the classic
    * in-domain perplexity proxy): per bigram (prev, cur), the ML
    * conditional probability c(prev,cur)/c(prev) on an INTEGER
    * PARTS-PER-MILLION grid — `(1e6 * c2) div c1` — instead of log
    * space, because ln is libm-dependent while integer floor-division
    * is exact in any engine (same reasoning as the rational BM25 idf
    * above). A document's score is the integer mean of its bigram ppms:
    * avg_ppm = sum_ppm div n_bigrams. Monotone in average conditional
    * likelihood, so rankings are LM rankings.
    *
    * Scale shape: tokenize once; bigram and context counts are
    * map-side-combined aggregations over the BIGRAM DOMAIN (vocabulary²
    * bounded, corpus-distinct in practice — never raw-row-sized after
    * the combine); the score table joins back to the per-doc bigram
    * stream by (prev, cur) equi-join. Nothing driver-side, no window
    * over the corpus.
    *
    * Returns (idCol, n_bigrams, avg_ppm) for documents with >= 2
    * tokens; callers order.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("__doc"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2) // guard BEFORE sequence: sequence(1, 0) would descend
      .select(col("__doc"), explode(expr(
        "transform(sequence(1, size(__toks) - 1), i -> struct(__toks[i-1] AS prev, __toks[i] AS cur))")).as("__b"))
      .select(col("__doc"), col("__b.prev").as("prev"), col("__b.cur").as("cur"))
    val c2 = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
    val scored = c2.join(c1, "prev")
      .withColumn("ppm", expr("CAST((1000000 * c2) div c1 AS BIGINT)"))
    bg.join(scored, Seq("prev", "cur"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("__sum_ppm"))
      .select(col("__doc").as(idCol), col("n_bigrams"),
        expr("CAST(__sum_ppm div n_bigrams AS BIGINT)").as("avg_ppm"))
  }

  /** The shared BM25 core: one row per (doc, matched term) with the
    * idf * tf-saturation contribution `__c` — everything past the
    * `tok IN terms` filter is posting-list-sized.
    */
  private def contributions(docs: DataFrame, idCol: String, textCol: String,
                            terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    val dl = toks.select(col(idCol), size(col("__toks")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val tf = toks.select(col(idCol), explode(col("__toks")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    // tf is unique per (doc, term), so df = row count per term
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    // fixed parenthesization — every () below must match the oracle SQL
    // character-for-character in association order
    val idf = (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val tfw = (col("__tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("__tf").cast("double") +
        lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("__dl").cast("double") / avgdl)))
    tf.join(broadcast(dfreq), "__tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__c", idf * tfw)
  }
}
