package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: deterministic
  * sampling and per-source token budgeting (data mixing). Both are
  * single-window transforms — one shuffle on the stratum/shard key, no
  * driver state, no randomness (content-hash order replaces RNG so
  * every engine and every run agrees).
  */
object Curation {

  /** Deterministic stratified sample: per stratum, keep the `n` rows
    * with the smallest `md5(seed || content)` (ties by id). A content
    * hash is uniform over the corpus — this IS a uniform n-per-stratum
    * sample — but unlike `rand()` it is reproducible across engines,
    * runs, and repartitioning, which is what a training-data pipeline
    * needs for auditable subsets. One window per stratum; at 100 TB the
    * shuffle key is the stratum column and skew is bounded by the
    * largest stratum (salt the window's sort via a pre-aggregated top-n
    * per partition if one stratum dominates).
    */
  def sampleStratified(df: DataFrame, strataCol: String, idCol: String,
                       contentCol: String, n: Int, seed: String = "s0"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(seed), col(contentCol))), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Per-source token-budget curation — the data-mixing step: within
    * each shard (source), admit documents in `orderBy` priority order
    * until the shard's token budget is exhausted. Admission uses
    * concat-and-chunk semantics (a document is admitted iff it STARTS
    * under budget, so the boundary document is kept whole and every
    * shard with any document admits at least one). Returns the admitted
    * rows with their `n_tokens` and running `start` offset — feed the
    * result straight into [[TextAnalysis.packSequences]].
    */
  def capTokenBudget(docs: DataFrame, shardCol: String, textCol: String,
                     budget: Long, orderBy: Seq[Column]): DataFrame =
    capTokenBudgetT(
      docs.withColumn("__cap_toks", TextAnalysis.tokens(col(textCol))),
      shardCol, "__cap_toks", budget, orderBy).drop("__cap_toks")

  /** [[capTokenBudget]] over a pre-tokenized corpus (`toksCol` a
    * materialized token array): callers that also compute quality or
    * other token signals should tokenize once and pass the column here —
    * the interpreted HOF tree otherwise re-splits the text per inlined
    * mention (see TextAnalysis.langIdT).
    */
  def capTokenBudgetT(docs: DataFrame, shardCol: String, toksCol: String,
                      budget: Long, orderBy: Seq[Column]): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // null text = zero tokens (same prefix-sum safety as packSequences)
    docs.withColumn("n_tokens", coalesce(size(col(toksCol)).cast("long"), lit(0L)))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("start") < budget)
  }

  /** Deterministic output sharding for training-data landing: shard id =
    * first `hexChars` hex digits of md5(content) — 16^hexChars shards,
    * uniform over the corpus and (like [[sampleStratified]]'s hash
    * order) reproducible across engines, runs, and repartitioning where
    * `rand()`- or task-id-based sharding is not. Pure per-row column
    * algebra; the downstream `partitionBy("shard")` write is the only
    * exchange, and shard sizes concentrate around corpus/16^hexChars
    * (md5 uniformity), so output files are balanced without a sort.
    */
  def assignShards(df: DataFrame, contentCol: String, hexChars: Int = 1): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, "hexChars must be in [1, 8]")
    df.withColumn("shard", substring(md5(col(contentCol)), 1, hexChars))
  }
}
