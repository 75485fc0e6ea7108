package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE aggregate
  * pass — the reference's per-field checking scripts (reference:
  * checking/clean_place.py's field audits, OLD/get_entities.py:32-43's
  * NIF format validation) generalized to a rule engine, the dbt-test /
  * Delta-constraint shape a lake ingest gates drops with.
  *
  * Every row-local rule is a Column predicate, so N rules cost one
  * scan + one map-side-combined aggregate regardless of N — at 100 TB
  * the audit reads the drop once, and the report is rule-count-sized.
  * Uniqueness is the one non-row-local expectation; it rides the same
  * aggregate as `count(col) - countDistinct(col)` (NULL keys are NOT
  * duplicates — they're a [[notNull]] violation; counting them here
  * would misdirect the operator toward deduping, the
  * SnapshotLake.requireKeyUnique lesson).
  *
  * [[report]] returns (rule, violations, n_rows, pass) — aggregate
  * output, safe to collect/log. [[gate]] is the pipeline form: pass
  * the DataFrame through untouched, or throw listing every failed rule
  * (a drop with 3 broken fields surfaces all 3, not the first).
  */
object Expectations {

  /** A named expectation: `violated` is a per-row predicate that is
    * TRUE exactly on the rows breaking the rule.
    */
  final case class Rule(name: String, violated: Column)

  /** The column must never be null. */
  def notNull(c: String): Rule = Rule(s"not_null($c)", col(c).isNull)

  /** Non-null values must lie in [lo, hi] (nulls are [[notNull]]'s
    * business — a range rule that also fired on null would double-count
    * one defect as two).
    */
  def inRange(c: String, lo: Column, hi: Column): Rule =
    Rule(s"in_range($c)", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Non-null values must match the (Java) regex in FULL. `rlike` alone
    * is substring search — an unanchored pattern like `[1-5]-` would
    * silently validate only a prefix — so the pattern is anchored
    * internally (`^(?:re)$`; explicit anchors in `regex` stay no-ops at
    * the string boundaries, so already-anchored patterns are unchanged).
    */
  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(s"^(?:$regex)$$"))

  /** Non-null values must be one of `values`. */
  def accepted(c: String, values: Seq[String]): Rule =
    Rule(s"accepted($c)", col(c).isNotNull && !col(c).isin(values: _*))

  /** Arbitrary row predicate: `cond` must HOLD on every row. */
  def satisfies(name: String, cond: Column): Rule = Rule(s"check($name)", !cond)

  /** One row per rule: (rule, violations, n_rows, pass), ordered by
    * rule name. `uniqueCols` adds a `unique(col)` row per listed column
    * (violations = non-null occurrences minus distinct non-null
    * values). One scan, one aggregate, rule-count-sized output.
    */
  def report(df: DataFrame, rules: Seq[Rule], uniqueCols: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueCols.nonEmpty, "at least one expectation required")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (rules.zipWithIndex.map { case (r, i) =>
          sum(when(r.violated, 1L).otherwise(0L)).as(s"__v$i") } ++
          uniqueCols.zipWithIndex.map { case (c, i) =>
            (count(col(c)) - countDistinct(col(c))).as(s"__u$i") })
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val pairs = rules.zipWithIndex.map { case (r, i) => (r.name, s"__v$i") } ++
      uniqueCols.zipWithIndex.map { case (c, i) => (s"unique($c)", s"__u$i") }
    pairs.map { case (n, c) =>
      one.select(lit(n).as("rule"),
        coalesce(col(c).cast("long"), lit(0L)).as("violations"),
        col("__n").as("n_rows"))
    }.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Per-row annotation: adds `violated` — the array of rule names this
    * row breaks, empty when clean, in rule-declaration order. Row-local
    * rules only (uniqueness is a dataset property, not a row's). Pure
    * per-row Column algebra — no shuffle, codegen'd end to end.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    df.withColumn("violated", array_compact(array(rules.map(r =>
      when(r.violated, lit(r.name)).otherwise(lit(null).cast("string"))): _*)))
  }

  /** Dead-letter split: (clean rows — original schema, dirty rows with
    * the `violated` column). The ingest pattern for drops that should
    * LAND what passes and QUARANTINE what doesn't, instead of the
    * all-or-nothing [[gate]].
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val ann = annotate(df, rules)
    (ann.filter(size(col("violated")) === 0).drop("violated"),
      ann.filter(size(col("violated")) > 0))
  }

  /** Pipeline gate: returns `df` untouched when every rule passes,
    * throws listing EVERY failed rule otherwise. The report collect is
    * rule-count-sized.
    */
  def gate(df: DataFrame, rules: Seq[Rule], uniqueCols: Seq[String] = Nil): DataFrame = {
    val bad = report(df, rules, uniqueCols)
      .filter(col("violations") > 0).orderBy(col("rule")).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException("data-quality gate failed: " +
        bad.map(r => s"${r.getString(0)} x${r.getLong(1)}").mkString(", ") +
        s" over ${bad.head.getLong(2)} rows")
    df
  }
}
