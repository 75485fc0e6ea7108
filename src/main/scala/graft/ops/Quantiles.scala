package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles / rank-select without a per-group global
  * sort (SURVEY §7.8 scale posture).
  *
  * A `row_number() OVER (PARTITION BY group ORDER BY value)` on raw rows
  * caps parallelism at the group cardinality — with 3 statuses, one
  * reducer sorts a third of the table; at 100 TB that task never
  * finishes. Here the exact answer comes from a value histogram CDF:
  *
  *  1. groupBy(group, value) — full shuffle parallelism, output is the
  *     compressed histogram (one row per distinct value);
  *  2. range-bucket the value domain (min/max per group, B buckets) and
  *     prefix-sum within each (group, bucket) — parallelism = G x B;
  *  3. prefix-sum the per-bucket totals per group — G x B rows total,
  *     trivially small — and add the bucket offset.
  *
  * Every rank query (median, any ntile boundary) then answers by a
  * broadcast join against the CDF: value v covers ranks (prev, cum], so
  * rank k selects the row with prev < k <= cum. No window in the plan
  * ever partitions raw rows by a low-cardinality key; the only low-card
  * window runs over the G x B bucket-total frame.
  */
object Quantiles {

  /** Histogram CDF per group: (group, value, c, cum, prev) where `c` is
    * the multiplicity of `value`, `cum` the number of rows with value <=
    * this one, `prev` = cum - c. Ranks are 1-based over (value) order
    * with multiplicity — identical to row_number over (value, tiebreak)
    * for any per-row tiebreak, projected to the value.
    */
  def histogramCdf(df: DataFrame, groupCol: String, valueCol: String,
                   buckets: Int = 32): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val hist = df.groupBy(g, v).agg(count(lit(1)).as("c"))
    val stats = hist.groupBy(g).agg(min(v).as("__lo"), max(v).as("__hi"))
    val span = col("__hi") - col("__lo")
    val bucket = when(span === 0, lit(0))
      .otherwise(least(floor((v - col("__lo")) / span * buckets), lit(buckets - 1)))
      .cast("int")
    // <=>: a NULL group value is a legitimate group (groupBy keeps it,
    // SQL GROUP BY keeps it) — a plain name-join would silently drop
    // its rows from the CDF by three-valued logic
    val bucketed = hist.join(broadcast(stats.withColumnRenamed(groupCol, "__g2")),
        g <=> col("__g2"))
      .withColumn("__b", bucket).drop("__g2")
    val wInB = Window.partitionBy(g, col("__b")).orderBy(v)
    val inBucket = bucketed.withColumn("__cumb", sum(col("c")).over(wInB))
    val wB = Window.partitionBy(g).orderBy(col("__b"))
    val offsets = bucketed.groupBy(g, col("__b")).agg(sum(col("c")).as("__bc"))
      .withColumn("__off", sum(col("__bc")).over(wB) - col("__bc"))
      .select(g.as("__g2"), col("__b").as("__b2"), col("__off"))
    inBucket.join(offsets, g <=> col("__g2") && col("__b") === col("__b2"))
      .withColumn("cum", col("__cumb") + col("__off"))
      .withColumn("prev", col("cum") - col("c"))
      .select(g, v, col("c"), col("cum"), col("prev"))
  }

  /** Exact lower median per group: the value at rank (n+1) div 2. */
  def medianByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cdf = histogramCdf(df, groupCol, valueCol)
    val tot = cdf.groupBy(col(groupCol)).agg(sum(col("c")).as("__n"))
      .withColumnRenamed(groupCol, "__g2")
    cdf.join(broadcast(tot), col(groupCol) <=> col("__g2")) // null group kept
      .withColumn("__k", (col("__n") + 1).divide(2).cast("long"))
      .filter(col("prev") < col("__k") && col("__k") <= col("cum"))
      .select(col(groupCol), col(valueCol).as("median"))
  }

  /** Exact ntile(n) summary per group: for each tile, its row count and
    * min/max value — identical to aggregating `ntile(n) OVER (PARTITION
    * BY group ORDER BY value, <tiebreak>)`, because a tile's min/max is
    * the value covering its lowest/highest rank regardless of how ties
    * are broken within a value.
    */
  def ntileStats(df: DataFrame, groupCol: String, valueCol: String, n: Int): DataFrame = {
    val cdf = histogramCdf(df, groupCol, valueCol)
    val tot = cdf.groupBy(col(groupCol)).agg(sum(col("c")).as("__cnt"))
    // tile q (1-based) covers ranks [lo, hi]: sizes are cnt/n + 1 for the
    // first cnt%n tiles, cnt/n for the rest (SQL ntile semantics)
    val tiles = tot.select(col(groupCol), col("__cnt"),
        explode(array((1 to n).map(lit): _*)).as("q"))
      .withColumn("__base", (col("__cnt") / n).cast("long"))
      .withColumn("__rem", col("__cnt") % n)
      .withColumn("__size", col("__base") + when(col("q") <= col("__rem"), 1L).otherwise(0L))
      .withColumn("lo", (col("q") - 1) * col("__base") + least(col("q") - 1, col("__rem")) + 1)
      .withColumn("hi", col("lo") + col("__size") - 1)
    // a value intersects tile q iff its rank range (prev, cum] meets [lo, hi]
    val t = tiles.select(col(groupCol).as("__g"), col("q"), col("lo"), col("hi"), col("__size"))
    cdf.join(broadcast(t),
        col(groupCol) <=> col("__g") && col("prev") < col("hi") && col("cum") >= col("lo"))
      .groupBy(col(groupCol), col("q"))
      .agg(first(col("__size")).as("n"), min(col(valueCol)).as("minv"), max(col(valueCol)).as("maxv"))
  }
}
