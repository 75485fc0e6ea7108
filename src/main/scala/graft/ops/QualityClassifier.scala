package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED document-quality classifier — the fastText-style gate real
  * pretraining pipelines run in front of heuristics (CCNet, Wenzek et
  * al. 2020; RefinedWeb, Penedo et al. 2023): a linear model over
  * hashed n-gram features, trained against a labeled slice (here: a
  * trusted target predicate, e.g. `lang = 'en'`, the same supervision
  * DSIR uses), then scored corpus-wide.
  *
  * Everything runs on an INTEGER grid so DuckDB can replay training
  * round by round the way the BPE oracle replays merge rounds:
  *
  *  - features: presence of the doc's word-bigram md5 hash buckets
  *    ([[Curation.hashBucket]] — the DSIR feature space, model size
  *    nBuckets REGARDLESS of corpus size);
  *  - logit: z = floor(Σ_{b∈doc} w_b / n_doc) — the MEAN bucket weight,
  *    scaled 10^6, so |z| is bounded by max|w| whatever the doc length;
  *  - probability: the HARD sigmoid p = clamp(z/4 + 1/2, 0, 1) on the
  *    same 10^6 grid (piecewise-linear σ of BinaryConnect, Courbariaux
  *    et al. 2015 — exact in fixed point, unlike exp);
  *  - training: logistic-loss gradient g_b = Σ_{d∋b} floor((p_d −
  *    y_d)/n_d), stepped by SIGN with a halving schedule (signSGD,
  *    Bernstein et al. 2018) — w stays on a coarse lattice, every
  *    round is bit-reproducible and order-independent (integer sums).
  *
  * Scale shape per round: one broadcast of the nBuckets-row model, one
  * doc-keyed aggregate (map-side combined), one bucket-keyed aggregate
  * back to nBuckets rows — the DSIR job shape, looped `steps.length`
  * times over ONE materialized feature stream. The driver holds only
  * the nBuckets-bounded model ([[Similarity.collectBounded]]). Docs
  * with < 2 tokens carry no features and drop out (no evidence either
  * way — the DSIR posture).
  */
object QualityClassifier {

  /** Fixed-point scale: probabilities/weights ride 10^6 = 1.0. */
  val Scale = 1000000L

  /** The halving signSGD step schedule — 3 rounds is enough to order a
    * separable fixture (each round moves every informative bucket by
    * ±step, and the mean-logit of a class-pure doc tracks its buckets).
    */
  val Steps: Seq[Long] = Seq(250000L, 125000L, 62500L)

  /** TRUNCATING integer division (toward zero) for b > 0 — the exact
    * semantics of DuckDB's integer `//` (measured: -7 // 2 = -3), which
    * the oracle replays verbatim. Subtracting the remainder (Spark's
    * `%` follows the dividend's sign, same as DuckDB's) makes the
    * division exact, so the double quotient IS the integer — operands
    * stay far below 2^53 on this grid. A pmod-based FLOOR here
    * mismatches the oracle by one on every negative logit (found by
    * the round-18 hash gate).
    */
  private[ops] def fdiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  private[ops] def hardSigmoid(z: Column): Column =
    greatest(lit(0L), least(lit(Scale), fdiv(z, lit(4L)) + lit(Scale / 2)))

  /** The DISTINCT (doc, label, bucket) presence stream + per-doc
    * feature counts. `labelPred` null counts as non-target (the DSIR
    * convention).
    *
    * The per-doc dedup happens INSIDE the row (`array_distinct` over
    * the hashed bigram buckets, then explode) — a doc's bucket set is
    * row-local state, so the global `.distinct()` this replaces (which
    * shuffled the whole exploded bigram stream once per train call:
    * factor-100 measured 1267 MB shuffled / 21.8 s before, 573 MB /
    * 16.8 s after) costs nothing: the stream leaves the scan already
    * distinct, zero shuffle. The train aggregates' ~537 MB disk spill
    * is NOT this — it is the doc-keyed partial-aggregation mass of the
    * corpus-sized stream (byte-identical before/after this change,
    * ~150 MB/task at 32 threads), which more executors dilute at real
    * scale. PRECONDITION: `idCol` is unique in `docs` — row-local
    * dedup equals the old global dedup only then (a duplicated id
    * would re-emit its buckets once per row and inflate that doc's
    * `__n`). Every caller already holds it: the documents table,
    * ClfIndex (whose score table is doc-keyed and whose churn split
    * joins on `doc`), and the oracle twin all key docs uniquely, and
    * it is the same id-uniqueness every index in the repo assumes of
    * its key column.
    */
  /** The doc's DISTINCT feature-bucket array from its `__toks` column
    * — the one bucket definition [[featureStream]] and
    * [[ClfIndex]]'s one-pass scorer share, so the feature space cannot
    * drift between training and landed scoring.
    */
  private[ops] def bucketArray(nBuckets: Int): Column =
    array_distinct(transform(
      expr("transform(sequence(1, size(__toks) - 1), i -> concat(__toks[i-1], ' ', __toks[i]))"),
      bg => Curation.hashBucket(bg, nBuckets)))

  private[ops] def requireBuckets(nBuckets: Int): Unit =
    require(nBuckets > 0 && nBuckets <= (1 << 16),
      s"nBuckets must be in [1, 65536] (16 hash bits): $nBuckets")

  private[ops] def featureStream(docs: DataFrame, idCol: String, textCol: String,
                                 labelPred: Option[Column], nBuckets: Int): DataFrame = {
    requireBuckets(nBuckets)
    val y = labelPred.map(p => when(coalesce(p, lit(false)), 1L).otherwise(0L))
      .getOrElse(lit(0L))
    docs
      .select(col(idCol).as("__doc"), y.as("__y"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("__doc"), col("__y"), explode(bucketArray(nBuckets)).as("__b"))
  }

  /** Train the classifier: bucket → weight (10^6 grid), nBuckets-bounded.
    *
    * `streamLanding`: where the reused feature stream lives for the
    * 1 + 2·steps passes over it.
    *  - `None` (default): one eager localCheckpoint pins the computed
    *    partitions on executors. Recovery contract: localCheckpoint
    *    blocks are NOT recoverable on executor loss — acceptable for a
    *    bounded batch job (minutes, not a service); a lost block fails
    *    THE JOB, never corrupts the model (signSGD is deterministic;
    *    rerun = identical weights).
    *  - `Some(dir)`: the stream LANDS as parquet at `dir` and every
    *    pass re-reads the files — the service-grade posture for a real
    *    cluster, where executor loss mid-train is routine: a lost task
    *    re-reads its split instead of failing the job. Costs one
    *    write + (1 + 2·steps) scans of compressed parquet; produces
    *    bit-identical weights (the landing only changes WHERE the same
    *    rows are re-read from). Factor-100 measured: the landed form
    *    trains with ZERO spill where the pinned form spills 537 MB —
    *    the cached stream blocks squeeze the training aggregates'
    *    execution memory under the unified memory manager — so at
    *    memory-pressured scale the recoverable posture is also the
    *    faster one. The caller owns `dir`'s lifecycle —
    *    [[ClfIndex.build]] lands under its own path and cleans up.
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelPred: Column,
            nBuckets: Int = 4096, steps: Seq[Long] = Steps,
            streamLanding: Option[String] = None): Map[Long, Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val st0 = featureStream(docs, idCol, textCol, Some(labelPred), nBuckets)
    val st = streamLanding match {
      // hash-partition the pinned stream by __doc ONCE: every training
      // pass groups or joins the corpus-sized stream on __doc (dn, the
      // per-step __sw aggregate, the gradient's per-doc join), and the
      // checkpoint preserves the partitioning, so those all reuse this
      // single exchange instead of re-shuffling the stream 2× per
      // signSGD round (guide §2.4 "two operations keyed the same way
      // share one exchange"); only the nBuckets-keyed gradient
      // aggregate still shuffles, and that one is inherent
      case None => st0.repartition(col("__doc")).localCheckpoint(true)
      case Some(dir) =>
        st0.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
    }
    // doc-sized (one row per doc), derived FROM the landed/pinned
    // stream so the fault-tolerance posture is uniform
    val dn0 = st.groupBy(col("__doc")).agg(
        max(col("__y")).as("__y"), count(lit(1)).as("__n"))
    val dn = if (streamLanding.isDefined) dn0 else dn0.localCheckpoint(true)
    var w = Map.empty[Long, Long]
    steps.foreach { step =>
      val wdf =
        if (w.isEmpty) Seq.empty[(Long, Long)].toDF("__b", "__w")
        else w.toSeq.toDF("__b", "__w")
      val sw = st.join(broadcast(wdf), Seq("__b"), "left_outer")
        .groupBy(col("__doc"))
        .agg(sum(coalesce(col("__w"), lit(0L))).as("__sw"))
      val per = dn.join(sw, Seq("__doc"))
        .withColumn("__err",
          hardSigmoid(fdiv(col("__sw"), col("__n"))) - col("__y") * Scale)
        .select(col("__doc"), fdiv(col("__err"), col("__n")).as("__c"))
      val g = st.select(col("__doc"), col("__b"))
        .join(per, Seq("__doc"))
        .groupBy(col("__b")).agg(sum(col("__c")).as("__g"))
      val rows = Similarity.collectBounded(g, nBuckets, "clf gradient")
      w = rows.map { r =>
        val b = r.getLong(0); val gs = r.getLong(1)
        val cur = w.getOrElse(b, 0L)
        b -> (if (gs > 0) cur - step else if (gs < 0) cur + step else cur)
      }.toMap
    }
    w
  }

  /** The trained model as a DataFrame (b, w) — for oracle dumps and
    * lake persistence.
    */
  def modelDf(spark: SparkSession, w: Map[Long, Long]): DataFrame = {
    import spark.implicits._
    w.toSeq.sortBy(_._1).toDF("b", "w")
  }

  /** Score documents under a trained model: (doc, n_fbuckets,
    * clf_logit, clf_prob) on the 10^6 grid. Buckets the model never
    * saw score 0 (no evidence). Shuffle shape: one broadcast join +
    * one doc-keyed aggregate.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Map[Long, Long], nBuckets: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf =
      if (model.isEmpty) Seq.empty[(Long, Long)].toDF("__b", "__w")
      else model.toSeq.toDF("__b", "__w")
    featureStream(docs, idCol, textCol, None, nBuckets)
      .join(broadcast(wdf), Seq("__b"), "left_outer")
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_fbuckets"),
        sum(coalesce(col("__w"), lit(0L))).as("__sw"))
      .withColumn("clf_logit", fdiv(col("__sw"), col("n_fbuckets")))
      .withColumn("clf_prob", hardSigmoid(col("clf_logit")))
      .select(col("__doc").as("doc"), col("n_fbuckets"),
        col("clf_logit"), col("clf_prob"))
  }
}
