package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding column
  * (`array<float>`), sized for the 100 TB corpus: the DATA never leaves
  * the executors — one declarative pass accumulates the first/second
  * moment sums (order-independent exact decimals, so the result is
  * bit-reproducible under any shuffle schedule), and only the
  * dim·(dim+3)/2 moment rows (dim = 64 here → 2,144 rows) land on the
  * driver, where a cyclic Jacobi sweep on the dim×dim covariance is
  * microseconds of work. The eigenbasis then goes BACK into the plan as
  * literals: projection is map-side column algebra (codegen'd
  * [[graft.functions.DotFloat]] per component), no join, no UDF.
  *
  * Use cases wired here:
  *  - dimensionality reduction for downstream curation (cheap cluster
  *    features, compact kNN gates);
  *  - [[pcaTopK]]: ANN with the m-dim projected dot as the coarse gate
  *    (per-pair cost m instead of dim) and the shared exact-decimal
  *    re-rank of margin survivors as the decider — same two-phase
  *    shape as the IVF/int8 tiers, so rankings stay bit-reproducible
  *    even though the gate is approximate.
  *
  * Determinism: the moment sums are exact decimals; Jacobi runs a fixed
  * cyclic pivot order in pure IEEE double arithmetic from those exact
  * sums — same moments in, same eigenbasis out, on every engine and
  * schedule. Eigenvectors are sign-canonicalized (largest-|coordinate|
  * entry positive, lowest index on ties) so the basis is unique even
  * for repeated eigenvalues' generic case.
  */
object Pca {

  /** The fitted model: `mean` and `components` in double precision
    * (row-major, `components(k)` = k-th principal axis, unit norm),
    * eigenvalues descending.
    */
  final case class PcaModel(mean: Seq[Double], eigenvalues: Seq[Double],
                            components: Seq[Seq[Double]])

  /** Largest vector dimension the fit accepts — the [[Pq.MaxFlatNList]]
    * posture applied to the PCA tier: the moment grid is O(dim²) DRIVER
    * state (dim·(dim+3)/2 collected rows) and the Jacobi eigensolve
    * O(dim³) driver compute, so past ~2048 dims (≈2.1M moment rows,
    * ~10^10 flops) the full-dim fit stops being a sub-second driver
    * step and starts being the job. The guard REFUSES rather than
    * silently degrading; the route past it is to shrink the input —
    * `slice(vec, 1, d)` or a fixed sparse random projection — before
    * fitting, which preserves the top of the spectrum (Johnson-
    * Lindenstrauss) at O(dim) per row.
    */
  val MaxFitDim = 2048

  private[ops] def requireDimBudget(dim: Int, where: String): Unit = {
    require(dim >= 1, s"$where: dim must be positive, got $dim")
    require(dim <= MaxFitDim,
      s"$where: dim=$dim exceeds MaxFitDim=$MaxFitDim — the moment grid is " +
        "O(dim²) driver state and the eigensolve O(dim³) driver " +
        "compute; slice or project the vectors to <= " + MaxFitDim +
        " dims (e.g. slice(vec, 1, d) or a fixed random projection) " +
        "before fitting")
  }

  /** One distributed pass of moment accumulation: rows
    * `(i, j, s, n)` where `j = -1` carries the first moment Σ v(i) and
    * `j >= i` the second moment Σ v(i)·v(j) (upper triangle), both as
    * exact decimal sums (element products are exact doubles — 24+24
    * mantissa bits — snapped to the scale-15 grid of
    * [[Similarity.dotExactDec]], so the snap is the only rounding and
    * the sum is schedule-independent) with the contributing row count.
    *
    * Shape (optimization round 19): ONE compiled fold per partition —
    * each task accumulates its rows into a local dim·(dim+3)/2 grid of
    * exact scaled-integer sums and emits only the grid, so the shuffle
    * carries `partitions × grid` rows and the corpus is scanned ONCE.
    * The previous double-`posexplode` form generated and
    * hash-aggregated dim·(dim+3)/2 rows PER INPUT ROW across TWO
    * corpus scans (union of first/second moments): at sf0.1 that is
    * 4.3M generated rows and 4.8 s of the 5.0 s full-64 fit; this form
    * runs the same arithmetic in a fraction of that, and at 100 TB it
    * removes the dominant Generate+hash mass and one full scan
    * (optimization guide §2.3 "aggregate before you shuffle", §1.2
    * "fix the distributed algorithm first").
    *
    * Exactness contract UNCHANGED, bit-for-bit: every element/product
    * is snapped by the SAME double→decimal(25,15) conversion SQL
    * `cast` used ([[org.apache.spark.sql.types.Decimal]] on the
    * shortest-repr value, HALF_UP, null on overflow — overflow rows
    * keep counting but add nothing, exactly like `sum` skipping a null
    * cast), partial sums are exact integer adds on the scale-15 grid
    * (spilling to BigInteger on the long boundary), and the final
    * per-cell merge is the same exact decimal `sum`. Integer addition
    * is associative, so the result is schedule-independent and equal
    * to the old form's decimal sum on every input (PcaSpec pins this
    * against naive driver accumulation; the DuckDB oracle replays it).
    *
    * Row-corner parity with the explode form: null/empty vectors emit
    * nothing; a null ELEMENT contributes to counts but not sums; a
    * short vector contributes only its present cells (the uniform-n
    * check in [[fitFromMoments]] rejects ragged corpora either way).
    */
  def moments(corpus: DataFrame, vecCol: String, dim: Int): DataFrame = {
    requireDimBudget(dim, "Pca.moments")
    val spark = corpus.sparkSession
    val nFirst = dim
    val nPairs = dim * (dim + 1) / 2
    val nSlots = nFirst + nPairs
    // slot layout: [0, dim) first moments; pair (i, j) at
    // dim + i*dim - i*(i-1)/2 + (j - i)
    val base = corpus.select(col(vecCol)).rdd
    // A small-SF scan arrives as ONE partition and would fold the whole
    // grid single-threaded (measured 2.1 s at sf0.1); fan the fold out
    // to the session's parallelism. At scale the scan already carries
    // >= cores partitions and this is a no-op — no shuffle on the big
    // path. Exactness unaffected: integer sums are order-independent.
    val width = math.max(1, corpus.sparkSession.sparkContext.defaultParallelism)
    val wide = if (base.getNumPartitions < width) base.repartition(width) else base
    val partials = wide.mapPartitions { it =>
      val accL = new Array[Long](nSlots)
      val accB = new Array[java.math.BigInteger](nSlots)
      val nRows = new Array[Long](nSlots) // count(1): every emitted cell row
      val nVals = new Array[Long](nSlots) // non-null contributions (sum-null parity)
      // slot → (i, j) inverse, built once per task (ints, ~17 KB at dim 64)
      val slotI = new Array[Int](nSlots)
      val slotJ = new Array[Int](nSlots)
      locally {
        var s = 0
        while (s < nFirst) { slotI(s) = s; slotJ(s) = -1; s += 1 }
        var i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { slotI(s) = i; slotJ(s) = j; s += 1; j += 1 }
          i += 1
        }
      }
      def add(slot: Int, u: Long): Unit = {
        val cur = accL(slot)
        val s = cur + u
        if (((cur ^ s) & (u ^ s)) < 0L) { // two's-complement overflow
          val b = if (accB(slot) == null) java.math.BigInteger.ZERO else accB(slot)
          accB(slot) = b.add(java.math.BigInteger.valueOf(cur))
            .add(java.math.BigInteger.valueOf(u))
          accL(slot) = 0L
        } else accL(slot) = s
      }
      // the EXACT SQL cast semantics: Decimal(double) is the
      // shortest-repr value; changePrecision(25,15) rounds HALF_UP and
      // reports overflow (→ null in non-ANSI mode → the value is
      // skipped but the row still counts)
      def snapAdd(slot: Int, d: Double): Unit = {
        val dec = org.apache.spark.sql.types.Decimal(d)
        if (dec.changePrecision(25, 15)) {
          nVals(slot) += 1L
          val bd = dec.toJavaBigDecimal // scale exactly 15 after changePrecision
          val unscaled = bd.unscaledValue()
          if (unscaled.bitLength() < 63) add(slot, unscaled.longValue())
          else {
            val b = if (accB(slot) == null) java.math.BigInteger.ZERO else accB(slot)
            accB(slot) = b.add(unscaled)
          }
        }
      }
      it.foreach { r =>
        // Number, not Float: the old cast-to-double form accepted
        // array<float> and array<double> alike (both widen exactly)
        val v = r.getSeq[java.lang.Number](0)
        if (v != null) {
          val len = v.length
          require(len <= dim,
            s"Pca.moments: vector of length $len exceeds declared dim $dim")
          var i = 0
          while (i < len) {
            val xi = v(i)
            val xid = if (xi == null) 0.0 else xi.doubleValue()
            nRows(i) += 1L
            if (xi != null) snapAdd(i, xid)
            val base = nFirst + i * dim - i * (i - 1) / 2 - i
            var j = i
            while (j < len) {
              val slot = base + j
              nRows(slot) += 1L
              val xj = v(j)
              if (xi != null && xj != null)
                snapAdd(slot, xid * xj.doubleValue())
              j += 1
            }
            i += 1
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      var slot = 0
      while (slot < nSlots) {
        if (nRows(slot) > 0L) {
          val s =
            if (nVals(slot) == 0L) null
            else {
              val big =
                if (accB(slot) == null) java.math.BigInteger.valueOf(accL(slot))
                else accB(slot).add(java.math.BigInteger.valueOf(accL(slot)))
              new java.math.BigDecimal(big, 15)
            }
          out += org.apache.spark.sql.Row(slotI(slot), slotJ(slot), s, nRows(slot))
        }
        slot += 1
      }
      out.iterator
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.DecimalType(35, 15), nullable = true),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(partials, schema)
      .groupBy(col("i"), col("j"))
      // sum(decimal(35,15)) widens to (38,15); cast back so the output
      // schema stays the historical decimal(35,15) — value unchanged
      // (the total equals the old form's sum, which carried (35,15))
      .agg(sum(col("s")).cast("decimal(35,15)").as("s"), sum(col("n")).as("n"))
  }

  /** Fit the top-`m` principal components. Driver traffic is bounded by
    * the moment-table size (enforced), never the corpus.
    */
  def fit(corpus: DataFrame, vecCol: String, dim: Int, m: Int): PcaModel =
    fitFromMoments(moments(corpus, vecCol, dim), dim, m)

  /** Fit from an already-computed moment table (the [[moments]] schema)
    * — the serve path of the incremental tier ([[PcaIndex]]): merged
    * per-drop segments are exactly a moment table, so the eigenbasis
    * refreshes from O(dim²) summed rows without ever re-reading the
    * corpus.
    */
  def fitFromMoments(momentRows: DataFrame, dim: Int, m: Int): PcaModel = {
    requireDimBudget(dim, "Pca.fitFromMoments")
    require(m >= 1 && m <= dim, s"need 1 <= m <= dim, got m=$m dim=$dim")
    val bound = dim * (dim + 3) / 2
    // plain collect, bound checked AFTER: the row count is bounded BY
    // CONSTRUCTION (a groupBy over (i, j) cannot exceed dim·(dim+3)/2
    // rows), and a defensive `.limit()` made CollectLimit re-execute
    // the whole aggregation up to 4× under its partition scale-up
    // probing (measured: 6 s -> 0.5 s at sf0.1)
    val rows = momentRows.collect()
    require(rows.length <= bound,
      s"PCA moment collect brought ${rows.length} rows to the driver (bound $bound)")
    require(rows.nonEmpty, "PCA fit needs a non-empty corpus")
    // every moment row must have seen the same row count — a ragged or
    // null-element corpus would otherwise silently skew the covariance
    val ns = rows.map(_.getLong(3)).distinct
    require(ns.length == 1,
      s"inconsistent moment row counts ${ns.sorted.mkString(",")} — " +
        "vectors must be non-null with a uniform dimension")
    // n <= 0 happens when an index path holds only retractions (every
    // insert segment cancelled): a fit would divide by zero into NaNs
    require(ns.head > 0,
      s"moment table covers ${ns.head} rows — nothing to fit (all segments retracted?)")
    var n = 0L
    val s1 = Array.ofDim[Double](dim)
    val s2 = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val s = r.getDecimal(2).doubleValue()
      n = r.getLong(3)
      if (j < 0) s1(i) = s
      else { s2(i)(j) = s; s2(j)(i) = s }
    }
    val mean = s1.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => s2(i)(j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    // order: eigenvalue desc, original index asc on exact ties
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(m)
    val comps = order.map { k =>
      val v = Array.tabulate(dim)(i => evecs(i)(k)) // column k
      // sign canon: the largest-|coordinate| entry (lowest index on
      // ties) is made positive — a unique representative per axis
      var best = 0
      var i = 1
      while (i < dim) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
      if (v(best) < 0) v.map(x => -x).toSeq else v.toSeq
    }
    PcaModel(mean.toSeq, order.map(evals), comps)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: fixed (p, q)
    * sweep order, rotations in pure double arithmetic — deterministic
    * for a given input. Returns (eigenvalues, eigenvector matrix with
    * eigenvectors as COLUMNS), unordered.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var sweep = 0
    while (offNorm() > 1e-14 && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def litF(xs: Seq[Double]): Column =
    array(xs.map(x => lit(x.toFloat)): _*)

  /** Map-side projection of a float-vector column onto the model's
    * components: `array_k( dot(v, comp_k) - dot(mean, comp_k) )`. Each
    * component is one codegen'd [[graft.functions.DotFloat]] against a
    * plan-inlined float literal; the mean term is a precomputed
    * constant. Float-snapped literals cost the gate < 1e-6 relative
    * error — gate-only precision, the decider never sees them.
    */
  def projectExpr(v: Column, model: PcaModel): Column =
    array(model.components.map { comp =>
      val centerK = comp.zip(model.mean)
        .map { case (c, mu) => c.toFloat.toDouble * mu.toFloat.toDouble }.sum
      graft.functions.DotFloat.dot_float(v, litF(comp)) - lit(centerK)
    }: _*)

  /** ANN with the PCA gate: rank every (query, candidate) pair by the
    * RECONSTRUCTED inner product
    * `Σ_k proj_q(k)·proj_c(k) + <mean, c> + <q, mean> - <mean, mean>`
    * (exact when m = dim; the m < dim truncation error is what the
    * margin absorbs), keep the top `margin` per query, then decide via
    * the SHARED exact tail ([[Similarity.exactTopKTail]]: codegen'd
    * double re-rank of the survivors, exact-decimal dot only on its
    * small fixed margin) — identical tie-break contract to every other
    * similarity tier. The gate itself is fully codegen'd: projections
    * are float-snapped arrays so the per-pair m-dim dot runs through
    * [[graft.functions.DotFloat]] (the interpreted zip_with form made
    * this the slowest pure query at 2.5× the cost); gate-side snapping
    * (< 1e-6 relative) is margin-absorbed, the decider never sees it.
    * Per-pair gate cost is m multiplies instead of dim; queries are
    * broadcast.
    */
  def pcaTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              model: PcaModel, k: Int, margin: Int): DataFrame = {
    val meanF = litF(model.mean)
    val meanSq = model.mean.map(x => x.toFloat.toDouble * x.toFloat.toDouble).sum
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      projectExpr(col(vecCol), model).cast("array<float>").as("qp"),
      graft.functions.DotFloat.dot_float(col(vecCol), meanF).as("qb")))
    // the exchange after the projection is a MATERIALIZATION BARRIER,
    // not a partitioning choice: fused into the broadcast join's
    // codegen stage, the m-dot projection's variables are deferred into
    // the inner pair loop and recomputed PER PAIR — measured 20 s
    // instead of 0.7 s at 40×2000 pairs. The shuffle writes the
    // projected rows once (n rows, +m floats each), so the join loop
    // reads attributes instead of re-deriving them; it also spreads the
    // pair loop across cores
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      projectExpr(col(vecCol), model).cast("array<float>").as("cp"),
      graft.functions.DotFloat.dot_float(col(vecCol), meanF).as("cb"))
      .repartition(col("cid"))
    val gate = graft.functions.DotFloat.dot_float(col("qp"), col("cp")) +
      col("qb") + col("cb") - lit(meanSq)
    // the gate is MATERIALIZED as a column before the window: ordering
    // by the expression would re-evaluate it (with the m-dot projection
    // inlined by projection collapsing) inside the generated row
    // comparator, per COMPARISON — measured 21 s instead of 0.7 s here
    val wg = Window.partitionBy(col("qid")).orderBy(col("__gate").desc, col("cid").asc)
    Similarity.exactTopKTail(
      q.join(c, col("qid") =!= col("cid"))
        .select(col("qid"), col("qv"), col("cid"), col("cv"), gate.as("__gate"))
        .withColumn("grank", row_number().over(wg)).filter(col("grank") <= margin)
        .select(col("qid"), col("qv"), col("cid"), col("cv")),
      k)
  }
}
