package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join (entity resolution / fuzzy name matching):
  * all pairs within Levenshtein distance `maxDist`, without the n²
  * distance evaluations — the fuzzy sibling of the enrichment tier's
  * exact-id joins (the reference matches companies by exact NIF,
  * reference: nextplib/ntp_constants.py id fields; real-world name
  * columns need a tolerant join).
  *
  * Candidate generation is the PassJoin pigeonhole (Li et al.,
  * VLDB'11 — public): split every string into `maxDist+1` contiguous
  * chunks; `maxDist` edits can touch at most `maxDist` chunks, so some
  * chunk of x survives VERBATIM in any y within distance, shifted by
  * at most `maxDist` positions (the net indel drift before it). So x
  * emits its chunks keyed by (len, chunkIdx, substring); y emits every
  * substring that could BE such a chunk — for each target length
  * within ±maxDist of its own, each chunk slot, each start offset in
  * the ±maxDist window — and candidates are one equi-join on the
  * substring key. The filter is LOSSLESS: no true pair can be missed,
  * and survivors are verified with the exact (codegen'd) levenshtein.
  *
  * Strings too short to chunk (len ≤ maxDist — a chunk would be empty
  * and match everything) pair inside the bounded `len ≤ 2·maxDist`
  * bucket instead: a pair with a ≤ maxDist side has BOTH sides ≤
  * 2·maxDist (length difference bounds edit distance), so the bucket
  * is complete and its pair count is bounded by the short-string
  * population, not the corpus.
  *
  * Scale posture: chunk/probe keys are substring-valued equi-join keys
  * — shuffle cost follows per-key pair counts (Σ |A_k|·|B_k|), i.e.
  * chunk SELECTIVITY. Templated corpora (every value sharing a prefix
  * chunk, like the synthetic `Customer#…` names the oracle runs on)
  * degrade toward the brute pair count through that hot chunk — the
  * honest worst case; natural name data keeps chunks selective, and
  * raising maxDist+1 (more, shorter chunks) trades probe fan-out for
  * selectivity. The probe fan-out is (2d+1)²·(d+1) rows per string —
  * constant in corpus size.
  */
object FuzzyJoin {

  /** Even chunking of a `len`-string into d+1 chunks (first `len mod
    * (d+1)` chunks one longer): (chunkIdx, start, chunkLen), 1-based
    * starts for SQL substring.
    */
  private[ops] def chunkSpecs(len: Int, d: Int): Seq[(Int, Int, Int)] = {
    val n = d + 1
    val base = len / n
    val extra = len % n
    val lens = Seq.tabulate(n)(i => base + (if (i < extra) 1 else 0))
    val starts = lens.scanLeft(1)(_ + _).init
    starts.zip(lens).zipWithIndex.map { case ((s, l), i) => (i, s, l) }
  }

  private def prep(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__l", length(col("__s")))
      .localCheckpoint(true) // chunk keys / probe keys / short bucket /
                             // verify join all reuse the prepared side

  /** The pigeonhole candidate pass shared by the self- and two-table
    * joins: `a` contributes chunks, `b` contributes window probes
    * (coverage needs only ONE side chunked — the surviving chunk of an
    * `a` string appears verbatim in its `b` partner). Returns candidate
    * (__aid, __bid) pairs; the caller verifies with the exact
    * levenshtein. Short `a` strings (too short to chunk) pair against
    * the bounded short bucket of `b`.
    */
  private def candidates(a: DataFrame, b: DataFrame, d: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val aLens = a.filter(col("__l") >= d + 1)
      .select(col("__l")).distinct().as[Int].collect().sorted.toSeq
    val specA = aLens.flatMap(la =>
      chunkSpecs(la, d).map { case (i, st, cl) => (la, i, st, cl) })
      .toDF("__la", "__i", "__st", "__cl")
    val specB = aLens.flatMap(la =>
      chunkSpecs(la, d).flatMap { case (i, st, cl) =>
        (-d to d).map(off => (la, i, st + off, cl)) })
      .filter(_._3 >= 1)
      .toDF("__la", "__i", "__bst", "__cl")
    val aKeys = a.filter(col("__l") >= d + 1)
      .join(broadcast(specA), col("__l") === col("__la"))
      .select(col("__id").as("__aid"), col("__la"), col("__i"),
        expr("substring(__s, __st, __cl)").as("__key"))
    val bKeys = b
      .join(broadcast(specB),
        col("__la").between(col("__l") - d, col("__l") + d) &&
          col("__bst") + col("__cl") - 1 <= col("__l"))
      .select(col("__id").as("__bid"), col("__la"), col("__i"),
        expr("substring(__s, __bst, __cl)").as("__key"))
    val candLong = aKeys.join(bKeys, Seq("__la", "__i", "__key"))
      .select(col("__aid"), col("__bid"))
    // a too short to chunk (len ≤ d) forces its partner under 2d: pair
    // inside the bounded short buckets (population-, not corpus-, sized)
    val candShort = a.filter(col("__l") <= d)
      .select(col("__id").as("__aid"), col("__l").as("__al"))
      .join(b.filter(col("__l") <= 2 * d)
          .select(col("__id").as("__bid"), col("__l").as("__bl")),
        abs(col("__al") - col("__bl")) <= d)
      .select(col("__aid"), col("__bid"))
    candLong.unionByName(candShort)
  }

  /** All (a, b, dist) pairs with `levenshtein ≤ maxDist`, a < b by id.
    * Null strings drop (no distance to measure); ids must be unique.
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist must be in [1, 8]: $maxDist")
    val s = prep(df, idCol, strCol)
    candidates(s, s, maxDist)
      .filter(col("__aid") =!= col("__bid"))
      .select(least(col("__aid"), col("__bid")).as("a"),
        greatest(col("__aid"), col("__bid")).as("b"))
      .distinct()
      .join(s.select(col("__id").as("a"), col("__s").as("__sa")), "a")
      .join(s.select(col("__id").as("b"), col("__s").as("__sb")), "b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Two-table form — the entity-resolution LOOKUP: every probe row
    * matched against the reference within `maxDist` (probe chunks,
    * reference probes the windows; the pigeonhole needs only one side
    * chunked, so a probe shorter than maxDist+1 falls back to the
    * bounded short bucket of the reference). Returns
    * (probe_id, ref_id, dist).
    */
  def editDistanceJoin(probes: DataFrame, probeId: String, probeStr: String,
                       reference: DataFrame, refId: String, refStr: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist must be in [1, 8]: $maxDist")
    val p = prep(probes, probeId, probeStr)
    val r = prep(reference, refId, refStr)
    candidates(p, r, maxDist)
      .distinct()
      .select(col("__aid").as("probe_id"), col("__bid").as("ref_id"))
      .join(p.select(col("__id").as("probe_id"), col("__s").as("__sa")), "probe_id")
      .join(r.select(col("__id").as("ref_id"), col("__s").as("__sb")), "ref_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("ref_id"), col("dist"))
  }
}
