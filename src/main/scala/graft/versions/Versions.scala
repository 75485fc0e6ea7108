package graft.versions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned-record resolution: one natural key -> many versions, of which
  * exactly one is active and the rest are tombstones pointing at it.
  *
  * Re-expresses the reference's row-at-a-time version machinery
  * (reference: nextplib/ntp_utils.py:114-165 `get_versions` /
  * `get_last_active_version`, nextplib/ntp_entry.py:60-68 `make_obsolete`,
  * checking/check_versions_completness.py:86-94 chain repair) as set-level
  * Spark transformations: a single window pass replaces the per-row
  * `find()` round-trips, and tombstone fan-out becomes a projection of the
  * same windowed frame — one shuffle on the natural key total, instead of
  * O(rows) RPCs.
  *
  * Scale notes: the window partitions by the natural key, so skew is
  * bounded by the max versions-per-key (small in practice — version chains
  * are append-only per tender). No global sort, no driver state.
  */
object Versions {

  /** Rank versions within each natural key: rank 1 = active (latest
    * `updated`, ties broken by max surrogate id — reference:
    * ntp_utils.py:151-165).
    */
  def ranked(df: DataFrame, naturalKey: String, id: String, updated: String): DataFrame = {
    val w = Window.partitionBy(col(naturalKey)).orderBy(col(updated).desc, col(id).desc)
    df.withColumn("version_rank", row_number().over(w))
  }

  /** Latest active version per natural key (W2). */
  def resolveLatest(df: DataFrame, naturalKey: String, id: String, updated: String): DataFrame =
    ranked(df, naturalKey, id, updated)
      .filter(col("version_rank") === 1)
      .drop("version_rank")

  /** Tombstones: every non-active version, pointing at its key's active id
    * (reference: ntp_entry.py:60-68 — `{_id, id, obsolete_version: true,
    * updated_to}`). Computed from the same windowed frame: `max_by` over
    * the partition avoids a second join against the actives.
    */
  def tombstones(df: DataFrame, naturalKey: String, id: String, updated: String): DataFrame = {
    val w = Window.partitionBy(col(naturalKey))
    ranked(df, naturalKey, id, updated)
      .withColumn("updated_to", first(col(id)).over(w.orderBy(col(updated).desc, col(id).desc)))
      .filter(col("version_rank") > 1)
      .select(col(id), col(naturalKey), lit(true).as("obsolete_version"), col("updated_to"))
  }

  /** Resolve obsolete-pointer chains to their active head by iterated
    * self-join until fixpoint (reference: ntp_entry.py:95-109
    * `follow_version`; checking/check_versions_completness.py:86-94).
    *
    * `pointers`: (id, updatedTo) edges where a null/absent `updatedTo`
    * marks an active head. Pointer-doubling: each round follows two hops,
    * so depth-d chains resolve in ceil(log2 d) joins — O(log d) shuffles
    * instead of O(d) for naive iteration. `maxHops` bounds cycles.
    *
    * Two execution tiers, size-gated like Dedup.connectedComponents:
    * pointer sets at or below `driverMaxEdges` are collected and chased on
    * the driver with a memoized hash-map walk — obsolete-pointer sets are
    * a sliver of the live collection, so this is the common case, and it
    * replaces ~4 scheduled join+checkpoint rounds of fixed overhead with
    * two jobs. Bigger sets fall back to the distributed doubling loop.
    * On a (pathological) pointer cycle the driver tier stops after
    * `maxHops` and yields an in-cycle node, like the bounded loop.
    */
  def resolveChains(pointers: DataFrame, id: String, updatedTo: String, maxHops: Int = 64,
                    driverMaxEdges: Long = 1L << 20,
                    driverMaxBytes: Long = 64L << 20): DataFrame = {
    val edges = pointers.select(col(id).as("src"), col(updatedTo).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    // gate on MATERIALIZED bytes, not just rows: 1M rows of long string
    // ids can be hundreds of MB of driver heap (the same reasoning as the
    // broadcast decision in propagateChains — a row-count gate would
    // happily collect them). Stats come from the populated cache, so
    // they're measured, not estimated.
    val nBytes = edges.queryExecution.optimizedPlan.stats.sizeInBytes
    val out =
      if (nEdges <= driverMaxEdges && nBytes <= driverMaxBytes)
        driverResolve(edges, id, maxHops)
      else propagateChains(edges, id, maxHops)
    edges.unpersist(blocking = false)
    out
  }

  /** Driver-side chain walk (small tier of `resolveChains`): follow the
    * src->dst map to the head, memoizing every node on the walked path —
    * total work O(edges) regardless of chain depth. A null dst passes
    * through as null, matching the join tier (null never matches a src).
    * Assumes src is unique (a pointer is a function of its id).
    */
  private def driverResolve(edges: DataFrame, id: String, maxHops: Int): DataFrame = {
    val rows = edges.collect()
    val next = new java.util.HashMap[Any, Any](rows.length * 2)
    rows.foreach(r => if (!r.isNullAt(1)) next.put(r.get(0), r.get(1)))
    val memo = new java.util.HashMap[Any, Any](rows.length * 2)
    def chase(start: Any): Any = {
      var path = List.empty[Any]
      var cur = start
      var hops = 0
      while (next.containsKey(cur) && !memo.containsKey(cur) && hops < maxHops) {
        path ::= cur; cur = next.get(cur); hops += 1
      }
      val head = if (memo.containsKey(cur)) memo.get(cur) else cur
      path.foreach(p => memo.put(p, head))
      head
    }
    val outRows: java.util.List[org.apache.spark.sql.Row] = new java.util.ArrayList(rows.length)
    rows.foreach { r =>
      val resolved = if (r.isNullAt(1)) null else chase(r.get(1))
      outRows.add(org.apache.spark.sql.Row(r.get(0), resolved))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(id, edges.schema(0).dataType),
      org.apache.spark.sql.types.StructField("resolved_to", edges.schema(1).dataType)))
    edges.sparkSession.createDataFrame(outRows, schema)
  }

  /** Distributed pointer-doubling loop (big tier of `resolveChains`).
    *
    * Iteration hygiene (load-bearing at scale — each round's result is
    * localCheckpoint'ed to truncate the exponentially-growing self-join
    * lineage):
    *  - the superseded round's checkpoint blocks are unpersisted as soon
    *    as the next round materializes — otherwise block-manager garbage
    *    accumulates for the rest of the session;
    *  - the loop exits at fixpoint (a round that follows zero edges), so
    *    shallow chains cost 2 rounds, not ceil(log2 maxHops);
    *  - the lookup side is broadcast only when the materialized cache
    *    estimates it under a byte threshold (checkpointed frames report
    *    unknown stats, so the planner can't make this call itself — and a
    *    row-count gate would happily broadcast hundreds of MB).
    */
  private def propagateChains(edges: DataFrame, id: String, maxHops: Int): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // byte-gated broadcast decision from the materialized edge cache
    val small = edges.queryExecution.optimizedPlan.stats.sizeInBytes <= (32L << 20)

    /** Checkpoint `df`, returning the new frame plus the block-manager RDD
      * ids the checkpoint created (so the caller can free them later).
      * New ids are detected as "persistent ids above the pre-call max" —
      * RDD ids are monotonic, so ids persisted *before* this call can
      * never be captured even if still registered. A concurrent job
      * persisting in the same window could still be caught: this class
      * assumes the single-threaded driver loop Spark jobs normally run
      * under (concurrent resolveChains calls are unsupported).
      */
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val maxBefore = sc.getPersistentRDDs.keySet.maxOption.getOrElse(Int.MinValue)
      val cp = df.localCheckpoint(eager = true)
      (cp, sc.getPersistentRDDs.keySet.filter(_ > maxBefore).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(i => sc.getPersistentRDDs.get(i).foreach(_.unpersist(blocking = false)))

    var (cur, curIds) = checkpointTracked(edges)
    var hops = 1
    var moved = true
    while (hops < maxHops && moved) {
      val b = if (small) broadcast(cur.as("b")) else cur.as("b")
      val (nxt, nxtIds) = checkpointTracked(
        cur.as("a")
          .join(b, col("a.dst") === col("b.src"), "left_outer")
          .select(col("a.src").as("src"),
            coalesce(col("b.dst"), col("a.dst")).as("dst"),
            col("b.dst").isNotNull.as("__hopped")))
      moved = !nxt.filter(col("__hopped")).isEmpty
      free(curIds)
      cur = nxt.select(col("src"), col("dst"))
      curIds = nxtIds
      hops *= 2
    }
    // copy the result off the final checkpoint so this call leaves ZERO
    // persistent checkpoint RDDs behind (round-2 lesson: one leaked
    // residual per invocation accumulates block-manager garbage for the
    // rest of the session; Bench's clearCache() frees cached frames but
    // never checkpoint blocks). MEMORY_AND_DISK: eviction spills instead
    // of recomputing through the now-freed checkpoint lineage.
    val out = cur.select(col("src").as(id), col("dst").as("resolved_to"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    free(curIds)
    out
  }

  /** J7: legacy-recovery lookup-and-repoint (reference:
    * checking/check_versions_completness.py:100-117): for ids referenced
    * somewhere (documents, pointers) but missing from the current
    * collection, look the id up in the LEGACY collection, take its
    * natural key, and repoint to that key's current active version —
    * the missing id becomes a tombstone pointing at the active. Rows
    * report `action`: REPOINTED (legacy hit + active found), NO_ACTIVE
    * (legacy hit, key has no active), NOT_IN_LEGACY (unrecoverable).
    *
    * Set-level: two left joins (one shuffle each, broadcast when the
    * missing-id set is small) replace the reference's per-id find loop.
    */
  def recoverLegacy(missingIds: DataFrame, legacy: DataFrame, actives: DataFrame,
                    id: String = "_id", nk: String = "nk"): DataFrame = {
    val m = missingIds.select(col(id))
    val l = legacy.select(col(id).as("__lid"), col(nk).as("__lnk"))
    val a = actives.select(col(id).as("__aid"), col(nk).as("__ank"))
    m.join(l, col(id) === col("__lid"), "left_outer")
      .join(a, col("__lnk") === col("__ank"), "left_outer")
      .select(col(id), col("__lnk").as(nk), col("__aid").as("updated_to"),
        when(col("__lid").isNull, lit("NOT_IN_LEGACY"))
          .when(col("__aid").isNull, lit("NO_ACTIVE"))
          .otherwise(lit("REPOINTED")).as("action"))
  }

  /** Field-level diff between two versions of a record: which of `fields`
    * were added / modified / missing in `new` vs `old` (reference:
    * ntp_entry.py:219-236 `diff_document`). Both inputs are struct columns
    * with the same schema; empty string counts as absent (the reference's
    * nan->'' normalization means '' is the absence marker).
    */
  def diffFields(newRec: Column, oldRec: Column, fields: Seq[String]): Column = {
    def f(rec: Column, name: String) = coalesce(rec.getField(name).cast("string"), lit(""))
    val changed = fields.map { n =>
      when(f(newRec, n) =!= f(oldRec, n) && f(newRec, n) =!= "" && f(oldRec, n) =!= "", lit(n))
    }
    val added = fields.map { n => when(f(newRec, n) =!= "" && f(oldRec, n) === "", lit(n)) }
    val missing = fields.map { n => when(f(newRec, n) === "" && f(oldRec, n) =!= "", lit(n)) }
    struct(
      filter(array(added: _*), _.isNotNull).as("added"),
      filter(array(changed: _*), _.isNotNull).as("modified"),
      filter(array(missing: _*), _.isNotNull).as("missing"))
  }

  /** merge_data precedence (reference: ntp_entry.py:30-46): non-empty new
    * value wins; an empty new value never overwrites an existing one.
    * Operates on `Map[String,String]` columns.
    */
  def mergeRecords(newMap: Column, oldMap: Column): Column =
    map_zip_with(newMap, oldMap, (_, n, o) => coalesce(nullif(n, lit("")), o))
}
