package graft.lake

import org.apache.spark.sql.DataFrame

/** Durable poll consumer over a [[SnapshotLake]] CDC feed — the
  * subscription half of the change-data story (the lake emits net
  * row-level changes between versions; this tracks HOW FAR a downstream
  * has consumed them across process restarts).
  *
  * The offset store is a directory of empty `oNNNNNNNN.offset` claim
  * files, one per consumed upper version — the same create-exclusive
  * idiom as the lake's manifest claims, so it inherits the lake's
  * durability model (atomic create, no read-modify-write) and costs one
  * small-dir listing per poll. The current offset is the max claim;
  * re-claiming an already-claimed version is impossible, so two
  * processes polling one offset directory can't both deliver the same
  * interval AND both advance — the loser of the create race throws and
  * retries its poll against the new offset.
  *
  * Delivery is at-least-once with exactly-once EFFECT for idempotent
  * handlers: the offset commits only after the handler returns, so a
  * crash in between redelivers the same (fromV, toV] interval on the
  * next poll. Handlers that key their output by the interval — e.g.
  * landing a [[MaterializedAgg]] change segment under drop id
  * `v<from>to<to>` (idempotent staged replacement), or the streaming
  * sinks' batch-id pattern — make the redelivery a no-op.
  *
  * Catch-up polls collapse intermediate versions (a poll after commits
  * v2..v5 delivers ONE net v1→v5 feed — `changesBetween` endpoint
  * semantics), which is what a summary/index maintainer wants: work
  * proportional to net churn, not to commit count.
  */
class CdcConsumer(lake: SnapshotLake, offsetDir: String, startVersion: Long = 1L) {
  import CdcConsumer._

  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(offsetDir)
      .getFileSystem(lake.spark.sparkContext.hadoopConfiguration)
  private def dir = new org.apache.hadoop.fs.Path(offsetDir)

  /** Highest durably-consumed version; `startVersion` before the first
    * poll (the consumer's base — the downstream is expected to have
    * loaded `readAt(startVersion)` as its initial state).
    */
  def offset: Long =
    if (!fs.exists(dir)) startVersion
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case OffsetRe(d) => d.toLong }
      .foldLeft(startVersion)(math.max)

  /** Deliver the net pre-image-carrying change feed (offset, latest] to
    * `handler(changes, fromV, toV)`, then durably advance the offset.
    * Returns the delivered interval, or None when already caught up.
    */
  def poll(handler: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = offset
    val to = lake.latestVersion.getOrElse(return None)
    if (to <= from) return None
    handler(lake.changesBetween(from, to, preImages = true), from, to)
    commitOffset(to)
    Some((from, to))
  }

  /** Bound the offset directory: drop every claim below the current
    * offset (the offset is the MAX claim, so pruning history can never
    * move it — only the newest file is load-bearing; the older ones are
    * audit trail). Returns the number of claims removed.
    */
  def pruneOffsets(): Int = {
    val cur = offset
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName match {
        case OffsetRe(d) => d.toLong < cur
        case _ => false
      })
      .count(p => fs.delete(p, false))
  }

  private[graft] def commitOffset(v: Long): Unit = {
    fs.mkdirs(dir)
    // create-exclusive: the claim either atomically lands or throws
    // (lost the race to a concurrent consumer of this offset dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, f"o$v%08d.offset"), false).close()
  }
}

object CdcConsumer {
  // \d{8,}, not \d{8}: %08d PADS to at least 8 digits — at version
  // 100,000,000 the claim grows a 9th digit, and an exact-8 match would
  // stop advancing the offset (every poll redelivers, every commit
  // collides with the unmatched claim)
  private val OffsetRe = "^o(\\d{8,})\\.offset$".r
}
