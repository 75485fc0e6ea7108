package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference has no streaming runtime — incrementality is batch-replay
  * with an id watermark (reference: read_parquet.py:85-123;
  * ntp_utils.py:51-69). Here the same batch operators run under
  * Structured Streaming: `readStream` over the lake directory, watermarked
  * tumbling-window aggregation, and `foreachBatch` for the CDC-style
  * versioned upsert (the reference's re-delivery semantics map to
  * dropDuplicates-within-watermark + merge per micro-batch).
  *
  * Scale: stateful aggregation is keyed by (window, event_type) — state
  * size is bounded by cardinality x watermark horizon, not stream length;
  * `foreachBatch` upserts rewrite only the partitions a batch touches.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet/json drops. */
  def readEvents(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Watermarked tumbling-window aggregation — the streaming form of the
    * batch q_events_windowed query. Late data beyond the watermark is
    * dropped deterministically. Money sums accumulate on the exact cents
    * grid (one long per event, one division at the end) so the result is
    * order-independent — a raw double sum would drift with partition
    * ordering, violating the engine's parity convention.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("__cents"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"),
        (col("__cents").cast("double") / 100.0).as("sum_value"))

  /** Streaming dedup of re-delivered records on the natural key + version
    * timestamp — the reference's duplicate-delivery handling (J2/F21) as a
    * watermarked dropDuplicates.
    */
  def dedupDeliveries(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Streaming exact-dedup of a document corpus by canonical content
    * fingerprint — the corpus-ingestion twin of [[dedupDeliveries]]: a
    * document feed replayed (or tailed) through `readStream` emits each
    * DISTINCT canonical fingerprint once. Emits the fingerprint only:
    * streaming dropDuplicates keeps the arbitrary first arrival, so
    * emitting document content would be run-order-dependent, while the
    * fingerprint SET is deterministic and batch-oracle-comparable.
    * State is one entry per distinct fingerprint — at corpus scale pair
    * it with a watermarked ingestion timestamp to bound the store, or
    * run it as the batch-side `dedup_exact_*` queries instead.
    */
  def dedupCorpus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(graft.ops.TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .dropDuplicates("fp")

  /** CDC-style sink: every micro-batch runs the same batch merge the
    * ingest pipeline uses (K1 upsert via foreachBatch).
    */
  def upsertSink(events: DataFrame)(merge: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id) }

  /** Streaming CDC ingest (§2.10; reference: read_parquet.py:85-123 —
    * the replay loop as a stream): each micro-batch of raw drop rows
    * runs the SAME merge as the batch `IngestJob.run`, so a drop-feed
    * directory replayed through `readStream` converges to exactly the
    * lake state the equivalent sequence of batch ingests produces
    * (id-stable, overlap-merged, tombstone-chained). Empty micro-batches
    * are skipped — no spurious lake rewrite. Give the returned writer a
    * `checkpointLocation` so re-runs resume from the last processed file.
    */
  def ingestSink(lake: graft.lake.LakeTable, codes: Map[String, String],
                 naturalId: String, updated: String, group: Int)(
                 drops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(drops) { (batch, _) =>
      if (!batch.isEmpty)
        graft.pipeline.IngestJob.run(batch.sparkSession, lake, batch, codes,
          naturalId, updated, group)
    }

  /** Streaming CDC ingest into a [[graft.lake.SnapshotLake]]: every
    * non-empty micro-batch commits one file-level copy-on-write upsert,
    * so a replayed drop feed converges to exactly the state the same
    * batches merged by hand would produce — AND the journey is queryable:
    * `history()` shows one version per batch, `changesBetween` serves the
    * net row-level diff of any interval. Give the writer a
    * `checkpointLocation` and re-runs resume from the last processed
    * file; a [[graft.lake.SnapshotConflict]] from a concurrent writer
    * fails the batch, and the stream restart re-runs it against the new
    * state (the upsert is idempotent per batch content).
    */
  def snapshotSink(lake: graft.lake.SnapshotLake)(
      drops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(drops) { (batch, _) =>
      if (!batch.isEmpty) lake.upsert(batch)
    }

  /** Quarantining ingest: each micro-batch splits on row-local
    * data-quality rules ([[graft.ops.Expectations.split]]) — clean rows
    * upsert the snapshot lake, dirty rows append to a dead-letter
    * parquet path with their violated-rule list and batch id, and the
    * stream keeps running (vs the all-or-nothing gate, which would wedge
    * ingestion on one bad drop). Dead letters land under
    * `quarantinePath/batch=<id>` via staged-swap REPLACE, so a replayed
    * micro-batch (crash between the quarantine landing and the lake
    * commit) rewrites its own segment instead of duplicating rows —
    * exactly-once dead letters under the engine's batch-id replay
    * contract; the lake side stays idempotent per batch content like
    * every upsert sink.
    */
  def quarantineSink(lake: graft.lake.SnapshotLake,
                     rules: Seq[graft.ops.Expectations.Rule],
                     quarantinePath: String)(
      drops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(drops) { (batch, id) =>
      val (clean, dirty) = graft.ops.Expectations.split(batch, rules)
      if (!dirty.isEmpty)
        graft.lake.Staged.land(batch.sparkSession, s"$quarantinePath/batch=$id", dirty)
      if (!clean.isEmpty) lake.upsert(clean)
    }

  /** The zone-map twin of [[snapshotSink]]: each micro-batch upserts the
    * snapshot lake, then churn-refreshes the min/max range-scan sidecar
    * ([[graft.lake.ZoneMapIndex.refreshSnapshot]]) for `valCol` — the
    * refresh stats-scans only the batch's new files (immutable carried
    * files keep their rows verbatim), so range scans stay selective
    * while drops stream in. Between the upsert and the refresh a range
    * scan is still CORRECT — not-yet-indexed files are unconditional
    * candidates — so a crash between the two steps costs selectivity
    * until the next batch, never rows.
    */
  def zonemapSink(lake: graft.lake.SnapshotLake, valCol: String)(
      drops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(drops) { (batch, _) =>
      if (!batch.isEmpty) {
        lake.upsert(batch)
        graft.lake.ZoneMapIndex.refreshSnapshot(lake, valCol)
      }
    }

  /** STREAMING INDEX MAINTENANCE: each micro-batch of documents upserts
    * the persisted MinHash band index ([[graft.ops.DedupIndex.upsert]])
    * — new/changed docs are signed, re-delivered unchanged docs carry
    * verbatim, documents outside the batch are untouched. A replayed
    * document feed converges to exactly the index a from-scratch build
    * over the final corpus produces, so near-dup candidate serving stays
    * warm while drops stream in. Checkpointable like its sink siblings.
    */
  def dedupIndexSink(idxPath: String, idCol: String, textCol: String)(
      docs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(docs) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.DedupIndex.upsert(batch, idCol, textCol, idxPath)
    }

  /** The fuzzy-master twin of [[dedupIndexSink]]: each micro-batch of
    * master rows delta-upserts the persisted PassJoin chunk index
    * ([[graft.ops.FuzzyJoinIndex.upsert]]) under the hot-key list pinned
    * at build — re-delivered unchanged strings carry verbatim, so
    * replaying a master feed never re-chunks the steady state and a
    * probe after any batch resolves against exactly the master seen so
    * far. The index must be BUILT before the stream starts (the hot
    * list needs a corpus to tune against, not a micro-batch).
    */
  def fuzzyIndexSink(idxPath: String, idCol: String, strCol: String)(
      masterRows: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(masterRows) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.FuzzyJoinIndex.upsert(batch, idCol, strCol, idxPath)
    }

  /** The ANN twin of [[dedupIndexSink]]: each micro-batch of embedding
    * rows upserts the persisted IVF-SQ8 lists under the pinned codebook
    * ([[graft.ops.SimilarityIndex.upsert]]). The index must be BUILT
    * before the stream starts — a micro-batch is not a corpus to train a
    * codebook on.
    */
  def simIndexSink(idxPath: String, idCol: String, vecCol: String)(
      vectors: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(vectors) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.SimilarityIndex.upsert(batch, idCol, vecCol, idxPath)
    }

  /** The 8-byte tier's twin of [[simIndexSink]]: each micro-batch of
    * embedding rows delta-upserts the persisted IVF-PQ lists under the
    * BUILD-pinned codebooks, gate centroids and residual reference
    * ([[graft.ops.PqIndex.upsert]]) — re-delivered unchanged vectors
    * carry verbatim, changed/new ids re-encode, and a probe after any
    * batch serves exactly what a from-scratch encode of everything
    * streamed so far would. Build the index before the stream starts.
    */
  def pqIndexSink(idxPath: String, idCol: String, vecCol: String)(
      vectors: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(vectors) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.PqIndex.upsert(batch, idCol, vecCol, idxPath)
    }

  /** The factorized tier's twin: micro-batches delta-upsert the
    * persisted IMI-PQ lists under the build-pinned sub-codebooks +
    * residual books ([[graft.ops.ImiPqIndex.upsert]]).
    */
  def imiPqIndexSink(idxPath: String, idCol: String, vecCol: String)(
      vectors: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(vectors) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.ImiPqIndex.upsert(batch, idCol, vecCol, idxPath)
    }

  /** The text-stats twin of the index sinks: each micro-batch of
    * documents delta-upserts the per-doc stats sidecar
    * ([[graft.ops.TextIndex.upsert]]) — only changed docs re-tokenize.
    */
  def textIndexSink(idxPath: String, idCol: String, textCol: String)(
      docs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(docs) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.TextIndex.upsert(batch, idCol, textCol, idxPath)
    }

  /** The trained-classifier twin of [[textIndexSink]]: each micro-batch
    * of documents delta-scores the persisted clf score table
    * ([[graft.ops.ClfIndex.upsert]]) under the index's PINNED model —
    * re-delivered unchanged docs carry verbatim, changed/new docs pay
    * one broadcast-model scoring pass. The model itself never retrains
    * from a stream: a labeled-slice change is a batch
    * [[graft.ops.ClfIndex.refresh]] decision (the fingerprint compare
    * lives there), not a micro-batch one. Requires a BUILT index.
    */
  def clfScoreSink(idxPath: String, idCol: String, textCol: String)(
      docs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(docs) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.ClfIndex.upsert(batch, idCol, textCol, idxPath)
    }

  /** The BM25 posting-list twin: each micro-batch delta-upserts the
    * persisted inverted index ([[graft.ops.PostingsIndex.upsert]]) —
    * re-delivered unchanged docs carry verbatim, so replaying a feed
    * never re-tokenizes the steady state, and an indexed probe after any
    * batch scores exactly like a from-scratch recompute over everything
    * streamed so far.
    */
  def postingsIndexSink(idxPath: String, idCol: String, textCol: String)(
      docs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(docs) { (batch, _) =>
      if (!batch.isEmpty) graft.ops.PostingsIndex.upsert(batch, idCol, textCol, idxPath)
    }

  /** The summary twin of the index sinks: each micro-batch lands ONE
    * aggregate-sized [[graft.lake.MaterializedAgg]] segment keyed by the
    * batch id, so the served summary always covers everything streamed
    * so far and a recovery replay of batch N REPLACES segment N instead
    * of double-counting it (landDrop is idempotent per drop id). Compact
    * periodically to bound segment count; give the writer a
    * `checkpointLocation` like its siblings.
    */
  def summarySink(path: String, spec: graft.lake.MaterializedAgg.Spec)(
      rows: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(rows) { (batch, id) =>
      if (!batch.isEmpty) {
        graft.lake.MaterializedAgg.landDrop(batch, spec, path, s"batch$id")
        ()
      }
    }

  /** The PCA twin of [[summarySink]]: each micro-batch of embedding
    * rows lands ONE moment segment ([[graft.ops.PcaIndex.landDrop]])
    * keyed by the batch id, so [[graft.ops.PcaIndex.serveModel]] fits
    * the eigenbasis over everything streamed so far from O(dim²)
    * merged rows — no corpus rescan, decimal-exact convergence to the
    * one-shot fit. Replay of batch N replaces segment N (idempotent
    * per drop id); compact periodically to bound segment count.
    */
  def pcaMomentsSink(path: String, vecCol: String, dim: Int)(
      vectors: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(vectors) { (batch, id) =>
      if (!batch.isEmpty) {
        graft.ops.PcaIndex.landDrop(batch, vecCol, dim, path, s"batch$id")
        ()
      }
    }

  /** The frequent-items twin of [[summarySink]]: each micro-batch lands
    * ONE top-k count segment ([[graft.ops.Sketches.landTopKDrop]]) keyed
    * by the batch id, so [[graft.ops.Sketches.serveTopK]] always bounds
    * every key's frequency over everything streamed so far (n_est <=
    * true <= n_hi, guarantee above the summed cutoffs). Replay of batch
    * N replaces segment N (idempotent); compactTopK periodically to
    * bound segment count — the fold preserves served bounds for
    * retained keys.
    */
  def topkSink(path: String, dims: Seq[String], keyCol: String, k: Int)(
      rows: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(rows) { (batch, id) =>
      if (!batch.isEmpty) {
        graft.ops.Sketches.landTopKDrop(batch, dims, keyCol, k, path, s"batch$id")
        ()
      }
    }

  /** The distribution twin of [[topkSink]]: each micro-batch lands one
    * ε-rank quantile summary ([[graft.ops.Sketches.landQuantileDrop]])
    * keyed by the batch id, so [[graft.ops.Sketches.serveQuantile]]
    * answers rank queries over everything streamed so far within the
    * summed segment envelope. Replay of batch N replaces segment N
    * (idempotent); `compactQuantile` periodically to bound segment
    * count (one ε increment per fold, documented there).
    */
  def quantileSink(path: String, dims: Seq[String], valueCol: String, k: Int)(
      rows: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    upsertSink(rows) { (batch, id) =>
      if (!batch.isEmpty) {
        graft.ops.Sketches.landQuantileDrop(batch, dims,
          org.apache.spark.sql.functions.col(valueCol), k, path, s"batch$id")
        ()
      }
    }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(lastTs: Long, sessionId: Long, curStart: Long, curN: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Custom stateful sessionization via flatMapGroupsWithState: per-user
    * state carries the OPEN session (start, count, last event time) so a
    * session spanning micro-batches is emitted exactly once, with full
    * counts. Only CLOSED sessions are emitted: a session closes when a
    * later event arrives past `gapMs`, or when the event-time watermark
    * passes lastTs + gapMs with no successor (GroupState event-time
    * timeout flushes it). Emitting the still-open session each batch —
    * the previous design — double-emitted any session spanning a batch
    * boundary and reset its start/count.
    *
    * Scale: state is one fixed-size record per active user; the timeout
    * reaps idle users, so state is bounded by concurrently-active users,
    * not stream history.
    */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[Event], gapMs: Long,
                         watermarkDelay: String = "0 seconds"):
      org.apache.spark.sql.Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          // state timestamps are MICROSECONDS via DateTimeUtils (Timestamp
          // .getTime is millis and would silently truncate event times —
          // the batch oracle compares at full parquet precision)
          import org.apache.spark.sql.catalyst.util.DateTimeUtils
          val gapUs = gapMs * 1000L
          def sess(st: SessionState) = Session(userId, st.sessionId, st.curN,
            DateTimeUtils.toJavaTimestamp(st.curStart), DateTimeUtils.toJavaTimestamp(st.lastTs))
          if (state.hasTimedOut) {
            val st = state.get
            if (st.lastTs == Long.MinValue) {
              // idle marker expired with no new events: reap the counter
              state.remove()
              Iterator.empty
            } else {
              // the watermark passed lastTs + gap with no successor:
              // flush the closed session but RETAIN the session counter
              // for a while — dropping state here restarted session_id
              // at 1, so (user_id, session_id) collided across timeout
              // flushes. The idle marker expires after ~10 more gaps
              // (bounded state); a user idle longer restarts numbering,
              // which is the documented trade against unbounded state.
              state.update(SessionState(Long.MinValue, st.sessionId, Long.MinValue, 0L))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 10 * gapMs + 1)
              Iterator.single(sess(st))
            }
          } else {
            val sorted = it.toSeq.sortBy(e => (DateTimeUtils.fromJavaTimestamp(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, Long.MinValue, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = DateTimeUtils.fromJavaTimestamp(e.ts)
              if (st.lastTs == Long.MinValue) {
                st = SessionState(t, st.sessionId + 1, t, 1L)
              } else if (t - st.lastTs > gapUs) {
                out += sess(st)
                st = SessionState(t, st.sessionId + 1, t, 1L)
              } else {
                // cross-batch late event (admissible under the watermark):
                // never regress the session clock — max for the end, min
                // for the start, matching the globally-sorted batch
                // oracle's view of the still-open session. Unconditional
                // lastTs = t once emitted end < start and split sessions
                // whose true last event was within the gap.
                st = SessionState(math.max(t, st.lastTs), st.sessionId,
                  math.min(st.curStart, t), st.curN + 1)
              }
            }
            state.update(st)
            // timeout API is milliseconds; round UP so the flush never
            // fires before the full microsecond gap has truly elapsed —
            // and strictly above the current watermark or Spark rejects
            state.setTimeoutTimestamp(
              math.max((st.lastTs + gapUs + 999L) / 1000L, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
        })
  }
}
