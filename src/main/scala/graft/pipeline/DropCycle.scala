package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.lake.{BloomIndex, MaterializedAgg, SnapshotLake}
import graft.ops.{DedupIndex, Sketches}

/** The monthly-drop runbook as ONE entry point — the reference's actual
  * operating cadence (read_parquet.py:85-123 re-ingests a drop, then
  * separate scripts recompute summaries and audits corpus-wide). Here a
  * drop lands through every maintained artifact in churn-proportional
  * steps:
  *
  *  1. snapshot lake CoW upsert — one version, only key-bearing files
  *     rewritten;
  *  2. bloom point-lookup sidecar — [[BloomIndex.refreshSnapshot]],
  *     file list from manifests, immutable files never re-bloom;
  *  3. MinHash band index — [[DedupIndex.upsert]], batch-scoped delta
  *     (unchanged re-delivered docs carry verbatim); optionally the
  *     per-doc text-stats sidecar ([[graft.ops.TextIndex.upsert]]) and
  *     the BM25 posting-list index ([[graft.ops.PostingsIndex.upsert]])
  *     ride the same fingerprint-gated delta;
  *  4. summary — [[MaterializedAgg.landChangesDrop]] over the version
  *     interval's change feed with pre-images (-pre +post retraction);
  *     the FIRST cycle lands a full-drop segment instead (nothing to
  *     diff against);
  *  5. distinct sketch — [[Sketches.landHllDrop]] of the drop (HLL
  *     re-insertion of unchanged keys is a union no-op, so per-drop
  *     sketches stay correct under upserts; deletes are not retractable
  *     from HLL — rebuild the sketch path when rows are purged);
  *  6. frequent-items segments — [[Sketches.landTopKDrop]] over the
  *     interval's inserted/updated rows (event-stream counting);
  *  7. bigram-LM counts — [[graft.ops.Relevance.landLmChangesDrop]]
  *     with pre-image retraction, so the merged model always equals a
  *     from-scratch retrain over the current corpus.
  *
  * Every step's cost follows the DROP, never the corpus; each step is
  * idempotent per drop id (segment replace / fingerprint carry), so a
  * crashed cycle re-runs safely. Returns per-tier (carried, refreshed)
  * counts — the observable proof that maintenance scaled with churn.
  */
object DropCycle {

  final case class Config(
    // step 0: data-quality dead-letter split (rules, quarantinePath,
    // dropId) — dirty rows of the DROP land under
    // `quarantinePath/seg=<dropId>` with their violated-rule list and
    // never reach anything downstream; the cycle proceeds on the clean
    // rows instead of wedging. The seg landing is a staged-swap REPLACE
    // (the MaterializedAgg layout), so a crashed cycle re-run with the
    // same dropId replaces its dead letters instead of duplicating them
    expect: Option[(Seq[graft.ops.Expectations.Rule], String, String)] = None,
    textCol: Option[String] = None,       // steps 3 + 3b + 6 run when set
    bandIdxPath: Option[String] = None,   // default: <lake>.bandidx
    textStatsPath: Option[String] = None, // step 3b: per-doc stats sidecar
    postingsPath: Option[String] = None,  // step 3c: BM25 posting-list index
    bloom: Boolean = true,
    summary: Option[(MaterializedAgg.Spec, String)] = None,
    hll: Option[(Seq[String], String, String)] = None, // (dims, key, path)
    topk: Option[(Seq[String], String, Int, String)] = None, // (dims, key, k, path)
    lmPath: Option[String] = None,        // step 6: bigram-LM count segments
    // step 6b: DSIR bucket-count segments (targetPred, path) — the
    // data-selection model maintained at change-feed cost with signed
    // retraction, like the LM tier
    dsir: Option[(org.apache.spark.sql.Column, String)] = None,
    // step 7: ε-rank quantile summaries (dims, value col, k, path).
    // Event-stream semantics like the top-k tier: segments summarize the
    // interval's inserted/updated rows — deletes/pre-images don't
    // retract (a summary point is not a signed count); rebuild the path
    // for current-state quantiles after purges.
    quantile: Option[(Seq[String], String, Int, String)] = None,
    // step 2b: zone-map (min/max) range-scan sidecar over this value
    // column — [[graft.lake.ZoneMapIndex.refreshSnapshot]]; immutable
    // files carry verbatim, only the drop's new files get stats-scanned
    zonemap: Option[String] = None,
    // step 3d: persisted near-dup cluster labels
    // ([[graft.ops.ClusterIndex]]). Needs textCol. The lake's string
    // keys map through the ntp-id codec (labels live in long id space);
    // the refresh runs against the lake's CURRENT corpus but is
    // internally fingerprint-gated — one digest-sized pass, label
    // recompute only where components changed.
    clusterIdxPath: Option[String] = None,
    // step 3e: learned-BPE word cache ([[graft.ops.BpeIndex]]). Needs
    // textCol and an EXISTING index (merges pinned at build — a cache
    // refresh never retrains). Only the drop's previously-unseen words
    // tokenize; the cache only grows, a lagging cache costs compute,
    // never a wrong count.
    bpePath: Option[String] = None,
    // step 6c: per-registrable-domain token totals (urlCol, path) — the
    // domain-budget curation axis as a signed summable segment table
    // riding the same pre-image change feed as the LM/DSIR tiers
    domainTokens: Option[(String, String)] = None,
    // step 3f: persisted trained-classifier scores
    // ([[graft.ops.ClfIndex]]). Needs textCol and an EXISTING index —
    // the model pins at build (a labeled-slice change is an explicit
    // ClfIndex.refresh/build decision, never a drop side effect); the
    // drop's changed docs re-score under the pinned broadcast model,
    // re-delivered unchanged docs carry verbatim.
    clfScoresPath: Option[String] = None)

  /** Run one cycle; returns tier -> (carried, refreshed). */
  def run(lake: SnapshotLake, dropIn: DataFrame, conf: Config): Map[String, (Long, Long)] = {
    val spark = dropIn.sparkSession
    val (drop, dqReport) = conf.expect match {
      case Some((rules, qpath, dropId)) =>
        require(dropId.nonEmpty && dropId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
          s"quarantine drop id must be [A-Za-z0-9_-]+: '$dropId'")
        // ONE materialization of the annotated frame: clean, dirty, and
        // both counts all derive from it, so a nondeterministic source
        // (re-read table, sampled input) cannot quarantine a row AND
        // land it — or neither — between independent actions
        val ann = graft.ops.Expectations.annotate(dropIn, rules)
          .localCheckpoint(true)
        import org.apache.spark.sql.functions.{col, size}
        val dirty = ann.filter(size(col("violated")) > 0)
        val clean = ann.filter(size(col("violated")) === 0).drop("violated")
        val nDirty = dirty.count()
        // idempotent per drop id: a cycle re-run REPLACES its seg — and a
        // re-run whose (fixed) input is now CLEAN must delete the stale
        // seg, or the previous run's dead letters keep indicting a drop
        // that no longer has any
        val segPath = new org.apache.hadoop.fs.Path(s"$qpath/seg=$dropId")
        if (nDirty > 0)
          graft.lake.Staged.land(spark, segPath.toString, dirty)
        else segPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(segPath, true)
        // the CLEAN slice feeds every downstream tier of this cycle
        (clean, Some((clean.count(), nDirty)))
      case None => (dropIn, None)
    }
    val before = lake.latestVersion
    lake.upsert(drop)
    val after = lake.latestVersion.get
    val report = scala.collection.mutable.Map[String, (Long, Long)]()
    dqReport.foreach(report("dq") = _)
    report("lake") = (before.getOrElse(0L), after)
    if (conf.bloom)
      report("bloom") = BloomIndex.refreshSnapshot(lake, lake.keyCol)
    conf.zonemap.foreach { vcol =>
      report("zonemap") = graft.lake.ZoneMapIndex.refreshSnapshot(lake, vcol)
    }
    conf.textCol.foreach { text =>
      val idx = conf.bandIdxPath.getOrElse(lake.path + ".bandidx")
      report("band") = DedupIndex.upsert(drop, lake.keyCol, text, idx)
      conf.textStatsPath.foreach { statsPath =>
        report("textstats") = graft.ops.TextIndex.upsert(drop, lake.keyCol, text, statsPath)
      }
      conf.postingsPath.foreach { postPath =>
        report("postings") = graft.ops.PostingsIndex.upsert(drop, lake.keyCol, text, postPath)
      }
      conf.bpePath.foreach { bpePath =>
        report("bpe") = graft.ops.BpeIndex.refresh(drop, text, bpePath)
      }
      conf.clfScoresPath.foreach { clfPath =>
        report("clf") = graft.ops.ClfIndex.upsert(drop, lake.keyCol, text, clfPath)
      }
      conf.clusterIdxPath.foreach { clPath =>
        import org.apache.spark.sql.functions.{coalesce, col, expr, when, xxhash64}
        // integral surrogate for the components fixpoint: exact for ntp
        // and numeric keys; other key shapes fall back to xxhash64
        // (deterministic; keep ONE key shape per lake — mixed shapes
        // could alias surrogate ids)
        val k = col(lake.keyCol)
        val docId = coalesce(
          when(graft.core.NtpIds.checkNtpId(k), graft.core.NtpIds.parseNtpId(k)),
          expr(s"try_cast(${lake.keyCol} AS BIGINT)"),
          xxhash64(k))
        val corpus = lake.read.select(docId.as("__doc_long"), col(text))
        report("cluster") = graft.ops.ClusterIndex.refresh(corpus, "__doc_long", text, clPath)
      }
    }
    conf.summary.foreach { case (spec, path) =>
      val segs = before match {
        case Some(v0) =>
          MaterializedAgg.landChangesDrop(
            lake.changesBetween(v0, after, preImages = true), spec, path, s"v${v0}to$after")
        case None =>
          MaterializedAgg.landDrop(lake.readAt(after), spec, path, s"v0to$after")
      }
      report("summary") = (0L, segs)
    }
    conf.hll.foreach { case (dims, key, path) =>
      report("hll") = (0L, Sketches.landHllDrop(drop, dims, key, path, s"v$after"))
    }
    // top-k frequency segments are ADDITIVE row counts (unlike HLL's
    // idempotent insertion), so they land from the version interval's
    // change feed: counting only insert/update_post rows keeps
    // re-delivered unchanged rows out (the CoW carries them, the feed
    // cancels them). Frequency-sketch semantics: the tier counts the
    // EVENT STREAM of arriving rows — deletes don't retract (the bound
    // invariant is over what was counted; rebuild the path for
    // current-state frequencies after purges)
    conf.topk.foreach { case (dims, key, k, path) =>
      val src = before match {
        case Some(v0) => lake.changesBetween(v0, after)
          .filter(org.apache.spark.sql.functions.col("change_type")
            .isin("insert", "update_post"))
        case None => lake.readAt(after)
      }
      report("topk") = (0L, Sketches.landTopKDrop(src, dims, key, k, path, s"v$after"))
    }
    // quantile summaries ride the same interval feed as top-k: the
    // distribution of ARRIVING rows (insert/update_post), per-drop
    // segments merged at serve; see Config.quantile for the
    // non-retractability note
    conf.quantile.foreach { case (dims, valueCol, k, path) =>
      val src = before match {
        case Some(v0) => lake.changesBetween(v0, after)
          .filter(org.apache.spark.sql.functions.col("change_type")
            .isin("insert", "update_post"))
        case None => lake.readAt(after)
      }
      report("quantile") = (0L, Sketches.landQuantileDrop(src, dims,
        org.apache.spark.sql.functions.col(valueCol), k, path, s"v$after"))
    }
    // bigram-LM counts retract through the pre-image change feed — the
    // merged model always equals a from-scratch retrain over the
    // current corpus, at change-feed cost
    (conf.textCol, conf.lmPath) match {
      case (Some(text), Some(path)) =>
        val n = before match {
          case Some(v0) => graft.ops.Relevance.landLmChangesDrop(
            lake.changesBetween(v0, after, preImages = true),
            lake.keyCol, text, path, s"v${v0}to$after")
          case None => graft.ops.Relevance.landLmDrop(
            lake.readAt(after), lake.keyCol, text, path, s"v0to$after")
        }
        report("lm") = (0L, n)
      case _ => ()
    }
    // per-domain token totals ride the same pre-image feed (a signed
    // summable table like the LM's) — the domain-budget cut list is
    // then a serve-time read of the merged totals
    (conf.textCol, conf.domainTokens) match {
      case (Some(text), Some((urlCol, path))) =>
        val n = before match {
          case Some(v0) => graft.ops.Curation.landDomainTokenChangesDrop(
            lake.changesBetween(v0, after, preImages = true),
            text, urlCol, path, s"v${v0}to$after")
          case None => graft.ops.Curation.landDomainTokenDrop(
            lake.readAt(after), text, urlCol, path, s"v0to$after")
        }
        report("domains") = (0L, n)
      case _ => ()
    }
    // DSIR bucket counts ride the same pre-image feed (the data-selection
    // model is a summable count table exactly like the LM's)
    (conf.textCol, conf.dsir) match {
      case (Some(text), Some((targetPred, path))) =>
        val n = before match {
          case Some(v0) => graft.ops.Curation.landDsirChangesDrop(
            lake.changesBetween(v0, after, preImages = true),
            lake.keyCol, text, targetPred, path, s"v${v0}to$after")
          case None => graft.ops.Curation.landDsirDrop(
            lake.readAt(after), lake.keyCol, text, targetPred, path, s"v0to$after")
        }
        report("dsir") = (0L, n)
      case _ => ()
    }
    report.toMap
  }

  /** The embeddings-side twin of [[run]]: maintain the persisted IVF-SQ8
    * index for a drop of (re)embedded documents. Thin by design — the
    * churn gating (vector fingerprints: unchanged vectors carry
    * verbatim, only new/changed ones are quantized and assigned) lives
    * in [[graft.ops.SimilarityIndex.upsert]]; this is the runbook seam
    * that puts embedding drops on the same per-drop cadence and
    * (carried, refreshed) reporting as the text tiers. Requires the
    * index to exist (codebook pinned at [[graft.ops.SimilarityIndex
    * .build]] — refresh NEVER retrains, so assignments stay comparable
    * across drops).
    */
  def runEmbeddings(embBatch: DataFrame, idCol: String, vecCol: String,
                    indexPath: String,
                    // (path, dim, dropId): also land this drop's PCA moment
                    // segment ([[graft.ops.PcaIndex]]) so the eigenbasis
                    // refreshes at O(drop) cost. The moments tier sums VECTOR
                    // contributions: for a RE-embedding drop, pass the old
                    // vectors as `pcaRetract` (landed as a sign=-1 segment,
                    // id `<dropId>-retract`) or the re-embedded docs double-
                    // count; append-only drops need no retraction.
                    pca: Option[(String, Int, String)] = None,
                    pcaRetract: Option[DataFrame] = None,
                    // the 8-byte serving tier: also delta-upsert the
                    // persisted IVF-PQ lists ([[graft.ops.PqIndex.upsert]])
                    // under their build-pinned codebooks + residual
                    // reference — same fingerprint gating as the SQ8 index,
                    // so both serving tiers stay on one drop cadence
                    pqIndexPath: Option[String] = None,
                    // ...and the factorized IMI-PQ lists
                    // ([[graft.ops.ImiPqIndex.upsert]]) — all three
                    // serving tiers stay on one drop cadence
                    imiPqIndexPath: Option[String] = None): Map[String, (Long, Long)] = {
    val report = scala.collection.mutable.Map[String, (Long, Long)]()
    report("simidx") = graft.ops.SimilarityIndex.upsert(embBatch, idCol, vecCol, indexPath)
    pqIndexPath.foreach { pqPath =>
      report("pqidx") = graft.ops.PqIndex.upsert(embBatch, idCol, vecCol, pqPath)
    }
    imiPqIndexPath.foreach { imiPath =>
      report("imipqidx") = graft.ops.ImiPqIndex.upsert(embBatch, idCol, vecCol, imiPath)
    }
    pca.foreach { case (path, dim, dropId) =>
      val n = graft.ops.PcaIndex.landDrop(embBatch, vecCol, dim, path, dropId)
      val r = pcaRetract.map(old =>
        graft.ops.PcaIndex.landDrop(old, vecCol, dim, path, s"$dropId-retract", sign = -1))
        .getOrElse(0L)
      report("pca") = (r, n)
    }
    report.toMap
  }
}
