package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The churn-split seam shared by the fingerprinted index tiers
  * ([[graft.ops.DedupIndex]] band rows, [[graft.ops.TextIndex]] stats,
  * [[graft.ops.PostingsIndex]] lengths, [[graft.ops.SimilarityIndex]]
  * inverted lists, [[graft.ops.FuzzyJoinIndex]] chunk keys): every one
  * of them maintains "rows derived from source records, refreshed on
  * churn", and they all need the SAME decomposition —
  *
  *  - `kept`: old index rows whose (key, fingerprint) is re-delivered
  *    verbatim — carried without recompute (refresh cost follows churn,
  *    never corpus size);
  *  - `fresh`: incoming records with NO verbatim row set (new keys, or
  *    fingerprint drifted) — the only rows the tier recomputes;
  *  - `others`: old index rows whose key is absent from the incoming
  *    frame — a full-corpus `refresh` DROPS them (deletion semantics),
  *    a micro-batch `upsert` CARRIES them (a batch is a delta, not a
  *    corpus).
  *
  * Lifting the three joins here keeps ten tiers from drifting on the
  * freshness contract ("unchanged rows carry verbatim; lagging costs
  * recompute, never correctness"). Non-users, deliberately:
  * [[graft.ops.BpeIndex]] (its word cache only ever GROWS — re-delivery
  * and deletion are meaningless for a vocabulary), and the lake
  * sidecars ([[BloomIndex]]/[[ZoneMapIndex]]), whose key is the
  * (file, len) physical identity joined against a manifest, not a
  * record fingerprint.
  *
  * The caller lands the recombined result through
  * [[Staged.land]]/[[Staged.landMany]] — split decides WHAT to rewrite,
  * the staged swap guarantees the rewrite is never torn.
  */
object ChurnSplit {

  final case class Split(kept: DataFrame, fresh: DataFrame, others: DataFrame)

  /** `old`: the persisted index rows, carrying `keyCol` and `fpCol`.
    * `incoming`: the source records, with `idCol` and a fingerprint
    * EXPRESSION `fp` over its columns (md5 of the text, a vector
    * digest, or the value itself when it is its own fingerprint). The
    * expression runs once in each join — fingerprints are computed,
    * compared, and shuffled digest-sized; source payloads never ride
    * the diff.
    */
  def split(old: DataFrame, keyCol: String, fpCol: String,
            incoming: DataFrame, idCol: String, fp: Column): Split = {
    val curFp = incoming.select(col(idCol).as(keyCol), fp.as(fpCol))
    val kept = old.join(curFp, Seq(keyCol, fpCol), "left_semi")
    val oldFp = old.select(col(keyCol).as("__cs_id"), col(fpCol).as("__cs_fp")).distinct()
    val fresh = incoming.join(oldFp,
      incoming(idCol) === col("__cs_id") && fp === col("__cs_fp"), "left_anti")
    val others = old.join(curFp.select(col(keyCol)), Seq(keyCol), "left_anti")
    Split(kept, fresh, others)
  }
}
