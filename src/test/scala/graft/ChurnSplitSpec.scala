package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.ChurnSplit

/** Pins the shared churn-split contract the index tiers ride
  * (round-15 consolidation): kept = verbatim re-delivery, fresh = new
  * or fingerprint-drifted, others = keys absent from the incoming
  * frame. The tier suites (DedupIndexSpec, TextIndexSpec,
  * PostingsIndexSpec, SimilarityIndexSpec, FuzzyJoinIndexSpec) keep
  * proving each tier end-to-end; this one pins the seam itself.
  */
class ChurnSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kept / fresh / others decompose exactly by (key, fingerprint)") {
    // old index rows: id 1 unchanged, id 2 will drift, id 3 vanishes
    val old = Seq((1L, "fp-a", "row1"), (2L, "fp-b", "row2"), (3L, "fp-c", "row3"))
      .toDF("doc", "fp", "payload")
    // incoming: id 1 re-delivered verbatim, id 2 changed, id 4 new
    val incoming = Seq((1L, "text-a"), (2L, "text-B"), (4L, "text-d"))
      .toDF("id", "text")
    // the fixture's "fingerprint": fp-<last char> so drift is visible
    val fp = concat(lit("fp-"), substring(col("text"), -1, 1))
    val s = ChurnSplit.split(old, "doc", "fp", incoming, "id", fp)
    assert(s.kept.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((1L, "row1")), "only the verbatim re-delivery carries")
    assert(s.fresh.collect().map(_.getLong(0)).toSet == Set(2L, 4L),
      "drifted and new ids are the recompute set")
    assert(s.others.collect().map(_.getLong(0)).toSet == Set(3L),
      "keys absent from the incoming frame are the refresh-drop / upsert-carry set")
    // the three sets reconstruct refresh (kept + recomputed(fresh)) and
    // upsert (others + kept + recomputed(fresh)) without overlap
    assert(s.kept.select("doc").intersect(s.others.select("doc")).count() == 0)
  }

  test("a duplicate-row index carries duplicates verbatim (multi-row-per-key tiers)") {
    // band/posting tiers hold MANY rows per key: every row of a kept key
    // must carry
    val old = Seq((1L, "fp-a", 0), (1L, "fp-a", 1), (2L, "fp-b", 0))
      .toDF("doc", "fp", "band")
    val incoming = Seq((1L, "text-a")).toDF("id", "text")
    val fp = concat(lit("fp-"), substring(col("text"), -1, 1))
    val s = ChurnSplit.split(old, "doc", "fp", incoming, "id", fp)
    assert(s.kept.count() == 2L && s.others.count() == 1L && s.fresh.count() == 0L)
  }
}
