package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked plan audits for the declarative query surface: the
  * properties the manual `.explain` reviews verify — pushdown reaching
  * the scans, pruned read schemas, top-k as TakeOrdered (never a global
  * sort), broadcast dims, and the absence of cartesian products — as
  * regression tests, so a refactor that silently de-optimizes a plan
  * fails CI instead of only the bench. Only side-effect-free queries are
  * audited (scratch-lake queries execute work at construction).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  // formatted mode: the tree string truncates long scan detail lines
  // (PushedFilters/ReadSchema), formatted prints them in full
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // declarative queries with no construction-time side effects
  private val pure = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q04_order_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue", "q10_returned_items",
    "q14_promo_revenue", "q18_large_volume", "q_top3_customers_per_nation",
    "q_customers_no_orders", "q_customer_segments_active", "q_pivot_status",
    "q_cube_orders", "q_window_suite", "q_nation_balance_fulljoin",
    "q_running_revenue", "q_histogram_prices", "q_events_json_extract",
    "q07_volume_shipping", "q08_market_share", "q13_customer_distribution",
    "q19_disjunctive_revenue", "q22_sales_opportunity", "q02_min_cost_supplier",
    "q09_product_profit", "q12_priority_lines", "q16_supplier_part_counts",
    "q20_excess_share_suppliers", "q21_waiting_suppliers")

  test("no audited query ever plans a CartesianProduct") {
    pure.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("q06: all three predicates push to the parquet scan; read schema is pruned to 4 columns") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate lower bound must reach the scan")
    assert(p.contains("LessThan(l_quantity"), "quantity filter must reach the scan")
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .forall(rs.contains), s"pruned schema wrong: $rs")
    assert(!rs.contains("l_orderkey") && !rs.contains("l_tax"),
      s"unneeded columns read: $rs")
  }

  test("top-k queries are TakeOrdered, never a global sort of the full result") {
    Seq("q03_shipping_priority", "q10_returned_items", "q18_large_volume").foreach { n =>
      assert(plan(n).contains("TakeOrderedAndProject"), s"$n must plan TakeOrdered")
    }
  }

  // corpus-tier queries whose construction is plan-only (no scratch dirs,
  // no driver fixpoint loops, no stream starts) — the LLM-pipeline
  // operators get the same no-cartesian audit as the classic tier
  private val corpusPure = Seq(
    "txt_token_stats", "txt_bpe_tokens", "txt_langid", "txt_quality",
    "txt_repetition", "txt_redact_pii", "txt_nfc_dedup", "txt_compress_ratio",
    "txt_top_tokens", "txt_chunk_overlap", "txt_lm_score",
    "dedup_minhash_sig", "dedup_minhash_pairs", "dedup_jaccard_verify",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_exact_stats",
    "dedup_exact_keep", "dedup_spans_global",
    "url_extract", "url_sniff", "nif_validate", "sim_quantize_int8",
    "sim_label_stats", "q_sample_stratified", "q_shard_assign",
    "q_token_budget", "q_pack_sequences", "q_pack_nostraddle",
    "q_median_order_value", "q_events_quartiles", "cpv_parse_codes",
    "sim_semdedup", "pca_moments", "txt_hashed_tf", "txt_sparse_sim_topk",
    "txt_dup_ngrams", "dedup_containment",
    "txt_dsir_weights", "sim_graph_pagerank", "sim_mmr_topk",
    "dedup_url_canonical")

  test("corpus-tier queries never plan a CartesianProduct") {
    corpusPure.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("corpus scans prune to the columns the operator needs") {
    // text kernels: documents scan reads the text (+key) columns only
    val tok = plan("txt_token_stats")
    val tokRs = tok.linesIterator.filter(l => l.contains("ReadSchema")).mkString
    assert(!tokRs.contains("n_chars") && !tokRs.contains("source"),
      s"txt_token_stats must not read unused documents columns: $tokRs")
    // embedding kernels: embeddings scan reads (vec_id, embedding) only
    val qz = plan("sim_quantize_int8")
    val qzRs = qz.linesIterator.filter(l => l.contains("ReadSchema")).mkString
    assert(!qzRs.contains("label"), s"sim_quantize_int8 must prune the label column: $qzRs")
    // minhash candidates: the band self-join is an EQUI join on the band
    // key (shuffle-partitioned), never a nested-loop pair scan
    val mh = plan("dedup_minhash_pairs")
    assert(mh.contains("SortMergeJoin") || mh.contains("ShuffledHashJoin") ||
      mh.contains("BroadcastHashJoin"), "band candidate join must be an equi join")
    assert(!mh.contains("BroadcastNestedLoopJoin") && !mh.contains("CartesianProduct"),
      "band candidate join must never pair-scan")
    // SemDeDup: the within-cell pair join is an EQUI join on the IVF
    // cell (cost follows sum of squared cell sizes), never a pair scan
    val sd = plan("sim_semdedup")
    assert(sd.contains("SortMergeJoin") || sd.contains("ShuffledHashJoin") ||
      sd.contains("BroadcastHashJoin"), "semdedup cell join must be an equi join")
    assert(!sd.contains("BroadcastNestedLoopJoin") && !sd.contains("CartesianProduct"),
      "semdedup cell join must never pair-scan")
    // PCA moments: the embeddings scan reads the embedding column only
    val pm = plan("pca_moments")
    val pmRs = pm.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!pmRs.contains("vec_id") && !pmRs.contains("label"),
      s"pca_moments must prune to the embedding column: $pmRs")
    // sparse similarity: the posting self-join is an EQUI join on the
    // bucket (cost follows posting-list sizes), never a pair scan
    val sp = plan("txt_sparse_sim_topk")
    assert(!sp.contains("BroadcastNestedLoopJoin") && !sp.contains("CartesianProduct"),
      "sparse posting join must never pair-scan")
    // containment: prefix-probe and verify joins are EQUI joins on the
    // shingle / (doc, shingle) keys, never a pair scan
    val ct = plan("dedup_containment")
    assert(!ct.contains("BroadcastNestedLoopJoin") && !ct.contains("CartesianProduct"),
      "containment candidate/verify joins must never pair-scan")
    // DSIR: the bucket-count model is nBuckets rows — the scoring join
    // against the (checkpointed) bigram stream must BROADCAST the model,
    // never shuffle the stream a second time
    val ds = plan("txt_dsir_weights")
    assert(ds.contains("BroadcastHashJoin"),
      "dsir scoring must broadcast the bucket model")
    // (the 1-row totals attach is a broadcast nested loop by design —
    // the build side is a single aggregate row; the no-cartesian audit
    // above still applies)
    assert(!ds.contains("CartesianProduct"), "dsir joins must never cartesian")
    // IVF-PQ: the candidate gate is an EQUI join on the cell id, and
    // the full-precision fetch BROADCASTS the (k+margin)-row survivor
    // pool against the corpus scan — float vectors never shuffle
    val pq = plan("sim_pq_recall")
    assert(pq.contains("BroadcastHashJoin"),
      "pq survivor fetch must broadcast the pool")
    assert(!pq.contains("CartesianProduct"), "pq joins must never cartesian")
  }

  test("classifier scoring broadcasts the model; canonical_url runs native, never a UDF") {
    // the trained-gate scoring shape: the nBuckets-bounded model joins
    // the corpus-sized feature stream — the model must BROADCAST (the
    // stream shuffles once, for the doc-keyed aggregate, never for the
    // model attach), and nothing may cartesian. Audited directly on
    // QualityClassifier.score with a literal model because the
    // txt_clf_* queries train at construction (not plan-only).
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val sp = graft.ops.QualityClassifier
      .score(docs, "doc_id", "text", Map(1L -> 5L, 2L -> -3L))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(sp.contains("BroadcastHashJoin"),
      "clf scoring must broadcast the bucket model")
    assert(!sp.contains("CartesianProduct") && !sp.contains("BroadcastNestedLoopJoin"),
      "clf scoring must never pair-scan")
    // the canonical-URL dedup key: a native codegen'd Catalyst
    // expression feeding an ordinary hash-groupBy — the plan must show
    // no interpreted ScalaUDF (and no Python eval), and the documents
    // never pair-scan
    val up = plan("dedup_url_canonical")
    assert(up.contains("canonical_url"), "the native expression must appear in the plan")
    assert(!up.contains("ScalaUDF") && !up.contains("BatchEvalPython"),
      "canonical_url must run as a native expression, not a UDF")
  }

  test("q05 star join broadcasts its dims") {
    val p = plan("q05_local_supplier_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "region/nation/supplier must broadcast")
  }

  test("q04 semi join keeps the returnflag filter at the probe scan") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"))
    assert(p.contains("EqualTo(l_returnflag,R)"), "probe-side filter must push to the scan")
  }

  test("q07: shipdate window pushes to the fact scan; both nation attaches broadcast") {
    val p = plan("q07_volume_shipping")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      "date window must reach the lineitem scan")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "filtered supplier and customer nation attaches must broadcast")
  }

  test("q19: the disjunctive brand/size predicate prunes the part scan") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("Or(") && p.contains("EqualTo(p_brand,Brand#12"),
      "three-brand disjunction must push to the part scan")
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("p_retailprice"), s"part scan must prune unused columns: $rs")
  }

  test("q22: dormant-customer check is one anti join with the date bound at the orders scan") {
    val p = plan("q22_sales_opportunity")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "recent-order date bound must push to the orders scan")
    assert(!p.contains("CartesianProduct"), "the 1-row stats attach must stay broadcast")
  }

  private def factScans(p: String, table: String): Int =
    p.linesIterator.count(l => l.contains("Location") && l.contains(s"$table.parquet"))

  test("q02: correlated min decorrelates to ONE window over ONE fact scan, dims broadcast") {
    val p = plan("q02_min_cost_supplier")
    assert(factScans(p, "lineitem") == 1,
      s"window-min decorrelation must not rescan the fact: ${factScans(p, "lineitem")} scans")
    assert(p.contains("Window"), "per-part min must ride a window, not a self-join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "part slice and supplier attach must broadcast")
  }

  test("q09: the widget filter pushes to the part scan; both dims broadcast") {
    val p = plan("q09_product_profit")
    assert(p.contains("StringContains(p_name,widget)"),
      "p_name contains-filter must reach the part scan")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, "part and supplier-nation must broadcast")
  }

  test("q12: the ship-year window pushes to the lineitem scan and its read schema stays 2-wide after the join keys") {
    val p = plan("q12_priority_lines")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      "year window must reach the fact scan")
    val rs = p.linesIterator.filter(l => l.contains("ReadSchema") && l.contains("l_")).mkString
    assert(!rs.contains("l_extendedprice") && !rs.contains("l_quantity"),
      s"unused fact columns must prune: $rs")
  }

  test("q16: complained suppliers drop via LeftAnti; the size slice pushes to the part scan") {
    val p = plan("q16_supplier_part_counts")
    assert(p.contains("LeftAnti"), "NOT IN over a never-null key must plan as an anti join")
    assert(p.contains("In(p_size"), "size list must push to the part scan")
  }

  test("q20: both gates are semi joins; the correlated half-threshold runs in ONE fact pass") {
    val p = plan("q20_excess_share_suppliers")
    assert("LeftSemi".r.findAllIn(p).size >= 2, "supplier and nation gates must be semi joins")
    assert(factScans(p, "lineitem") == 1,
      "both conditional sums must fold in one pair aggregate over one fact scan")
  }

  test("q21: EXISTS/NOT EXISTS decorrelate to ONE fact scan + window, never self-joins of the fact") {
    val p = plan("q21_waiting_suppliers")
    assert(factScans(p, "lineitem") == 1,
      s"the two existence tests must ride the pair window: ${factScans(p, "lineitem")} fact scans")
    assert(p.contains("Window"), "per-order supplier counts must ride a window")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must plan TakeOrdered, not a global sort")
  }
}
