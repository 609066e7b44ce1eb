package graft

/** Enforces the repo's central scale invariant MECHANICALLY: no gated
  * batch query plans a cartesian product (`CartesianProductExec` /
  * `BroadcastNestedLoopJoinExec`) unless it is one of the LABELED
  * all-pairs tiers. The per-round verdicts audited this by hand; this
  * spec makes the audit a failing test the moment a new query ships
  * an unlabeled O(n²) plan or a plan regression sneaks one in.
  *
  * Streaming (st*) and pipeline (k*) queries execute real streams in
  * their builders and are covered by their own specs; every other
  * query's physical plan is inspected here (planning only — nothing
  * is executed except the driver loops some builders run). */
class PlanAuditSpec extends SparkSpec {

  /** Queries ALLOWED to plan all-pairs joins, each with the reason
    * documented at its definition site. */
  private val labeledAllPairs: Map[String, String] = Map(
    "s01_cosine_topk" -> "verification tier: exactness baseline for s02/s04",
    "s03_embedding_neardup" -> "verification tier: exactness baseline for s05/s10",
    "s07_truncated_rerank" -> "verification tier: exact coarse baseline for s09",
    "s04_ivf_ann" -> "broadcast 8-centroid affinity (k tiny, not O(n²))",
    "s08_ivf_kmeans" -> "broadcast k-centroid affinity per Lloyd round",
    // r19: the whole IVF-PQ family (s12/s18/s19/s21–s30, d13) left
    // this list — routing/encoding/LUTs are exchange-free native
    // projections over driver-collected bounded geometry now, and the
    // bounded calibration referee runs eagerly INSIDE the builders,
    // so the gated serve plans carry no cross join at all (the
    // honest-allowlist discipline: exemptions drop when plans
    // improve). s20/s27 keep theirs: their sample referee rides the
    // RETURNED plan.
    "s20_hybrid_rrf" ->
      ("broadcast 1-row BM25 stats + the E[32]-query vector " +
        "verification leg (bounded by the sample like the s12 " +
        "calibration referee; s21 is the index-backed deployment twin)"),
    "s27_recall_drift_audit" ->
      ("s24's lifecycle broadcasts + the audit's bounded E[256]-query " +
        "exact referee (the same |sample|·n pass every build pays) — " +
        "never all-pairs"),
    "t07_vocab_stats" -> "1x1 scalar combine",
    "q70_skew_stats" -> "1x1 scalar combine",
    "q71_hll_sketch_distinct" -> "1x1 scalar combine (union row)",
    "q20_above_average_parts" -> "broadcast 1-row scalar (global average)",
    "p03_domain_mixture" -> "5x1 scalar combine (weight total over langs)",
    "q76_triangle_count" -> "1x1x1x1 scalar combine (4 single-row aggs)",
    "q84_gapfill_interpolate" ->
      ("spine-grid construction: hourly spine × the tiny distinct " +
        "type dim — bounded by the TIME RANGE × |types|, not data"),
    "s14_binary_quantization" ->
      ("binary-code linear scan: broadcast query rows x 8-byte codes " +
        "(the BQ rescoring shape; floats touched only for the shortlist)"),
    "q78_kll_quantile_sketch" -> "1x1 scalar combine (merged-sketch row)",
    "t15_bm25_retrieval" -> "broadcast 1-row corpus stats (nd, tl)",
    "s15_mmr_diverse_topk" ->
      ("verification-tier candidate stage (s01's role); the MMR fold " +
        "itself is per-row — s28 is the index-served deployment twin"),
    "p05_cluster_balanced_sample" ->
      ("broadcast 8-centroid Lloyd affinities (s08's trained chain " +
        "via the shared helpers — k tiny, not O(n²))"),
    "p09_token_budget_mix" ->
      ("5x1 scalar combine (per-language weight total) broadcast " +
        "back as the budget dim — not all-pairs"),
    "p08_dsir_resample" ->
      ("broadcast 1-row scalar combines: the bucket-model totals and " +
        "the global weight min/max (the B=256 model itself broadcasts " +
        "as an equi-join, not all-pairs)"))

  test("no unlabeled cartesian product in any gated batch query plan") {
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val unusedExemptions = scala.collection.mutable.Set(labeledAllPairs.keys.toSeq: _*)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      if (!name.startsWith("st") && !name.startsWith("k")) {
        val plan = f(spark, sf).queryExecution.executedPlan.toString
        val allPairs = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (allPairs && !labeledAllPairs.contains(name)) offenders += name
        if (allPairs) unusedExemptions -= name
      }
    }
    assert(offenders.isEmpty,
      s"unlabeled all-pairs plans: ${offenders.mkString(", ")}")
    // exemptions must stay honest: drop them when the plan improves
    assert(unusedExemptions.isEmpty,
      s"exemptions no longer needed: ${unusedExemptions.mkString(", ")}")
  }
}
