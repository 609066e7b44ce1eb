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
    "s12_pq_adc" ->
      ("broadcast centroid/codebook affinities (ceil(√k) super-cells " +
        "+ <=4096 cells + 64-row codebook init, not O(n²))"),
    "s18_pq_persisted" ->
      ("s12's build chain verbatim (same labeled broadcast " +
        "affinities), then persist + serve from the saved tables"),
    "s18_pq_serve_only" ->
      ("serve path over the persisted index (broadcast query-LUT " +
        "against the saved tables; rebuild branch only when no index " +
        "exists for the corpus — s12's labeled affinities)"),
    "s19_filtered_ann" ->
      ("s18's serve path + the label candidate gate (same broadcast " +
        "LUTs; the gate itself is an n-row equi-join, not all-pairs)"),
    "s20_hybrid_rrf" ->
      ("broadcast 1-row BM25 stats + the E[32]-query vector " +
        "verification leg (bounded by the sample like the s12 " +
        "calibration referee; s21 is the index-backed deployment twin)"),
    "s21_hybrid_indexed" ->
      ("s18's serve path (broadcast centroid/query-LUT affinities " +
        "against the persisted PQ index; NO corpus-side cross join — " +
        "the vector leg is the bucketed codes-table scan, the lexical " +
        "leg the bucketed postings index with nd/tl as literals; " +
        "rebuild branches only when no fresh index exists)"),
    "s22_incremental_lex" ->
      ("s21's serve plan verbatim after the base-build + delta-append " +
        "phases (same broadcast affinities; the incremental build " +
        "itself is appends + an additive df merge, no all-pairs)"),
    "s23_lex_compaction" ->
      ("s21's serve plan verbatim after build + append + compaction " +
        "(compaction is a zero-exchange per-bucket rewrite + rename " +
        "swap; the serve plan is unchanged by layout)"),
    "s30_lex_maintained_serve" ->
      ("s21's serve plan verbatim after the stale-base build + the " +
        "maintain's tokenize-once full rebuild (the serve's vector " +
        "leg is s18's labeled broadcast routing/LUT affinities " +
        "against the persisted PQ index; the lexical audit and " +
        "rebuild are counts, equi-joins, and aggregations — never " +
        "all-pairs)"),
    "s24_incremental_pq" ->
      ("s12's labeled broadcast affinities in the gated BASE build + " +
        "the delta append's broadcast centroid routing (|delta|·√k, " +
        "not all-pairs); serve is s18's plan over the appended codes"),
    "s26_pq_compaction" ->
      ("s24's lifecycle (gated-base build + delta append broadcasts) " +
        "before a zero-exchange per-bucket codes rewrite + rename " +
        "swap; the serve plan is s18's, unchanged by layout"),
    "s27_recall_drift_audit" ->
      ("s24's lifecycle broadcasts + the audit's bounded E[256]-query " +
        "exact referee (the same |sample|·n pass every build pays) — " +
        "never all-pairs"),
    "s29_maintained_serve" ->
      ("s27's aged lifecycle (gated-base build + delta broadcasts) + " +
        "the audit's bounded E[256]-query exact referee + the " +
        "rebuild's s12-labeled broadcast affinities; serve is s18's " +
        "plan — never all-pairs"),
    "s25_hard_negatives" ->
      ("s18's serve path (broadcast routing/LUT affinities; rebuild " +
        "branch only when no fresh index exists) + one equi-self-join " +
        "for the positive distance — no all-pairs"),
    "d13_semdedup" ->
      ("broadcast centroid affinities via the shared two-level " +
        "quantizer (<=4096 cells; pair work bounded per cell, " +
        "not O(n²))"),
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
    "s28_mmr_indexed" ->
      ("s18's serve path for the candidate tier (broadcast " +
        "routing/LUT affinities against the persisted index; rebuild " +
        "branch only when no fresh index exists) — NO corpus-side " +
        "cross join; the MMR fold is per-row"),
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
