package graft

/** s28 — MMR diversity rerank with candidates served from the
  * PERSISTED s18 IVF-PQ index (the deployment shape s15's comment
  * promised; s15 keeps the all-pairs candidate tier as the
  * verification referee, exactly the s20→s21 split). Pins:
  *
  *  - the PLAN fact the r17 verdict asked for: candidates come from
  *    the persisted codes table and the plan contains NO
  *    CartesianProduct — per-query cost is probed-cell candidates,
  *    never a corpus pair enumeration (s15's plan, by contrast, IS
  *    the labeled all-pairs tier and never reads the index);
  *  - the MMR contract per sampled query: exactly MmrPickK picks,
  *    dense ranks, distinct ids, and the greedy head is the pure
  *    relevance argmax (empty picked set ⇒ mmr_score = λ·relevance);
  *  - determinism across runs.
  *
  * Value correctness is the DuckDB oracle's job (hash-gated: the
  * s12-twin chain's top-16 per sampled query composed with the
  * SHARED unrolled-greedy tail). */
class MmrIndexedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("candidates ride the persisted index: codes-table scan, no " +
      "cartesian product anywhere in the plan") {
    val df = SparkEntry.queries("s28_mmr_indexed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("s18_pq_codes"),
      "s28's plan never scans the persisted codes table — the " +
        "candidate tier is not index-backed")
    assert(!plan.contains("CartesianProduct"),
      "s28 plans a cartesian product")
    // the referee (s15) by contrast scores every (query, corpus)
    // pair and never touches the index
    val s15plan = SparkEntry.queries("s15_mmr_diverse_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s15plan.contains("s18_pq_codes"),
      "sanity: the referee unexpectedly reads the index")
  }

  test("per sampled query: dense ranks, MmrPickK distinct picks, " +
      "greedy head is the relevance argmax") {
    val rows = SparkEntry.queries("s28_mmr_indexed")(spark, sf).collect()
    assert(rows.nonEmpty, "the E[32] sample selected no queries")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length === graft.operators.Similarity.MmrPickK,
        s"query $q: expected a full pick set (candidate tier must " +
          "always supply >= MmrPickK candidates)")
      assert(sorted.map(_.getAs[Long]("rank")).toSeq
        === (1L to sorted.length.toLong), s"query $q ranks not dense")
      val ids = sorted.map(_.getAs[Long]("sel_id"))
      assert(ids.distinct.length === ids.length,
        s"query $q picked a candidate twice")
      val head = sorted.head
      assert(head.getAs[Double]("mmr_score")
          === 0.7 * head.getAs[Double]("relevance"),
        s"query $q: rank-1 must be the pure relevance argmax " +
          "(empty picked prefix => no diversity penalty)")
    }
  }

  test("under-populated query (fewer candidates than MmrPickK): " +
      "picks every candidate once, appends no NULL sel_ids") {
    // the r18 ADVICE degenerate input: s28's index-served tier can
    // yield <MmrPickK candidates when probed cells are tiny; the
    // greedy fold is capped at least(MmrPickK, size(cands)) so the
    // argmax never scans an exhausted set (the oracle twin bounds
    // its recursive steps by the same per-query candidate count)
    import spark.implicits._
    val k = graft.operators.Similarity.MmrPickK
    def unit(x: Double, y: Double): Array[Double] = Array(x, y)
    // qid 1: only 2 candidates; qid 2: k + 2 candidates
    val cand = (
      Seq((1L, 1, 10L, 0.9, unit(1, 0), 1.0),
          (1L, 2, 11L, 0.8, unit(0, 1), 1.0)) ++
      (0 until k + 2).map(i =>
        (2L, i + 1, 20L + i, 0.9 - 0.05 * i,
          unit(math.cos(i), math.sin(i)), 1.0)))
      .toDF("qid", "r", "id_b", "cos_q", "bv", "nrm_b")
    val out = graft.operators.Similarity
      .mmrSelect(graft.operators.Similarity.mmrPack(cand)).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ(1L).length === 2, "qid 1 must pick its 2 candidates")
    assert(byQ(2L).length === k, s"qid 2 must pick exactly $k")
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("sel_id")),
        "a NULL sel_id leaked out of the greedy fold")
    }
    assert(byQ(1L).map(_.getAs[Long]("sel_id")).toSet === Set(10L, 11L))
    assert(byQ(1L).sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    // harness sanity: the engine column set is what the oracle emits
    assert(out.head.schema.fieldNames.sorted
      === Array("mmr_score", "qid", "rank", "relevance", "sel_id"))
  }

  test("deterministic across runs") {
    val a = SparkEntry.queries("s28_mmr_indexed")(spark, sf).collect()
    val b = SparkEntry.queries("s28_mmr_indexed")(spark, sf).collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("st23 streamed MMR == s28 batch MMR, row for row " +
      "(micro-batch slicing changes nothing)") {
    val streamed = SparkEntry
      .queries("st23_stream_mmr_serving")(spark, sf).collect()
    val batch = SparkEntry.queries("s28_mmr_indexed")(spark, sf)
      .collect()
    assert(streamed.length === batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
  }
}
