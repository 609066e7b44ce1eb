package graft

import org.apache.spark.sql.functions._

/** s21 — hybrid retrieval with the vector leg served from the
  * PERSISTED s18 IVF-PQ index (the deployment shape s20's comment
  * promised; s20 keeps the bounded |sample|·n exact leg as the
  * verification tier). Pins:
  *
  *  - the PLAN fact the r16 verdict asked for: the vector leg rides
  *    the persisted codes table (candidates come from the cid
  *    equi-join against `s18_pq_codes`), and the plan contains NO
  *    CartesianProduct — per-query vector cost is candidates from
  *    probed cells, never a corpus-wide pair enumeration;
  *  - the refactor seam: `servePqRanked` at topK=1 is exactly the
  *    s12/s18 serve answer (the ranked generalization changed
  *    nothing for the argmin family);
  *  - output shape + determinism of the fused result.
  *
  * Value correctness is the DuckDB oracle's job (hash-gated, the
  * s12-twin chain composed with the lexical CTEs). */
class HybridIndexedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the vector leg rides the persisted index: codes-table scan, " +
      "no cartesian product anywhere in the plan") {
    val df = SparkEntry.queries("s21_hybrid_indexed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("s18_pq_codes"),
      "s21's plan never scans the persisted codes table — the vector " +
        "leg is not index-backed")
    assert(plan.contains("s21_lex_post"),
      "s21's plan never scans the persisted postings table — the " +
        "lexical leg re-tokenizes the corpus at serve")
    assert(!plan.contains("CartesianProduct"),
      "s21 plans a cartesian product")
    // the exact referee (s20) by contrast scores every (query,
    // corpus-doc) pair — the index path must not
    val s20plan = SparkEntry.queries("s20_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s20plan.contains("s18_pq_codes"),
      "sanity: the referee unexpectedly reads the index")
  }

  test("servePqRanked at topK=1 IS the s18 serve answer (the ranked " +
      "refactor preserved the argmin family)") {
    import graft.operators.Similarity
    val idx = Similarity.ensurePqIndex(spark, sf)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val qs = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("q_id"), col("v").as("av"))
    val corpus = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("bv"))
    val ranked1 = Similarity
      .servePqRanked(spark, qs, corpus, idx, identity, 1)
      .select(col("q_id"), col("c_id"), col("l2sq"))
      .orderBy(col("q_id")).collect()
    val served = Similarity.servePq(spark, sf, idx).collect()
    assert(ranked1.length === served.length && ranked1.length > 0)
    ranked1.zip(served).foreach { case (a, b) => assert(a === b) }
  }

  test("st19 streamed hybrid == s21 batch hybrid, row for row " +
      "(micro-batch slicing changes nothing)") {
    val streamed = SparkEntry
      .queries("st19_stream_hybrid_serving")(spark, sf).collect()
    val batch = SparkEntry.queries("s21_hybrid_indexed")(spark, sf)
      .collect()
    assert(streamed.length === batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
  }

  test("fused output: same sampled queries as s20, ranks 1..3 dense, " +
      "rrf monotone, deterministic across runs") {
    val a = SparkEntry.queries("s21_hybrid_indexed")(spark, sf).collect()
    val b = SparkEntry.queries("s21_hybrid_indexed")(spark, sf).collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
    // the E[32] sample is SHARED with s20 (one md5 gate)
    val q21 = a.map(_.getLong(0)).distinct.sorted
    val q20 = SparkEntry.queries("s20_hybrid_rrf")(spark, sf).collect()
      .map(_.getLong(0)).distinct.sorted
    assert(q21.sameElements(q20))
    // per query: ranks are 1..k (k <= 3), rrf_scaled non-increasing
    a.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length),
        s"query $q ranks not dense")
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"query $q rrf_scaled not monotone")
    }
  }
}
