package graft

import org.apache.spark.sql.functions._

/** s07's two-stage retrieval (16-dim coarse scan → full-dim rerank of
  * the top-8 shortlist) against s01's exact full-dim top-1: recall@1
  * is what decides whether the cheap first pass is usable at 100 TB.
  * Deterministic — fixed corpus, exact arithmetic. */
class TruncatedRerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("full-dim rerank of the truncated shortlist recovers most exact top-1s") {
    val twoStage = SparkEntry.queries("s07_truncated_rerank")(spark, sf)
      .select(col("id_a"), col("id_b").as("nn_two_stage"))
    val exact = SparkEntry.queries("s01_cosine_topk")(spark, sf)
      .filter(col("rank") === 1)
      .select(col("id_a"), col("id_b").as("nn_exact"))
    val joined = twoStage.join(exact, "id_a").cache()

    val n = joined.count()
    assert(n == 500) // one answer per query vector

    val hits = joined
      .filter(col("nn_two_stage") === col("nn_exact")).count()
    val recall = hits.toDouble / n
    // random 64-dim embeddings are the WORST case for prefix scoring
    // (no energy compaction); even so the 8-wide shortlist must beat a
    // random shortlist (8/499 ≈ 1.6%) by a wide margin
    assert(recall >= 0.20, s"recall@1 = $recall")
  }

  test("s09's index-backed coarse stage tracks the exact two-stage baseline") {
    val indexed = SparkEntry.queries("s09_indexed_rerank")(spark, sf)
      .select(col("id_a"), col("id_b").as("nn_indexed"))
    val exact = SparkEntry.queries("s07_truncated_rerank")(spark, sf)
      .select(col("id_a"), col("id_b").as("nn_exact_coarse"))
    val joined = indexed.join(exact, "id_a").cache()

    val answered = joined.count()
    assert(answered > 0)
    val agree = joined
      .filter(col("nn_indexed") === col("nn_exact_coarse")).count()
    val agreement = agree.toDouble / answered
    // the LSH shortlist sees only bucketed candidates, so agreement
    // with the exhaustive truncated scan is the price of the index —
    // on THIS corpus (random vectors, nearest neighbors at a weak
    // cos ≈ 0.4–0.5 where 8-plane sign-agreement is barely better
    // than coin flips; same band NearDupRecallSpec documents) it
    // measures ~0.08, ≈ 40× a random pick (1/499). Real embedding
    // corpora cluster far above this; the gate is the multiple, not
    // the absolute.
    assert(agreement >= 0.04, s"agreement with exact coarse = $agreement")
  }

  test("s09 plans a bucket-key join — no cartesian product anywhere") {
    val plan = SparkEntry.queries("s09_indexed_rerank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
