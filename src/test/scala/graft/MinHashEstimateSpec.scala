package graft

import org.apache.spark.sql.functions._

/** d06's seed-agreement estimator against d02's exact jaccard on the
  * same LSH candidates: the sketch-only fast path must actually track
  * the exact value (16 hashes → stderr ≈ √(J(1−J)/16) ≈ 0.1), or
  * thresholding on it at 100 TB silently mis-classifies near-dups.
  * Deterministic: signatures are md5-seeded, the corpus is fixed. */
class MinHashEstimateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch estimate tracks exact jaccard on candidate pairs") {
    val est = SparkEntry.queries("d06_minhash_estimate")(spark, sf)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    val exact = SparkEntry.queries("d02_ngram_jaccard")(spark, sf)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = est.join(exact, Seq("id_a", "id_b")).cache()

    val n = joined.count()
    assert(n >= 20) // the planted near-dup pairs are all candidates

    val stats = joined
      .agg(max(abs(col("est_jaccard") - col("jaccard"))).as("max_err"),
        avg(abs(col("est_jaccard") - col("jaccard"))).as("mae"),
        min(when(col("jaccard") >= 0.8, col("est_jaccard"))).as("min_est_hi"))
      .collect().head
    assert(stats.getDouble(0) <= 0.25, s"max_err=${stats.getDouble(0)}")
    assert(stats.getDouble(1) <= 0.10, s"mae=${stats.getDouble(1)}")
    // strong pairs are never estimated weak
    assert(stats.getDouble(2) >= 0.6, s"min_est_hi=${stats.getDouble(2)}")
  }
}
