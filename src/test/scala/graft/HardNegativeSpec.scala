package graft

import org.apache.spark.sql.functions._

/** s25 — hard-negative mining semantics the oracle hash can't state
  * by itself:
  *
  *  - the known positive (q−1) NEVER appears among a query's mined
  *    negatives — the one row a contrastive batch must not contain
  *    (a positive mislabeled as negative poisons the loss);
  *  - negative ranks are dense 1..10 per query, ordered by exact
  *    distance;
  *  - the `hard` bit is exactly the sign of the margin: a negative
  *    closer than the positive (margin < 0) is hard. On this corpus
  *    the positive is a random pairing, so the index's nearest
  *    negatives beat it for most queries — hard negatives must be
  *    PRESENT in quantity (the op exists to find them). */
class HardNegativeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no positive leaks, ranks are dense, hard == (margin < 0), " +
      "and hard negatives are actually found") {
    val out = SparkEntry.queries("s25_hard_negatives")(spark, sf).cache()
    assert(out.filter(col("c_id") === col("q_id") - 1).count() === 0L,
      "a known positive leaked into the negative set")

    val badRanks = out.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), min(col("neg_rank")).as("lo"),
        max(col("neg_rank")).as("hi"),
        countDistinct(col("neg_rank")).as("nd"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("nd") =!= col("n"))
      .count()
    assert(badRanks === 0L, "negative ranks are not dense 1..n")

    assert(out.filter(col("hard") =!= (col("margin") < 0)).count() === 0L,
      "hard bit disagrees with the margin sign")
    val hard = out.filter(col("hard")).count()
    assert(hard > 0L, "no hard negatives found — the op is vacuous")
    out.unpersist()
  }
}
