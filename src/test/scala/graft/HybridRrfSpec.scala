package graft

import org.apache.spark.sql.functions._

/** s20 hybrid retrieval (BM25 ⊕ vector via reciprocal-rank fusion):
  * cross-engine exactness is the DuckDB gate's job; these pin the
  * fusion semantics. */
class HybridRrfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("shape: top-3 per sampled query, ranks contiguous from 1, " +
      "answers from the even corpus stripe") {
    val res = SparkEntry.queries("s20_hybrid_rrf")(spark, sf)
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf_scaled"))
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getLong(2) % 2 == 0), "a result doc is not corpus-side")
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to ranks.length),
        s"ranks not contiguous: ${ranks.mkString(",")}")
      assert(ranks.length <= 3)
      // RRF scores non-increasing with rank (ties broken by doc_id)
      val byRank = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("fusion is evidence-bounded: a doc ranked #1 by BOTH legs " +
      "must win the fusion (max possible RRF), and every fused score " +
      "is a sum of valid leg terms") {
    val res = SparkEntry.queries("s20_hybrid_rrf")(spark, sf).collect()
    val terms = (1 to 10).map(r => 100000000L / (60 + r)).toSet
    val maxRrf = 2L * (100000000L / 61L)
    res.foreach { r =>
      val score = r.getLong(3)
      // each score decomposes as one or two single-leg terms
      val ok = terms.contains(score) ||
        terms.exists(a => terms.contains(score - a))
      assert(ok, s"score $score is not a sum of 1e8/(60+rank) terms")
      assert(score <= maxRrf)
      if (score == maxRrf) assert(r.getInt(1) === 1,
        "a both-legs-rank-1 doc did not win the fusion")
    }
  }
}
