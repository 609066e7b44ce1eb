package graft

import org.apache.spark.sql.functions._

/** p07 (CCNet-style perplexity terciles): exact order-statistic
  * thresholds must yield exact tercile sizes with a clean score
  * ordering between buckets, the keep rule must be head-whole /
  * middle-sampled / tail-dropped, and the plan must contain NO window
  * operator — the thresholds are TakeOrdered order statistics, never
  * a single-partition global ranking. */
class PerplexityPartitionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("exact tercile sizes, ordered buckets, CCNet keep rule, no window in plan") {
    val df = SparkEntry.queries("p07_perplexity_partition")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"p07 planned a window operator:\n${plan.take(1500)}")

    val rows = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getBoolean(3)))
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_._3)
    assert(byBucket.keySet == Set("head", "middle", "tail"))

    // exact sizes from the rank-floor(n/3) / rank-floor(2n/3) cuts
    assert(byBucket("tail").length == n / 3)
    assert(byBucket("middle").length == 2 * n / 3 - n / 3)
    assert(byBucket("head").length == n - 2 * n / 3)

    // ordering: every tail (fluency, id) <= every middle <= every head
    def key(r: (Long, Double, String, Boolean)) = (r._2, r._1)
    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    assert(ord.lt(byBucket("tail").map(key).max,
      byBucket("middle").map(key).min))
    assert(ord.lt(byBucket("middle").map(key).max,
      byBucket("head").map(key).min))

    // keep rule: head whole, tail dropped, middle = the md5 gate
    assert(byBucket("head").forall(_._4))
    assert(byBucket("tail").forall(!_._4))
    val midKept = byBucket("middle").count(_._4)
    assert(midKept > 0 && midKept < byBucket("middle").length,
      s"middle gate degenerate: $midKept of ${byBucket("middle").length}")
    byBucket("middle").foreach { case (id, _, _, kept) =>
      val u = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"ppl:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(7), 16)
      assert(kept == (u % 100 < 50), s"gate mismatch for doc $id")
    }
  }
}
