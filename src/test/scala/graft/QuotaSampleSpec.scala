package graft

import org.apache.spark.sql.functions._

/** p06's physical shape: the exact-quota sample must plan with
  * InferWindowGroupLimit's map-side prune (rank <= LITERAL max
  * quota), so the lang shuffle carries O(|strata| · quota) rows, not
  * the corpus — the q66/p05 discipline. A rank <= COLUMN predicate
  * alone defeats the rule (found by review; the literal conjunct
  * restores it). */
class QuotaSampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p06 plans a WindowGroupLimit map-side prune") {
    val df = SparkEntry.queries("p06_exact_quota_sample")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"no WindowGroupLimit in p06's plan:\n$plan")
  }

  test("p06 honors exact quotas: en=100, others=40 (or whole stratum)") {
    val rows = SparkEntry.queries("p06_exact_quota_sample")(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val totals = new Tables(spark, sf).documents
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    totals.foreach { case (lang, n) =>
      val quota = if (lang == "en") 100L else 40L
      assert(rows(lang) == math.min(quota, n),
        s"$lang: got ${rows(lang)}, want min($quota, $n)")
    }
  }
}
