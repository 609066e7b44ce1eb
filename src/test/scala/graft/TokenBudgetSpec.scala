package graft

import org.apache.spark.sql.functions._

/** p09 — token-budget mixture sample. The oracle proves the exact
  * row set; this spec pins the CONTRACT the op exists for and the
  * plan shape that makes it scale:
  *
  *  - per-language budgets are an exact integer split of the total
  *    (Σ budgets ≤ TokenBudget; flooring, never rounding up);
  *  - every shipped doc had budget room before it (cum − n_tok <
  *    budget), and the fill is greedy: the last shipped doc either
  *    crosses the budget or the stratum ran out of docs;
  *  - ranks are contiguous per language (nothing skipped by the
  *    prune);
  *  - the rank prune plans as a WindowGroupLimit (the p06 shape), so
  *    the per-language sort+shuffle is bounded by the budget, not
  *    the corpus. */
class TokenBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("budget split, greedy fill, and contiguous ranks hold per " +
      "language") {
    val df = SparkEntry.queries("p09_token_budget_mix")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)

    val budgets = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("budget")).toMap
    assert(budgets.values.sum <= graft.operators.Pipeline.TokenBudget,
      "flooring must never allocate more than the total budget")

    val perLangDocs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("samp_rank"))
      assert(sorted.map(_.getAs[Long]("samp_rank")).toSeq
        === (1L to sorted.length.toLong),
        s"$lang: ranks must be a contiguous prefix")
      sorted.foreach { r =>
        assert(r.getAs[Long]("cum_tok") - r.getAs[Long]("n_tok")
          < r.getAs[Long]("budget"),
          s"$lang: a shipped doc had no budget room before it")
      }
      val last = sorted.last
      assert(last.getAs[Long]("cum_tok") >= budgets(lang)
          || sorted.length.toLong == perLangDocs(lang),
        s"$lang: the greedy fill stopped early — neither budget " +
          "reached nor stratum exhausted")
    }
  }

  test("the rank prune plans as a WindowGroupLimit — budget-bounded, " +
      "not corpus-bounded") {
    val plan = SparkEntry.queries("p09_token_budget_mix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "the rank <= budget literal must prune map-side before the " +
        "per-language exchange")
  }

  /** Expression IDs (#123) and plan ids differ per invocation; strip
    * them so two plans of the same query compare structurally. */
  private def shape(plan: String): String = plan
    .replaceAll("#\\d+", "#").replaceAll("plan_id=\\d+", "plan_id=")

  test("the builder never mutates session conf, and a neighboring " +
      "query's plan is unchanged after p09 runs (r17 ADVICE)") {
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val harnessDefault = spark.conf.get(key)
    def neighborShape: String = shape(
      SparkEntry.queries("p06_exact_quota_sample")(spark, sf)
        .queryExecution.executedPlan.toString)
    val before = neighborShape
    SparkEntry.queries("p09_token_budget_mix")(spark, sf).collect()
    assert(spark.conf.get(key) == harnessDefault,
      "p09 must not leave the optimizer threshold modified")
    assert(neighborShape == before,
      "a neighboring window query must plan identically after p09")
    // and with a session running BELOW the budget threshold, the
    // builder still never writes conf — the plan is corpus-bounded
    // but correct, and the session's dial stays the session's
    spark.conf.set(key, "1000")
    try {
      SparkEntry.queries("p09_token_budget_mix")(spark, sf)
        .queryExecution.executedPlan
      assert(spark.conf.get(key) == "1000",
        "p09 must not raise the threshold behind the session's back")
    } finally spark.conf.set(key, harnessDefault)
  }
}
