package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** The bloom-prefiltered decontamination (t11) contract:
  * bit-identical answers to the exact path (t10), no false negatives
  * from the bloom stage, and a prefilter that actually filters.
  */
class BloomPrefilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def grams(eval: Boolean) = {
    graft.functions.Generators.register(spark)
    val docs = new Tables(spark, sf).documents
    docs.filter((col("doc_id") % 10 === 0) === lit(eval))
      .select(col("doc_id"), expr("ngrams(text, 5)"))
      .select(col("doc_id"), md5(col("ngram")).as("g"))
  }

  test("t11 (bloom two-stage) equals t10 (exact single-stage) row for row") {
    val exact = SparkEntry.queries("t10_decontaminate")(spark, sf).collect()
    val bloomed =
      SparkEntry.queries("t11_decontaminate_bloom")(spark, sf).collect()
    assert(exact.length == bloomed.length)
    exact.zip(bloomed).foreach { case (a, b) => assert(a == b) }
  }

  test("bloom admits every inserted key (no false negatives)") {
    val evalG = grams(eval = true).select(col("g")).distinct()
    val bf = BloomFunctions.buildBloom(evalG, "g", 1L << 20, 0.01)
    BloomFunctions.registerMightContain(spark, "bf_spec_nfn", bf)
    val misses = evalG.filter(!expr("bf_spec_nfn(g)")).count()
    assert(misses == 0L, s"$misses inserted keys reported absent")
  }

  test("bloom prefilter discards most non-matching train grams") {
    val evalG = grams(eval = true).select(col("g")).distinct()
    val trainG = grams(eval = false)
    val bf = BloomFunctions.buildBloom(evalG, "g", 1L << 20, 0.01)
    BloomFunctions.registerMightContain(spark, "bf_spec_sel", bf)
    val total = trainG.count()
    val survivors = trainG.filter(expr("bf_spec_sel(g)")).count()
    val trueHits = trainG.join(evalG, "g").count()
    assert(survivors >= trueHits, "prefilter may never drop a true hit")
    // at 1% fpp survivors should be ≈ trueHits + 0.01·total; allow 5×
    // slack so the assertion tests the mechanism, not the corpus
    assert(survivors <= trueHits + (total / 20).max(50),
      s"bloom barely filtered: $survivors of $total survive " +
        s"($trueHits true hits)")
  }

  test("bloom predicate plans inside whole-stage codegen") {
    val evalG = grams(eval = true).select(col("g")).distinct()
    val bf = BloomFunctions.buildBloom(evalG, "g", 1L << 20, 0.01)
    BloomFunctions.registerMightContain(spark, "bf_spec_wscg", bf)
    val filtered = grams(eval = false).filter(expr("bf_spec_wscg(g)"))
    val wscgWithFilter = filtered.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.exists(_.isInstanceOf[org.apache.spark.sql.execution.FilterExec])
      case _ => false
    }
    assert(wscgWithFilter,
      s"bloom filter fell out of codegen:\n${filtered.queryExecution.executedPlan}")
  }
}
