package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The model-based quality classifier (t17) contract: bounded
  * length-normalized scores, a keep bit that is exactly score>0, and
  * — the scale property — a single narrow projection pass over the
  * corpus (no shuffle besides the presentation sort).
  */
class QualityClassifierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run() = SparkEntry.queries("t17_quality_classifier")(spark, sf)

  test("scores are length-normalized into [-1, 1]; keep == score>0") {
    val rows = run().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nToks = r.getLong(1)
      val wsum = r.getLong(2)
      val score = r.getDouble(3)
      val keep = r.getBoolean(4)
      assert(nToks >= 1L)
      // per-token weights are integers in [-1000, 1000], so the
      // normalized score can never leave [-1, 1]
      assert(score >= -1.0 && score <= 1.0, s"score $score out of range")
      assert(score == wsum.toDouble / (nToks * 1000.0d))
      assert(keep == (score > 0.0d))
    }
  }

  test("classifier is deterministic (the 'model' is a fixed weight table)") {
    val a = run().collect().toSeq
    val b = run().collect().toSeq
    assert(a == b)
  }

  test("classifier neither unanimously keeps nor unanimously drops") {
    // md5-derived weights are ~uniform on [-1000, 1000]; a corpus-wide
    // constant verdict would mean the score column is degenerate
    val verdicts = run().groupBy(col("keep")).count().collect()
    assert(verdicts.length == 2, s"degenerate keep column: ${verdicts.toSeq}")
  }

  test("one corpus pass: no shuffle except the presentation sort") {
    val plan = run().queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    // the only exchange is the range partitioning for ORDER BY doc_id
    assert(exchanges.forall(_.outputPartitioning.toString.contains("range")),
      s"unexpected non-sort shuffle:\n$plan")
    // the scoring itself is a projection, not an aggregate: exploding
    // tokens into a groupBy would shuffle the whole corpus at 100 TB
    val hasAgg = plan.toString.contains("HashAggregate") ||
      plan.toString.contains("SortAggregate") ||
      plan.toString.contains("ObjectHashAggregate")
    assert(!hasAgg, s"scoring must be a per-row projection:\n$plan")
  }
}
