package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan

/** s13's scale claim, asserted on the plan: the persisted
  * LSH-bucketed corpus joins WITHOUT an exchange on its side — the
  * bucket shuffle was paid once at index-build time — while the
  * exploded query side shuffles to align. And the query agrees with
  * s11 (same oracle, same semantics, different physical path).
  */
class PersistedIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s13 equals s11 row for row (the layout changes, the answer doesn't)") {
    val viaIndex =
      SparkEntry.queries("s13_persisted_bucket_index")(spark, sf).collect()
    val selfJoin = SparkEntry.queries("s11_corpus_retrieval")(spark, sf).collect()
    assert(viaIndex.length == selfJoin.length && viaIndex.length > 0)
    viaIndex.zip(selfJoin).foreach { case (a, b) => assert(a == b) }
  }

  test("s13 probe join: no exchange under the bucketed corpus side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("s13_persisted_bucket_index")(spark, sf)
      def findJoin(p: SparkPlan): Option[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findJoin(a.executedPlan)
        case j: SortMergeJoinExec => Some(j)
        case j: ShuffledHashJoinExec => Some(j)
        case other => other.children.view.flatMap(findJoin).headOption
      }
      val join = findJoin(df.queryExecution.executedPlan)
      assert(join.isDefined, "expected a shuffle-family probe join")
      // query side explodes H+1 probes and MUST shuffle to align;
      // the corpus side's write-time bucketing must satisfy the join
      // distribution with no exchange of its own
      val Seq(left, right) = join.get.children
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      val corpusSide =
        if (right.toString.contains("s13_corpus_idx")) right else left
      assert(corpusSide.toString.contains("s13_corpus_idx"),
        s"couldn't locate the bucketed corpus side:\n${join.get}")
      assert(shuffles(corpusSide).isEmpty,
        s"persisted index side re-shuffled:\n$corpusSide")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS s13_corpus_idx")
    }
  }
}
