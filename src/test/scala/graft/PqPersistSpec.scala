package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan

/** s18's deployment claims, asserted directly: the persisted IVF-PQ
  * index answers EXACTLY what the inline s12 build answers (the
  * save/load round trip changes the physical source, never the
  * result); the calibrated dials ride the index as metadata and
  * survive the round trip; and the serve-time membership join reads
  * the bucketed codes table with NO exchange on the corpus side —
  * the index shuffle was paid once at build (the w02/s13
  * discipline, now for the PQ codes map).
  */
class PqPersistSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s18 equals s12 row for row (persisting the index changes nothing)") {
    val persisted = SparkEntry.queries("s18_pq_persisted")(spark, sf).collect()
    val inline = SparkEntry.queries("s12_pq_adc")(spark, sf).collect()
    assert(persisted.length == inline.length && persisted.length > 0)
    persisted.zip(inline).foreach { case (a, b) => assert(a == b) }
  }

  test("calibrated dials round-trip through the meta table") {
    val built = graft.operators.Similarity.buildPqIndex(spark, sf)
    graft.operators.Similarity.persistPqIndex(spark, sf, built)
    val loaded = graft.operators.Similarity.loadPqIndex(spark)
    assert(loaded.np == built.np, s"nprobe ${loaded.np} != ${built.np}")
    assert(loaded.sl == built.sl, s"shortlist ${loaded.sl} != ${built.sl}")
    // the dials are CALIBRATED values, not defaults that would
    // round-trip trivially even if the meta table were never read
    assert(built.np >= 1 && built.sl >= 1)
  }

  test("s18 serve: codes-table side of the membership join is exchange-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val built = graft.operators.Similarity.buildPqIndex(spark, sf)
      graft.operators.Similarity.persistPqIndex(spark, sf, built)
      val df = graft.operators.Similarity.servePersisted(spark, sf)
      def findJoins(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findJoins(a.executedPlan)
        case j: SortMergeJoinExec => j +: j.children.flatMap(findJoins)
        case j: ShuffledHashJoinExec => j +: j.children.flatMap(findJoins)
        case other => other.children.flatMap(findJoins)
      }
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      // the membership join is the one whose child scans the
      // persisted codes table DIRECTLY (no join nested below it —
      // upper joins' subtrees also contain the table name); its codes
      // side must plan with zero exchanges (the probes side shuffles
      // to align with the write-time bucketing)
      val joins = findJoins(df.queryExecution.executedPlan)
      val membership = joins.flatMap(_.children.filter(c =>
        c.toString.contains("s18_pq_codes") && findJoins(c).isEmpty))
      assert(membership.nonEmpty,
        s"couldn't locate the codes side of the membership join among " +
          s"${joins.size} shuffle-family joins")
      membership.foreach { side =>
        assert(shuffles(side).isEmpty,
          s"persisted codes side re-shuffled:\n$side")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
