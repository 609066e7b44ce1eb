package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s27 — recall-drift audit. The oracle gate proves the measurement
  * itself (engine == the two-phase twin + ungated referee,
  * hash-exact); this spec pins the TRIGGER MECHANISM — the part a
  * deployment branches its nightly job on:
  *
  *  - internal consistency: measured = hits/n, build_recall is the
  *    persisted meta number, drift is their exact difference, and
  *    with neither trigger conf set rebuild_due is always false
  *    (report-only);
  *  - the drift trigger FIRES where it exists to fire: an index
  *    whose corpus grew without an append (the stale-index state) is
  *    measured WORSE against current truth — queries whose true NN
  *    only exists in the un-appended stripe can never hit — and
  *    crossing spark.graft.maxRecallDrift flips rebuild_due;
  *  - the floor trigger (spark.graft.minCandRecall) fires on the
  *    absolute measured value, independent of the build-time number;
  *  - conf validation fails loudly on out-of-range values. */
class PqDriftAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dropIndexTables(): Unit =
    Seq("s18_pq_sc", "s18_pq_cells", "s18_pq_cb", "s18_pq_codes",
      "s18_pq_meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def buildBase(): Unit = {
    dropIndexTables()
    Similarity.persistPqIndex(spark, sf,
      Similarity.buildPqIndex(spark, sf,
        Some(col("vec_id") % 10 =!= 0)))
  }

  private def audit() =
    Similarity.auditPqRecall(spark, sf).head()

  test("after base + append the audit is internally consistent and " +
      "report-only by default") {
    buildBase()
    Similarity.appendPqDelta(spark, sf, col("vec_id") % 10 === 0)
    val r = audit()
    val n = r.getAs[Long]("n_sample")
    val h = r.getAs[Long]("hits")
    assert(n > 0 && h >= 0 && h <= n)
    assert(r.getAs[Double]("measured_recall") === h.toDouble / n)
    val metaRecall = spark.table("s18_pq_meta").head()
      .getAs[Double]("cand_recall")
    assert(r.getAs[Double]("build_recall") === metaRecall)
    assert(r.getAs[Double]("drift")
      === metaRecall - h.toDouble / n)
    assert(!r.getAs[Boolean]("rebuild_due"),
      "with neither trigger conf set the audit must be report-only")
  }

  test("an index missing its delta measures positive drift against " +
      "current truth, and the maxRecallDrift ceiling flips " +
      "rebuild_due") {
    buildBase() // the stale state: corpus grew, nobody appended
    val r0 = audit()
    val drift = r0.getAs[Double]("drift")
    assert(drift > 0.01,
      s"a 10%-stale index should measure real drift, got $drift — " +
        "queries whose true NN only exists in the missing stripe " +
        "cannot hit")
    assert(!r0.getAs[Boolean]("rebuild_due"))

    spark.conf.set(GraftConf.MaxRecallDriftKey, "0.01")
    try assert(audit().getAs[Boolean]("rebuild_due"),
      "measured drift above the ceiling must flag rebuild_due")
    finally spark.conf.unset(GraftConf.MaxRecallDriftKey)

    spark.conf.set(GraftConf.MaxRecallDriftKey, "0.95")
    try assert(!audit().getAs[Boolean]("rebuild_due"),
      "a ceiling above the measured drift must not fire")
    finally spark.conf.unset(GraftConf.MaxRecallDriftKey)
  }

  test("the minCandRecall floor fires on the absolute measured value") {
    buildBase()
    val measured = audit().getAs[Double]("measured_recall")
    assert(measured < 1.0,
      "setup: the stale index should miss at least one sampled NN")
    // the floor is set AFTER the build (it also gates builds; here
    // we exercise its audit role alone)
    spark.conf.set(GraftConf.MinCandRecallKey, "1.0")
    try assert(audit().getAs[Boolean]("rebuild_due"))
    finally spark.conf.unset(GraftConf.MinCandRecallKey)
  }

  test("out-of-range trigger confs fail loudly") {
    spark.conf.set(GraftConf.MaxRecallDriftKey, "1.5")
    try {
      val ex = intercept[IllegalArgumentException] {
        Similarity.auditPqRecall(spark, sf).head()
      }
      assert(ex.getMessage.contains(GraftConf.MaxRecallDriftKey))
    } finally spark.conf.unset(GraftConf.MaxRecallDriftKey)
  }
}
