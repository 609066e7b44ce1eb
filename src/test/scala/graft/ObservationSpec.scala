package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe` — zero-cost pipeline metrics collected during a
  * normal action (no second scan), the mechanism a production ingest
  * job uses to count/validate rows inline. The metric values are
  * asserted against an independent batch computation. */
class ObservationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("observe collects row count and sum during the main action") {
    val docs = new Tables(spark, dir).documents
    val obs = Observation("ingest-stats")
    docs
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        max(col("doc_id")).as("max_id"))
      .write.mode("overwrite").format("noop").save()

    val expect = docs.agg(
      count(lit(1)), sum(length(col("text")).cast("long")),
      max(col("doc_id"))).head()
    assert(obs.get("n_rows") === expect.getLong(0))
    assert(obs.get("total_chars") === expect.getLong(1))
    assert(obs.get("max_id") === expect.getLong(2))
  }
}
