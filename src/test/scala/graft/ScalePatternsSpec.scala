package graft

import org.apache.spark.sql.functions._

/** Executable evidence for the 100 TB playbook claims (README "Scale
  * design"): bucketing removes the join shuffle entirely, and salting
  * decomposes a skewed join without changing its result. */
class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans with zero exchanges") {
    val t = new Tables(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      t.lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      t.orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // same cardinality as the plain (shuffling) join
      val plain = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("salted join over a skewed key equals the unsalted join") {
    // 90% of fact rows share one key — the classic straggler shape
    val fact = (1 to 10000).map(i =>
      (if (i % 10 == 0) i.toLong else 0L, i.toLong)).toDF("k", "v")
    val dim = (0L to 1000L).map(k => (k, s"dim$k")).toDF("k", "payload")

    val plain = fact.join(dim, "k")

    val salts = 8
    val saltedFact = fact.withColumn("salt", pmod(col("v"), lit(salts)))
    val saltedDim = dim
      .withColumn("salt", explode(expr(s"sequence(0, ${salts - 1})")))
    val salted = saltedFact
      .join(saltedDim, Seq("k", "salt"))
      .drop("salt")

    assert(salted.count() == plain.count())
    val a = plain.select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val b = salted.select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // The 100 TB shape: a fact-table scan joined to a dimension
    // filtered on a NON-join column — static pushdown can't help the
    // fact side, but Catalyst's runtime row-level filter builds a
    // bloom over the dim's surviving join keys and injects
    // might_contain into the fact scan, skipping non-matching rows
    // (and, via parquet, whole row groups) BEFORE the shuffle.
    val t = new Tables(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val probe = t.lineitem.join(dim,
        col("l_orderkey") === col("o_orderkey"))
      val formatted = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(formatted.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$formatted")
      // the filter is a pure optimization — results unchanged
      val without = {
        spark.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        t.lineitem.join(t.orders.filter(
            col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      }
      assert(probe.count() == without)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
