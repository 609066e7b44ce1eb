package graft

import org.apache.spark.sql.functions._

/** The ×K corpus builder's disjoint-copies guard (the r14 ADVICE
  * finding at ScaleUp.build): every shifted key rides a fixed
  * 1e8-per-copy shift, and TPC-H's sparse orderkeys exceed 1e8 near
  * sf≥25 — the build must then FAIL LOUDLY instead of silently
  * interleaving copy c's keys with copy c+1's (cross-copy edges that
  * corrupt the exact-×K invariants q82/w19/retention probes rely on).
  */
class ScaleUpGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cloneCorpus(): String = {
    val out = tmpDir("scaleup_guard_src")
    Seq("documents", "embeddings", "orders", "events", "lineitem",
      "part").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  test("a source key at or above the 1e8 shift fails the build loudly") {
    val src = cloneCorpus()
    // plant ONE orderkey past the shift — the sf≥25 failure mode
    val o = spark.read.parquet(s"$sf/orders.parquet")
    o.limit(1).withColumn("o_orderkey", lit(200000000L))
      .unionByName(o)
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.build(spark, src, tmpDir("scaleup_guard_out"), 2)
    }
    assert(ex.getMessage.contains("o_orderkey"),
      s"guard fired but did not name the offending key: ${ex.getMessage}")
    assert(ex.getMessage.contains("disjoint"),
      "guard message must explain the invariant at stake")
  }

  test("an EMPTY source table passes explicitly (NULL max is not an " +
      "NPE — r16 ADVICE low)") {
    val src = cloneCorpus()
    // empty orders: no keys exist, so no keys can collide — the guard
    // must pass it through the descriptive path, not throw a bare NPE
    // out of getLong(0) on the NULL max
    spark.read.parquet(s"$sf/orders.parquet")
      .filter(lit(false))
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    ScaleUp.build(spark, src, tmpDir("scaleup_guard_empty"), 2)
  }

  test("in-range keys pass the guard and the copies stay disjoint") {
    val src = cloneCorpus()
    val out = tmpDir("scaleup_guard_ok")
    ScaleUp.build(spark, src, out, 2)
    val orig = spark.read.parquet(s"$src/orders.parquet").count()
    val built = spark.read.parquet(s"$out/orders.parquet")
    assert(built.count() === 2 * orig)
    // disjointness is exact: copy 1's keys all sit in [1e8, 2e8)
    val copies = built
      .groupBy((col("o_orderkey") / 100000000L).cast("long").as("copy"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copies === Map(0L -> orig, 1L -> orig))
  }
}
