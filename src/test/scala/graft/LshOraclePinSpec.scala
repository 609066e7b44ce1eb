package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB oracle twins for the LSH queries are OVERRIDE-AWARE:
  * with `spark.graft.lshHyperplanes`/`lshTables` set at
  * materialization time they pin the resolved value as a literal
  * (matching what the Spark side will use), and with the conf unset
  * they re-derive the adaptive default in SQL. This is what keeps the
  * cross-engine hash gate valid under the production recall dials. */
class LshOraclePinSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("lshHyperplanes override pins a literal H into the twin CTEs") {
    spark // force session creation so getActiveSession resolves
    val pinned = withConf(GraftConf.LshHyperplanesKey, "17") {
      Similarity.bucketedSqlCtes()
    }
    assert(pinned.contains("hh AS (SELECT 17 AS h)"),
      s"override not pinned: ${pinned.take(200)}")
    // unsetting restores the adaptive CTE (H derived in SQL)
    val adaptive = Similarity.bucketedSqlCtes()
    assert(adaptive.contains("LEAST(62, GREATEST(2,"),
      s"adaptive CTE missing: ${adaptive.take(200)}")
    assert(!adaptive.contains("SELECT 17 AS h"))
  }

  test("out-of-range lshHyperplanes override fails loudly in the twin") {
    spark
    // h > 62 would overflow the BIGINT bucket sum in DuckDB — the twin
    // must validate like the Spark side, not embed the literal
    withConf(GraftConf.LshHyperplanesKey, "63") {
      intercept[IllegalArgumentException] { Similarity.bucketedSqlCtes() }
    }
    withConf(GraftConf.LshHyperplanesKey, "0") {
      intercept[IllegalArgumentException] { Similarity.bucketedSqlCtes() }
    }
  }

  test("lshTables override pins the table count r into the s10 twin") {
    spark
    val pinned = withConf(GraftConf.LshTablesKey, "5") {
      Similarity.multiTableSql()
    }
    // r=5 tables unnest as generate_series(0, 4)
    assert(pinned.contains("generate_series(0, 4)) AS tt"),
      s"r=5 not reflected: $pinned")
    // default r=3 restored on unset
    val default = Similarity.multiTableSql()
    assert(default.contains("generate_series(0, 2)) AS tt"),
      s"default r not restored: $default")
  }
}
