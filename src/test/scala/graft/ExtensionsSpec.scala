package graft

import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions=graft.GraftExtensions` end-to-end: a session
  * BUILT with the extension (same JVM, shared SparkContext — the
  * default session is cleared so getOrCreate actually constructs one)
  * has every stateless library function and the as-of planner
  * strategy available with zero per-session register calls. */
class ExtensionsSpec extends SparkSpec {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark // force shared session (and its SparkContext)
    // getOrCreate applies spark.sql.extensions from the (shared)
    // SparkContext's conf, NOT from builder options, when the context
    // already exists — so the config-string wiring is exercised by
    // setting it there, scoped to this block
    org.apache.spark.sql.graftshim.TestShims.setContextConf(
      base.sparkContext, "spark.sql.extensions", "graft.GraftExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      assert(s2 ne base, "getOrCreate returned the old session — extensions not applied")
      f(s2)
    } finally {
      org.apache.spark.sql.graftshim.TestShims.removeContextConf(
        base.sparkContext, "spark.sql.extensions")
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected SQL functions work without register calls") {
    withExtendedSession { s2 =>
      val dot = s2.sql(
        """SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |               array(cast(3.0 as float), cast(4.0 as float))) AS d,
          |       vec_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n
          |""".stripMargin).head()
      assert(dot.getDouble(0) == 11.0)
      assert(dot.getDouble(1) == 5.0)

      val grams = s2.sql(
        "SELECT ngram FROM (SELECT 'a b c' AS t) " +
          "LATERAL VIEW ngrams(t, 2) g AS pos, ngram ORDER BY pos")
        .collect().map(_.getString(0)).toSeq
      assert(grams == Seq("a b", "b c"))

      val topk = s2.sql(
        "SELECT top_k(x, 2) FROM VALUES (1.0D), (5.0D), (3.0D) AS t(x)")
        .head().getSeq[Double](0)
      assert(topk == Seq(5.0, 3.0))

      val sig = s2.sql(
        "SELECT vec_signbits(array(cast(1.0 as float), cast(-1.0 as float)), 0)")
        .head().getLong(0)
      assert(sig == 1L) // bit i set iff v[i] >= 0 within the 32-wide window
    }
  }

  test("as-of planner strategy is injected (no experimental mutation needed)") {
    withExtendedSession { s2 =>
      val strategies = s2.sessionState.planner.strategies
      assert(strategies.exists(_.getClass.getName.contains("AsOfJoinStrategy")),
        s"AsOfJoinStrategy not in planner: ${strategies.map(_.getClass.getSimpleName)}")
      assert(!s2.experimental.extraStrategies
        .exists(_.getClass.getName.contains("AsOfJoinStrategy")),
        "strategy should come from the extension, not experimental")
    }
  }

  test("avro_decode round-trips the reference framing through SQL") {
    withExtendedSession { s2 =>
      val schemaJson =
        """{"type":"record","name":"OrderEvent","namespace":"com.example",
          |"fields":[{"name":"orderId","type":"string"},
          |{"name":"amount","type":"double"},{"name":"ts","type":"string"}]}
          |""".stripMargin.replace("\n", "")
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("orderId", "o-1")
      rec.put("amount", 12.5)
      rec.put("ts", "2026-01-01")
      val bytes = new graft.functions.avro.Serializer(schema).serialize(rec)
      import s2.implicits._
      val df = Seq(bytes).toDF("value")
      df.createOrReplaceTempView("raw_ext")
      val r = s2.sql(
        s"SELECT avro_decode(value, '$schemaJson') AS data FROM raw_ext")
        .select("data.*").head()
      assert(r.getString(0) == "o-1" && r.getDouble(1) == 12.5)
    }
  }
}
