package graft

import org.apache.spark.sql.functions._

/** Corpus-trained bigram LM fluency (t18) contract: probabilities are
  * well-formed, the keep gate splits the real corpus, and on a planted
  * corpus deterministic phrasing outscores diverse phrasing over the
  * same vocabulary (the signal the filter exists for).
  */
class LmFluencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fluency in (0, 1]; keep == fluency > cut; gate splits corpus") {
    val rows = SparkEntry.queries("t18_lm_fluency")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getDouble(2)
      assert(f > 0.0 && f <= 1.0, s"doc ${r.getLong(0)} fluency $f")
      assert(r.getBoolean(3) == (f > 0.0345d))
    }
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "keep gate is degenerate on the corpus")
  }

  test("deterministic transitions outscore diverse ones, same vocabulary") {
    import spark.implicits._
    // docs 1-2: the cycle a b c repeated — every transition is the
    // only continuation of its head (p = 1 per bigram, modulo doc 3's
    // contributions). doc 3: the SAME three words in varied orders —
    // heads spread over several continuations, so each p is a
    // fraction. Self-trained on exactly these docs.
    val cycle = Seq.fill(20)(Seq("a", "b", "c")).flatten.mkString(" ")
    val varied = "a a b b c a c c b a b c b a c a b b a c"
    val dir = tmpDir("t18_planted")
    Seq((1L, cycle), (2L, cycle), (3L, varied))
      .map { case (id, tx) => (id, tx, "en", "web", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t18_lm_fluency")(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) == r(2L), "identical docs scored differently")
    assert(r(1L) > r(3L),
      s"cycle doc ${r(1L)} did not outscore varied doc ${r(3L)}")
  }
}
