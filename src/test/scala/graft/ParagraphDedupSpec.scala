package graft

import org.apache.spark.sql.functions._

/** Paragraph-granularity fuzzy dedup (d11) contract: keep-first
  * semantics over 32-token windows, a scrub that reconstitutes the
  * untouched text when nothing is dropped, and full-drop of later
  * exact-copy documents.
  */
class ParagraphDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("d11_paragraph_neardup")(spark, sf).cache()

  test("drops are bounded and present: 0 <= n_dropped <= n_paras, some > 0") {
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: n_dropped ${r.getLong(2)} of ${r.getLong(1)}")
    }
    assert(rows.exists(_.getLong(2) > 0L), "no paragraph ever dropped")
    assert(rows.exists(_.getLong(2) == 0L), "every doc lost a paragraph")
  }

  test("untouched documents scrub to their own token-joined text") {
    val expected = new Tables(spark, sf).documents
      .select(col("doc_id"),
        md5(array_join(split(lower(trim(col("text"))), "\\s+"), " "))
          .as("full_md5"))
    val mismatches = out.filter(col("n_dropped") === 0L)
      .join(expected, "doc_id")
      .filter(col("scrubbed_md5") =!= col("full_md5"))
      .count()
    assert(mismatches == 0L,
      s"$mismatches untouched docs whose scrub altered the text")
  }

  test("a later exact-copy document loses every paragraph; first copy " +
      "and bystander keep all") {
    // planted corpus: doc 2 is a verbatim copy of doc 1 (80 tokens =
    // three 32-token windows, all shingle-able), doc 3 is unrelated.
    // Keep-first: doc 1 and doc 3 untouched, doc 2 fully scrubbed.
    import spark.implicits._
    val a = (0 until 80).map(i => s"alpha$i").mkString(" ")
    val b = (0 until 80).map(i => s"omega$i").mkString(" ")
    val dir = tmpDir("d11_planted")
    Seq((1L, a, "en", "web", a.length.toLong),
      (2L, a, "en", "web", a.length.toLong),
      (3L, b, "en", "web", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("d11_paragraph_neardup")(spark, dir)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r(1L) == ((3L, 0L)), s"first copy touched: ${r(1L)}")
    assert(r(2L) == ((3L, 3L)), s"later copy not fully scrubbed: ${r(2L)}")
    assert(r(3L) == ((3L, 0L)), s"bystander touched: ${r(3L)}")
  }
}
