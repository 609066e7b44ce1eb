package graft

import org.apache.spark.sql.functions._

/** p08 — DSIR importance resampling (Xie et al. 2023). The oracle
  * gate proves cross-engine exactness; this spec pins the SEMANTICS
  * the hash compare can't see:
  *
  *  - target enrichment: documents of the target domain (lang 'en')
  *    carry a strictly higher mean importance weight than every
  *    other language, and survive the resample at a higher rate —
  *    the property the operator exists for;
  *  - the gate genuinely resamples: keep is neither all-true nor
  *    all-false, and acceptance is monotone in the weight by
  *    construction (affine in w — spot-checked: the max-weight doc
  *    is always kept, a min-weight doc never);
  *  - determinism: two runs produce identical rows (no RNG state —
  *    the md5 uniform is derived from doc identity). */
class DsirResampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run() = SparkEntry.queries("p08_dsir_resample")(spark, sf)

  test("target-domain documents are enriched: higher mean weight and " +
      "higher keep rate than every other language") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val byLang = run().join(docs, "doc_id")
      .groupBy(col("lang"))
      .agg(avg(col("w_scaled")).as("mw"),
        avg(col("keep").cast("double")).as("kr"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val (enW, enK) = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (lang, (w, k)) =>
      assert(enW > w, s"mean weight: en $enW not above $lang $w")
      assert(enK > k, s"keep rate: en $enK not above $lang $k")
    }
  }

  test("the resample splits, keeps the max-weight doc, drops a " +
      "min-weight doc, and is deterministic") {
    val out = run().cache()
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < n, s"degenerate resample: $kept of $n")

    // acceptance is affine in w: p(max) = 1, p(min) = 0
    val byW = out.orderBy(col("w_scaled").desc).collect()
    assert(byW.head.getAs[Boolean]("keep"),
      "the maximum-weight document must always be accepted")
    assert(!byW.last.getAs[Boolean]("keep"),
      "a minimum-weight document has acceptance probability zero")

    val again = run().collect()
    val first = out.collect()
    assert(first.length === again.length)
    first.zip(again).foreach { case (a, b) => assert(a === b) }
    out.unpersist()
  }

  test("st21 streamed admission == p08 batch resample, row for row " +
      "(model and bounds are corpus constants; slicing changes nothing)") {
    val batch = run().collect()
    val streamed =
      SparkEntry.queries("st21_stream_dsir_gate")(spark, sf).collect()
    assert(streamed.length === batch.length && batch.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
  }
}
