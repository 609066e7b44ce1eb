package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** st22 — streaming perceptual admission gate. The oracle gates the
  * end-to-end streamed output (one SQL for any micro-batch slicing);
  * this spec pins the GATE SEMANTICS and the slicing independence on
  * planted content:
  *
  *  - a tail-edited copy of a corpus doc is caught (n_dups ≥ 1,
  *    is_new false) — the banded probe is recall-safe at the
  *    threshold by pigeonhole;
  *  - genuinely new content is admitted (n_dups 0, is_new true);
  *  - slicing the batch changes no per-doc answer (the property that
  *    lets m08's fingerprint definition gate the stream). */
class StreamPerceptualGateSpec extends SparkSpec {

  private val baseText = ("spark table row " * 38).take(608)
  private val freshText = ("zq7w vp9k mx2j " * 41).take(608)

  private def corpusIdx(bands: Int) = {
    import spark.implicits._
    Multimodal.bandedPhash(
      Seq((2L, baseText), (5L, ("alpha beta gamma " * 36).take(608)))
        .toDF("doc_id", "text"),
      bands)
  }

  test("tail-edited copies are caught, new content is admitted") {
    import spark.implicits._
    val idx = corpusIdx(4)
    val batch = Seq(
      (20L, baseText + "EXTRA-TAIL-16chr"), // near-dup of corpus doc 2
      (35L, freshText)                      // genuinely new
    ).toDF("doc_id", "text")
    val got = Multimodal.perceptualGateBatch(batch, idx, 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dups"), r.getAs[Boolean]("is_new"))).toMap
    assert(got(20L)._1 >= 1L && !got(20L)._2,
      "a tail-edited near-dup must not be admitted as new")
    assert(got(35L)._1 === 0L && got(35L)._2,
      "fresh content must be admitted")
  }

  test("micro-batch slicing changes no per-doc answer") {
    import spark.implicits._
    val idx = corpusIdx(4)
    val docs = Seq(
      (20L, baseText + "EXTRA-TAIL-16chr"),
      (35L, freshText),
      (50L, baseText)) // exact corpus copy
    def gate(rows: Seq[(Long, String)]) =
      Multimodal.perceptualGateBatch(rows.toDF("doc_id", "text"), idx, 4)
        .collect().map(_.toString).sorted
    val whole = gate(docs)
    val sliced = (gate(docs.take(1)) ++ gate(docs.drop(1))).sorted
    assert(whole.sameElements(sliced))
  }
}
