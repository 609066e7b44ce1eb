package graft

import org.apache.spark.sql.functions._

/** Streaming dedup admission gate (st15) vs the exact nightly pass
  * (d10): the gate is the cheap band-collision test, so it must be
  * RECALL-SAFE — any document d10's exact-jaccard verify counts as a
  * corpus duplicate had a band collision, hence the gate refused it.
  * (The converse is allowed: band hash-luck may flag docs the exact
  * verify clears — that is the precision the nightly pass buys back.)
  */
class StreamDedupGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gate refuses every doc the exact incremental dedup flags") {
    val gate = SparkEntry.queries("st15_stream_dedup_gate")(spark, sf)
      .select(col("doc_id").as("delta_id"), col("admit"))
    val exact = SparkEntry.queries("d10_incremental_dedup")(spark, sf)
      .filter(col("n_corpus_dups") > 0)
      .select(col("delta_id"))
    val leaked = exact.join(gate, "delta_id")
      .filter(col("admit")).count()
    assert(leaked == 0L,
      s"$leaked exact-verified dups were admitted by the band gate")
    // and the gate flags SOMETHING on this corpus
    val refused = gate.filter(!col("admit")).count()
    assert(refused > 0L, "gate refused nothing — degenerate corpus?")
  }
}
