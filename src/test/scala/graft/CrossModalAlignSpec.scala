package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** m07 / st20 — the cross-modal (CLIP-score-shaped) alignment filter.
  *
  * Planted-pair tier: a constructed corpus where one doc's text
  * embedding is built PROPORTIONAL to its own pooled media embedding
  * (block j of the 64-dim text vector holds the constant α·me_j, so
  * the block-pooled text tower reproduces the media tower up to
  * float quantization → cosine ≈ +1, keep) and another doc's is the
  * NEGATION (cosine ≈ −1, dropped). The filter must pass exactly the
  * aligned pair — the behavioral contract, independent of the oracle.
  *
  * Streaming tier: st20's micro-batched union equals m07's batch
  * answer row for row (per-doc independence — the one-SQL-two-
  * consumers discipline).
  */
class CrossModalAlignSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("planted aligned pair is kept, planted misaligned pair is " +
      "dropped, cosines land at ±1") {
    import spark.implicits._
    val dir = tmpDir("xmodal_planted")
    // two video-stripe docs (doc_id % 3 == 2); text long enough for
    // a few frames each
    val textA = ("alpha " * 500).trim
    val textB = ("bravo " * 700).trim
    Seq((2L, textA, "en", "web", textA.length.toLong),
        (5L, textB, "en", "web", textB.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // derive each doc's pooled MEDIA embedding with the engine's own
    // chain, then plant text embeddings: block j of doc 2's vector is
    // the constant alpha*me_j (aligned); doc 5's is -alpha*me_j
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val me = Multimodal.pooledFrameEmbeddingOf(docs)
      .select(col("doc_id"), col("e0"), col("e1"), col("e2"), col("e3"))
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getDouble(i)).toArray).toMap
    val alpha = 1e-4
    def planted(id: Long, sign: Double): (Long, Seq[Float], String) =
      (id,
        (0 until 64).map(dd => (sign * alpha * me(id)(dd / 16)).toFloat),
        "x")
    Seq(planted(2L, 1.0), planted(5L, -1.0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("m07_crossmodal_align")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.keySet === Set(2L, 5L))
    val (cosA, keepA) = out(2L)
    val (cosB, keepB) = out(5L)
    assert(cosA > 0.999 && keepA,
      s"aligned pair scored $cosA / keep=$keepA")
    assert(cosB < -0.999 && !keepB,
      s"misaligned pair scored $cosB / keep=$keepB")
  }

  test("no cartesian product; the towers meet in ONE key equi-join") {
    val plan = SparkEntry.queries("m07_crossmodal_align")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "m07 plans an all-pairs join")
  }

  test("st20 streamed alignment == m07 batch alignment, row for row") {
    val streamed = SparkEntry
      .queries("st20_stream_crossmodal")(spark, sf).collect()
    val batch = SparkEntry.queries("m07_crossmodal_align")(spark, sf)
      .collect()
    assert(streamed.length === batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
  }
}
