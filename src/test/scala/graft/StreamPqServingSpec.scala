package graft

/** st17's identity claim, asserted in-JVM (the StreamAnnServingSpec
  * discipline for st16): the STREAMED serve over the persisted IVF-PQ
  * index returns row-for-row exactly what the batch persisted serve
  * (s18) returns — micro-batch slicing, the foreachBatch landing, and
  * the per-epoch index loads change the execution shape, never the
  * answer. The shared oracle already gates both against DuckDB; this
  * pins them against EACH OTHER without an engine in between.
  */
class StreamPqServingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("st17 streamed serve equals s18 batch serve row for row") {
    val streamed =
      SparkEntry.queries("st17_stream_pq_serving")(spark, sf).collect()
    val batch =
      SparkEntry.queries("s18_pq_persisted")(spark, sf).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("st18 streamed filtered serve equals s19 batch filtered serve " +
      "row for row") {
    val streamed =
      SparkEntry.queries("st18_stream_filtered_ann")(spark, sf).collect()
    val batch =
      SparkEntry.queries("s19_filtered_ann")(spark, sf).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }
}
