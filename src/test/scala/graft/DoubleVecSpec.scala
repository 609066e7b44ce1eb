package graft

import org.apache.spark.sql.functions._

/** The native vec_* expressions accept BOTH `array<float>` and
  * `array<double>` vectors: float elements widen losslessly to double
  * (the shipped `embeddings` encoding), doubles read natively — so
  * results over a float array and its exact double widening are
  * BIT-IDENTICAL. This is regen insurance: the driver has re-encoded
  * testdata physical types between rounds before (events.ts NANOS →
  * micros took out 32 queries in round 10); if `embeddings` ever
  * ships as list<double>, the whole similarity surface keeps
  * working — identically to DuckDB, which computes the same fold in
  * double either way. Any other element type still fails at analysis
  * time. */
class DoubleVecSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def both = {
    graft.functions.VectorFunctions.register(spark)
    new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("vf"))
      .withColumn("vd", col("vf").cast("array<double>"))
  }

  test("vec_dot/vec_norm/vec_signbits agree bit-for-bit across encodings") {
    val e = both
      .withColumn("dot_f", expr("vec_dot(vf, vf)"))
      .withColumn("dot_d", expr("vec_dot(vd, vd)"))
      .withColumn("dot_m", expr("vec_dot(vf, vd)")) // mixed sides
      .withColumn("nrm_f", expr("vec_norm(vf)"))
      .withColumn("nrm_d", expr("vec_norm(vd)"))
      .withColumn("sb_f", expr("vec_signbits(vf, 0)"))
      .withColumn("sb_d", expr("vec_signbits(vd, 0)"))
    assert(e.filter(
      col("dot_f") =!= col("dot_d") || col("dot_f") =!= col("dot_m") ||
        col("nrm_f") =!= col("nrm_d") || col("sb_f") =!= col("sb_d"))
      .count() === 0L)
    assert(e.select("dot_f").distinct().count() > 1L) // non-degenerate
  }

  test("vec_lsh_bucket agrees bit-for-bit across encodings") {
    val planes = (0 until 8).map(p =>
      (0 until 64).map(i => math.sin(p * 64 + i + 1).toDouble))
    graft.functions.VectorFunctions
      .registerLshBucketAs(spark, "dv_bucket", planes)
    val e = both
      .withColumn("b_f", expr("dv_bucket(vf)"))
      .withColumn("b_d", expr("dv_bucket(vd)"))
    assert(e.filter(col("b_f") =!= col("b_d")).count() === 0L)
    assert(e.select("b_f").distinct().count() > 1L)
  }

  test("non-vector element types are refused at analysis time") {
    val e = both.withColumn("vi", col("vf").cast("array<int>"))
    val err = intercept[Exception] {
      e.withColumn("bad", expr("vec_dot(vi, vi)")).collect()
    }
    assert(err.getMessage.contains("array<float> or array<double>"),
      s"wrong analysis error: ${err.getMessage}")
  }
}
