package graft

import org.apache.spark.sql.functions._

/** Property of symmetric round-half-up int8 quantization: the
  * reconstruction error of every element is at most scale/2 (half a
  * quantization step), and each vector's max-magnitude element lands
  * exactly on ±127 (so every vector has at least one saturated code).
  */
class QuantizationBoundSpec extends SparkSpec {
  test("reconstruction error <= scale/2 and max element saturates") {
    val df = SparkEntry.queries("s06_int8_quantization")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      val overBound = df
        .filter(col("max_abs_err") > col("scale") * 0.5 + 1e-12).count()
      assert(overBound === 0)
      val unsaturated = df.filter(col("n_saturated") < 1).count()
      assert(unsaturated === 0)
    } finally df.unpersist()
  }
}
