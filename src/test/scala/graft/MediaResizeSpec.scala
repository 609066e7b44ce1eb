package graft

import org.apache.spark.sql.functions._

/** m06 aspect-fit resize: the DuckDB gate proves cross-engine
  * exactness; these pin the geometry contract itself. */
class MediaResizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the long side lands exactly on 224 and no side collapses to 0") {
    val res = SparkEntry.queries("m06_media_resize")(spark, sf)
    assert(res.count() > 0)
    assert(res.filter(greatest(col("out_w"), col("out_h")) =!= 224)
      .count() === 0L, "a frame's long side is not 224")
    assert(res.filter(col("out_w") < 1 || col("out_h") < 1)
      .count() === 0L)
  }

  test("aspect ratio preserved to integer truncation; audio excluded") {
    val res = SparkEntry.queries("m06_media_resize")(spark, sf)
    assert(res.filter(col("media_type") === "audio").count() === 0L)
    // out_short = floor(short * 224 / long): check the defining
    // identity on the clamped inputs rather than a float ratio
    val bad = res
      .withColumn("w1", greatest(lit(1L), col("width")))
      .withColumn("h1", greatest(lit(1L), col("height")))
      .filter(
        col("out_w") =!= greatest(lit(1L),
          expr("(w1 * 224) div greatest(w1, h1)")) ||
        col("out_h") =!= greatest(lit(1L),
          expr("(h1 * 224) div greatest(w1, h1)")))
    assert(bad.count() === 0L)
  }
}
