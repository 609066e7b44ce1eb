package graft

import org.apache.spark.sql.functions._

/** VecCentroid's partial-aggregation determinism: the floor-quantized
  * Long accumulation must produce BIT-IDENTICAL means under any
  * partitioning (Spark chooses partial/merge order freely), and the
  * empty relation must finish cleanly. */
class VecCentroidSpec extends SparkSpec {

  import spark.implicits._

  test("bit-identical means across partitionings") {
    graft.functions.VecCentroid.register(spark, 3)
    val rows = (1 to 997).map(i =>
      (i.toLong % 5, Seq(i * 0.001, -i * 0.013, i * 1.7e-5)))
    def centroid(parts: Int): Map[Long, Seq[Double]] =
      rows.toDF("g", "v").repartition(parts)
        .groupBy(col("g")).agg(expr("vec_centroid(v)").as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val one = centroid(1)
    val many = centroid(32)
    assert(one.keySet == many.keySet)
    one.foreach { case (g, c) =>
      assert(c.zip(many(g)).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b)
      }, s"group $g diverged: $c vs ${many(g)}")
    }
  }

  test("dimension mismatch fails loudly; empty input yields zero vector") {
    graft.functions.VecCentroid.register(spark, 2)
    val bad = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
        .groupBy(col("g")).agg(expr("vec_centroid(v)")).collect()
    }
    assert(bad.getMessage != null)
    val agg = new graft.functions.VecCentroid(2)
    assert(agg.finish(agg.zero) == Seq(0.0, 0.0))
  }
}
