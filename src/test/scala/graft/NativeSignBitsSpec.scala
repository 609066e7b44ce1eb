package graft

import org.apache.spark.sql.functions._

/** The native codegen'd `vec_signbits` must be bit-identical to the
  * interpreted HOF formulation it replaced (s14's signature builder),
  * and the signature projection must actually sit inside whole-stage
  * codegen — the entire point of going native: the index pass touches
  * every float of every vector, and an interpreted lambda ×64 per row
  * is the failure mode that kept s02 slow before `vec_lsh_bucket`. */
class NativeSignBitsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The pre-native formulation: 1-based element access, NULL-safe IF
    * (out-of-range elements contribute 0 bits; `try_element_at`
    * because ANSI `element_at` throws out of range). */
  private def hof(off: Int): String =
    s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
      (acc, i) -> acc + IF(try_element_at(v, i + ${off + 1}) >= 0,
        shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"""

  test("native vec_signbits == interpreted HOF on every vector, both words") {
    graft.functions.VectorFunctions.register(spark)
    val e = new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("n0", expr("vec_signbits(v, 0)"))
      .withColumn("n1", expr("vec_signbits(v, 32)"))
      .withColumn("h0", expr(hof(0)))
      .withColumn("h1", expr(hof(32)))
    assert(e.filter(col("n0") =!= col("h0") || col("n1") =!= col("h1"))
      .count() === 0L)
    // non-degenerate: signatures differ across vectors
    assert(e.select(col("n0")).distinct().count() > 1L)
    // every word fits in 32 bits (packing is little-endian 0..31)
    val mx = e.agg(max(col("n0")), max(col("n1"))).head()
    assert(mx.getLong(0) < (1L << 32) && mx.getLong(1) < (1L << 32))
  }

  test("out-of-range offset yields 0 bits, matching element_at NULL semantics") {
    graft.functions.VectorFunctions.register(spark)
    val e = new Tables(spark, sf).embeddings
      .select(col("embedding").as("v"))
      .withColumn("past", expr("vec_signbits(v, 64)")) // beyond 64 dims
      .withColumn("hofPast", expr(hof(64)))
    assert(e.filter(col("past") =!= lit(0L)).count() === 0L)
    assert(e.filter(col("hofPast") =!= lit(0L)).count() === 0L)
  }

  test("NaN coordinates follow SQL semantics: bit set, matching the HOF") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    // NaN >= 0 is TRUE under Spark SQL ordering (NaN sorts above all
    // numbers) — Java float semantics would clear the bit and diverge
    // from the HOF twin on any corpus with a NaN embedding coordinate
    val e = Seq(
      Seq(Float.NaN, -1f, 1f, -0f),
      Seq(-1f, Float.NaN, Float.NegativeInfinity, Float.PositiveInfinity))
      .toDF("v")
      .withColumn("native", org.apache.spark.sql.functions
        .expr("vec_signbits(v, 0)"))
      .withColumn("hofv", org.apache.spark.sql.functions.expr(hof(0)))
      .collect()
    assert(e.forall(r => r.getAs[Long]("native") == r.getAs[Long]("hofv")))
    // row 1: NaN(set), -1(clear), 1(set), -0.0(set) -> 0b1101 = 13
    assert(e(0).getAs[Long]("native") == 13L)
    // row 2: -1(clear), NaN(set), -inf(clear), +inf(set) -> 0b1010 = 10
    assert(e(1).getAs[Long]("native") == 10L)
  }

  test("signature projection sits inside whole-stage codegen") {
    graft.functions.VectorFunctions.register(spark)
    val e = new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("h0", expr("vec_signbits(v, 0)"))
      .withColumn("h1", expr("vec_signbits(v, 32)"))
    // the PROJECT carrying vec_signbits must be inside a
    // WholeStageCodegenExec subtree (not just any codegen in the plan)
    val inWscg = e.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.exists {
      case p: org.apache.spark.sql.execution.ProjectExec =>
        p.projectList.exists(_.exists(
          _.isInstanceOf[graft.functions.VectorSignBits]))
      case _ => false
    })
    assert(inWscg, "vec_signbits projection fell out of whole-stage codegen")
  }
}
