package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The native codegen'd `vec_lsh_bucket` must be bit-identical to the
  * interpreted HOF formulation it replaced (same left-to-right double
  * fold, same sign test, same 2^p packing) — the DuckDB oracle derives
  * the same buckets a third way (md5 in SQL), so this equivalence is
  * what lets s02/s05 stay hash-checked after the codegen swap. */
class NativeLshBucketSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("native vec_lsh_bucket == interpreted HOF bucket on every vector") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.VectorFunctions.registerLshBucket(
      spark, Similarity.hyperplaneWeights())
    val e = new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("native", expr("vec_lsh_bucket(v)"))
      .withColumn("hof", expr(Similarity.bucketExprHof()))
    val bad = e.filter(col("native") =!= col("hof")).count()
    assert(bad === 0L)
    // and the buckets are non-degenerate (more than one occupied)
    val distinct = e.select(col("native")).distinct().count()
    assert(distinct > 1L)
  }

  test("bucket projection stays inside whole-stage codegen") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.VectorFunctions.registerLshBucket(
      spark, Similarity.hyperplaneWeights())
    val e = new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", expr("vec_lsh_bucket(v)"))
    // `*(n)` in the string form; assert on the node type directly
    val hasWscg = e.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWscg)
  }
}
