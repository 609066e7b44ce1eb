package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{avro, Generators, TopKAggregate, VectorDot,
  VectorNorm, VectorSignBits}
import graft.plans.AsOfJoinStrategy

/** Cluster-wide library installation — the idiomatic Spark deployment
  * hook. A user adds
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * to spark-defaults (or `.withExtensions(new GraftExtensions)`) and
  * every SESSION-STATELESS piece of the library is present in every
  * session without per-session `register` calls:
  *
  *   - native SQL functions: `vec_dot`, `vec_norm`, `vec_signbits`,
  *     `ngrams`, `top_k`, `avro_decode` (each also keeps its
  *     per-session `register` for notebook use);
  *   - the as-of join planner strategy ([[graft.plans.AsOfJoinStrategy]]),
  *     so [[graft.plans.AsOf.join]] plans without touching
  *     `spark.experimental` (it still self-registers there when the
  *     extension is absent).
  *
  * Deliberately NOT injected, with reasons:
  *   - `vec_lsh_bucket` / `bloom_might_contain`: bound to run-time
  *     state (a trained hyperplane matrix / a built Bloom filter) —
  *     they are registered by the operator that owns the state;
  *   - the `bronze` catalog: catalogs are config-plugged, not
  *     extension-plugged — `spark.sql.catalog.bronze=graft.catalog
  *     .BronzeCatalog` (+ its warehouse option) is the one line that
  *     installs it, exactly as Iceberg's SparkCatalog installs.
  *
  * The reference job wires its capabilities through per-job session
  * config (reference src/main/resources/spark-defaults.properties:4-9
  * installs the Iceberg catalog the same config-file way); this class
  * is that deployment story for the library's engine extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, clazz: Class[_], usage: String)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        // 5-arg ctor carries the usage into DESCRIBE FUNCTION
        new ExpressionInfo(clazz.getName, null, name, usage, ""), builder))

    fn("vec_dot", classOf[VectorDot],
      "vec_dot(a, b) - exact double dot product of two float/double arrays") {
      exprs =>
        require(exprs.size == 2, "vec_dot(a, b)")
        VectorDot(exprs(0), exprs(1))
    }
    fn("vec_norm", classOf[VectorNorm],
      "vec_norm(v) - L2 norm of a float/double array") { exprs =>
      require(exprs.size == 1, "vec_norm(v)")
      VectorNorm(exprs.head)
    }
    fn("vec_signbits", classOf[VectorSignBits],
      "vec_signbits(v, off) - 32 sign bits of v[off..off+32) packed into a long") {
      exprs =>
        require(exprs.size == 2, "vec_signbits(v, off)")
        VectorSignBits(exprs(0), exprs(1))
    }
    fn("ngrams", classOf[graft.functions.NGramGenerator],
      "ngrams(text, n) - generator of word n-grams")(Generators.ngramsBuilder)
    fn("top_k", classOf[graft.functions.TopKAggregate],
      "top_k(value, k) - aggregate: k largest values, descending")(
      TopKAggregate.builder)
    fn("avro_decode", classOf[graft.functions.AvroDeserialize],
      "avro_decode(value, schemaJson) - raw-framed Avro body to struct")(
      avro.decodeBuilder)

    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
