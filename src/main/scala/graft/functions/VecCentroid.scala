package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Element-wise vector-mean UDAF via the typed `Aggregator` API — the
  * one extension mechanism the library's function layer didn't yet
  * exercise (TopK is a `TypedImperativeAggregate`; the vec_* scalars
  * are Catalyst expressions): `Aggregator[IN, BUF, OUT]` + Encoders +
  * `functions.udaf`, the public face Spark documents for custom
  * aggregation.
  *
  * Determinism across partial aggregation AND engines: each element
  * is floor-quantized to 1e-6 ticks and accumulated as an exact Long
  * (associative and commutative, so Spark's arbitrary partial/merge
  * order cannot change the sum — s08/q75/t15's discipline), and the
  * mean converts the exact Long sum to double ONCE (round-half-even —
  * the only rounding in the computation) then divides by scale and
  * count. The DuckDB oracle accumulates the same ticks in
  * DECIMAL(38,0) — exact; a DOUBLE sum would round order-dependently
  * past 2^53 ticks — and casts to DOUBLE the same single time:
  * `CAST(SUM(CAST(FLOOR(x*1e6) AS DECIMAL(38,0))) AS DOUBLE)/1e6/n`.
  *
  * Input is `Seq[Double]` — callers cast the column to
  * `array<double>` (float→double widening is exact), so both
  * embedding encodings the driver has shipped work unchanged.
  *
  * At 100 TB: a centroid pass is one map-side-combinable aggregation —
  * the shuffle carries one (dims·8 byte) buffer per group per
  * partition, never vectors.
  */
final class VecCentroid(dims: Int)
    extends Aggregator[Seq[Double], VecCentroid.Buf, Seq[Double]] {
  import VecCentroid.{Buf, Scale}

  override def zero: Buf = Buf(Array.fill(dims)(0L), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    require(v.length == dims,
      s"vec_centroid: expected $dims dims, got ${v.length}")
    var i = 0
    while (i < dims) {
      b.sums(i) += math.floor(v(i) * Scale).toLong
      i += 1
    }
    Buf(b.sums, b.n + 1L)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dims) { a.sums(i) += b.sums(i); i += 1 }
    Buf(a.sums, a.n + b.n)
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0L) Seq.fill(dims)(0.0)
    else b.sums.toSeq.map(s => s.toDouble / Scale / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VecCentroid {
  /** Quantization: 1e-6 ticks — exact Long accumulation while
    * |sum| < 2^63 ticks (a 10^12-row group of unit-scale values). */
  val Scale: Double = 1e6

  final case class Buf(sums: Array[Long], n: Long)

  /** Registers `vec_centroid(array<double>)` for SQL + DataFrame use. */
  def register(spark: SparkSession, dims: Int): Unit =
    spark.udf.register("vec_centroid",
      functions.udaf(new VecCentroid(dims), ExpressionEncoder[Seq[Double]]()))
}
