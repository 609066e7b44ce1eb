package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom aggregate function (TypedImperativeAggregate):
  * `top_k(value, k)` → the k largest doubles per group, descending.
  *
  * The buffer is a bounded min-heap of size k — constant memory per
  * group regardless of group size, and merge-able, so Spark runs it
  * map-side first (partial aggregation) and merges heaps in the final
  * aggregation: exactly the pattern a 100 TB group-wise top-k needs
  * (contrast with collect_list + slice, whose buffer is unbounded).
  */
case class TopKAggregate(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  require(k >= 1, s"top_k: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  override def update(heap: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (heap.size < k) heap.add(d)
      else if (heap.peek() < d) { heap.poll(); heap.add(d) }
    }
    heap
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Double],
      b: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (a.size < k) a.add(d)
      else if (a.peek() < d) { a.poll(); a.add(d) }
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](heap.size)
    var i = heap.size - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // ascending poll → desc fill
    new GenericArrayData(arr)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 8)
    buf.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) buf.putDouble(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach(_ => heap.add(buf.getDouble))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "top_k"
}

object TopKAggregate {
  /** SQL builder — shared by per-session [[register]] and the
    * cluster-wide [[graft.GraftExtensions]] injection. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    { exprs =>
      require(exprs.size == 2, "top_k(value, k)")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"top_k: k must be an integer literal, got $other")
      }
      TopKAggregate(exprs.head, k).toAggregateExpression()
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k", builder, "built-in")
}
