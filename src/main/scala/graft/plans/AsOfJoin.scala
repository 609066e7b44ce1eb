package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator: logical node + planner
  * strategy + sort-merge physical exec (the category-(c) path of the
  * build plan — used when composition is not wanted).
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`): every left row pairs with the single right row of the
  * same key having the greatest time ≤ the left row's time, or nulls.
  *
  * Physical execution: both sides hash-cluster on the key (Spark's
  * EnsureRequirements inserts the exchanges and sorts from the
  * declared requiredChildDistribution/Ordering), then ONE sequential
  * merge per partition — no per-row range probe, no broadcast, state
  * is a single retained right row. This is the shape that scales to
  * 100 TB: cost = sort + co-partitioned streaming merge, identical to
  * a sort-merge join.
  *
  * v1 constraint: key expressions must be LongType and time
  * expressions TimestampType/LongType (stored as long internally) —
  * covers the driver schema; generalizing is a comparator swap.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter0, rIter0) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // right side is consumed lazily; retain only the latest row whose
      // (key, time) is <= the current left row
      val rIter = rIter0.buffered
      var heldKey = 0L
      var heldRow: InternalRow = null

      lIter0.map { lRow =>
        val lk = lKey.eval(lRow).asInstanceOf[Long]
        val lt = lTime.eval(lRow).asInstanceOf[Long]
        // drop held row if from a previous key
        if (heldRow != null && heldKey != lk) heldRow = null
        // advance right while it is still "as of" the left row
        var advancing = true
        while (advancing && rIter.hasNext) {
          val head = rIter.head
          val hk = rKey.eval(head).asInstanceOf[Long]
          val ht = rTime.eval(head).asInstanceOf[Long]
          if (hk < lk || (hk == lk && ht <= lt)) {
            val consumed = rIter.next()
            if (hk == lk) { heldKey = hk; heldRow = consumed.copy() }
          } else advancing = false
        }
        val matched =
          if (heldRow != null && heldKey == lk) heldRow else nullRight
        proj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOf {
  /** DataFrame-level entry: as-of join `left` to `right` on equal
    * key and leftTime >= rightTime (latest right wins). Installs the
    * planner strategy on the session if missing. */
  def join(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    // skip the experimental-methods fallback when the strategy is
    // already present — via [[graft.GraftExtensions]] injection (its
    // strategies surface in sessionState.planner.strategies) or a
    // prior call
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = org.apache.spark.sql.graftshim.shim.analyzedPlan(leftDf)
    val rPlan = org.apache.spark.sql.graftshim.shim.analyzedPlan(rightDf)
    def resolve(c: Column, plan: LogicalPlan, df: DataFrame): Expression = {
      val name = df.select(c).schema.head.name
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    }
    org.apache.spark.sql.graftshim.shim.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoin(lPlan, rPlan,
        resolve(leftKey, lPlan, leftDf), resolve(rightKey, rPlan, rightDf),
        resolve(leftTime, lPlan, leftDf), resolve(rightTime, rPlan, rightDf)))
  }
}
