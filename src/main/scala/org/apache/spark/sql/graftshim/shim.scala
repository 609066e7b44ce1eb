package org.apache.spark.sql.graftshim

import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: building a DataFrame
  * from a custom LogicalPlan node (the documented extension pattern —
  * third-party operators need exactly this one hook; everything else
  * in graft uses public API).
  */
object shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
