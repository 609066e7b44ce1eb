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

  /** A V2 parquet `Table` (SupportsRead + SupportsWrite) over one
    * directory — the storage half of graft's `bronze` TableCatalog.
    * `ParquetTable` is `private[sql]`, hence constructed here. */
  def parquetTable(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      dir: String,
      schema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.connector.catalog.Table =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      name,
      spark,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("path", dir)),
      Seq(dir),
      schema,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
}
