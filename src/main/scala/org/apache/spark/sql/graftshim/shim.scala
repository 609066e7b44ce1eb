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

  /** An executor-side parquet writer of `InternalRow`s to one file —
    * the piece graft's bronze STREAMING_WRITE needs.
    * `ParquetWriteSupport` is `private[sql]`, hence constructed here.
    * The keys set below are the ones `ParquetWriteSupport.init`
    * requires Spark to have placed in the Hadoop conf. */
  def rowParquetWriter(
      path: String,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.parquet.hadoop.ParquetWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetWriter
    import org.apache.parquet.hadoop.api.WriteSupport
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      "false")
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      "true")
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      "false")
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      "CORRECTED")
    conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      "CORRECTED")
    conf.set(org.apache.spark.sql.internal.SQLConf.SESSION_LOCAL_TIMEZONE.key,
      "UTC")
    class B(p: org.apache.hadoop.fs.Path)
        extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
        new ParquetWriteSupport
    }
    new B(new org.apache.hadoop.fs.Path(path)).withConf(conf).build()
  }

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
