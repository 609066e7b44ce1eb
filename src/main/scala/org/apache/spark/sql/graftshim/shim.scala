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

  /** The session confs `ParquetWriteSupport.init` reads from the
    * Hadoop conf, CAPTURED DRIVER-SIDE from the active session so the
    * streaming-written files agree byte-for-byte with what a batch
    * `INSERT INTO` under the same session settings would produce
    * (timestamp physical type, timezone, rebase modes, …). The result
    * is a plain serializable Map the write factory ships to executors
    * — `SparkSession.active` does not exist there. Absent keys fall
    * back to Spark's own defaults for this build. */
  def parquetWriterConfs(spark: org.apache.spark.sql.SparkSession)
      : Map[String, String] = {
    import org.apache.spark.sql.internal.SQLConf
    val defaults = Map(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key -> "false",
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key -> "TIMESTAMP_MICROS",
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key -> "true",
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key -> "false",
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
      SQLConf.SESSION_LOCAL_TIMEZONE.key -> "UTC")
    defaults.map { case (k, d) => k -> spark.conf.get(k, d) }
  }

  /** An executor-side parquet writer of `InternalRow`s to one file —
    * the piece graft's bronze STREAMING_WRITE needs.
    * `ParquetWriteSupport` is `private[sql]`, hence constructed here.
    * `sessionConfs` comes from [[parquetWriterConfs]] captured on the
    * driver. */
  def rowParquetWriter(
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      sessionConfs: Map[String, String])
      : org.apache.parquet.hadoop.ParquetWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetWriter
    import org.apache.parquet.hadoop.api.WriteSupport
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    sessionConfs.foreach { case (k, v) => conf.set(k, v) }
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

  /** Same, but over an EXPLICIT file list — the read half of the
    * bronze snapshot log: a table load pins one snapshot's file set,
    * so concurrent commits never change a planned scan (snapshot
    * isolation) and `VERSION AS OF` reads an old set. An empty list
    * (a just-created table's v0) is a valid empty relation because
    * the schema is always supplied, never inferred. */
  def parquetTableFiles(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      files: Seq[String],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.Table =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      name,
      spark,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
      files,
      Some(schema),
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
}
