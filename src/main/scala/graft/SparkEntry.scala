package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in module registries ([[graft.operators.Relational]],
  * etc.); this object flattens them into the driver's (name → builder)
  * and (name → DuckDB oracle SQL) maps.
  */
object SparkEntry {

  /** Every declared query, in registry order. */
  def all: Seq[QueryDef] =
    operators.Relational.queries ++
      operators.Relational2.queries ++
      operators.Analytics.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Pipeline.queries ++
      operators.Writes.queries ++
      operators.KafkaOps.queries ++
      streaming.StreamingOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset benchmarked by [[Bench]]. */
  def headlines: Seq[QueryDef] = all.filter(_.headline)
}
