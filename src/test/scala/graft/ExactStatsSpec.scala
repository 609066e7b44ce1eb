package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import org.apache.spark.sql.functions._

/** EXACT manifest-backed table statistics: a bronze scan must report
  * the snapshot's footer-scraped row/byte totals from
  * `estimateStatistics()` — not the parquet delegate's size-only
  * estimate — and, after manifest-stats file skipping, the SURVIVORS'
  * totals. The payoff under test: a pruned bronze join side whose
  * surviving bytes fit under `autoBroadcastJoinThreshold` plans as a
  * broadcast join even though the full table would not. */
class ExactStatsSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def mkTable(name: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.es")
    spark.sql(s"DROP TABLE IF EXISTS bronze.es.$name")
    spark.sql(s"CREATE TABLE bronze.es.$name (id BIGINT, v DOUBLE) USING parquet")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].tableDir(Seq("es"), name)
  }

  /** The V2 scan's reported statistics, from the analyzed+pushed-down
    * physical plan of `df`. */
  private def scanStats(df: DataFrame): (Option[Long], Option[Long]) = {
    def find(p: SparkPlan): Option[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case b: BatchScanExec => Some(b)
      case other => other.children.flatMap(find(_)).headOption
    }
    val b = find(df.queryExecution.sparkPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    b.scan match {
      case s: SupportsReportStatistics =>
        val st = s.estimateStatistics()
        (if (st.numRows().isPresent) Some(st.numRows().getAsLong) else None,
          if (st.sizeInBytes().isPresent) Some(st.sizeInBytes().getAsLong)
          else None)
      case _ => fail("scan does not report statistics")
    }
  }

  test("scan reports exact manifest numRows, full and pruned") {
    val dir = mkTable("rows")
    Seq(0, 1000, 2000).foreach { base =>
      spark.sql(s"INSERT INTO bronze.es.rows " +
        s"SELECT id + $base, CAST(id AS DOUBLE) FROM range(500)")
    }
    // full scan: exact total row count, not a size-only estimate
    val (fullRows, fullBytes) = scanStats(spark.table("bronze.es.rows"))
    assert(fullRows.contains(1500L),
      s"expected exact numRows 1500, got $fullRows")
    assert(fullBytes.exists(_ > 0))

    // pruned scan: survivors' exact totals (strictly fewer rows)
    val pruned = spark.table("bronze.es.rows").filter(col("id") >= 2000)
    val (pRows, pBytes) = scanStats(pruned)
    assert(pRows.isDefined && pRows.get < 1500L && pRows.get >= 500L,
      s"expected survivors-only numRows, got $pRows")
    assert(pBytes.exists(b => b > 0 && b < fullBytes.get))

    // the survivors' manifest totals agree with the report
    val entries = SnapshotLog.current(dir).get.entries
    val survivors = entries.filter(_.stats.get("id")
      .flatMap(_.max).map(_.toLong).exists(_ >= 2000))
    assert(pRows.contains(survivors.flatMap(_.rows).sum))
  }

  test("delete-carrying (MOR) scan still reports manifest stats") {
    mkTable("mor")
    spark.sql("INSERT INTO bronze.es.mor " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1000)")
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql("DELETE FROM bronze.es.mor WHERE id >= 900")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    // the per-file MOR scan reports the surviving manifest totals —
    // an upper bound under the sidecars (deletes only remove rows)
    val (rows, bytes) = scanStats(spark.table("bronze.es.mor"))
    assert(rows.contains(1000L), s"expected manifest numRows, got $rows")
    assert(bytes.exists(_ > 0))
    assert(spark.table("bronze.es.mor").count() == 900)
  }

  test("pruned bronze side flips a join to broadcast") {
    mkTable("dim")
    Seq(0, 1000, 2000, 3000, 4000, 5000).foreach { base =>
      spark.sql(s"INSERT INTO bronze.es.dim " +
        s"SELECT id + $base, CAST(id AS DOUBLE) FROM range(800)")
    }
    // the broadcast decision reads the LOGICAL plan's sizeInBytes,
    // which Spark derives from the scan's reported rowCount (rows ×
    // schema row width) — so exact manifest numRows is what shrinks
    // the pruned side's estimate. Take the threshold strictly between
    // the two logical estimates: only the stats-pruned side qualifies.
    def logicalSize(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val fullBytes = logicalSize(spark.table("bronze.es.dim"))
    val prunedDf = spark.table("bronze.es.dim").filter(col("id") >= 5000)
    val prunedBytes = logicalSize(prunedDf)
    assert(prunedBytes < fullBytes)
    val threshold = ((prunedBytes + fullBytes) / 2).toLong
    // exchanges are only inserted into executedPlan; the static
    // strategy choice shows as BroadcastHashJoinExec in sparkPlan
    def hasBroadcast(df: DataFrame): Boolean = {
      def walk(p: SparkPlan): Boolean = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          true
        case other => other.children.exists(walk)
      }
      walk(df.queryExecution.sparkPlan)
    }
    val big = spark.range(0, 200000).toDF("id")
    withThreshold(threshold) {
      assert(hasBroadcast(big.join(prunedDf, "id")),
        "pruned side under threshold did not broadcast")
      assert(!hasBroadcast(big.join(spark.table("bronze.es.dim"), "id")),
        "full side over threshold broadcast anyway")
    }
  }

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.set(key, prev)
  }
}
