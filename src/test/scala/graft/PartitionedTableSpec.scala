package graft

import graft.catalog.{BronzePartitioning, SnapshotLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

/** Partition transforms on bronze catalog tables (identity / days /
  * bucket — the Iceberg hidden-partitioning surface the reference's
  * sink table uses): the fanout write path must give every data file
  * exactly one partition tuple, record it in the manifest entry, and
  * scan planning must prune on it — including bucket equality, the
  * one transform per-file min/max stats can never express. */
class PartitionedTableSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  private def mk(name: String, cols: String, partBy: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.pt")
    spark.sql(s"DROP TABLE IF EXISTS bronze.pt.$name")
    spark.sql(s"CREATE TABLE bronze.pt.$name ($cols) USING parquet " +
      s"PARTITIONED BY ($partBy)")
    bronzeCatalog.tableDir(Seq("pt"), name)
  }

  private def plannedFiles(df: DataFrame): Seq[String] = {
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
        case b: BatchScanExec =>
          shim.scanInputFiles(b.scan).getOrElse(Seq.empty)
        case other => other.children.flatMap(scan)
      }
    scan(df.queryExecution.executedPlan)
  }

  test("bucket(8, id): fanout writes single-bucket files; equality prunes") {
    val dir = mk("bkt", "id BIGINT, v DOUBLE", "bucket(8, id)")
    spark.sql("INSERT INTO bronze.pt.bkt " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(400)")
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.nonEmpty)
    // every file carries exactly one bucket value
    assert(entries.forall(_.parts.contains("bucket_id")))
    val buckets = entries.map(_.parts("bucket_id")).distinct
    assert(buckets.size > 1, s"only buckets $buckets — no fanout?")
    // files within one bucket: id stats are useless (each bucket
    // spans the whole id range) — ONLY the tuple can prune equality
    val total = entries.size
    val q = spark.table("bronze.pt.bkt").filter(col("id") === 123)
    val expected = BronzePartitioning.bucketOf(123L, 8).toString
    val matching = entries.count(_.parts("bucket_id") == expected)
    assert(plannedFiles(q).size <= matching,
      s"planned ${plannedFiles(q).size} files; bucket $expected has " +
        s"only $matching of $total")
    assert(plannedFiles(q).size < total)
    assert(q.count() == 1)
    // IN-lists prune to the union of their buckets
    val in = spark.table("bronze.pt.bkt")
      .filter(col("id").isin(5L, 77L, 123L))
    assert(plannedFiles(in).size < total)
    assert(in.count() == 3)
  }

  test("days(ts): one epoch-day per file; time ranges prune") {
    val dir = mk("byday", "ev BIGINT, ts TIMESTAMP", "days(ts)")
    spark.sql("INSERT INTO bronze.pt.byday SELECT id, " +
      "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-03-01 00:00:00') " +
      "FROM range(96)") // 4 days × 24 hours
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.forall(_.parts.contains("days_ts")))
    assert(entries.map(_.parts("days_ts")).distinct.size == 4)
    val total = entries.size
    val q = spark.table("bronze.pt.byday")
      .filter(col("ts") >= lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(plannedFiles(q).size < total)
    assert(q.count() == 48)
    val day = spark.table("bronze.pt.byday")
      .filter(col("ts") === lit("2024-03-02 05:00:00").cast("timestamp"))
    assert(plannedFiles(day).size <= entries.count(_.parts("days_ts") ==
      java.time.LocalDate.parse("2024-03-02").toEpochDay.toString))
    assert(day.count() == 1)
  }

  test("identity(cat): value files + null partition; IS NULL prunes") {
    val dir = mk("ident", "id BIGINT, cat STRING", "cat")
    spark.sql("INSERT INTO bronze.pt.ident SELECT id, " +
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('c', id % 3) END " +
      "FROM range(210)")
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.forall(_.parts.contains("cat")))
    // c0/c1/c2 + the null partition
    assert(entries.map(_.parts("cat")).distinct.sorted ==
      Seq("c0", "c1", "c2", "null"))
    val total = entries.size
    val eq = spark.table("bronze.pt.ident").filter(col("cat") === "c1")
    assert(plannedFiles(eq).size < total)
    // id%3==1 (70 ids) minus the ones id%7==0 also nulls (id≡7 mod 21)
    assert(eq.count() == 60)
    val nul = spark.table("bronze.pt.ident").filter(col("cat").isNull)
    assert(plannedFiles(nul).size < total)
    assert(nul.count() == 30)
    assert(spark.table("bronze.pt.ident").count() == 210)
  }

  test("row-level DELETE keeps tuples; OPTIMIZE compacts within buckets") {
    val dir = mk("rl", "id BIGINT, v DOUBLE", "bucket(4, id)")
    (0 until 3).foreach { _ =>
      spark.sql("INSERT INTO bronze.pt.rl " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    }
    spark.sql("DELETE FROM bronze.pt.rl WHERE id >= 0 AND v < 10.0")
    val afterDelete = SnapshotLog.current(dir).get.entries
    // rewritten files re-fanned out: every live file still has a tuple
    assert(afterDelete.forall(_.parts.contains("bucket_id")))
    assert(spark.table("bronze.pt.rl").count() == 270)
    // compaction must not merge across buckets
    bronzeCatalog.optimizeTable(Seq("pt"), "rl", 1L << 30)
    val compacted = SnapshotLog.current(dir).get.entries
    assert(compacted.forall(_.parts.contains("bucket_id")))
    assert(compacted.map(_.parts("bucket_id")).distinct.size == 4)
    assert(spark.table("bronze.pt.rl").count() == 270)
    // pruning still live on the compacted layout
    val q = spark.table("bronze.pt.rl").filter(col("id") === 55)
    assert(plannedFiles(q).size < compacted.size)
    assert(q.count() == 3)
  }

  test("partitions metadata table: live rows per partition, MOR-aware") {
    val dir = mk("ptmeta", "id BIGINT, cat STRING", "cat")
    spark.sql("INSERT INTO bronze.pt.ptmeta SELECT id, " +
      "concat('c', id % 3) FROM range(300)")
    val before = graft.catalog.BronzeMetaTables.partitions(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(before == Map("cat=c0" -> 100L, "cat=c1" -> 100L, "cat=c2" -> 100L))
    // a MOR position delete must shrink the LIVE count of exactly c1
    spark.sql("DELETE FROM bronze.pt.ptmeta WHERE cat = 'c1' AND id < 30")
    val after = graft.catalog.BronzeMetaTables.partitions(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(after("cat=c0") == 100L && after("cat=c2") == 100L)
    assert(after("cat=c1") == 90L, s"got $after")
    // totals agree with what a reader sees
    assert(after.values.sum == spark.table("bronze.pt.ptmeta").count())
    // n_files + bytes populated for every partition
    graft.catalog.BronzeMetaTables.partitions(spark, dir).collect()
      .foreach { r =>
        assert(r.getLong(1) >= 1L && r.getLong(3) > 0L)
      }
  }

  test("partition columns are evolution-frozen; bad transforms fail DDL") {
    mk("frozen", "id BIGINT, cat STRING", "cat")
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE bronze.pt.frozen RENAME COLUMN cat TO cat2")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE bronze.pt.frozen DROP COLUMN cat")
    }
    // non-partition columns still evolve
    spark.sql("ALTER TABLE bronze.pt.frozen ADD COLUMN note STRING")
    intercept[Exception] {
      spark.sql("CREATE TABLE bronze.pt.badt (id BIGINT, v DOUBLE) " +
        "USING parquet PARTITIONED BY (truncate(4, id))")
    }
    intercept[Exception] { // float identity keys refused
      spark.sql("CREATE TABLE bronze.pt.badf (id BIGINT, v DOUBLE) " +
        "USING parquet PARTITIONED BY (v)")
    }
  }

  test("streaming writes to a partitioned table fan out too") {
    val dir = mk("strm", "id BIGINT, v DOUBLE", "bucket(4, id)")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val enc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L until 100L: _*)
    val q = mem.toDF().selectExpr("value AS id", "CAST(value AS DOUBLE) AS v")
      .writeStream
      .option("checkpointLocation", tmpDir("ptstrm_ckpt"))
      .trigger(Trigger.AvailableNow())
      .toTable("bronze.pt.strm")
    q.awaitTermination(60000)
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.nonEmpty)
    assert(entries.forall(_.parts.contains("bucket_id")))
    assert(entries.map(_.parts("bucket_id")).distinct.size == 4)
    assert(spark.table("bronze.pt.strm").count() == 100)
  }
}
