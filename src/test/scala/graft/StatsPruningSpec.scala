package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

/** Manifest-stats file skipping on bronze catalog tables: per-file
  * min/max/null-count scraped into manifest entries at commit time
  * must SHRINK the planned file list under pushed predicates — before
  * any file is opened — while never changing an answer. Proven on the
  * actual planned scan (`shim.scanInputFiles`), through time travel,
  * OPTIMIZE, and RENAME COLUMN (id-based stats resolution). */
class StatsPruningSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def mkTable(name: String, cols: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.sp")
    spark.sql(s"DROP TABLE IF EXISTS bronze.sp.$name")
    spark.sql(s"CREATE TABLE bronze.sp.$name ($cols) USING parquet")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].tableDir(Seq("sp"), name)
  }

  /** Files the planned scan will actually read. */
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

  test("point and range predicates skip files by manifest min/max") {
    val dir = mkTable("minmax", "id BIGINT, v DOUBLE")
    // three appends with disjoint id ranges; 4 shuffle partitions →
    // several files per append, each with a narrow id subrange
    Seq(0, 1000, 2000).foreach { base =>
      spark.sql(s"INSERT INTO bronze.sp.minmax " +
        s"SELECT id + $base, CAST(id AS DOUBLE) FROM range(500)")
    }
    val total = SnapshotLog.current(dir).get.files.size
    assert(total >= 3, s"expected >=3 files, got $total")
    // every committed entry carries id stats
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.forall(_.stats.contains("id")))

    val point = spark.table("bronze.sp.minmax").filter(col("id") === 1250)
    assert(plannedFiles(point).size < total,
      s"point predicate planned all $total files")
    assert(point.count() == 1)

    val range = spark.table("bronze.sp.minmax")
      .filter(col("id") >= 2100 && col("id") < 2200)
    assert(plannedFiles(range).size < total)
    assert(range.count() == 100)

    // a predicate matching NOTHING plans zero files
    val none = spark.table("bronze.sp.minmax").filter(col("id") === 99999)
    assert(plannedFiles(none).isEmpty,
      s"impossible predicate planned ${plannedFiles(none).size} files")
    assert(none.count() == 0)

    // double-typed bounds prune too
    val dbl = spark.table("bronze.sp.minmax").filter(col("v") > 1e9)
    assert(plannedFiles(dbl).isEmpty)
  }

  test("string equality and IS NULL prune via utf8 bounds / null counts") {
    val dir = mkTable("strs", "id BIGINT, tag STRING")
    spark.sql("INSERT INTO bronze.sp.strs " +
      "SELECT id, concat('aa-', id) FROM range(100)")
    spark.sql("INSERT INTO bronze.sp.strs " +
      "SELECT id + 100, concat('zz-', id) FROM range(100)")
    val total = SnapshotLog.current(dir).get.files.size
    val q = spark.table("bronze.sp.strs").filter(col("tag") === "zz-7")
    assert(plannedFiles(q).size < total)
    assert(q.count() == 1)
    // no nulls anywhere: IS NULL plans zero files
    val isNull = spark.table("bronze.sp.strs").filter(col("tag").isNull)
    assert(plannedFiles(isNull).isEmpty)
    assert(isNull.count() == 0)
    // an all-null append: IS NOT NULL skips its files
    spark.sql("INSERT INTO bronze.sp.strs " +
      "SELECT id + 200, CAST(NULL AS STRING) FROM range(50)")
    val total2 = SnapshotLog.current(dir).get.files.size
    val notNull = spark.table("bronze.sp.strs").filter(col("tag").isNotNull)
    assert(plannedFiles(notNull).size < total2)
    assert(notNull.count() == 200)
    // value predicates also skip the all-null files
    val eq = spark.table("bronze.sp.strs").filter(col("tag") === "aa-3")
    assert(plannedFiles(eq).size < total)
    assert(eq.count() == 1)
  }

  test("dates prune; pruning holds through VERSION AS OF and OPTIMIZE") {
    val dir = mkTable("dated", "id BIGINT, d DATE")
    spark.sql("INSERT INTO bronze.sp.dated " +
      "SELECT id, DATE '1996-06-15' FROM range(100)")
    spark.sql("INSERT INTO bronze.sp.dated " +
      "SELECT id + 100, DATE '1998-03-01' FROM range(100)")
    val total = SnapshotLog.current(dir).get.files.size
    val q = spark.table("bronze.sp.dated")
      .filter(col("d") >= lit("1997-01-01").cast("date"))
    assert(plannedFiles(q).size < total)
    assert(q.count() == 100)

    // OPTIMIZE rewrites files; the replace snapshot's entries carry
    // freshly scraped stats, so pruning still applies to the compacted
    // layout — and VERSION AS OF the pre-compaction snapshot prunes
    // with the OLD entries
    val curV = SnapshotLog.currentVersion(dir).get
    SnapshotLog.optimize(spark, dir, 16L) // tiny target: no bin merges all
    val post = spark.table("bronze.sp.dated")
      .filter(col("d") < lit("1997-01-01").cast("date"))
    assert(post.count() == 100)
    val tt = spark.sql(
      s"SELECT * FROM bronze.sp.dated VERSION AS OF $curV")
      .filter(col("d") < lit("1997-01-01").cast("date"))
    assert(plannedFiles(tt).size < total)
    assert(tt.count() == 100)
  }

  test("stats survive RENAME COLUMN (field-id resolution)") {
    val dir = mkTable("renamed", "id BIGINT, amount BIGINT")
    spark.sql("INSERT INTO bronze.sp.renamed " +
      "SELECT id, id * 10 FROM range(100)")
    spark.sql("INSERT INTO bronze.sp.renamed " +
      "SELECT id + 100, (id + 100) * 10 FROM range(100)")
    spark.sql("ALTER TABLE bronze.sp.renamed RENAME COLUMN amount TO amt")
    val total = SnapshotLog.current(dir).get.files.size
    // filter on the NEW name must still prune files whose stats were
    // recorded under the old name — resolution is by parquet field id
    val q = spark.table("bronze.sp.renamed").filter(col("amt") >= 1500)
    assert(plannedFiles(q).size < total,
      "rename broke stats resolution: no files pruned")
    assert(q.count() == 50)
    assert(spark.table("bronze.sp.renamed")
      .filter(col("amt") < 0).count() == 0)
  }

  test("pruning never fires on filters stats cannot decide") {
    val dir = mkTable("safe", "id BIGINT, tag STRING")
    spark.sql("INSERT INTO bronze.sp.safe " +
      "SELECT id, concat('t', id % 3) FROM range(90)")
    val total = SnapshotLog.current(dir).get.files.size
    // a non-translatable / non-boundable predicate keeps every file
    val q = spark.table("bronze.sp.safe")
      .filter(length(col("tag")) === 2)
    assert(plannedFiles(q).size == total)
    assert(q.count() == 90)
  }
}
