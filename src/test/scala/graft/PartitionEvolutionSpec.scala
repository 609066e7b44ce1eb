package graft

import graft.catalog.{BronzePartitioning, SnapshotLog}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

/** Partition-spec evolution (Iceberg's `update_partition_spec`):
  * mixed-era files coexist, each pruned by the transforms of the spec
  * that wrote it; a re-parameterized bucket gets a fresh key
  * generation so old and new tuple values are never compared (the one
  * comparison that could prune wrongly); new writes fan out under the
  * new spec. */
class PartitionEvolutionSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def cat: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  /** Files the planned scan will actually read (stats/tuple pruning
    * proof at the plan level). */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scan(a.executedPlan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          shim.scanInputFiles(b.scan).getOrElse(Seq.empty)
        case other => other.children.flatMap(scan)
      }
    scan(df.queryExecution.executedPlan)
  }

  test("bucket width change: both eras prune with their own spec") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.pe")
    spark.sql("DROP TABLE IF EXISTS bronze.pe.evo")
    spark.sql("CREATE TABLE bronze.pe.evo (id BIGINT, v DOUBLE) " +
      "USING parquet PARTITIONED BY (bucket(4, id))")
    val dir = cat.tableDir(Seq("pe"), "evo")
    spark.sql("INSERT INTO bronze.pe.evo " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(400)")
    val era1 = SnapshotLog.current(dir).get.entries
    assert(era1.forall(_.parts.contains("bucket_id")))

    // evolve bucket(4) -> bucket(8): generation bump on the key
    cat.evolvePartitionSpec(Seq("pe"), "evo",
      Array(Expressions.bucket(8, "id")))
    assert(SnapshotLog.current(dir).get.operation == "alter")
    spark.sql("INSERT INTO bronze.pe.evo " +
      "SELECT id + 400, CAST(id AS DOUBLE) FROM range(400)")
    val all = SnapshotLog.current(dir).get.entries
    val era2 = all.filterNot(e => era1.exists(_.name == e.name))
    assert(era2.nonEmpty && era2.forall(_.parts.contains("bucket_id@1")),
      s"era2 tuples: ${era2.map(_.parts)}")
    assert(era2.map(_.parts("bucket_id@1")).distinct.size == 8)

    // answers correct across the mix
    assert(spark.table("bronze.pe.evo").count() == 800)
    val hit = spark.table("bronze.pe.evo").filter(col("id") === 123)
    assert(hit.count() == 1)
    val hit2 = spark.table("bronze.pe.evo").filter(col("id") === 567)
    assert(hit2.count() == 1)

    // pruning: stats min/max already prune id-ranges here, so prove
    // BUCKET pruning specifically — an id-equality plans at most one
    // era-1 bucket (1/4 of era-1 files) and one era-2 bucket (1/8 of
    // era-2 files); crucially it never drops a file that HOLDS the row
    val planned = plannedFiles(hit).map(f =>
      java.nio.file.Paths.get(f).getFileName.toString).toSet
    val holder = all.find(e => e.stats.get("id").exists(s =>
      s.min.exists(_.toLong <= 123) && s.max.exists(_.toLong >= 123) &&
        e.parts.get("bucket_id").contains(
          BronzePartitioning.bucketOf(123L, 4).toString)))
    holder.foreach(h => assert(planned.contains(h.name),
      s"pruned away the holder file ${h.name}"))
    // era-2 files of non-matching NEW buckets are pruned
    val wrongEra2 = all.filter(e => e.parts.get("bucket_id@1").exists(
      _ != BronzePartitioning.bucketOf(567L, 8).toString))
    val planned2 = plannedFiles(hit2).map(f =>
      java.nio.file.Paths.get(f).getFileName.toString).toSet
    assert(wrongEra2.forall(e => !planned2.contains(e.name)),
      "era-2 files of non-matching buckets were not pruned")
  }

  test("adding days() partitioning to an unpartitioned table") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.pe")
    spark.sql("DROP TABLE IF EXISTS bronze.pe.late")
    spark.sql("CREATE TABLE bronze.pe.late (id BIGINT, d DATE) " +
      "USING parquet")
    val dir = cat.tableDir(Seq("pe"), "late")
    spark.sql("INSERT INTO bronze.pe.late " +
      "SELECT id, DATE '1996-06-15' FROM range(100)")
    cat.evolvePartitionSpec(Seq("pe"), "late",
      Array(Expressions.days("d")))
    spark.sql("INSERT INTO bronze.pe.late " +
      "SELECT id + 100, DATE '1998-03-01' + CAST(id % 3 AS INT) " +
      "FROM range(100)")
    val entries = SnapshotLog.current(dir).get.entries
    assert(entries.exists(_.parts.contains("days_d")))
    assert(spark.table("bronze.pe.late").count() == 200)
    val q = spark.table("bronze.pe.late")
      .filter(col("d") === lit("1998-03-02").cast("date"))
    assert(q.count() > 0)
    // new-era files of other days are pruned
    val planned = plannedFiles(q).map(f =>
      java.nio.file.Paths.get(f).getFileName.toString).toSet
    val otherDays = entries.filter(_.parts.get("days_d").exists(
      _ != java.time.LocalDate.parse("1998-03-02").toEpochDay.toString))
    assert(otherDays.nonEmpty)
    assert(otherDays.forall(e => !planned.contains(e.name)),
      "files of other days were not pruned")
  }

  test("re-adding the ORIGINAL bucket width reuses its generation") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.pe")
    spark.sql("DROP TABLE IF EXISTS bronze.pe.back")
    spark.sql("CREATE TABLE bronze.pe.back (id BIGINT, v DOUBLE) " +
      "USING parquet PARTITIONED BY (bucket(4, id))")
    val dir = cat.tableDir(Seq("pe"), "back")
    cat.evolvePartitionSpec(Seq("pe"), "back",
      Array(Expressions.bucket(8, "id")))
    cat.evolvePartitionSpec(Seq("pe"), "back",
      Array(Expressions.bucket(4, "id")))
    val active = BronzePartitioning.read(java.nio.file.Paths.get(dir))
    assert(active == Seq(BronzePartitioning.PartField("bucket", "id", 4, 0)),
      s"active: $active") // same width -> same comparable era key
    val all = BronzePartitioning.readAll(java.nio.file.Paths.get(dir))
    assert(all.exists(_.gen == 1), s"retired bucket(8) missing: $all")
  }

  test("retired partition columns cannot be renamed away") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.pe")
    spark.sql("DROP TABLE IF EXISTS bronze.pe.ret")
    spark.sql("CREATE TABLE bronze.pe.ret (id BIGINT, v DOUBLE) " +
      "USING parquet PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO bronze.pe.ret " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    // un-partition: bucket(4, id) RETIRES, but old files still prune
    // by their recorded bucket_id tuples — renaming id away (and
    // worse, renaming another column onto the freed name) would let
    // stale tuples prune the wrong files
    cat.evolvePartitionSpec(Seq("pe"), "ret", Array.empty)
    assert(BronzePartitioning.read(
      java.nio.file.Paths.get(cat.tableDir(Seq("pe"), "ret"))).isEmpty)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE bronze.pe.ret RENAME COLUMN id TO id2")
    }
    assert(e.getMessage.contains("partition column"),
      s"wrong refusal: ${e.getMessage}")
    // non-partition columns still rename freely
    spark.sql("ALTER TABLE bronze.pe.ret RENAME COLUMN v TO amount")
    assert(spark.table("bronze.pe.ret").columns.toSeq ==
      Seq("id", "amount"))
  }
}
