package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.functions._

/** Merge-on-read position deletes (Iceberg v2 delete files) on bronze
  * catalog tables: a MOR DELETE must change NO data files, attach one
  * (file, pos) sidecar, answer identically to the copy-on-write path
  * on the same change-set, stay time-travelable, feed the change feed
  * the exact deleted rows, and be purged by OPTIMIZE back onto the
  * vectorized scan path. */
class MorDeleteSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  private def mk(name: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.mor")
    spark.sql(s"DROP TABLE IF EXISTS bronze.mor.$name")
    spark.sql(s"CREATE TABLE bronze.mor.$name " +
      "(id BIGINT, v DOUBLE) USING parquet")
    bronzeCatalog.tableDir(Seq("mor"), name)
  }

  private def withMor[A](f: => A): A = {
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try f finally spark.conf.unset(GraftConf.DeleteModeKey)
  }

  test("MOR delete: file set unchanged, sidecar attached, reads skip") {
    val dir = mk("basic")
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO bronze.mor.basic " +
        s"SELECT id + ${b * 100}, CAST(id AS DOUBLE) FROM range(100)")
    }
    val before = SnapshotLog.current(dir).get
    withMor { spark.sql(
      "DELETE FROM bronze.mor.basic WHERE id >= 50 AND id < 150") }
    val after = SnapshotLog.current(dir).get
    // the delete rewrote NOTHING: same data files, one sidecar ref
    assert(after.files == before.files, "MOR delete changed the file set")
    assert(after.operation == "delete")
    val withDels = after.entries.filter(_.deletes.nonEmpty)
    assert(withDels.nonEmpty)
    assert(withDels.flatMap(_.deletes).distinct.size == 1,
      "one DELETE statement writes one sidecar")
    // reads skip the positions; old versions still see them
    assert(spark.table("bronze.mor.basic").count() == 200)
    assert(spark.table("bronze.mor.basic")
      .filter(col("id") >= 50 && col("id") < 150).count() == 0)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM bronze.mor.basic VERSION AS OF ${before.version}")
      .head().getLong(0) == 300)
    // a second, overlapping MOR delete only removes LIVE rows
    withMor { spark.sql(
      "DELETE FROM bronze.mor.basic WHERE id >= 100 AND id < 160") }
    assert(spark.table("bronze.mor.basic").count() == 190)
    // aggregation over the MOR snapshot is exact
    assert(spark.table("bronze.mor.basic")
      .agg(sum(col("id"))).head().getLong(0) ==
      (0L until 300L).filterNot(i => (i >= 50 && i < 150) ||
        (i >= 100 && i < 160)).sum)
    // a no-match MOR delete commits nothing
    val v = SnapshotLog.currentVersion(dir).get
    withMor { spark.sql("DELETE FROM bronze.mor.basic WHERE id > 99999") }
    assert(SnapshotLog.currentVersion(dir).get == v)
  }

  test("MOR answers are identical to COW on the same change-set") {
    val dirM = mk("asmor"); val dirC = mk("ascow")
    Seq("asmor", "ascow").foreach { t =>
      (0 until 3).foreach { b =>
        spark.sql(s"INSERT INTO bronze.mor.$t " +
          s"SELECT id + ${b * 100}, CAST(id % 7 AS DOUBLE) FROM range(100)")
      }
    }
    val del = "WHERE (id >= 40 AND id < 60) OR (id >= 250 AND id < 270)"
    withMor { spark.sql(s"DELETE FROM bronze.mor.asmor $del") }
    spark.sql(s"DELETE FROM bronze.mor.ascow $del")
    def digest(t: String): Seq[org.apache.spark.sql.Row] =
      spark.table(s"bronze.mor.$t").orderBy("id").collect().toSeq
    assert(digest("asmor") == digest("ascow"))
    // and the two paths really differed in mechanism
    assert(SnapshotLog.current(dirM).get.entries.exists(_.deletes.nonEmpty))
    assert(!SnapshotLog.current(dirC).get.entries.exists(_.deletes.nonEmpty))
  }

  test("COW ops over MOR-deleted files never resurrect rows") {
    mk("interop")
    spark.sql("INSERT INTO bronze.mor.interop " +
      "SELECT id, CAST(0 AS DOUBLE) FROM range(100)")
    withMor { spark.sql(
      "DELETE FROM bronze.mor.interop WHERE id >= 0 AND id < 30") }
    // a COW UPDATE rewrites the files — deleted rows must stay gone
    spark.sql("UPDATE bronze.mor.interop SET v = v + 1.0 WHERE id % 2 = 0")
    assert(spark.table("bronze.mor.interop").count() == 70)
    assert(spark.table("bronze.mor.interop")
      .filter(col("id") < 30).count() == 0)
    assert(spark.table("bronze.mor.interop")
      .filter(col("v") === 1.0).count() == 35)
    // a COW predicate DELETE over the same files: same invariant
    mk("interop2")
    spark.sql("INSERT INTO bronze.mor.interop2 " +
      "SELECT id, CAST(0 AS DOUBLE) FROM range(100)")
    withMor { spark.sql(
      "DELETE FROM bronze.mor.interop2 WHERE id >= 0 AND id < 30") }
    spark.sql("DELETE FROM bronze.mor.interop2 WHERE id >= 90")
    assert(spark.table("bronze.mor.interop2").count() == 60)
    assert(spark.table("bronze.mor.interop2").agg(min("id"))
      .head().getLong(0) == 30)
  }

  test("OPTIMIZE purges sidecars; vacuum reaps them after retention") {
    val dir = mk("purge")
    (0 until 2).foreach { b =>
      spark.sql(s"INSERT INTO bronze.mor.purge " +
        s"SELECT id + ${b * 50}, CAST(id AS DOUBLE) FROM range(50)")
    }
    withMor { spark.sql(
      "DELETE FROM bronze.mor.purge WHERE id >= 20 AND id < 80") }
    assert(SnapshotLog.current(dir).get.entries.exists(_.deletes.nonEmpty))
    val (compacted, _) = bronzeCatalog.optimizeTable(Seq("mor"), "purge",
      1L << 30)
    assert(compacted > 0, "delete-carrying files must always compact")
    val cur = SnapshotLog.current(dir).get
    assert(cur.entries.forall(_.deletes.isEmpty),
      "compaction left sidecar refs")
    assert(spark.table("bronze.mor.purge").count() == 40)
    assert(spark.table("bronze.mor.purge")
      .filter(col("id") >= 20 && col("id") < 80).count() == 0)
    // after expiry the sidecar bytes are reaped
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def sidecarsOnDisk(): Seq[String] = {
      val s = Files.list(Paths.get(dir))
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("del-")).toSeq
      finally s.close()
    }
    assert(sidecarsOnDisk().nonEmpty)
    bronzeCatalog.vacuumTable(Seq("mor"), "purge", retainLast = 1)
    // grace period guards fresh files; force-age via a second vacuum
    // with zero grace through the SnapshotLog API
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    assert(sidecarsOnDisk().isEmpty, "vacuum left unreferenced sidecars")
  }

  test("rewrite_position_deletes merges sidecars, touches no data file") {
    val dir = mk("rpd")
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO bronze.mor.rpd " +
        s"SELECT id + ${b * 100}, CAST(id AS DOUBLE) FROM range(100)")
    }
    // three MOR deletes -> three sidecars, each attached to the files
    // it touches
    withMor {
      spark.sql("DELETE FROM bronze.mor.rpd WHERE id < 10")
      spark.sql("DELETE FROM bronze.mor.rpd WHERE id >= 110 AND id < 120")
      spark.sql("DELETE FROM bronze.mor.rpd WHERE id >= 250")
    }
    val before = SnapshotLog.current(dir).get
    val oldSidecars = before.entries.flatMap(_.deletes).distinct
    assert(oldSidecars.size == 3, s"sidecars: $oldSidecars")
    val stateBefore = spark.table("bronze.mor.rpd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    assert(stateBefore.size == 230)

    val (merged, written) =
      bronzeCatalog.rewritePositionDeletesTable(Seq("mor"), "rpd")
    assert((merged, written) == (3, 1), s"(merged, written)")
    val after = SnapshotLog.current(dir).get
    assert(after.operation == "replace")
    assert(after.files == before.files,
      "sidecar compaction touched a data file")
    assert(after.entries.flatMap(_.deletes).distinct.size == 1,
      "sidecars did not merge to one")
    assert(after.entries.filter(_.deletes.nonEmpty).map(_.name).toSet ==
      before.entries.filter(_.deletes.nonEmpty).map(_.name).toSet,
      "compaction changed which entries carry deletes")
    // answers identical; the layout-only replace emits NO change rows
    val stateAfter = spark.table("bronze.mor.rpd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    assert(stateAfter == stateBefore)
    assert(spark.read.option("startingVersion", before.version.toString)
      .option("endingVersion", after.version.toString)
      .table("bronze.mor.rpd.changes").count() == 0,
      "sidecar compaction leaked change rows")
    // idempotent: a compact table is a no-op
    assert(bronzeCatalog.rewritePositionDeletesTable(Seq("mor"), "rpd")
      == (0, 0))
    // old sidecars are unreferenced -> vacuum reaps them; the merged
    // one is live and survives
    import java.nio.file.{Files, Paths}
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    oldSidecars.foreach(s => assert(!Files.exists(Paths.get(dir, s)),
      s"vacuum kept the merged-away sidecar $s"))
    val mergedRef = after.entries.flatMap(_.deletes).distinct.head
    assert(Files.exists(Paths.get(dir, mergedRef)))
    assert(spark.table("bronze.mor.rpd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
      == stateBefore)
  }

  test("accumulated sidecars: 12 deletes, 12 sidecars, one compaction") {
    val dir = mk("accum")
    spark.sql("INSERT INTO bronze.mor.accum " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1200)")
    // the production shape: a retention job trickling small deletes —
    // every statement adds a sidecar, refs pile up per entry
    withMor {
      (0 until 12).foreach { i =>
        spark.sql(s"DELETE FROM bronze.mor.accum " +
          s"WHERE id >= ${i * 100} AND id < ${i * 100 + 3}")
      }
    }
    val snap = SnapshotLog.current(dir).get
    assert(snap.entries.flatMap(_.deletes).distinct.size == 12,
      "expected one sidecar per DELETE")
    val expect = (0L until 1200L).filterNot(id => id % 100 < 3).toSet
    assert(spark.table("bronze.mor.accum")
      .collect().map(_.getLong(0)).toSet == expect)
    val (merged, written) =
      bronzeCatalog.rewritePositionDeletesTable(Seq("mor"), "accum")
    assert((merged, written) == (12, 1))
    val after = SnapshotLog.current(dir).get
    assert(after.entries.flatMap(_.deletes).distinct.size == 1)
    assert(after.entries.filter(_.deletes.nonEmpty)
      .forall(_.deletes.size == 1), "entries still carry multiple refs")
    assert(spark.table("bronze.mor.accum")
      .collect().map(_.getLong(0)).toSet == expect)
    // and OPTIMIZE still purges everything afterwards
    bronzeCatalog.optimizeTable(Seq("mor"), "accum", 1L << 30)
    val opt = SnapshotLog.current(dir).get
    assert(opt.entries.forall(_.deletes.isEmpty))
    assert(spark.table("bronze.mor.accum")
      .collect().map(_.getLong(0)).toSet == expect)
  }

  test("negative zero: eq-key probe matches SQL equality across OPTIMIZE") {
    val dir = mk("negzero")
    spark.sql("INSERT INTO bronze.mor.negzero VALUES " +
      "(1, CAST('-0.0' AS DOUBLE)), (2, CAST('0.0' AS DOUBLE)), (3, 1.0)")
    // v = 0.0 is a pure equality -> the zero-read eq fast path; SQL
    // says -0.0 = 0.0, so BOTH zero rows must go — and the answer
    // must not change when OPTIMIZE re-applies the same sidecar
    // through SQL <=> instead of the reader's hash-set probe
    withMor { spark.sql("DELETE FROM bronze.mor.negzero WHERE v = 0.0") }
    assert(SnapshotLog.current(dir).get.eqDeletes.nonEmpty,
      "expected the equality fast path")
    assert(spark.table("bronze.mor.negzero")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    bronzeCatalog.optimizeTable(Seq("mor"), "negzero", 1L << 30)
    assert(spark.table("bronze.mor.negzero")
      .collect().map(_.getLong(0)).toSet == Set(3L),
      "layout-only OPTIMIZE changed answers")
  }

  test("nested-field MOR DELETE avoids the equality fast path") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS bronze.mor.nested")
    spark.sql("CREATE TABLE bronze.mor.nested " +
      "(id BIGINT, s STRUCT<k: BIGINT>) USING parquet")
    val dir = bronzeCatalog.tableDir(Seq("mor"), "nested")
    spark.sql("INSERT INTO bronze.mor.nested " +
      "SELECT id, named_struct('k', id % 3) FROM range(9)")
    // a nested ref can't become a sidecar key column; the statement
    // must still succeed (position path or group rewrite), not throw
    withMor { spark.sql("DELETE FROM bronze.mor.nested WHERE s.k = 1") }
    assert(spark.table("bronze.mor.nested").count() == 6)
    assert(SnapshotLog.current(dir).get.eqDeletes.isEmpty,
      "nested predicate must not write an equality sidecar")
  }

  test("rewrite commit refuses inputs that gained sidecars since the scan") {
    val dir = mk("race")
    spark.sql("INSERT INTO bronze.mor.race " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(0, 100, 1, 1)")
    val scanned = SnapshotLog.current(dir).get
    val f0 = scanned.files.head
    // a MOR delete lands AFTER the (simulated) rewrite scan
    withMor { spark.sql(
      "DELETE FROM bronze.mor.race WHERE id >= 10 AND id < 20") }
    // the rewriter's commit carries the delete refs it SCANNED (none);
    // the commit must refuse rather than resurrect the 10 rows through
    // a rewritten copy computed without the sidecar
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitRewrite(dir, "replace", Set(f0), Seq.empty,
        scannedDeletes = Map(f0 -> Seq.empty))
    }
    assert(spark.table("bronze.mor.race").count() == 90,
      "refused commit must leave the table untouched")
  }

  test("change feed emits exactly the MOR-deleted rows; rollback undoes") {
    val dir = mk("cdc")
    spark.sql("INSERT INTO bronze.mor.cdc " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    withMor { spark.sql(
      "DELETE FROM bronze.mor.cdc WHERE id >= 10 AND id < 25") }
    val delV = SnapshotLog.currentVersion(dir).get
    val changes = spark.read
      .option("startingVersion", (delV - 1).toString)
      .option("endingVersion", delV.toString)
      .table("bronze.mor.cdc.changes")
    val rows = changes.collect()
    assert(rows.length == 15)
    assert(rows.forall(_.getAs[String]("_change_type") == "delete"))
    assert(rows.map(_.getAs[Long]("id")).sorted.toSeq ==
      (10L until 25L).toSeq)
    // rollback across the MOR delete re-inserts the un-deleted rows
    bronzeCatalog.rollbackTable(Seq("mor"), "cdc", delV - 1)
    val rbV = SnapshotLog.currentVersion(dir).get
    assert(spark.table("bronze.mor.cdc").count() == 100)
    val rb = spark.read
      .option("startingVersion", (rbV - 1).toString)
      .option("endingVersion", rbV.toString)
      .table("bronze.mor.cdc.changes").collect()
    assert(rb.length == 15)
    assert(rb.forall(_.getAs[String]("_change_type") == "insert"))
    assert(rb.map(_.getAs[Long]("id")).sorted.toSeq == (10L until 25L).toSeq)
  }

  test("metadata tables report LIVE rows under MOR; incremental refuses") {
    val dir = mk("meta")
    spark.sql("INSERT INTO bronze.mor.meta " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(80)")
    withMor { spark.sql(
      "DELETE FROM bronze.mor.meta WHERE id >= 0 AND id < 30") }
    val hist = bronzeCatalog.historyTable(Seq("mor"), "meta").collect()
    assert(hist.find(_.getLong(0) == 1L).get.getLong(3) == 80L)
    assert(hist.find(_.getLong(0) == 2L).get.getLong(3) == 50L)
    val files = bronzeCatalog.filesTable(Seq("mor"), "meta").collect()
    assert(files.map(_.getLong(1)).sum == 50L)
    // incremental readers refuse to cross the delete snapshot (its
    // op is `delete`, MOR or COW alike)
    intercept[IllegalArgumentException] {
      SnapshotLog.appendedFilesBetween(dir, 0, 2)
    }
  }
}
