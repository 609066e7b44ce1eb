package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.functions._

/** Merge-on-read UPDATE / MERGE INTO (position deltas — Iceberg v2
  * delta writes via Spark's SupportsDelta): a MOR update/merge must
  * rewrite NO existing data file (old row versions retract through a
  * (file, pos) sidecar; new versions land as appended files), answer
  * identically to the copy-on-write path on the same statement, stay
  * time-travelable, feed the change feed retraction+insertion pairs,
  * route moved rows to the right partition tuples, and be purged by
  * OPTIMIZE back onto the vectorized scan path. */
class MorDeltaSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  private def mk(name: String, ddlTail: String = ""): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.delta")
    spark.sql(s"DROP TABLE IF EXISTS bronze.delta.$name")
    spark.sql(s"CREATE TABLE bronze.delta.$name " +
      s"(id BIGINT, grp STRING, v DOUBLE) USING parquet $ddlTail")
    bronzeCatalog.tableDir(Seq("delta"), name)
  }

  private def fill(name: String): Unit =
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO bronze.delta.$name " +
        s"SELECT id + ${b * 100}, CASE WHEN id % 2 = 0 THEN 'even' " +
        s"ELSE 'odd' END, CAST(id AS DOUBLE) FROM range(100)")
    }

  private def withMor[A](f: => A): A = {
    spark.conf.set(GraftConf.UpdateModeKey, "merge-on-read")
    spark.conf.set(GraftConf.MergeModeKey, "merge-on-read")
    try f finally {
      spark.conf.unset(GraftConf.UpdateModeKey)
      spark.conf.unset(GraftConf.MergeModeKey)
    }
  }

  test("MOR update: data files unchanged + sidecar + new-version files") {
    val dir = mk("upd")
    fill("upd")
    val before = SnapshotLog.current(dir).get
    withMor { spark.sql("UPDATE bronze.delta.upd SET v = v + 1000 " +
      "WHERE id >= 50 AND id < 150") }
    val after = SnapshotLog.current(dir).get
    assert(after.operation == "update")
    // every pre-statement data file SURVIVES (nothing rewritten)...
    assert(before.files.forall(after.files.contains),
      "MOR update rewrote a data file")
    // ...the old versions retract via sidecars on those files...
    val withDels = after.entries.filter(_.deletes.nonEmpty)
    assert(withDels.nonEmpty, "no position-delete sidecar attached")
    assert(withDels.forall(e => before.files.contains(e.name)))
    // ...and the new versions are appended files
    assert((after.files.toSet -- before.files).nonEmpty,
      "no new-version files appended")
    // answers: updated rows changed, others untouched, count stable
    val t = spark.table("bronze.delta.upd")
    assert(t.count() == 300)
    assert(t.filter(col("id") >= 50 && col("id") < 150 &&
      col("v") < 1000).count() == 0)
    // base sum = 3 × Σ(0..99); +1000 for each of the 100 updated rows
    assert(t.agg(sum("v")).head().getDouble(0) ==
      3.0 * (0 until 100).sum + 100 * 1000.0)
    // time travel: the pre-update version still reads old values
    assert(spark.sql("SELECT SUM(v) FROM bronze.delta.upd VERSION AS OF " +
      s"${before.version}").head().getDouble(0) ==
      3.0 * (0 until 100).sum)
  }

  test("MOR update/merge answers identical to COW on the same statements") {
    val dirM = mk("dmor"); val dirC = mk("dcow")
    Seq("dmor", "dcow").foreach(fill)
    def upd(t: String) = s"UPDATE bronze.delta.$t SET v = -v, " +
      "grp = 'neg' WHERE id % 13 = 3"
    withMor { spark.sql(upd("dmor")) }
    spark.sql(upd("dcow"))
    def merge(t: String) =
      s"""MERGE INTO bronze.delta.$t x
        |USING (SELECT id * 3 AS k, CAST(id AS DOUBLE) AS nv
        |       FROM range(120)) s
        |ON x.id = s.k
        |WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET v = s.nv * 10
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.k >= 300 THEN
        |  INSERT (id, grp, v) VALUES (s.k, 'new', s.nv)""".stripMargin
    withMor { spark.sql(merge("dmor")) }
    spark.sql(merge("dcow"))
    def digest(t: String): Seq[org.apache.spark.sql.Row] =
      spark.table(s"bronze.delta.$t").orderBy("id", "grp", "v")
        .collect().toSeq
    assert(digest("dmor") == digest("dcow"))
    // the mechanisms really differed: delta attached sidecars, COW
    // rewrote files without any
    assert(SnapshotLog.current(dirM).get.entries.exists(_.deletes.nonEmpty))
    assert(SnapshotLog.current(dirC).get.entries.forall(_.deletes.isEmpty))
    // MOR total work: appended only delta-scale files (no rewrite of
    // the three base appends)
    val mSnaps = SnapshotLog.versions(dirM)
    assert(SnapshotLog.read(dirM, mSnaps.max).operation == "merge")
  }

  test("MOR merge: CDC emits retraction+insertion, OPTIMIZE purges") {
    val dir = mk("cdc")
    fill("cdc")
    val v0 = SnapshotLog.currentVersion(dir).get
    withMor { spark.sql(
      """MERGE INTO bronze.delta.cdc t
        |USING (SELECT id * 10 AS k FROM range(20)) s
        |ON t.id = s.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + 0.5""".stripMargin) }
    val v1 = SnapshotLog.currentVersion(dir).get
    assert(v1 == v0 + 1)
    val feed = spark.read
      .option("startingVersion", v0.toString)
      .option("endingVersion", v1.toString)
      .table("bronze.delta.cdc.changes")
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 0,10,...,190 within [0,300) → 20 updates
    assert(byType.get("update_before").contains(20L), byType.toString)
    assert(byType.get("update_after").contains(20L), byType.toString)
    // net effect through retraction consumption = +10 (0.5 × 20)
    val net = feed.agg(sum(when(
      col("_change_type").isin("delete", "update_before"), -col("v"))
      .otherwise(col("v")))).head().getDouble(0)
    assert(math.abs(net - 10.0) < 1e-9, s"net=$net")
    // OPTIMIZE purges the sidecars; answers identical before/after
    val preOpt = spark.table("bronze.delta.cdc")
      .agg(sum("v"), count(lit(1))).head()
    bronzeCatalog.optimizeTable(Seq("delta"), "cdc", 1L << 30)
    assert(SnapshotLog.current(dir).get.entries.forall(_.deletes.isEmpty))
    val postOpt = spark.table("bronze.delta.cdc")
      .agg(sum("v"), count(lit(1))).head()
    assert(preOpt == postOpt)
  }

  test("MOR update on a partitioned table routes moved rows by tuple") {
    val dir = mk("part", "PARTITIONED BY (grp)")
    fill("part")
    val before = SnapshotLog.current(dir).get
    // moves rows ACROSS partition tuples (grp changes): the delta's
    // insert half must route through the fanout writer
    withMor { spark.sql("UPDATE bronze.delta.part SET grp = 'moved' " +
      "WHERE id < 30") }
    val after = SnapshotLog.current(dir).get
    assert(before.files.forall(after.files.contains))
    val newFiles = after.entries.filterNot(e => before.files.contains(e.name))
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(_.parts.get("grp").contains("moved")),
      s"new files carry wrong tuples: ${newFiles.map(_.parts)}")
    assert(spark.table("bronze.delta.part")
      .filter(col("grp") === "moved").count() == 30)
    assert(spark.table("bronze.delta.part").count() == 300)
    // tuple pruning still works across the delta snapshot: a grp
    // predicate must not read files of other tuples
    val pruned = spark.table("bronze.delta.part")
      .filter(col("grp") === "moved")
    assert(pruned.count() == 30)
  }

  test("MOR delta validates targets still live (concurrent rewrite)") {
    val dir = mk("conc")
    fill("conc")
    // compute a delta against the current snapshot, then have a
    // concurrent compaction rewrite every file before the commit:
    // the attach targets vanish and the commit must fail loudly
    val snap = SnapshotLog.current(dir).get
    bronzeCatalog.optimizeTable(Seq("delta"), "conc", 1L << 30)
    val ex = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitDelta(dir, "update",
        Map(snap.files.head -> Seq("del-bogus.parquet")), Seq.empty)
    }
    assert(ex.getMessage.contains("concurrent"))
  }

  test("untranslatable-predicate MOR DELETE rides the delta path") {
    val dir = mk("subq")
    fill("subq")
    val before = SnapshotLog.current(dir).get
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql(
      """DELETE FROM bronze.delta.subq WHERE id IN
        |(SELECT id * 7 FROM range(10))""".stripMargin)
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    val after = SnapshotLog.current(dir).get
    assert(after.operation == "delete")
    assert(after.files == before.files,
      "subquery MOR delete rewrote data files")
    assert(after.entries.exists(_.deletes.nonEmpty))
    assert(spark.table("bronze.delta.subq").count() == 300 - 10)
  }
}
