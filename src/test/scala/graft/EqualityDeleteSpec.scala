package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Equality deletes (Iceberg v2) + the streaming keyed-upsert sink:
  * each upsert epoch appends its rows and ONE equality-delete sidecar
  * retracting every EARLIER row with a matching key — O(changes)
  * written, zero target reads. Readers of the snapshot see
  * last-write-wins state; time travel sees the old rows; the change
  * feed emits update_before/update_after; OPTIMIZE purges the
  * sidecars back onto the plain vectorized path; rollback across an
  * upsert un-applies it. */
class EqualityDeleteSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def mk(name: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.eq")
    spark.sql(s"DROP TABLE IF EXISTS bronze.eq.$name")
    spark.sql(s"CREATE TABLE bronze.eq.$name " +
      "(id BIGINT, v DOUBLE) USING parquet")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].tableDir(Seq("eq"), name)
  }

  /** One keyed-upsert consumer: each `epoch(rows)` call adds the rows
    * to the shared memory source and runs the sink to completion from
    * the SAME checkpoint — a restartable upsert stream. */
  private final class Upserter(table: String) {
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    private val mem = MemoryStream[(Long, Double)]
    val ckpt = tmpDir("eq_ups_ckpt")
    def epoch(rows: Seq[(Long, Double)]): Unit = {
      mem.addData(rows: _*)
      val q = mem.toDF().toDF("id", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .option("upsertKeys", "id")
        .trigger(Trigger.AvailableNow())
        .toTable(table)
      q.awaitTermination(60000)
      // AvailableNow self-terminates, but deregistration from the
      // streams manager is async — a back-to-back restart can race
      // the "concurrently using checkpoint" guard
      var spins = 0
      while (spark.streams.active.exists(_.id == q.id) && spins < 600) {
        Thread.sleep(100); spins += 1
      }
    }
  }

  test("streaming upsert: last-write-wins state, O(changes) writes") {
    val dir = mk("ups")
    spark.sql("INSERT INTO bronze.eq.ups SELECT id, 0.0 FROM range(10)")
    val v0 = SnapshotLog.current(dir).get
    val ups = new Upserter("bronze.eq.ups")

    // epoch 1: update keys 3..6, insert 10..11
    ups.epoch(Seq(3L -> 1.0, 4L -> 1.0, 5L -> 1.0, 6L -> 1.0,
      10L -> 1.0, 11L -> 1.0))
    val v1 = SnapshotLog.current(dir).get
    assert(v1.operation == "upsert")
    assert(v1.eqDeletes.size == 1, s"eqdels: ${v1.eqDeletes}")
    // the original data files were NOT rewritten
    assert(v0.files.forall(v1.files.contains),
      "upsert rewrote pre-existing files")
    // last-write-wins state
    val state1 = spark.table("bronze.eq.ups")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state1.size == 12, s"state: $state1")
    assert((3L to 6L).forall(k => state1(k) == 1.0))
    assert((0L to 2L).forall(k => state1(k) == 0.0))
    assert(state1(10L) == 1.0 && state1(11L) == 1.0)

    // time travel: the pre-upsert version still reads the old values
    val old = spark.sql(
      s"SELECT * FROM bronze.eq.ups VERSION AS OF ${v0.version}")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(old.size == 10 && old.values.forall(_ == 0.0))

    // epoch 2 (same source + checkpoint, new data): re-update 5,6,10
    ups.epoch(Seq(5L -> 2.0, 6L -> 2.0, 10L -> 2.0))
    val v2 = SnapshotLog.current(dir).get
    assert(v2.eqDeletes.size == 2)
    val state2 = spark.table("bronze.eq.ups")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state2.size == 12)
    assert(state2(5L) == 2.0 && state2(6L) == 2.0 && state2(10L) == 2.0)
    assert(state2(3L) == 1.0 && state2(4L) == 1.0 && state2(11L) == 1.0)
    assert(state2(0L) == 0.0)

    // projections that prune the key column still apply the deletes
    val sum = spark.table("bronze.eq.ups").agg(org.apache.spark.sql
      .functions.sum(col("v"))).head().getDouble(0)
    assert(math.abs(sum - (2.0 * 3 + 1.0 * 3 + 0.0)) < 1e-9, s"sum: $sum")
  }

  test("change feed emits update_before/update_after across an upsert") {
    val dir = mk("cdc")
    spark.sql("INSERT INTO bronze.eq.cdc SELECT id, 0.0 FROM range(5)")
    new Upserter("bronze.eq.cdc").epoch(Seq(1L -> 9.0, 2L -> 9.0, 7L -> 9.0))
    val v = SnapshotLog.current(dir).get.version
    val changes = spark.read.option("startingVersion", (v - 1).toString)
      .table("bronze.eq.cdc.changes")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(changes == Set(
      (1L, 0.0, "update_before", v), (2L, 0.0, "update_before", v),
      (1L, 9.0, "update_after", v), (2L, 9.0, "update_after", v),
      (7L, 9.0, "update_after", v)), s"changes: $changes")
  }

  test("OPTIMIZE purges equality deletes; state unchanged") {
    val dir = mk("opt")
    spark.sql("INSERT INTO bronze.eq.opt SELECT id, 0.0 FROM range(8)")
    new Upserter("bronze.eq.opt").epoch(Seq(2L -> 5.0, 3L -> 5.0))
    assert(SnapshotLog.current(dir).get.eqDeletes.nonEmpty)
    val before = spark.table("bronze.eq.opt")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
      .optimizeTable(Seq("eq"), "opt", 512L * 1024 * 1024)
    val snap = SnapshotLog.current(dir).get
    assert(snap.eqDeletes.isEmpty, "OPTIMIZE left equality deletes")
    assert(snap.entries.forall(_.deletes.isEmpty))
    val after = spark.table("bronze.eq.opt")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == before, s"compaction changed state: $after vs $before")
  }

  test("MOR key-equality DELETE takes the zero-read equality path") {
    val dir = mk("fast")
    spark.sql("INSERT INTO bronze.eq.fast SELECT id, 0.0 FROM range(10)")
    val v0 = SnapshotLog.current(dir).get
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try {
      spark.sql("DELETE FROM bronze.eq.fast WHERE id = 4")
      spark.sql("DELETE FROM bronze.eq.fast WHERE id IN (6, 7, 99)")
    } finally spark.conf.unset(GraftConf.DeleteModeKey)
    val snap = SnapshotLog.current(dir).get
    // zero files touched, zero position sidecars: pure equality
    // deletes (file set unchanged, two eqdel sidecars, no del- refs)
    assert(snap.files == v0.files, "equality DELETE changed the file set")
    assert(snap.eqDeletes.size == 2, s"eqdels: ${snap.eqDeletes}")
    assert(snap.entries.forall(_.deletes.isEmpty),
      "equality DELETE attached position sidecars")
    val left = spark.table("bronze.eq.fast")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(0L, 1L, 2L, 3L, 5L, 8L, 9L), s"left: $left")
    // the change feed emits exactly the deleted rows
    val v = snap.version
    val changes = spark.read.option("startingVersion", (v - 2).toString)
      .table("bronze.eq.fast.changes")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(changes == Set((4L, "delete"), (6L, "delete"), (7L, "delete")),
      s"changes: $changes")
    // a mixed predicate (range) still takes the position path
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql("DELETE FROM bronze.eq.fast WHERE id >= 8")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    val snap2 = SnapshotLog.current(dir).get
    assert(snap2.entries.exists(_.deletes.nonEmpty),
      "range DELETE should have written position sidecars")
    assert(spark.table("bronze.eq.fast").count() == 5)
  }

  test("upsert into a partitioned table fans out and prunes") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS bronze.eq.part")
    spark.sql("CREATE TABLE bronze.eq.part (id BIGINT, v DOUBLE) " +
      "USING parquet PARTITIONED BY (bucket(4, id))")
    val dir = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].tableDir(Seq("eq"), "part")
    spark.sql("INSERT INTO bronze.eq.part SELECT id, 0.0 FROM range(100)")
    new Upserter("bronze.eq.part").epoch(Seq(10L -> 9.0, 55L -> 9.0))
    // the upsert's inserts rode the fanout writer: new entries carry
    // bucket tuples, so tuple pruning works on the upserted table
    val snap = SnapshotLog.current(dir).get
    assert(snap.eqDeletes.size == 1)
    assert(snap.entries.forall(_.parts.contains("bucket_id")),
      s"missing tuples: ${snap.entries.filter(_.parts.isEmpty).map(_.name)}")
    assert(spark.table("bronze.eq.part").filter(col("id") === 10)
      .head().getDouble(1) == 9.0)
    assert(spark.table("bronze.eq.part").count() == 100)
  }

  test("crashed upsert epoch replays exactly-once") {
    val dir = mk("crash")
    spark.sql("INSERT INTO bronze.eq.crash SELECT id, 0.0 FROM range(6)")
    val ups = new Upserter("bronze.eq.crash")
    ups.epoch(Seq(2L -> 5.0, 3L -> 5.0, 9L -> 5.0))
    val committed = SnapshotLog.current(dir).get
    // simulate a crash BETWEEN the table's snapshot commit and the
    // checkpoint commit: drop the newest checkpoint commit marker so
    // the restarted query replays the epoch against a table that
    // already holds the crashed attempt's snapshot
    val commits = java.nio.file.Paths.get(ups.ckpt, "commits")
    val latest = {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.list(commits)
      try st.iterator().asScala.toSeq
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      finally st.close()
    }
    java.nio.file.Files.delete(latest)
    // the local checkpoint FS keeps a checksum sibling; a stale one
    // makes the replayed commit write throw FileAlreadyExists
    java.nio.file.Files.deleteIfExists(
      latest.resolveSibling("." + latest.getFileName + ".crc"))
    ups.epoch(Seq.empty) // restart: replays the uncommitted epoch
    val replayed = SnapshotLog.current(dir).get
    assert(replayed.version > committed.version, "replay committed nothing")
    // exactly-once STATE: the crashed attempt's files were retired by
    // the replay's manifest swap — no duplicated rows, no lost update
    val state = spark.table("bronze.eq.crash")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == Map(0L -> 0.0, 1L -> 0.0, 2L -> 5.0, 3L -> 5.0,
      4L -> 0.0, 5L -> 0.0, 9L -> 5.0), s"state after replay: $state")
    assert(spark.table("bronze.eq.crash").count() == 7,
      "replayed epoch duplicated rows")
  }

  test("streaming read crosses upserts; vacuum reaps purged sidecars") {
    val dir = mk("life")
    spark.sql("INSERT INTO bronze.eq.life SELECT id, 0.0 FROM range(4)")
    new Upserter("bronze.eq.life").epoch(Seq(1L -> 9.0, 7L -> 9.0))
    // streaming read from v0: appended row VERSIONS only (upserts are
    // appends to an incremental reader; retractions ride the change
    // feed) — and the stream sails across the upsert snapshot
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    val q = spark.readStream.option("startingVersion", "0")
      .table("bronze.eq.life")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add((r.getLong(0), r.getDouble(1))))
      }
      .option("checkpointLocation", tmpDir("eq_life_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    val rows = seen.asScala.toSet
    assert(rows == Set(0L -> 0.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0,
      1L -> 9.0, 7L -> 9.0), s"stream saw: $rows")

    // lifecycle: sidecar referenced -> vacuum keeps it; OPTIMIZE
    // purges the reference -> vacuum (expiry + zero grace) reaps it
    val sidecar = SnapshotLog.current(dir).get.eqDeletes.head.name
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, sidecar)), "vacuum reaped a LIVE sidecar")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
      .optimizeTable(Seq("eq"), "life", 512L * 1024 * 1024)
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, sidecar)),
      "vacuum kept a purged, expired sidecar")
    val state = spark.table("bronze.eq.life")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == Map(0L -> 0.0, 1L -> 9.0, 2L -> 0.0, 3L -> 0.0,
      7L -> 9.0), s"state after vacuum: $state")
  }

  test("renaming an equality-key column is refused until OPTIMIZE") {
    val dir = mk("ren")
    spark.sql("INSERT INTO bronze.eq.ren SELECT id, 0.0 FROM range(5)")
    new Upserter("bronze.eq.ren").epoch(Seq(1L -> 9.0))
    // the sidecar keys on `id` by name — a rename would silently
    // resurrect the deleted row; must refuse loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE bronze.eq.ren RENAME COLUMN id TO ident")
    }
    assert(e.getMessage.contains("equality-delete key"),
      s"wrong refusal: ${e.getMessage}")
    // non-key columns still rename; after OPTIMIZE the key renames too
    spark.sql("ALTER TABLE bronze.eq.ren RENAME COLUMN v TO amount")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
      .optimizeTable(Seq("eq"), "ren", 512L * 1024 * 1024)
    assert(SnapshotLog.current(dir).get.eqDeletes.isEmpty)
    spark.sql("ALTER TABLE bronze.eq.ren RENAME COLUMN id TO ident")
    val state = spark.table("bronze.eq.ren")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == Map(0L -> 0.0, 1L -> 9.0, 2L -> 0.0, 3L -> 0.0,
      4L -> 0.0), s"state: $state")
  }

  /** NET changelog deltas of versions in (from, to]: +1 per
    * insert/update_after, -1 per delete/update_before, zero-sum rows
    * (carryovers) dropped — the consumption contract the class doc
    * promises reproduces state deltas exactly. */
  private def netChanges(table: String, from: Long,
      to: Long): Map[(Long, Double), Long] =
    spark.read.option("startingVersion", from.toString)
      .option("endingVersion", to.toString)
      .table(s"$table.changes")
      .collect()
      .map { r =>
        val sign = r.getString(2) match {
          case "insert" | "update_after" => 1L
          case "delete" | "update_before" => -1L
        }
        ((r.getLong(0), r.getDouble(1)), sign)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)

  test("change feed nets exactly across COW delete + rollback over upsert") {
    val dir = mk("net")
    // ONE data file so the upsert-retracted rows share it with id=3 —
    // the regression shape: a later COW rewrite of that file must not
    // re-retract (or, restored by rollback, re-insert) eq-deleted rows
    spark.sql(
      "INSERT INTO bronze.eq.net SELECT id, 0.0 FROM range(0, 6, 1, 1)")
    new Upserter("bronze.eq.net").epoch(Seq(1L -> 7.0, 2L -> 7.0))
    val vUps = SnapshotLog.current(dir).get.version
    spark.sql("DELETE FROM bronze.eq.net WHERE id = 3")
    val vDel = SnapshotLog.current(dir).get.version
    assert(netChanges("bronze.eq.net", vDel - 1, vDel) ==
      Map((3L, 0.0) -> -1L),
      "COW delete re-retracted upsert-retracted rows of the rewritten file")
    // rollback to the upsert state restores the pre-delete file WITH
    // its era's live sidecar: only (3, 0.0) comes back
    SnapshotLog.rollback(dir, vUps)
    val vRb = SnapshotLog.current(dir).get.version
    assert(netChanges("bronze.eq.net", vRb - 1, vRb) ==
      Map((3L, 0.0) -> 1L),
      "rollback re-inserted eq-deleted rows of the restored file")
  }

  test("rollback detaching a position sidecar AND an eq sidecar nets once") {
    // the double-emit shape: row (3, 0.0) is covered by BOTH a
    // position sidecar (MOR delete) and an equality sidecar (upsert of
    // key 3); one rollback commit detaches the former and removes the
    // latter. The re-insert is owned by the position-delta partition —
    // the equality-delta partition must skip positions listed on
    // EITHER side of the commit, or the row inserts twice.
    val dir = mk("dblins")
    spark.sql(
      "INSERT INTO bronze.eq.dblins SELECT id, 0.0 FROM range(0, 6, 1, 1)")
    val v0 = SnapshotLog.current(dir).get.version
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    // range predicate: a pure `id = 3` would take the EQUALITY fast
    // path — this test needs the POSITION sidecar shape
    try spark.sql("DELETE FROM bronze.eq.dblins WHERE id >= 3 AND id < 4")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    assert(SnapshotLog.current(dir).get.entries.exists(_.deletes.nonEmpty),
      "expected a position-delete sidecar")
    new Upserter("bronze.eq.dblins").epoch(Seq(3L -> 9.0))
    assert(SnapshotLog.current(dir).get.eqDeletes.nonEmpty)
    SnapshotLog.rollback(dir, v0)
    val vRb = SnapshotLog.current(dir).get.version
    // net across the rollback: the upsert's row version retracts, the
    // original row returns EXACTLY once
    assert(netChanges("bronze.eq.dblins", vRb - 1, vRb) ==
      Map((3L, 9.0) -> -1L, (3L, 0.0) -> 1L),
      "rollback double-emitted the row covered by both sidecar kinds")
    val state = spark.table("bronze.eq.dblins")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == (0L to 5L).map(_ -> 0.0).toMap, s"state: $state")
  }

  test("NaN upsert keys retract on the hash-probe scan path") {
    val dir = mk("nankey")
    spark.sql("DROP TABLE IF EXISTS bronze.eq.nankey")
    spark.sql("CREATE TABLE bronze.eq.nankey (k DOUBLE, n BIGINT) " +
      "USING parquet")
    spark.sql("""INSERT INTO bronze.eq.nankey VALUES
      (CAST('NaN' AS DOUBLE), 0), (1.5, 0), (-0.0, 0)""")
    // upsert keyed on the DOUBLE column, with a NaN and a +0.0 key:
    // the per-file readers probe a hash set of key tuples, where Seq
    // cooperative equality says NaN != NaN — without canonicalization
    // the NaN row never retracts at scan time while OPTIMIZE's SQL
    // `<=>` path retracts it, so a layout-only compaction would
    // change answers
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Double, Long)]
    mem.addData((Double.NaN, 1L), (0.0, 1L))
    val q = mem.toDF().toDF("k", "n").writeStream
      .option("checkpointLocation", tmpDir("nan_ckpt"))
      .option("upsertKeys", "k")
      .trigger(Trigger.AvailableNow())
      .toTable("bronze.eq.nankey")
    q.awaitTermination(60000)
    assert(SnapshotLog.current(dir).get.eqDeletes.nonEmpty)
    // NaN-safe comparison key (Scala tuple equality says NaN != NaN —
    // the very semantics under test)
    def state(): Seq[(Double, Long)] = spark.table("bronze.eq.nankey")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      .sortBy(t => (java.lang.Double.doubleToLongBits(t._1), t._2))
    def render(s: Seq[(Double, Long)]): Seq[(Long, Long)] =
      s.map(t => (java.lang.Double.doubleToLongBits(t._1), t._2))
    val before = state()
    assert(before.count(_._1.isNaN) == 1 &&
      before.find(_._1.isNaN).get._2 == 1L,
      s"NaN key did not retract on the hash-probe path: $before")
    // -0.0 key row must be retracted by the +0.0 upsert key too
    assert(before.count(t => t._1 == 0.0) == 1 &&
      before.find(t => t._1 == 0.0).get._2 == 1L, s"state: $before")
    assert(before.size == 3, s"state: $before")
    // the SQL <=> application path (OPTIMIZE) agrees — layout-only
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
      .optimizeTable(Seq("eq"), "nankey", 512L * 1024 * 1024)
    assert(render(state()) == render(before),
      "OPTIMIZE changed NaN/-0.0 key answers")
  }

  test("replayed upsert epoch's change feed nets to zero") {
    val dir = mk("netcrash")
    spark.sql("INSERT INTO bronze.eq.netcrash SELECT id, 0.0 FROM range(6)")
    val ups = new Upserter("bronze.eq.netcrash")
    ups.epoch(Seq(2L -> 5.0, 3L -> 5.0, 9L -> 5.0))
    val committed = SnapshotLog.current(dir).get
    val commits = java.nio.file.Paths.get(ups.ckpt, "commits")
    val latest = {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.list(commits)
      try st.iterator().asScala.toSeq
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      finally st.close()
    }
    java.nio.file.Files.delete(latest)
    java.nio.file.Files.deleteIfExists(
      latest.resolveSibling("." + latest.getFileName + ".crc"))
    ups.epoch(Seq.empty) // restart: replays the uncommitted epoch
    val replayed = SnapshotLog.current(dir).get
    assert(replayed.version > committed.version)
    // the replay's manifest swap changed NOTHING net: the first
    // attempt's files retract as update_before, the replacements land
    // as update_after, and they cancel — a consumer reading across
    // the crash sees the epoch exactly once
    assert(netChanges("bronze.eq.netcrash", committed.version,
      replayed.version).isEmpty,
      "replayed epoch double-counted in the change feed")
  }

  test("dropping an equality-key column is refused until OPTIMIZE") {
    val dir = mk("dropk")
    spark.sql("INSERT INTO bronze.eq.dropk SELECT id, 0.0 FROM range(5)")
    new Upserter("bronze.eq.dropk").epoch(Seq(1L -> 9.0))
    // a drop would leave the live sidecar keying on a column the MOR
    // read/OPTIMIZE paths can no longer resolve; must refuse loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE bronze.eq.dropk DROP COLUMN id")
    }
    assert(e.getMessage.contains("equality-delete key"),
      s"wrong refusal: ${e.getMessage}")
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
      .optimizeTable(Seq("eq"), "dropk", 512L * 1024 * 1024)
    spark.sql("ALTER TABLE bronze.eq.dropk DROP COLUMN id")
    assert(spark.table("bronze.eq.dropk").columns.toSeq == Seq("v"))
  }

  test("out-of-range key-equality DELETE skips the commit entirely") {
    val dir = mk("noop")
    spark.sql("INSERT INTO bronze.eq.noop SELECT id, 0.0 FROM range(10)")
    val v0 = SnapshotLog.current(dir).get.version
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try {
      // manifest stats prove no live file can hold these keys: a
      // sidecar would retract nothing yet demote every scan to the
      // per-file MOR path — the commit must be skipped
      spark.sql("DELETE FROM bronze.eq.noop WHERE id = 99")
      spark.sql("DELETE FROM bronze.eq.noop WHERE id IN (98, 99)")
      val snap = SnapshotLog.current(dir).get
      assert(snap.version == v0, "no-op equality DELETE committed")
      assert(snap.eqDeletes.isEmpty)
      // an in-range key still deletes (out-of-range ones ride along)
      spark.sql("DELETE FROM bronze.eq.noop WHERE id IN (4, 99)")
      assert(SnapshotLog.current(dir).get.eqDeletes.size == 1)
    } finally spark.conf.unset(GraftConf.DeleteModeKey)
    assert(spark.table("bronze.eq.noop").collect().map(_.getLong(0)).toSet ==
      (0L to 9L).toSet - 4L)
  }

  test("equality sidecars skip files their key ranges provably exclude") {
    val dir = mk("prune")
    // two commits -> files with DISJOINT id ranges in the manifest
    spark.sql("INSERT INTO bronze.eq.prune SELECT id, 0.0 FROM range(100)")
    spark.sql("INSERT INTO bronze.eq.prune " +
      "SELECT id + 100000, 0.0 FROM range(100)")
    // upsert touching only the LOW range
    new Upserter("bronze.eq.prune").epoch(Seq(5L -> 9.0, 7L -> 9.0))
    val snap = SnapshotLog.current(dir).get
    val sidecar = s"$dir/${snap.eqDeletes.head.name}"
    val schema = spark.table("bronze.eq.prune").schema
    // pre-upsert files split by whether their id range OVERLAPS the
    // key range [5, 7] — the inserts fan out into several files, each
    // holding a slice of the id space
    val (hit, miss) = snap.entries
      .filter(e => snap.eqDeletesFor(e).nonEmpty) // pre-upsert files
      .partition(_.stats.get("id").exists(s =>
        s.min.exists(_.toLong <= 7) && s.max.exists(_.toLong >= 5)))
    assert(hit.nonEmpty && miss.nonEmpty, s"bad split: ${snap.entries}")
    // overlapping files must probe the key set; every other file —
    // including the whole high-range commit — provably skips it
    hit.foreach(e => assert(
      graft.catalog.MorDeletes.eqMayApply(sidecar, e, schema),
      s"overlapping ${e.name} wrongly excluded"))
    miss.foreach(e => assert(
      !graft.catalog.MorDeletes.eqMayApply(sidecar, e, schema),
      s"${e.name} not excluded by stats"))
    // and answers are right with the refinement active
    val state = spark.table("bronze.eq.prune")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.size == 200)
    assert(state(5L) == 9.0 && state(7L) == 9.0 && state(6L) == 0.0)
    assert(state(100005L) == 0.0)
  }

  test("convert_equality_deletes trades key probes for positions") {
    val dir = mk("conv")
    spark.sql("INSERT INTO bronze.eq.conv SELECT id, 0.0 FROM range(10)")
    new Upserter("bronze.eq.conv").epoch(Seq(2L -> 5.0, 3L -> 5.0,
      12L -> 5.0))
    val before = SnapshotLog.current(dir).get
    assert(before.eqDeletes.size == 1)
    val eqSidecar = before.eqDeletes.head.name
    val stateBefore = spark.table("bronze.eq.conv")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val cat = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
    assert(cat.convertEqualityDeletesTable(Seq("eq"), "conv") == ((1, 1)))
    val after = SnapshotLog.current(dir).get
    assert(after.operation == "replace")
    assert(after.eqDeletes.isEmpty, "conversion left equality sidecars")
    assert(after.files == before.files, "conversion touched a data file")
    // the retracted old versions of keys 2 and 3 became POSITIONS on
    // the pre-upsert files; the upsert's own files carry nothing
    // (their rows were never subject to their own sidecar)
    val preUpsert = SnapshotLog.read(dir, 1L).files.toSet
    val carrying = after.entries.filter(_.deletes.nonEmpty)
    assert(carrying.nonEmpty &&
      carrying.forall(e => preUpsert.contains(e.name)),
      s"position refs on wrong files: ${carrying.map(_.name)}")
    // answers identical; the layout-only replace emits NO change rows
    val stateAfter = spark.table("bronze.eq.conv")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(stateAfter == stateBefore)
    assert(spark.read.option("startingVersion", before.version.toString)
      .option("endingVersion", after.version.toString)
      .table("bronze.eq.conv.changes").count() == 0,
      "conversion leaked change rows")
    // time travel to the eq era still applies the key sets
    assert(spark.sql(s"SELECT * FROM bronze.eq.conv " +
      s"VERSION AS OF ${before.version}")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == stateBefore)
    // idempotent; the converted eq sidecar is reaped once expired
    assert(cat.convertEqualityDeletesTable(Seq("eq"), "conv") == ((0, 0)))
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, eqSidecar)),
      "vacuum kept the converted equality sidecar")
    assert(spark.table("bronze.eq.conv")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == stateBefore)
  }

  test("convert on a fresh-key-only upsert drops sidecars, writes nothing") {
    val dir = mk("convfresh")
    spark.sql(
      "INSERT INTO bronze.eq.convfresh SELECT id, 0.0 FROM range(10)")
    // a brand-new key: the sink writes the sidecar unconditionally,
    // but stats prove NO live file can hold it — conversion must drop
    // the sidecar without crashing on the empty position union
    new Upserter("bronze.eq.convfresh").epoch(Seq(100L -> 1.0))
    assert(SnapshotLog.current(dir).get.eqDeletes.size == 1)
    val cat = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
    assert(cat.convertEqualityDeletesTable(Seq("eq"), "convfresh")
      == ((1, 0)))
    val after = SnapshotLog.current(dir).get
    assert(after.eqDeletes.isEmpty)
    assert(after.entries.forall(_.deletes.isEmpty),
      "no-match conversion attached position sidecars")
    val state = spark.table("bronze.eq.convfresh")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.size == 11 && state(100L) == 1.0 && state(0L) == 0.0)
  }

  test("rollback across convert_equality_deletes nets zero in the feed") {
    val dir = mk("convrb")
    spark.sql(
      "INSERT INTO bronze.eq.convrb SELECT id, 0.0 FROM range(0, 6, 1, 1)")
    new Upserter("bronze.eq.convrb").epoch(Seq(1L -> 7.0, 2L -> 7.0))
    val vUps = SnapshotLog.current(dir).get.version
    val cat = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
    assert(cat.convertEqualityDeletesTable(Seq("eq"), "convrb") == ((1, 1)))
    // rollback detaches the conversion's position sidecar AND
    // restores the equality sidecar — live rows are unchanged, so the
    // change feed must net zero: the detached positions' rows are
    // exactly the restored key sets' victims and must not re-insert
    SnapshotLog.rollback(dir, vUps)
    val vRb = SnapshotLog.current(dir).get.version
    assert(netChanges("bronze.eq.convrb", vRb - 1, vRb).isEmpty,
      "rollback across conversion leaked change rows")
    val state = spark.table("bronze.eq.convrb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == Map(0L -> 0.0, 1L -> 7.0, 2L -> 7.0, 3L -> 0.0,
      4L -> 0.0, 5L -> 0.0), s"state after rollback: $state")
  }

  test("COW UPDATE writing a retracted key value stays visible") {
    val dir = mk("updkey")
    spark.sql(
      "INSERT INTO bronze.eq.updkey SELECT id, 0.0 FROM range(0, 6, 1, 1)")
    new Upserter("bronze.eq.updkey").epoch(Seq(1L -> 9.0))
    assert(SnapshotLog.current(dir).get.eqDeletes.size == 1)
    // the rewritten file carries a NEW version of key 1: it must get
    // a fresh data sequence (value-changing rewrites do NOT inherit
    // their inputs' seq), else the live {1} sidecar would retract the
    // freshly updated row
    spark.sql("UPDATE bronze.eq.updkey SET id = 1 WHERE id = 2")
    val rows = spark.table("bronze.eq.updkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows.size == 6, s"updated row vanished: $rows")
    assert(rows.count(_._1 == 1L) == 2, s"rows: $rows")
    assert(rows.toSet == Set((0L, 0.0), (1L, 9.0), (1L, 0.0), (3L, 0.0),
      (4L, 0.0), (5L, 0.0)), s"rows: $rows")
  }

  test("rollback across an upsert un-applies it; DELETE respects eqdels") {
    val dir = mk("rb")
    spark.sql("INSERT INTO bronze.eq.rb SELECT id, 0.0 FROM range(6)")
    val v0 = SnapshotLog.current(dir).get.version
    new Upserter("bronze.eq.rb").epoch(Seq(1L -> 7.0, 2L -> 7.0))
    // COW DELETE on the upserted table must not resurrect old rows
    spark.sql("DELETE FROM bronze.eq.rb WHERE id = 3")
    val state = spark.table("bronze.eq.rb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state == Map(0L -> 0.0, 1L -> 7.0, 2L -> 7.0, 4L -> 0.0,
      5L -> 0.0), s"state: $state")
    // rollback to before the upsert: old values return
    SnapshotLog.rollback(dir, v0)
    val rolled = spark.table("bronze.eq.rb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rolled.size == 6 && rolled.values.forall(_ == 0.0),
      s"rolled: $rolled")
  }

  test("metadata tables report NULL rows under live eq-deletes, exact after convert") {
    val dir = mk("meta")
    spark.sql("INSERT INTO bronze.eq.meta SELECT id, 0.0 FROM range(10)")
    new Upserter("bronze.eq.meta").epoch(Seq((3L, 1.0), (12L, 1.0)))
    // the live equality sidecar applies to the initial file: a
    // metadata-scale audit cannot know how many rows it retracts —
    // n_rows must be NULL there, never an overcount
    val files = graft.catalog.BronzeMetaTables.files(spark, dir).collect()
    assert(files.exists(_.isNullAt(1)),
      s"expected a NULL n_rows under a live eq-delete: ${files.toSeq}")
    val parts = graft.catalog.BronzeMetaTables.partitions(spark, dir)
      .collect()
    assert(parts.exists(_.isNullAt(2)), s"partitions: ${parts.toSeq}")
    assert(graft.catalog.BronzeMetaTables.history(spark, dir)
      .orderBy(col("version")).collect().last.isNullAt(3),
      "history must not overcount under a live eq-delete")
    // converting keys → positions restores exact metadata-scale counts
    graft.catalog.BronzeMor.convertEqualityDeletes(spark, dir)
    val after = graft.catalog.BronzeMetaTables.files(spark, dir).collect()
    assert(after.forall(!_.isNullAt(1)), s"after convert: ${after.toSeq}")
    val total = graft.catalog.BronzeMetaTables.partitions(spark, dir)
      .agg(sum(col("n_rows"))).head().getLong(0)
    assert(total == spark.table("bronze.eq.meta").count(),
      "partition totals must equal the reader's view after convert")
  }
}
