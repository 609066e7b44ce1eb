package graft

import graft.catalog.{BronzeBranches, SnapshotLog}
import org.apache.spark.sql.functions._

/** Branches + write-audit-publish: staged batches are durable and
  * auditable but invisible to main; a failed audit drops the branch
  * with main untouched; publish fast-forwards main atomically and
  * refuses when main advanced past the base; vacuum retains staged
  * files while the branch lives and reaps them after a drop. */
class BranchWapSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  private def mk(name: String): String = {
    warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS bronze.br")
    spark.sql(s"DROP TABLE IF EXISTS bronze.br.$name")
    spark.sql(s"CREATE TABLE bronze.br.$name " +
      "(id BIGINT, v DOUBLE) USING parquet")
    bronzeCatalog.tableDir(Seq("br"), name)
  }

  test("stage → audit-fail → drop: main never sees the bad batch") {
    val dir = mk("wap")
    spark.sql("INSERT INTO bronze.br.wap " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    val mainV = SnapshotLog.currentVersion(dir).get
    bronzeCatalog.createBranch(Seq("br"), "wap", "audit")
    // a poisoned batch: negative values
    bronzeCatalog.appendToBranch(Seq("br"), "wap", "audit",
      spark.range(100, 150).selectExpr("id", "CAST(-id AS DOUBLE) AS v"))
    // staged rows are ON the branch...
    val branchView = bronzeCatalog.readBranch(Seq("br"), "wap", "audit")
    assert(branchView.count() == 150)
    // ...and INVISIBLE on main
    assert(spark.table("bronze.br.wap").count() == 100)
    assert(SnapshotLog.currentVersion(dir).get == mainV)
    // the audit catches the poison; the branch is dropped
    val bad = branchView.filter(col("v") < 0).count()
    assert(bad == 50)
    assert(bronzeCatalog.dropBranch(Seq("br"), "wap", "audit"))
    assert(bronzeCatalog.branches(Seq("br"), "wap").isEmpty)
    assert(spark.table("bronze.br.wap").count() == 100)
    intercept[IllegalArgumentException] {
      bronzeCatalog.readBranch(Seq("br"), "wap", "audit")
    }
  }

  test("stage → audit-pass → publish: one atomic append on main") {
    val dir = mk("pub")
    spark.sql("INSERT INTO bronze.br.pub " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    bronzeCatalog.createBranch(Seq("br"), "pub", "stage")
    bronzeCatalog.appendToBranch(Seq("br"), "pub", "stage",
      spark.range(100, 160).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    bronzeCatalog.appendToBranch(Seq("br"), "pub", "stage",
      spark.range(160, 180).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    assert(bronzeCatalog.readBranch(Seq("br"), "pub", "stage")
      .filter(col("v") < 0).count() == 0) // audit passes
    bronzeCatalog.publishBranch(Seq("br"), "pub", "stage")
    assert(spark.table("bronze.br.pub").count() == 180)
    val cur = SnapshotLog.current(dir).get
    assert(cur.operation == "publish")
    // the branch is gone; the published snapshot is a pure append, so
    // incremental readers cross it like any append
    assert(bronzeCatalog.branches(Seq("br"), "pub").isEmpty)
    val delta = SnapshotLog.appendedFilesBetween(dir, 1, cur.version)
    assert(delta.nonEmpty)
    // CDC emits the published rows as inserts
    val changes = spark.read
      .option("startingVersion", "1")
      .table("bronze.br.pub.changes").collect()
    assert(changes.length == 80)
    assert(changes.forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("publish refuses when main advanced past the base") {
    mk("race")
    spark.sql("INSERT INTO bronze.br.race " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    bronzeCatalog.createBranch(Seq("br"), "race", "stage")
    bronzeCatalog.appendToBranch(Seq("br"), "race", "stage",
      spark.range(10, 20).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    // main advances underneath the staged branch
    spark.sql("INSERT INTO bronze.br.race " +
      "SELECT id + 100, CAST(id AS DOUBLE) FROM range(5)")
    intercept[java.util.ConcurrentModificationException] {
      bronzeCatalog.publishBranch(Seq("br"), "race", "stage")
    }
    // main untouched by the refused publish; branch still live for
    // re-staging
    assert(spark.table("bronze.br.race").count() == 15)
    assert(bronzeCatalog.branches(Seq("br"), "race") == Seq("stage"))
    bronzeCatalog.dropBranch(Seq("br"), "race", "stage")
  }

  test("vacuum retains branch-staged files; reaps them after drop") {
    val dir = mk("vac")
    spark.sql("INSERT INTO bronze.br.vac " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    bronzeCatalog.createBranch(Seq("br"), "vac", "stage")
    bronzeCatalog.appendToBranch(Seq("br"), "vac", "stage",
      spark.range(10, 20).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    val staged = BronzeBranches.head(dir, "stage").get.files
      .filter(_.startsWith("part-br-"))
    assert(staged.nonEmpty)
    // zero-grace vacuum with the branch alive: staged files survive
    SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    staged.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, f)),
      s"vacuum reaped live branch file $f"))
    assert(bronzeCatalog.readBranch(Seq("br"), "vac", "stage")
      .count() == 20)
    // after the drop the staged files are orphans and reap
    bronzeCatalog.dropBranch(Seq("br"), "vac", "stage")
    val reaped = SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    staged.foreach(f => assert(reaped.contains(f),
      s"dropped-branch file $f was not reaped"))
    assert(spark.table("bronze.br.vac").count() == 10)
  }

  test("branchMaxAgeMs expires an abandoned branch; a live one survives") {
    val dir = mk("age")
    spark.sql("INSERT INTO bronze.br.age " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    // "abandoned": staged long ago — backdate its branch-log mtimes
    bronzeCatalog.createBranch(Seq("br"), "age", "stale")
    bronzeCatalog.appendToBranch(Seq("br"), "age", "stale",
      spark.range(10, 15).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    val staleFiles = BronzeBranches.head(dir, "stale").get.files
      .filter(_.startsWith("part-br-"))
    assert(staleFiles.nonEmpty)
    val bdir = java.nio.file.Paths.get(dir, "_graft_snapshots", "branch-stale")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 7L * 24 * 3600 * 1000)
    val s = java.nio.file.Files.list(bdir)
    try s.forEach(p => java.nio.file.Files.setLastModifiedTime(p, old))
    finally s.close()
    // "live": just staged, inside the age
    bronzeCatalog.createBranch(Seq("br"), "age", "fresh")
    bronzeCatalog.appendToBranch(Seq("br"), "age", "fresh",
      spark.range(20, 25).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    val freshFiles = BronzeBranches.head(dir, "fresh").get.files
      .filter(_.startsWith("part-br-"))

    spark.conf.set(GraftConf.BranchMaxAgeKey, (24L * 3600 * 1000).toString)
    try bronzeCatalog.vacuumTable(Seq("br"), "age", retainLast = 1)
    finally spark.conf.unset(GraftConf.BranchMaxAgeKey)
    // the stale branch ref is gone, the fresh one untouched
    assert(bronzeCatalog.branches(Seq("br"), "age") == Seq("fresh"))
    freshFiles.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, f)),
      s"expiry reaped live branch file $f"))
    assert(bronzeCatalog.readBranch(Seq("br"), "age", "fresh").count() == 15)
    // the expired branch's staged files are now orphans: a zero-grace
    // vacuum pass reaps them
    val reaped = SnapshotLog.vacuum(dir, retainLast = 1, orphanGraceMs = 0L)
    staleFiles.foreach(f => assert(reaped.contains(f),
      s"expired-branch file $f was not reaped"))
    assert(spark.table("bronze.br.age").count() == 10)
    bronzeCatalog.dropBranch(Seq("br"), "age", "fresh")
  }
}
