package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.functions._

/** OPTIMIZE ZORDER: the sort-order-aware `rewrite_data_files` — after
  * the rewrite, per-file manifest bounding boxes must be narrow on
  * BOTH z dimensions (restoring plan-time pruning for conjunctive
  * predicates), the table state must be bit-identical, and the commit
  * must be a layout-only `replace` snapshot incremental readers treat
  * like any compaction. */
class ZOrderOptimizeSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  /** Per-file (min,max) boxes of the two dims, via the metadata
    * column — what manifest stats will show after commit. */
  private def boxes(table: String): Seq[(Long, Long, Long, Long)] =
    spark.table(table)
      .groupBy(col("_file"))
      .agg(min("u").as("mnu"), max("u").as("mxu"),
        min("h").as("mnh"), max("h").as("mxh"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  /** How many files a (u-range × h-range) box predicate could touch
    * given per-file boxes — the plan-time pruning survivor count. */
  private def overlapping(bs: Seq[(Long, Long, Long, Long)],
      u0: Long, u1: Long, h0: Long, h1: Long): Int =
    bs.count { case (mnu, mxu, mnh, mxh) =>
      mxu >= u0 && mnu <= u1 && mxh >= h0 && mnh <= h1
    }

  test("z-order rewrite narrows both dims; state and history exact") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.zo")
    spark.sql("DROP TABLE IF EXISTS bronze.zo.ev")
    spark.sql(
      "CREATE TABLE bronze.zo.ev (id BIGINT, u BIGINT, h BIGINT, " +
        "v DOUBLE) USING parquet")
    // z-HOSTILE seed: 4 appends in id order — u and h are both
    // id-derived pseudo-random, so every file spans ~the full range
    // of BOTH dims and no box predicate can prune anything
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO bronze.zo.ev " +
        s"SELECT id, (id * 48271) % 256, (id * 69621) % 1024, " +
        s"id * 0.5 FROM range(${b * 4000}, ${b * 4000 + 4000})")
    }
    val dir = bronzeCatalog.tableDir(Seq("zo"), "ev")
    val preSnap = SnapshotLog.current(dir).get
    val preState = spark.table("bronze.zo.ev").orderBy("id")
      .collect().map(_.toString).toSeq
    val preBoxes = boxes("bronze.zo.ev")
    // every seed file overlaps any reasonable box: pruning is dead
    assert(overlapping(preBoxes, 10, 20, 100, 150) == preBoxes.size,
      s"seed layout unexpectedly prunable: $preBoxes")

    val (compacted, created) = bronzeCatalog.optimizeTableZOrder(
      Seq("zo"), "ev", targetBytes = 64L * 1024, Seq("u", "h"))
    assert(compacted == preSnap.files.size)
    assert(created >= 4, s"want a multi-file tiling, got $created")

    val post = SnapshotLog.current(dir).get
    assert(post.operation == "replace")
    // data unchanged, bit for bit
    val postState = spark.table("bronze.zo.ev").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(postState == preState, "z-order rewrite changed table state")
    // time travel still reads the pre-rewrite version
    assert(spark.sql(
      s"SELECT COUNT(*) FROM bronze.zo.ev VERSION AS OF ${preSnap.version}")
      .head().getLong(0) == 16000L)

    // THE POINT: boxes narrowed on BOTH dims...
    val postBoxes = boxes("bronze.zo.ev")
    def meanSpan(bs: Seq[(Long, Long, Long, Long)]): (Double, Double) = (
      bs.map(b => b._2 - b._1).sum.toDouble / bs.size,
      bs.map(b => b._4 - b._3).sum.toDouble / bs.size)
    val (preU, preH) = meanSpan(preBoxes)
    val (postU, postH) = meanSpan(postBoxes)
    assert(postU < preU * 0.7 && postH < preH * 0.7,
      s"boxes did not narrow: u $preU->$postU, h $preH->$postH")
    // ...and plan-time pruning came back: a conjunctive box predicate
    // now touches strictly fewer files than the full tiling
    val survivors = overlapping(postBoxes, 10, 20, 100, 150)
    assert(survivors < postBoxes.size,
      s"box predicate still touches every file ($survivors)")
    // the bronze scan itself sees the stats: the filtered read agrees
    // with an unpruned recompute
    val got = spark.table("bronze.zo.ev")
      .filter(col("u").between(10, 20) && col("h").between(100, 150))
      .agg(count(lit(1)), sum("v")).head()
    val exp = spark.table("bronze.zo.ev").collect()
      .filter(r => r.getLong(1) >= 10 && r.getLong(1) <= 20 &&
        r.getLong(2) >= 100 && r.getLong(2) <= 150)
    assert(got.getLong(0) == exp.length.toLong)
  }

  test("z-order purges MOR sidecars and respects partition tuples") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.zo")
    spark.sql("DROP TABLE IF EXISTS bronze.zo.evp")
    spark.sql(
      "CREATE TABLE bronze.zo.evp (id BIGINT, region STRING, u BIGINT, " +
        "h BIGINT) USING parquet PARTITIONED BY (region)")
    (0 until 2).foreach { b =>
      spark.sql("INSERT INTO bronze.zo.evp " +
        s"SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END, " +
        s"(id * 48271) % 64, (id * 69621) % 64 " +
        s"FROM range(${b * 1000}, ${b * 1000 + 1000})")
    }
    // a MOR position delete so the rewrite must apply + purge sidecars
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql("DELETE FROM bronze.zo.evp WHERE id >= 100 AND id < 120")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    val dir = bronzeCatalog.tableDir(Seq("zo"), "evp")
    assert(SnapshotLog.current(dir).get.entries.exists(_.deletes.nonEmpty))
    val pre = spark.table("bronze.zo.evp").orderBy("id")
      .collect().map(_.toString).toSeq

    bronzeCatalog.optimizeTableZOrder(Seq("zo"), "evp",
      targetBytes = 16L * 1024, Seq("u", "h"))
    val post = SnapshotLog.current(dir).get
    assert(post.entries.forall(_.deletes.isEmpty),
      "z-order rewrite left position sidecars attached")
    val postState = spark.table("bronze.zo.evp").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(postState == pre, "z-order + sidecar purge changed state")
    // partition tuples survived: every entry still carries its region
    assert(post.entries.forall(e => e.parts.get("region")
      .exists(r => r == "east" || r == "west")),
      s"lost partition tuples: ${post.entries.map(_.parts)}")
    // partition pruning still works post-rewrite
    val east = spark.table("bronze.zo.evp").filter(col("region") === "east")
    assert(east.count() == pre.count(_.contains("east")))
  }

  test("z-order applies and purges EQUALITY deletes; later eq-deletes " +
      "still apply via seq inheritance") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.zo")
    spark.sql("DROP TABLE IF EXISTS bronze.zo.eqz")
    spark.sql(
      "CREATE TABLE bronze.zo.eqz (id BIGINT, u BIGINT, h BIGINT) " +
        "USING parquet")
    (0 until 2).foreach { b =>
      spark.sql("INSERT INTO bronze.zo.eqz " +
        s"SELECT id, (id * 48271) % 64, (id * 69621) % 64 " +
        s"FROM range(${b * 500}, ${b * 500 + 500})")
    }
    // live equality-delete sidecars via the zero-read key path
    val dir = bronzeCatalog.tableDir(Seq("zo"), "eqz")
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql("DELETE FROM bronze.zo.eqz WHERE id IN (3, 250, 700)")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    assert(SnapshotLog.current(dir).get.eqDeletes.nonEmpty)
    val pre = spark.table("bronze.zo.eqz").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(pre.length == 997)

    bronzeCatalog.optimizeTableZOrder(Seq("zo"), "eqz",
      targetBytes = 16L * 1024, Seq("u", "h"))
    val snap = SnapshotLog.current(dir).get
    assert(snap.eqDeletes.isEmpty, "ZORDER left applied equality deletes")
    assert(snap.entries.forall(_.deletes.isEmpty))
    val post = spark.table("bronze.zo.eqz").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(post == pre, "ZORDER + eq-delete purge changed state")

    // an eq-delete issued AFTER the rewrite must retract rewritten
    // rows: the rewritten files inherited their group's max data
    // sequence, strictly below the new delete's
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql("DELETE FROM bronze.zo.eqz WHERE id IN (10, 900)")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    val left = spark.table("bronze.zo.eqz")
      .filter(col("id").isin(10L, 900L)).count()
    assert(left == 0L, "post-rewrite equality delete failed to apply")
  }
}
