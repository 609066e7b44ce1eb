package graft

import graft.catalog.SnapshotLog
import org.apache.spark.sql.functions._

/** The bronze per-file readers decode through Spark's VECTORIZED
  * parquet reader (rows iterated off columnar batches). This spec
  * drives that path across the type surface bronze tables carry —
  * longs, ints, doubles, strings, dates, timestamps, booleans,
  * decimals, nulls, arrays — through a MERGE-ON-READ scan (the
  * per-file reader path) and checks exact agreement with the
  * pre-delete state minus the deleted rows. */
class VectorizedReaderSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  test("MOR per-file scan round-trips all column types exactly") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.vr")
    spark.sql("DROP TABLE IF EXISTS bronze.vr.types")
    spark.sql("""CREATE TABLE bronze.vr.types (
      id BIGINT, i INT, d DOUBLE, s STRING, dt DATE, ts TIMESTAMP,
      b BOOLEAN, dec DECIMAL(12,3), arr ARRAY<BIGINT>) USING parquet""")
    spark.sql("""INSERT INTO bronze.vr.types
      SELECT id, CAST(id % 7 AS INT),
        CAST(id AS DOUBLE) / 3.0,
        CASE WHEN id % 5 = 0 THEN NULL ELSE concat('s-', id) END,
        DATE '1996-01-01' + CAST(id % 50 AS INT),
        TIMESTAMP '1996-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id),
        id % 2 = 0,
        CAST(id AS DECIMAL(12,3)) / 7,
        array(id, id * 2)
      FROM range(200)""")
    val before = spark.table("bronze.vr.types")
      .filter(col("id") >= 50 || col("id") < 40)
      .orderBy("id").collect().toSeq

    // MOR delete forces the per-file (vectorized) reader path
    spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
    try spark.sql(
      "DELETE FROM bronze.vr.types WHERE id >= 40 AND id < 50")
    finally spark.conf.unset(GraftConf.DeleteModeKey)
    val dir = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].tableDir(Seq("vr"), "types")
    assert(SnapshotLog.current(dir).get.entries.exists(_.deletes.nonEmpty),
      "expected a position-delete sidecar (per-file reader path)")

    val after = spark.table("bronze.vr.types").orderBy("id").collect().toSeq
    assert(after.size == 190)
    assert(after == before,
      s"vectorized per-file read drifted:\n${after.take(3)}\nvs\n${before.take(3)}")

    // column pruning through the per-file reader
    val pruned = spark.table("bronze.vr.types").select("s", "dec")
      .orderBy("dec").collect()
    assert(pruned.length == 190)

    // `_file`/`_pos` metadata columns still splice correctly
    val meta = spark.table("bronze.vr.types")
      .select(col("id"), col("_pos")).orderBy("id").collect()
    assert(meta.length == 190)
  }

  test("first-batch prefetch loses no rows (empty / 1 / multi-batch)") {
    // the reader eagerly decodes the FIRST batch inside its guarded
    // init (so lazy physical-type refusals fall back to parquet-mr
    // instead of failing the scan); this asserts the buffered first
    // row is handed out exactly once across batch-boundary shapes
    import org.apache.spark.sql.graftshim.shim
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    for (n <- Seq(0L, 1L, 4096L, 4097L, 10000L)) {
      val out = tmpDir(s"vrr_$n")
      spark.range(n).repartition(1).write.mode("overwrite").parquet(out)
      val part = new java.io.File(out).listFiles()
        .find(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet")).get.getAbsolutePath
      val r = shim.vectorizedRowFileReader(part, schema)
      var count = 0L
      var sum = 0L
      try {
        var row = r.read()
        while (row != null) {
          count += 1; sum += row.getLong(0)
          row = r.read()
        }
        // reads past EOF stay null (no rewind through the prefetch)
        assert(r.read() == null)
      } finally r.close()
      assert(count == n, s"n=$n: read $count rows")
      assert(sum == n * (n - 1) / 2, s"n=$n: row payload drifted")
    }
  }
}
