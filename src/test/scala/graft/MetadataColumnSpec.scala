package graft

/** The `_file` metadata column on bronze tables (Iceberg's column of
  * the same name): selecting it routes the scan through the per-file
  * reader over the pinned snapshot; not selecting it keeps the
  * vectorized delegate parquet scan. */
class MetadataColumnSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  test("SELECT _file maps each row to its data file; normal reads unaffected") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.md")
    spark.sql("DROP TABLE IF EXISTS bronze.md.f")
    spark.sql("CREATE TABLE bronze.md.f (id BIGINT, batch INT) USING parquet")
    (1 to 2).foreach { b =>
      spark.sql(s"INSERT INTO bronze.md.f SELECT id, $b FROM range(10)")
    }
    val rows = spark.sql("SELECT id, batch, _file FROM bronze.md.f")
      .collect()
    assert(rows.length == 20)
    // every row names a real committed file; the two appends land in
    // disjoint file sets
    val byBatch = rows.groupBy(_.getInt(1))
      .map { case (b, rs) => b -> rs.map(_.getString(2)).toSet }
    assert(byBatch(1).nonEmpty && byBatch(2).nonEmpty)
    assert(byBatch(1).intersect(byBatch(2)).isEmpty)
    assert(rows.forall(_.getString(2).contains("part-")))
    // values survive: ids are intact alongside the metadata column
    assert(rows.map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).flatMap(i => Seq(i, i)).sorted)
    // aggregation over _file gives the file-level row audit
    val perFile = spark.sql(
      "SELECT _file, COUNT(*) AS n FROM bronze.md.f GROUP BY _file")
      .collect()
    assert(perFile.map(_.getLong(1)).sum == 20)
    // a plain read (no _file) still plans the delegate parquet scan
    val plain = spark.table("bronze.md.f")
    assert(plain.queryExecution.executedPlan.toString
      .contains("bronze snapshot scan"))
    assert(plain.count() == 20)
  }
}
