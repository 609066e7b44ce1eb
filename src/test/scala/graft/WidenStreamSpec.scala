package graft

/** Widened column + snapshot-log STREAMING read: the row-based
  * executor-side parquet reader must widen old int32 pages under the
  * BIGINT declared schema exactly like the vectorized batch path. */
class WidenStreamSpec extends SparkSpec {
  private lazy val warehouse: String = bronzeWarehouse
  test("streaming read widens old int32 files under the evolved schema") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.ws")
    spark.sql("DROP TABLE IF EXISTS bronze.ws.w")
    spark.sql("CREATE TABLE bronze.ws.w (id BIGINT, batch INT) USING parquet")
    spark.sql("INSERT INTO bronze.ws.w SELECT id, 7 FROM range(6)")
    spark.sql("ALTER TABLE bronze.ws.w ALTER COLUMN batch TYPE BIGINT")
    spark.sql("INSERT INTO bronze.ws.w SELECT id, 5000000000 FROM range(2)")
    import org.apache.spark.sql.streaming.Trigger
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.option("startingVersion", "0")
      .table("bronze.ws.w")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("batch").collect().foreach(r => acc.add(r.getLong(0)))
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(acc.asScala.toSeq.sorted == Seq(7L,7L,7L,7L,7L,7L,5000000000L,5000000000L).sorted)
  }
}
