package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The oracle corpus happens to produce only intra-batch matches for
  * st06; this spec forces the CROSS-batch case — a view buffered in
  * micro-batch 0 state must join a click arriving in micro-batch 1. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("view buffered in batch 0 joins click arriving in batch 1") {
    val stage = tmpDir("ssj")
    def writeFile(name: String, rows: Seq[(Long, String, java.sql.Timestamp)],
        mtime: Long): Unit = {
      val tmp = Paths.get(stage, s"_tmp_$name")
      rows.toDF("user_id", "event_type", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, Paths.get(stage, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(Paths.get(stage, s"$name.parquet"),
        FileTime.fromMillis(mtime))
    }
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    writeFile("00", Seq((7L, "view", ts(0))), 1000000L)          // batch 0
    writeFile("01", Seq((7L, "click", ts(10)),                    // batch 1,
      (7L, "view", ts(50))), 1060000L)                            // +late view

    val schema = spark.read.parquet(s"$stage/00.parquet").schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)

    val clicks = stream.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val views = stream.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts".as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val joined = clicks.join(views,
      $"user_id" === $"vu" && $"view_ts" <= $"click_ts"
        && $"view_ts" >= $"click_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"click_ts", $"view_ts")

    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    // exactly the batch-0 view × batch-1 click pair; the 10:50 view is
    // outside the 30-minute look-back and must NOT match
    assert(got.toSeq == Seq((7L, ts(10), ts(0))))
  }
}
