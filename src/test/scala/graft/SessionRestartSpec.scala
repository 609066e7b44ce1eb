package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once restart for STATEFUL streaming (extends the bronze-
  * pipeline story to session windows): a session-window aggregation
  * runs on the RocksDB state store with a checkpoint, is stopped after
  * the first file, and a NEW query resumes from the same checkpoint.
  * A session whose events span the stop/resume boundary must come out
  * merged exactly once — possible only if the session state was
  * recovered from the checkpoint, not recomputed or duplicated.
  */
class SessionRestartSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, modMs: Long,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_tmp_$name"
    rows.toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = Files.list(Paths.get(tmp)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(f, Paths.get(s"$dir/$name.parquet"))
    Files.setLastModifiedTime(Paths.get(s"$dir/$name.parquet"),
      FileTime.fromMillis(modMs))
  }

  private def runAvailable(input: String, out: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(input).schema
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))
    val q = sessions.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def readOut(out: String): Array[(String, String, Long, Long)] = {
    val files = Files.list(Paths.get(out)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).count()
    if (files == 0) Array.empty
    else spark.read.parquet(out)
      .select(date_format(col("sess_start"), "HH:mm").as("s"),
        date_format(col("sess_end"), "HH:mm").as("e"),
        col("user_id"), col("n_events"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._3, t._1))
  }

  test("session state survives stop/resume; boundary-spanning session emitted once") {
    val input = tmpDir("sess-in")
    val out = tmpDir("sess-out")
    val ckpt = tmpDir("sess-ckpt")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // phase 1: u1's session is OPEN (2 events), u2 has 1 event
      writeFile(input, "00", 1000000L, Seq(
        (1L, "2026-01-01 00:00:00"), (1L, "2026-01-01 00:10:00"),
        (2L, "2026-01-01 00:05:00")))
      runAvailable(input, out, ckpt)
      assert(readOut(out).isEmpty,
        "nothing may be finalized before the watermark passes")

      // phase 2 (NEW query, same checkpoint): u1 continues its session
      // (00:25 is within the 30-min gap of 00:10) then opens another;
      // u99 far in the future pushes the watermark so closed sessions
      // flush — but u99's own session stays open and must NOT appear
      writeFile(input, "01", 1060000L, Seq(
        (1L, "2026-01-01 00:25:00"), (1L, "2026-01-01 02:00:00"),
        (2L, "2026-01-01 03:00:00")))
      writeFile(input, "02", 1120000L, Seq((99L, "2026-01-01 12:00:00")))
      runAvailable(input, out, ckpt)

      val got = readOut(out)
      val want = Array(
        ("00:00", "00:55", 1L, 3L), // spans the restart: 2 + 1 events
        ("02:00", "02:30", 1L, 1L),
        ("00:05", "00:35", 2L, 1L),
        ("03:00", "03:30", 2L, 1L))
      assert(got === want)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
