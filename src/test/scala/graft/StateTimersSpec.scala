package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode,
  TimerValues, Trigger, TTLConfig, ExpiredTimerInfo, StatefulProcessor}

/** transformWithState with EVENT-TIME TIMERS + ListState: events
  * buffer per user; a timer at (last event + 30 min) flushes the
  * buffered session once the watermark proves it over — the
  * session-timeout pattern the fMGWS/transformWithState API exists
  * for. Deterministic because the staged files fix watermark advances.
  */
class StateTimersSpec extends SparkSpec {

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

  test("event-time timer flushes the buffered session after the gap") {
    val input = tmpDir("timer-in")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // batch 1: u1 has 2 events, u2 has 1
      writeFile(input, "00", 1000000L, Seq(
        (1L, "2026-01-01 00:00:00"), (1L, "2026-01-01 00:10:00"),
        (2L, "2026-01-01 00:05:00")))
      // batch 2: only u3 — watermark 02:50 fires u1/u2 timers
      writeFile(input, "01", 1060000L, Seq((3L, "2026-01-01 03:00:00")))
      // batch 3: u99 pushes watermark to 11:50 — fires u3; u99 pending
      writeFile(input, "02", 1120000L, Seq((99L, "2026-01-01 12:00:00")))

      import spark.implicits._
      val schema = spark.read.parquet(input).schema
      val out = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(input)
        .withWatermark("ts", "10 minutes")
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new SessionFlushProcessor,
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "n_events")
      val q = out.writeStream.format("memory").queryName("timer_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val got = spark.table("timer_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
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

/** Buffers event times per user in a ListState; keeps exactly one
  * pending timer at (max buffered event + 30 min); emits and clears on
  * expiry. Top-level class so it serializes cleanly. */
private[graft] class SessionFlushProcessor
  extends StatefulProcessor[Long, (Long, java.sql.Timestamp), (Long, Long)] {

  @transient private var buf: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[Long]("buf", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    rows.foreach(r => buf.appendValue(r._2.getTime))
    val latest = buf.get().max
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(latest + 30 * 60 * 1000L)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    val n = buf.get().size.toLong
    buf.clear()
    if (n > 0) Iterator((key, n)) else Iterator.empty
  }
}
