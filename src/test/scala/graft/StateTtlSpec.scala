package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}

/** transformWithState state TTL (the last piece of the Spark-4 state
  * API surface after st09's ValueState and StateTimersSpec's
  * ListState + timers): a ValueState configured with
  * `TTLConfig(duration)` expires between micro-batch runs, so a
  * counter resumed after the TTL restarts instead of accumulating —
  * verified against a no-TTL twin that accumulates across the same
  * two runs. */
class StateTtlSpec extends SparkSpec {

  private def writeBatch(dir: String, name: String,
      rows: Seq[Long]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_tmp_$name"
    rows.toDF("user_id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = Files.list(Paths.get(tmp)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(f, Paths.get(s"$dir/$name.parquet"))
  }

  /** Poll `sinkName` until it contains `expect` (2 min deadline).
    * transformWithState in ProcessingTime mode always requests another
    * micro-batch (proactive TTL maintenance), so AvailableNow never
    * self-terminates and processAllAvailable never quiesces — polling
    * the sink is the only sound wait. */
  private def awaitRow(sinkName: String, expect: (Long, Long)): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var seen = Seq.empty[(Long, Long)]
    while (!seen.contains(expect) && System.nanoTime() < deadline) {
      Thread.sleep(200)
      seen = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(seen.contains(expect), s"$sinkName: wanted $expect, saw $seen")
  }

  /** ONE continuous query per scenario (the memory sink cannot recover
    * a checkpoint): file 00 is processed, then after `gapMs` of wall
    * time file 01 lands in the same directory — with TTL shorter than
    * the gap the key's state has expired by then. */
  private def scenario(sinkName: String, ttlMs: Long,
      expectAfterGap: (Long, Long)): Unit = {
    import spark.implicits._
    val input = tmpDir(s"$sinkName-in")
    writeBatch(input, "00", Seq(7L, 7L, 7L))
    val schema = spark.read.parquet(input).schema
    val out = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
      .as[Long]
      .groupByKey(identity)
      .transformWithState(new TtlCountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("user_id", "n")
    val q = out.writeStream.format("memory").queryName(sinkName)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      awaitRow(sinkName, (7L, 3L))
      Thread.sleep(4000) // comfortably past a 2s TTL
      writeBatch(input, "01", Seq(7L, 7L))
      awaitRow(sinkName, expectAfterGap)
    } finally { q.stop(); q.awaitTermination() }
  }

  test("ValueState with TTL expires across the gap; without TTL it accumulates") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // TTL 2s < 4s gap → state expired → counter restarts at 2
      scenario("ttl_sink", ttlMs = 2000L, expectAfterGap = (7L, 2L))
      // no TTL → accumulates to 5
      scenario("nottl_sink", ttlMs = 0L, expectAfterGap = (7L, 5L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** Per-key event counter; ttlMs > 0 configures state TTL, 0 means no
  * TTL. Top-level class so it serializes cleanly. */
private[graft] class TtlCountProcessor(ttlMs: Long)
  extends StatefulProcessor[Long, Long, (Long, Long)] {

  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl =
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
      else TTLConfig.NONE
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, ttl)
  }

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (cnt.exists()) cnt.get() else 0L
    val next = prev + rows.size
    cnt.update(next)
    Iterator((key, next))
  }
}
