package graft.streaming.monitors

import java.nio.file.{Files, Path, Paths}

import graft.sources.kafkasim.{KafkaSimSource, SimBroker}
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** A detected retention-induced loss range on one topic-partition.
  * Mirrors the reference's `DataLossEvent` record
  * (KafkaBatchDataLossMonitor.java:140-149). */
final case class DataLossEvent(topic: String, partition: Int,
    lostFrom: Long, lostTo: Long, lostCount: Long,
    kafkaEarliest: Long, kafkaLatest: Long, detector: String)

/** Structured-Streaming offset-log parsing, shared by the detectors.
  *
  * File format (reference SparkCheckpointReader.scala:12-17): an
  * `offsets/<batchId>` file is line 0 `v1`, line 1 batch-metadata JSON,
  * lines 2.. one offsets JSON per source — `{"topic":{"partition":off}}`
  * for Kafka-shaped sources. The reference has two independent parsers
  * (jackson M6, circe M7); consolidated here into one.
  */
object CheckpointOffsets {

  /** Parse one v1 offset file's Kafka-shaped source offsets (first
    * source line, as in the reference's readers). */
  def parseOffsetFile(path: Path): Map[(String, Int), Long] = {
    val lines = Files.readAllLines(path).asScala.toSeq
    require(lines.nonEmpty && lines.head == "v1",
      s"not a v1 offset file: $path")
    // line 1 = metadata, line 2.. = per-source offsets JSON (the
    // reference's readers take the LAST line — KafkaStreamingPreflightDetector.java:159-185)
    lines.drop(2).lastOption.map(KafkaSimSource.parseOffsetJson)
      .getOrElse(Map.empty)
  }

  /** Batch ids present under `<ckpt>/offsets`, ascending. */
  def batchIds(checkpointDir: String): Seq[Long] = {
    val dir = Paths.get(checkpointDir, "offsets")
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      val buf = ArrayBuffer.empty[Long]
      val it = s.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.forall(_.isDigit)) buf += name.toLong
      }
      buf.sorted.toSeq
    } finally s.close()
  }

  /** Committed offsets of the latest batch, if any. */
  def latestOffsets(checkpointDir: String): Option[(Long, Map[(String, Int), Long])] =
    batchIds(checkpointDir).lastOption.map { id =>
      id -> parseOffsetFile(Paths.get(checkpointDir, "offsets", id.toString))
    }

  /** Offset for one (topic, partition) in the latest batch — the
    * reference's `readCheckpointOffset` (SparkCheckpointReader.scala:18-43). */
  def readCheckpointOffset(checkpointDir: String, topic: String,
      partition: Int): Option[Long] =
    latestOffsets(checkpointDir).flatMap(_._2.get((topic, partition)))
}

/** M1 (KafkaStreamingPreflightDetector.java:25-210): before starting a
  * streaming job, compare the last checkpointed offsets against broker
  * earliest; REPORT loss verbosely, never throw — restart decisions
  * stay with the operator. */
final class PreflightDetector(checkpointDir: String, brokerRoot: String) {
  def detect(): Seq[DataLossEvent] =
    CheckpointOffsets.latestOffsets(checkpointDir) match {
      case None => Seq.empty // no checkpoint yet — fresh start, nothing to lose
      case Some((_, offsets)) =>
        offsets.toSeq.sortBy(_._1).flatMap { case ((topic, p), committed) =>
          val earliest = SimBroker.earliest(brokerRoot, topic, p)
          val latest = SimBroker.latest(brokerRoot, topic, p)
          if (committed < earliest)
            Some(DataLossEvent(topic, p, committed, earliest,
              earliest - committed, earliest, latest, "preflight"))
          else None
        }
    }
}

/** M2 (CheckpointKafkaDataLossMonitor.java:14-102): compare the last
  * TWO checkpoint batches; loss iff `prevEnd < earliest && currStart
  * == earliest` — a deliberately narrower predicate than M1's (it only
  * fires when Spark has already jumped forward to earliest), preserved
  * as-is. */
final class CheckpointDiffMonitor(checkpointDir: String, brokerRoot: String) {
  def checkLatestBatch(): Seq[DataLossEvent] = {
    val ids = CheckpointOffsets.batchIds(checkpointDir)
    if (ids.size < 2) return Seq.empty
    val prev = CheckpointOffsets.parseOffsetFile(
      Paths.get(checkpointDir, "offsets", ids(ids.size - 2).toString))
    val curr = CheckpointOffsets.parseOffsetFile(
      Paths.get(checkpointDir, "offsets", ids.last.toString))
    curr.toSeq.sortBy(_._1).flatMap { case ((topic, p), currStart) =>
      prev.get((topic, p)).flatMap { prevEnd =>
        val earliest = SimBroker.earliest(brokerRoot, topic, p)
        val latest = SimBroker.latest(brokerRoot, topic, p)
        if (prevEnd < earliest && currStart == earliest)
          Some(DataLossEvent(topic, p, prevEnd, earliest,
            earliest - prevEnd, earliest, latest, "checkpoint-diff"))
        else None
      }
    }
  }
}

/** M4 (KafkaBatchDataLossMonitor.java:18-150): given explicit
  * startingOffsets/endingOffsets JSON for a bounded read, report
  * ranges the broker has already expired. Policy (log vs throw) is the
  * caller's, as in the reference (KafkaBatchJob.java:47-49). */
final class BatchRangeMonitor(brokerRoot: String) {
  def check(startingOffsetsJson: String, endingOffsetsJson: String): Seq[DataLossEvent] = {
    val starts = KafkaSimSource.parseOffsetJson(startingOffsetsJson)
    val ends = KafkaSimSource.parseOffsetJson(endingOffsetsJson)
    starts.toSeq.sortBy(_._1).flatMap { case ((topic, p), start) =>
      val earliest = SimBroker.earliest(brokerRoot, topic, p)
      val latest = SimBroker.latest(brokerRoot, topic, p)
      if (earliest > start) {
        val lostTo = math.min(earliest, ends.getOrElse((topic, p), earliest))
        Some(DataLossEvent(topic, p, start, lostTo, lostTo - start,
          earliest, latest, "batch-range"))
      } else None
    }
  }
}

/** M3 (DataLossMonitor.java:16-165): live `StreamingQueryListener` —
  * on every progress event, parse the kafkasim sources' start/end
  * offset JSON and compare against broker earliest. Events accumulate
  * in-memory (the reference logs; a queryable buffer is strictly more
  * testable). Runs on the listener-bus thread. */
class StreamingLossListener(brokerRoot: String)
    extends StreamingQueryListener {

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[DataLossEvent]()
  def events: Seq[DataLossEvent] = buf.asScala.toSeq

  /** Hook for subclasses that forward events somewhere queryable
    * (see [[QueryableLossListener]]); runs on the listener-bus
    * thread. */
  protected def onLoss(ev: DataLossEvent): Unit = ()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    e.progress.sources.filter(s =>
      Option(s.description).exists(_.contains("KafkaSimV2"))).foreach { s =>
      val start = Option(s.startOffset).map(KafkaSimSource.parseOffsetJson)
        .getOrElse(Map.empty[(String, Int), Long])
      start.foreach { case ((topic, p), off) =>
        val earliest = SimBroker.earliest(brokerRoot, topic, p)
        val latest = SimBroker.latest(brokerRoot, topic, p)
        if (off < earliest) {
          val ev = DataLossEvent(topic, p, off, earliest, earliest - off,
            earliest, latest, "listener")
          buf.add(ev)
          onLoss(ev)
        }
      }
    }
}

/** M3's events as a LIVE QUERYABLE STREAM — SURVEY §2.2's "also
  * expose as a DataFrame for queryability", closed for the live path:
  * the listener feeds an in-memory streaming source, so loss events
  * can be consumed with the full Structured Streaming surface
  * (windowed aggregation over loss volume, alert joins, a memory/
  * console sink) while the batch-side detectors stay Dataset-typed.
  * `lossEvents` is the unbounded Dataset to `writeStream` from. */
final class QueryableLossListener(brokerRoot: String,
    spark: org.apache.spark.sql.SparkSession)
    extends StreamingLossListener(brokerRoot) {

  private val stream = {
    implicit val enc: org.apache.spark.sql.Encoder[DataLossEvent] =
      org.apache.spark.sql.Encoders.product[DataLossEvent]
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DataLossEvent]
  }

  /** The live loss-event stream (isStreaming = true). */
  def lossEvents: org.apache.spark.sql.Dataset[DataLossEvent] = stream.toDS()

  override protected def onLoss(ev: DataLossEvent): Unit = {
    stream.addData(ev)
    ()
  }
}

/** M8 (KafkaLossDetector.scala:10-46): single-partition loss check
  * appending a `[DATA-LOSS]` line to a log file — the reference's
  * simplest detector, kept as a standalone because its file-append
  * output format is part of its contract. */
object LossLogger {
  def detectAndLogLoss(brokerRoot: String, topic: String, partition: Int,
      checkpointOffset: Long, logFile: Path): Option[DataLossEvent] = {
    val earliest = SimBroker.earliest(brokerRoot, topic, partition)
    if (checkpointOffset < earliest) {
      val lost = earliest - checkpointOffset
      val line = s"[DATA-LOSS] topic=$topic partition=$partition " +
        s"checkpointOffset=$checkpointOffset earliest=$earliest lost=$lost\n"
      Files.writeString(logFile, line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      Some(DataLossEvent(topic, partition, checkpointOffset, earliest, lost,
        earliest, SimBroker.latest(brokerRoot, topic, partition), "loss-logger"))
    } else None
  }
}

/** M7 (Utils.scala:34-69 `checkDataLoss`): the reference's historical
  * audit — iterate EVERY numeric file under `offsets/` (not just the
  * latest) and run the per-partition loss check for each, appending a
  * `[DATA-LOSS]` line per hit. Composed from the shared pieces:
  * [[CheckpointOffsets.batchIds]] + [[CheckpointOffsets.parseOffsetFile]]
  * + [[LossLogger.detectAndLogLoss]]. Unlike the reference, partitions
  * come from the offset file itself instead of a hard-coded
  * `Seq(0, 1, 2)` ("or detect programmatically", Utils.scala:54). */
object CheckpointAudit {
  /** Returns every (batchId, event) hit, ascending by batch. A batch
    * fires once per lost partition — the reference's per-file loop
    * semantics, so one retention expiry shows up in each batch whose
    * committed offset predates the new earliest. */
  def checkDataLoss(checkpointDir: String, brokerRoot: String,
      logFile: Path): Seq[(Long, DataLossEvent)] =
    CheckpointOffsets.batchIds(checkpointDir).flatMap { id =>
      CheckpointOffsets.parseOffsetFile(
        Paths.get(checkpointDir, "offsets", id.toString))
        .toSeq.sortBy(_._1)
        .flatMap { case ((topic, p), committed) =>
          LossLogger.detectAndLogLoss(brokerRoot, topic, p, committed, logFile)
            .map(id -> _)
        }
    }
}

/** M5 (KafkaDataLossAppender.java:16-53): log-line pattern matcher for
  * Spark-internal data-loss messages. The reference ships it as a
  * log4j2 appender wired-but-disabled (log4j2.properties:63-76); the
  * match logic is the testable part and is kept engine-agnostic here —
  * `matches` can back a real appender plugin unchanged. */
object LossLogPatterns {
  val patterns: Seq[String] = Seq(
    "Some data may be lost",
    "Cannot fetch offset",
    "Skip missing records")

  def matches(logLine: String): Boolean =
    patterns.exists(logLine.contains)
}
