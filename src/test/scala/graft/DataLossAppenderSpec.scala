package graft

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LoggerContext
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.monitors.DataLossAppender

/** M5: the appender is exercised THROUGH log4j2 — attached to a live
  * LoggerContext, fed via Logger.warn, detached after — not by calling
  * append() directly. */
class DataLossAppenderSpec extends AnyFunSuite {

  test("attached appender captures Spark Kafka loss warnings and ignores benign lines") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    var paged = List.empty[String]
    val app = DataLossAppender.createAppender("DATA_LOSS",
      onLoss = m => paged ::= m)
    val loggerName = "graft.spec.kafka010.consumer"
    DataLossAppender.attach(ctx, loggerName, app)
    try {
      val log = LogManager.getLogger(loggerName)
      log.warn("Offset 17 out of range; Some data may be lost as they are " +
        "not available in Kafka any more")
      log.warn("Cannot fetch offset 42 (GroupId: g, TopicPartition: t-0)")
      log.warn("executor heartbeat OK") // benign warning
      log.info("Skip missing records") // below the WARN threshold
      assert(app.captured.size === 2)
      assert(paged.size === 2)
      assert(paged.exists(_.contains("Cannot fetch offset 42")))
    } finally DataLossAppender.detach(ctx, loggerName, app)
  }

  test("default factory layout falls back to bare %m like the reference") {
    val app = DataLossAppender.createAppender("DATA_LOSS_DEFAULT")
    assert(app.getLayout != null)
    assert(!app.isStarted) // disabled until attached — the shipping default
  }
}
