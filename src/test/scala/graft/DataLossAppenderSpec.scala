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

  test("attach preserves the logger's existing output path and detach restores prior config") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    val loggerName = "graft.spec.preserve.consumer"

    // a pre-existing exact LoggerConfig with its own appender (stands in
    // for a user's console wiring — a PLAIN appender: interceptors are
    // deliberately never copied between interception configs)
    val sink = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "PRIOR_SINK", null, null, true,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = ()
    }
    sink.start()
    config.addAppender(sink)
    val prior = new org.apache.logging.log4j.core.config.LoggerConfig(
      loggerName, org.apache.logging.log4j.Level.INFO, true)
    prior.addAppender(sink, null, null)
    config.addLogger(loggerName, prior)
    ctx.updateLoggers()

    val app = DataLossAppender.createAppender("DATA_LOSS_2", onLoss = _ => ())
    DataLossAppender.attach(ctx, loggerName, app)
    // interception config carries BOTH the interceptor and the prior
    // appender — monitoring observes the logger without silencing it
    val active = config.getLoggerConfig(loggerName)
    assert(active.getAppenders.containsKey("DATA_LOSS_2"))
    assert(active.getAppenders.containsKey("PRIOR_SINK"))

    DataLossAppender.detach(ctx, loggerName, app)
    // the pre-existing config is back, untouched
    val restored = config.getLoggerConfig(loggerName)
    assert(restored eq prior)
    assert(restored.getAppenders.containsKey("PRIOR_SINK"))
    assert(!restored.getAppenders.containsKey("DATA_LOSS_2"))

    config.removeLogger(loggerName)
    ctx.updateLoggers()
  }

  test("default factory layout falls back to bare %m like the reference") {
    val app = DataLossAppender.createAppender("DATA_LOSS_DEFAULT")
    assert(app.getLayout != null)
    assert(!app.isStarted) // disabled until attached — the shipping default
  }
}
