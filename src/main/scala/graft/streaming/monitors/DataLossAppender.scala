package graft.streaming.monitors

import java.io.Serializable
import java.util.concurrent.CopyOnWriteArrayList

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.{Filter, Layout, LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}
import org.apache.logging.log4j.core.layout.PatternLayout

/** M5 (KafkaDataLossAppender.java:16-53): a real log4j2
  * `AbstractAppender` that intercepts Spark's internal Kafka data-loss
  * warnings ("Some data may be lost", …) as they are logged, and hands
  * matching messages to a callback — the hook where production wiring
  * would page/forward (the reference leaves a TODO for Kafka/object-
  * store forwarding at KafkaDataLossAppender.java:47-50).
  *
  * Pattern matching delegates to [[LossLogPatterns]] so the appender
  * shell and the (unit-testable) match logic stay separate.
  *
  * Like the reference (log4j2.properties:63-76), the appender ships
  * wired-but-DISABLED: nothing attaches it by default. Because the
  * plugin-descriptor generation (`Log4j2Plugins.dat`) needs log4j's
  * Java annotation processor, discovery happens programmatically via
  * [[DataLossAppender.attach]] rather than by `@Plugin` scan —
  * equivalent wiring, same log4j2 `Configuration` surface. See
  * `src/main/resources/log4j2-dataloss.properties.template` for the
  * config-file shape this corresponds to.
  */
final class DataLossAppender private (
    name: String,
    filter: Filter,
    layout: Layout[_ <: Serializable],
    onLoss: String => Unit)
  extends AbstractAppender(name, filter, layout, true, Property.EMPTY_ARRAY) {

  /** Messages that matched, newest last (bounded use: diagnostics). */
  val captured = new CopyOnWriteArrayList[String]()

  override def append(event: LogEvent): Unit = {
    val msg = event.getMessage.getFormattedMessage
    if (LossLogPatterns.matches(msg)) {
      captured.add(msg)
      onLoss(msg)
    }
  }
}

object DataLossAppender {

  /** Factory mirroring the reference's `@PluginFactory createAppender`:
    * null layout defaults to a bare `%m` PatternLayout. */
  def createAppender(
      name: String,
      filter: Filter = null,
      layout: Layout[_ <: Serializable] = null,
      onLoss: String => Unit =
        msg => System.err.println(s"[DATA LOSS DETECTED] $msg"))
      : DataLossAppender = {
    val l =
      if (layout != null) layout
      else PatternLayout.newBuilder().withPattern("%m").build()
    new DataLossAppender(name, filter, l, onLoss)
  }

  /** Exact LoggerConfigs replaced by [[attach]], so [[detach]] can put
    * them back instead of deleting the logger outright. */
  private val replaced =
    new java.util.concurrent.ConcurrentHashMap[(LoggerContext, String), LoggerConfig]()

  /** Wire the appender into a live log4j2 context under `loggerName`
    * (the reference targets `org.apache.spark.sql.kafka010.consumer`,
    * where KafkaDataConsumer logs its loss warnings). Returns the
    * started appender. Non-additive so intercepted warnings don't
    * double-print — but the effective config's existing appender refs
    * (console etc.) are COPIED onto the new LoggerConfig, exactly like
    * the properties template keeps its console appenderRef: monitoring
    * must observe the logger, not silence it. A pre-existing exact
    * LoggerConfig is remembered and restored by [[detach]]. */
  def attach(ctx: LoggerContext, loggerName: String,
      appender: DataLossAppender, level: Level = Level.WARN): DataLossAppender = {
    val config = ctx.getConfiguration
    appender.start()
    config.addAppender(appender)
    // effective config: the exact logger if configured, else nearest
    // ancestor (usually root) — its appenders are the current output path
    val effective = config.getLoggerConfig(loggerName)
    // putIfAbsent: a second attach without an intervening detach sees
    // the FIRST interception config as "effective" — remembering that
    // instead would discard the user's original forever
    if (effective.getName == loggerName)
      replaced.putIfAbsent((ctx, loggerName), effective)
    val lc = new LoggerConfig(loggerName, level, /* additive = */ false)
    effective.getAppenders.forEach { (_, a) =>
      if (!a.isInstanceOf[DataLossAppender]) lc.addAppender(a, null, null)
    }
    lc.addAppender(appender, level, null)
    config.removeLogger(loggerName) // addLogger is put-if-absent
    config.addLogger(loggerName, lc)
    ctx.updateLoggers()
    appender
  }

  /** Undo [[attach]]: remove the interception LoggerConfig and restore
    * the one it replaced, if any. */
  def detach(ctx: LoggerContext, loggerName: String,
      appender: DataLossAppender): Unit = {
    val config = ctx.getConfiguration
    config.removeLogger(loggerName)
    Option(replaced.remove((ctx, loggerName)))
      .foreach(prior => config.addLogger(loggerName, prior))
    appender.stop()
    ctx.updateLoggers()
  }
}
