package graft

import java.nio.file.Files

import graft.pipeline.{BronzeIngest, OrderEventProducer, SparkConfigLoader}
import graft.streaming.monitors.LossLogger
import graft.sources.kafkasim.SimBroker

class BronzeTableSpec extends SparkSpec {

  test("S5/B6: DDL is idempotent; batch job appends into the catalog table") {
    val root = tmpDir("broker")
    val orders = (1 to 40).map(i =>
      OrderEventProducer.Order(s"o$i", i * 1.0, "2026-02-01"))
    OrderEventProducer.produce(root, "orders", 3, orders)

    val table = "bronze_spec_orders"
    BronzeIngest.ensureBronzeTable(spark, table)
    BronzeIngest.ensureBronzeTable(spark, table) // IF NOT EXISTS: no error
    val n = BronzeIngest.batchJobToTable(spark, root, "orders",
      """{"orders":{"0":0,"1":0,"2":0}}""", "latest", table)
    assert(n == 40)
    assert(spark.table(table).count() == 40)
    assert(spark.table(table).filter("source = 'kafka-batch'").count() == 40)
    // second append accumulates (append-only bronze semantics)
    BronzeIngest.batchJobToTable(spark, root, "orders",
      """{"orders":{"0":0,"1":0,"2":0}}""", "latest", table)
    assert(spark.table(table).count() == 80)
    spark.sql(s"DROP TABLE $table")
  }

  test("M8: loss logger appends [DATA-LOSS] line exactly when behind earliest") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "orders", 1)
    (0 until 30).foreach { i =>
      SimBroker.append(root, "orders", 0, Seq((None, Array[Byte](1), 1L)))
    }
    SimBroker.expireThrough(root, "orders", 0, 12)
    val log = Files.createTempFile("loss", ".log")

    val hit = LossLogger.detectAndLogLoss(root, "orders", 0, 5, log)
    assert(hit.exists(e => e.lostFrom == 5 && e.lostTo == 12 && e.lostCount == 7))
    val content = Files.readString(log)
    assert(content ==
      "[DATA-LOSS] topic=orders partition=0 checkpointOffset=5 earliest=12 lost=7\n")

    val miss = LossLogger.detectAndLogLoss(root, "orders", 0, 20, log)
    assert(miss.isEmpty)
    assert(Files.readString(log) == content) // nothing appended on the ok path
  }

  test("U1: config loader keeps only spark.* keys") {
    val conf = SparkConfigLoader.loadFromResources("/spark-defaults.properties")
    assert(conf.get("spark.sql.shuffle.partitions") == "16")
    assert(conf.get("spark.app.name") == "graft-test")
    assert(!conf.contains("log4j.rootLogger"))
    assert(!conf.contains("some.other.key"))
    intercept[IllegalArgumentException] {
      SparkConfigLoader.loadFromResources("/missing.properties")
    }
  }

  test("S7: streaming query exposes progress after AvailableNow run") {
    val root = tmpDir("broker")
    val orders = (1 to 10).map(i =>
      OrderEventProducer.Order(s"p$i", 1.0, "2026-02-01"))
    OrderEventProducer.produce(root, "orders", 2, orders)
    val q = BronzeIngest.streamJob(spark, root, "orders",
      tmpDir("ckpt"), tmpDir("sink"))
    q.awaitTermination()
    val progress = q.lastProgress
    assert(progress != null)
    assert(progress.sources.exists(s => s.description.contains("KafkaSimV2")))
    assert(q.recentProgress.map(_.numInputRows).sum == 10)
  }
}
