package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{BronzeIngest, OrderEventProducer}
import graft.sources.kafkasim.SimBroker
import graft.streaming.monitors._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MonitorsSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Write a v1 offset file the way Structured Streaming does. */
  private def writeOffsetFile(ckpt: String, batchId: Long, json: String): Unit = {
    val dir = Paths.get(ckpt, "offsets")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(batchId.toString),
      s"""v1\n{"batchWatermarkMs":0,"batchTimestampMs":0}\n$json""")
  }

  private def brokerWith(earliest: Long, latest: Long): String = {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "orders", 1)
    // one record per segment so expireThrough lands exactly on `earliest`
    (0L until latest).foreach { i =>
      SimBroker.append(root, "orders", 0, Seq((None, bytes(s"r$i"), 1L)))
    }
    if (earliest > 0) SimBroker.expireThrough(root, "orders", 0, earliest)
    root
  }

  test("preflight (M1): committed < earliest → loss event; else silent") {
    val root = brokerWith(earliest = 40, latest = 100)
    val ckpt = tmpDir("ckpt")
    writeOffsetFile(ckpt, 0, """{"orders":{"0":20}}""")
    val events = new PreflightDetector(ckpt, root).detect()
    assert(events == Seq(DataLossEvent("orders", 0, 20, 40, 20, 40, 100, "preflight")))

    val ckptOk = tmpDir("ckpt")
    writeOffsetFile(ckptOk, 0, """{"orders":{"0":60}}""")
    assert(new PreflightDetector(ckptOk, root).detect().isEmpty)
    // no checkpoint at all → fresh start, no events
    assert(new PreflightDetector(tmpDir("empty"), root).detect().isEmpty)
  }

  test("checkpoint-diff (M2): fires only when prevEnd < earliest AND currStart == earliest") {
    val root = brokerWith(earliest = 40, latest = 100)
    val ckpt = tmpDir("ckpt")
    writeOffsetFile(ckpt, 0, """{"orders":{"0":20}}""")
    writeOffsetFile(ckpt, 1, """{"orders":{"0":40}}""")
    val events = new CheckpointDiffMonitor(ckpt, root).checkLatestBatch()
    assert(events == Seq(DataLossEvent("orders", 0, 20, 40, 20, 40, 100, "checkpoint-diff")))

    // currStart != earliest → M2 stays silent even though prevEnd < earliest
    val ckpt2 = tmpDir("ckpt")
    writeOffsetFile(ckpt2, 0, """{"orders":{"0":20}}""")
    writeOffsetFile(ckpt2, 1, """{"orders":{"0":55}}""")
    assert(new CheckpointDiffMonitor(ckpt2, root).checkLatestBatch().isEmpty)

    // single batch → nothing to diff
    val ckpt3 = tmpDir("ckpt")
    writeOffsetFile(ckpt3, 0, """{"orders":{"0":20}}""")
    assert(new CheckpointDiffMonitor(ckpt3, root).checkLatestBatch().isEmpty)
  }

  test("batch-range (M4): expired start offsets reported per partition") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "orders", 3)
    (0 until 3).foreach { p =>
      (0 until 6).foreach { seg => // segments of 20 → expiry aligns at 80
        SimBroker.append(root, "orders", p,
          (0 until 20).map(i => (None, bytes(s"$p-${seg * 20 + i}"), 1L)))
      }
    }
    SimBroker.expireThrough(root, "orders", 1, 80)
    val events = new BatchRangeMonitor(root).check(
      """{"orders":{"0":100,"1":60,"2":66}}""",
      """{"orders":{"0":120,"1":120,"2":86}}""")
    assert(events == Seq(
      DataLossEvent("orders", 1, 60, 80, 20, 80, 120, "batch-range")))
  }

  test("M1 property: loss reported iff earliest > committed, count = gap") {
    val gen = for {
      committed <- Gen.choose(0L, 50L)
      earliest <- Gen.choose(0L, 50L)
    } yield (committed, earliest)
    val cases = Gen.listOfN(60, gen)
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (committed, earliest) =>
      val root = brokerWith(earliest, latest = 60)
      val ckpt = tmpDir("ckpt")
      writeOffsetFile(ckpt, 0, s"""{"orders":{"0":$committed}}""")
      val events = new PreflightDetector(ckpt, root).detect()
      val actualEarliest = SimBroker.earliest(root, "orders", 0)
      withClue(s"committed=$committed earliest=$actualEarliest: ") {
        if (actualEarliest > committed) {
          assert(events.size == 1)
          assert(events.head.lostCount == actualEarliest - committed)
        } else assert(events.isEmpty)
      }
    }
  }

  test("checkpoint audit (M7): scans EVERY batch file, fires once per lost batch") {
    val root = brokerWith(earliest = 40, latest = 100)
    val ckpt = tmpDir("ckpt")
    // 4-batch history; retention expiry (earliest=40) strands batches
    // 0 and 1 — the audit must surface BOTH, not just the latest state
    writeOffsetFile(ckpt, 0, """{"orders":{"0":10}}""")
    writeOffsetFile(ckpt, 1, """{"orders":{"0":30}}""")
    writeOffsetFile(ckpt, 2, """{"orders":{"0":40}}""")
    writeOffsetFile(ckpt, 3, """{"orders":{"0":75}}""")
    val log = Files.createTempFile("audit", ".log")

    val hits = CheckpointAudit.checkDataLoss(ckpt, root, log)
    assert(hits.map(_._1) == Seq(0L, 1L)) // once per lost batch, ascending
    assert(hits.map(_._2.lostCount) == Seq(30L, 10L))
    assert(hits.forall(h => h._2.detector == "loss-logger"
      && h._2.kafkaEarliest == 40))
    val lines = Files.readAllLines(log)
    assert(lines.size == 2)
    assert(lines.get(0) ==
      "[DATA-LOSS] topic=orders partition=0 checkpointOffset=10 earliest=40 lost=30")
    assert(lines.get(1) ==
      "[DATA-LOSS] topic=orders partition=0 checkpointOffset=30 earliest=40 lost=10")

    // healthy checkpoint (all offsets ≥ earliest) → clean audit, no log
    val ckptOk = tmpDir("ckpt")
    writeOffsetFile(ckptOk, 0, """{"orders":{"0":60}}""")
    writeOffsetFile(ckptOk, 1, """{"orders":{"0":90}}""")
    val logOk = Files.createTempFile("audit", ".log")
    assert(CheckpointAudit.checkDataLoss(ckptOk, root, logOk).isEmpty)
    assert(Files.readAllLines(logOk).isEmpty)
  }

  test("listener (M3): detects loss range from progress events on a live query") {
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("sink")
    SimBroker.createTopic(root, "orders", 1)
    SimBroker.append(root, "orders", 0, (0 until 10).map(i => (None, bytes(s"r$i"), 1L)))

    // first run commits offsets 0..10
    import org.apache.spark.sql.streaming.Trigger
    def run(): Unit = {
      val q = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribe", "orders")
        .option("failOnDataLoss", "false").load()
        .selectExpr("CAST(value AS STRING) v")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // retention expires past the checkpoint; new data arrives
    // (two segments of 5 so expiry can land exactly on offset 15)
    SimBroker.append(root, "orders", 0, (10 until 15).map(i => (None, bytes(s"r$i"), 1L)))
    SimBroker.append(root, "orders", 0, (15 until 20).map(i => (None, bytes(s"r$i"), 1L)))
    SimBroker.expireThrough(root, "orders", 0, 15)

    val listener = new StreamingLossListener(root)
    spark.streams.addListener(listener)
    try {
      run()
      // listener events are async on the bus — wait for delivery
      val deadline = System.currentTimeMillis() + 20000
      while (listener.events.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.events.exists(e =>
        e.topic == "orders" && e.partition == 0 &&
          e.lostFrom == 10 && e.lostTo == 15 && e.lostCount == 5 &&
          e.detector == "listener"))
    } finally spark.streams.removeListener(listener)
  }

  test("log patterns (M5) match the Spark-internal loss messages") {
    assert(LossLogPatterns.matches(
      "WARN KafkaDataConsumer: Some data may be lost. Recovering from the earliest offset"))
    assert(LossLogPatterns.matches("Cannot fetch offset 42 for orders-0"))
    assert(LossLogPatterns.matches("Skip missing records in [10, 15)"))
    assert(!LossLogPatterns.matches("batch 3 committed"))
  }

  test("bronze pipelines: produce → ingest (stream + batch) → decoded table") {
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val streamTable = tmpDir("bronze_stream")
    val batchTable = tmpDir("bronze_batch")
    val orders = (1 to 256).map(i =>
      OrderEventProducer.Order(s"o$i", i * 2.5, f"2026-01-${i % 28 + 1}%02d"))
    OrderEventProducer.produce(root, "orders", 3, orders)

    // streaming flavor (KafkaAvroToIceberg-shaped)
    val q = BronzeIngest.streamJob(spark, root, "orders", ckpt, streamTable)
    q.awaitTermination()
    val streamed = spark.read.parquet(streamTable)
    assert(streamed.count() == 256)
    assert(streamed.schema.fieldNames.toSet ==
      Set("orderId", "amount", "ts", "ingested_at"))
    assert(streamed.selectExpr("sum(amount)").head.getDouble(0) ==
      orders.map(_.amount).sum)

    // batch flavor with bounded offsets (KafkaBatchJob-shaped)
    val n = BronzeIngest.batchJob(spark, root, "orders",
      """{"orders":{"0":0,"1":0,"2":0}}""",
      "latest", batchTable)
    assert(n == 256)
    val batched = spark.read.parquet(batchTable)
    assert(batched.filter("source = 'kafka-batch'").count() == 256)
  }
}
