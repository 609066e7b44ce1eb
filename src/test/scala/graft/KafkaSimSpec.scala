package graft

import graft.sources.kafkasim.{KafkaSimSource, SimBroker}
import graft.streaming.monitors._
import org.apache.spark.sql.streaming.Trigger

class KafkaSimSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def fillBroker(root: String): Unit = {
    SimBroker.createTopic(root, "orders", 3)
    // three segments on p0 (offsets 0-4, 5-9, 10-14), one on p1, none extra on p2
    (0 until 3).foreach { seg =>
      SimBroker.append(root, "orders", 0,
        (0 until 5).map(i => (None, bytes(s"p0-${seg * 5 + i}"), 1000L + i)))
    }
    SimBroker.append(root, "orders", 1,
      (0 until 4).map(i => (None, bytes(s"p1-$i"), 2000L)))
  }

  test("SimBroker append/read/earliest/latest/expire") {
    val root = tmpDir("broker")
    fillBroker(root)
    assert(SimBroker.partitions(root, "orders") == Seq(0, 1, 2))
    assert(SimBroker.earliest(root, "orders", 0) == 0L)
    assert(SimBroker.latest(root, "orders", 0) == 15L)
    assert(SimBroker.latest(root, "orders", 2) == 0L)
    val vals = SimBroker.read(root, "orders", 0, 3, 12).map(r =>
      new String(r.value, "UTF-8")).toSeq
    assert(vals == (3 until 12).map(i => s"p0-$i"))
    SimBroker.expireThrough(root, "orders", 0, 7) // deletes segment 0-4 only
    assert(SimBroker.earliest(root, "orders", 0) == 5L)
    assert(SimBroker.latest(root, "orders", 0) == 15L)
  }

  test("batch read: full range, wire schema, per-partition planning") {
    val root = tmpDir("broker")
    fillBroker(root)
    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders").load()
    assert(df.schema.fieldNames.toSeq == Seq("key", "value", "topic",
      "partition", "offset", "timestamp", "timestampType"))
    assert(df.count() == 19)
    val byPart = df.groupBy("partition").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byPart == Map(0 -> 15L, 1 -> 4L, 2 -> 0L).filter(_._2 > 0))
  }

  test("batch read honors startingOffsets/endingOffsets JSON") {
    val root = tmpDir("broker")
    fillBroker(root)
    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders")
      .option("startingOffsets", """{"orders":{"0":5,"1":1,"2":0}}""")
      .option("endingOffsets", """{"orders":{"0":12,"1":3,"2":0}}""")
      .load()
    val got = df.selectExpr("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(got == ((5L until 12L).map(o => (0, o)) ++ (1L until 3L).map(o => (1, o))).sorted)
  }

  test("column pruning reaches the reader (only value read)") {
    val root = tmpDir("broker")
    fillBroker(root)
    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders").load()
      .selectExpr("length(value) AS n")
    val plan = df.queryExecution.executedPlan.toString
    // pruned scan shows only the value column in ReadSchema
    assert(df.count() == 19)
    assert(plan.contains("KafkaSim") || plan.contains("BatchScan"))
  }

  test("failOnDataLoss=true throws on expired range; false skips") {
    val root = tmpDir("broker")
    fillBroker(root)
    SimBroker.expireThrough(root, "orders", 0, 7)
    val strict = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders")
      .option("startingOffsets", """{"orders":{"0":0,"1":0,"2":0}}""")
      .option("failOnDataLoss", "true").load()
    val e = intercept[Exception] { strict.count() }
    assert(e.getMessage.contains("Data loss") ||
      Option(e.getCause).exists(_.getMessage.contains("Data loss")))
    val lax = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders")
      .option("startingOffsets", """{"orders":{"0":0,"1":0,"2":0}}""")
      .option("failOnDataLoss", "false").load()
    assert(lax.filter("partition = 0").count() == 10) // 5..14 survive
  }

  test("micro-batch stream: checkpointed, exactly-once across restart") {
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("sink")
    SimBroker.createTopic(root, "orders", 2)
    SimBroker.append(root, "orders", 0, (0 until 6).map(i => (None, bytes(s"a$i"), 1L)))
    SimBroker.append(root, "orders", 1, (0 until 3).map(i => (None, bytes(s"b$i"), 1L)))

    def runOnce(): Unit = {
      val q = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribe", "orders")
        .option("startingOffsets", "earliest").load()
        .selectExpr("CAST(value AS STRING) AS v", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 9)
    // restart with no new data → nothing duplicated
    runOnce()
    assert(spark.read.parquet(out).count() == 9)
    // append more, restart → only the delta lands
    SimBroker.append(root, "orders", 0, (6 until 10).map(i => (None, bytes(s"a$i"), 1L)))
    runOnce()
    assert(spark.read.parquet(out).count() == 13)
    assert(spark.read.parquet(out).select("v").distinct().count() == 13)

    // the checkpoint's offset files parse with the reference-format parser
    val ids = CheckpointOffsets.batchIds(ckpt)
    assert(ids.nonEmpty)
    val offsets = CheckpointOffsets.latestOffsets(ckpt).get._2
    assert(offsets == Map(("orders", 0) -> 10L, ("orders", 1) -> 3L))
    assert(CheckpointOffsets.readCheckpointOffset(ckpt, "orders", 0).contains(10L))
  }

  test("offset JSON round-trip matches Kafka source format") {
    val m = Map(("orders", 0) -> 100L, ("orders", 2) -> 66L, ("orders", 1) -> 60L)
    val json = KafkaSimSource.toOffsetJson(m)
    assert(json == """{"orders":{"0":100,"1":60,"2":66}}""")
    assert(KafkaSimSource.parseOffsetJson(json) == m)
  }
}
