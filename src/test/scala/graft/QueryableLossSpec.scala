package graft

import graft.sources.kafkasim.SimBroker
import graft.streaming.monitors.QueryableLossListener
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** M3's live loss events exposed as a QUERYABLE STREAM: the listener
  * feeds an in-memory streaming source, a downstream Structured
  * Streaming query aggregates it into a memory sink, and the result is
  * plain SQL — closing SURVEY §2.2's "also expose as a DataFrame for
  * queryability" note for the live path. */
class QueryableLossSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("live loss events stream into a memory sink and answer SQL") {
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("sink")
    SimBroker.createTopic(root, "orders", 1)
    SimBroker.append(root, "orders", 0,
      (0 until 10).map(i => (None, bytes(s"r$i"), 1L)))

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
    run() // commits offsets 0..10
    SimBroker.append(root, "orders", 0,
      (10 until 15).map(i => (None, bytes(s"r$i"), 1L)))
    SimBroker.append(root, "orders", 0,
      (15 until 20).map(i => (None, bytes(s"r$i"), 1L)))
    SimBroker.expireThrough(root, "orders", 0, 15)

    val listener = new QueryableLossListener(root, spark)
    spark.streams.addListener(listener)
    try {
      run() // restarts past the expired range → loss detected live
      val deadline = System.currentTimeMillis() + 20000
      while (listener.events.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.events.nonEmpty)

      // the SAME events, consumed as a stream: aggregate loss volume
      // per topic-partition into a memory sink, then query it as SQL
      val agg = listener.lossEvents.toDF()
        .groupBy(col("topic"), col("partition"), col("detector"))
        .agg(sum(col("lostCount")).as("lost_total"),
          min(col("lostFrom")).as("lost_from"),
          max(col("lostTo")).as("lost_to"))
      val q = agg.writeStream.format("memory")
        .queryName("loss_live").outputMode("complete").start()
      q.processAllAvailable()
      val row = spark.sql(
        """SELECT topic, partition, lost_total, lost_from, lost_to
           FROM loss_live WHERE detector = 'listener'""").collect()
      q.stop()

      assert(row.length == 1)
      assert(row.head.getString(0) == "orders")
      assert(row.head.getInt(1) == 0)
      assert(row.head.getLong(2) == 5L) // offsets 10..15 expired
      assert(row.head.getLong(3) == 10L && row.head.getLong(4) == 15L)
    } finally spark.streams.removeListener(listener)
  }
}
