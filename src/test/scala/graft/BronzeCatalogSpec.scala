package graft

import graft.pipeline.{BronzeIngest, OrderEventProducer}

/** The reference creates its bronze table under a catalog named
  * `bronze` and addresses it as `bronze.db.orders` everywhere
  * (KafkaAvroToIceberg.scala:79-100). This spec proves the rebuilt
  * catalog restores that exact identifier surface: reference-shaped
  * DDL runs verbatim, the batch job appends through it, and
  * `spark.table("bronze.db.orders")` reads it back. */
class BronzeCatalogSpec extends SparkSpec {

  /** One registration for the whole JVM: the session CACHES the
    * catalog instance on first use, so re-registering with a different
    * warehouse would desync later uses (and foreachBatch's cloned
    * session, which re-instantiates from conf). */
  private lazy val warehouse: String = bronzeWarehouse

  test("3-level bronze.db.orders round-trips through the custom catalog") {
    warehouse

    val root = tmpDir("broker")
    val orders = (1 to 25).map(i =>
      OrderEventProducer.Order(s"c$i", i * 2.0, "2026-03-01"))
    OrderEventProducer.produce(root, "orders", 2, orders)

    BronzeIngest.ensureBronzeTable(spark) // CREATE TABLE bronze.db.orders
    BronzeIngest.ensureBronzeTable(spark) // IF NOT EXISTS: idempotent

    val n = BronzeIngest.batchJobToTable(spark, root, "orders",
      """{"orders":{"0":0,"1":0}}""", "latest")
    assert(n == 25)

    val t = spark.table("bronze.db.orders")
    assert(t.count() == 25)
    assert(t.columns.toSeq ==
      Seq("orderId", "amount", "ts", "ingested_at", "source"))
    assert(t.filter("source = 'kafka-batch'").count() == 25)

    // second append accumulates (append-only bronze semantics)
    BronzeIngest.batchJobToTable(spark, root, "orders",
      """{"orders":{"0":0,"1":0}}""", "latest")
    assert(spark.table("bronze.db.orders").count() == 50)

    // SQL DML with the reference's identifier text
    val viaSql = spark.sql(
      "SELECT COUNT(*) AS n FROM bronze.db.orders WHERE amount > 0")
      .collect().head.getLong(0)
    assert(viaSql == 50)

    // catalog introspection sees the namespace and table
    assert(spark.sql("SHOW TABLES IN bronze.db").collect()
      .exists(_.getString(1) == "orders"))

    spark.sql("DROP TABLE bronze.db.orders")
    intercept[Exception] { spark.table("bronze.db.orders").count() }
  }

  test("streaming toTable(bronze.db.orders) — the reference's sink line, verbatim") {
    import org.apache.spark.sql.streaming.Trigger
    warehouse
    val root = tmpDir("broker")
    OrderEventProducer.produce(root, "orders", 2, (1 to 20).map(i =>
      OrderEventProducer.Order(s"t$i", i * 7.0, "2026-06-01")))
    BronzeIngest.ensureBronzeTable(spark)
    val ckpt = tmpDir("toTable_ckpt") // one checkpoint, reused by the restart

    def runStream(): Unit = {
      val wire = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribe", "orders")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "7") // multiple epochs
        .load()
      val q = BronzeIngest.decode(spark, wire)
        .withColumn("source", org.apache.spark.sql.functions.lit(null:
          String).cast("string"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .toTable("bronze.db.orders")
      q.awaitTermination()
    }

    runStream()
    val t = spark.table("bronze.db.orders")
    assert(t.count() == 20)
    assert(t.select("orderId").distinct().count() == 20)
    assert(t.filter(t("source").isNull).count() == 20)

    // restart with the same checkpoint and no new data: no duplicates
    runStream()
    assert(spark.table("bronze.db.orders").count() == 20)

    // restart with NEW data: the new run's epochs write under a fresh
    // attempt token; only the tail is consumed, nothing duplicates
    OrderEventProducer.produce(root, "orders", 2, (21 to 30).map(i =>
      OrderEventProducer.Order(s"t$i", i * 7.0, "2026-06-02")))
    runStream()
    val t2 = spark.table("bronze.db.orders")
    assert(t2.count() == 30)
    assert(t2.select("orderId").distinct().count() == 30)
    spark.sql("DROP TABLE bronze.db.orders")
  }

  test("streaming ingest into bronze.db.orders via the foreachBatch bridge") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    warehouse
    val root = tmpDir("broker")
    OrderEventProducer.produce(root, "orders", 2, (1 to 15).map(i =>
      OrderEventProducer.Order(s"s$i", i * 3.0, "2026-05-01")))
    BronzeIngest.ensureBronzeTable(spark)

    // The reference's (commented-out) sink is
    // `decoded.writeStream...toTable("bronze.db.orders")`; Spark's V2
    // file tables advertise no STREAMING_WRITE capability, so the
    // standard bridge for catalog tables without a native streaming
    // sink is foreachBatch + insertInto — same 3-level identifier,
    // same append semantics, batchId available for idempotence.
    val wire = spark.readStream.format("kafkasim")
      .option("path", root).option("subscribe", "orders")
      .option("startingOffsets", "earliest").load()
    val q = BronzeIngest.decode(spark, wire)
      .withColumn("source", org.apache.spark.sql.functions.lit(null:
        String).cast("string"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("orderId", "amount", "ts", "ingested_at", "source")
          .write.mode("append").insertInto("bronze.db.orders")
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val t = spark.table("bronze.db.orders")
    assert(t.count() == 15)
    // streaming path leaves `source` NULL — the reference's asymmetry
    assert(t.filter(t("source").isNull).count() == 15)
    spark.sql("DROP TABLE bronze.db.orders")
  }
}
