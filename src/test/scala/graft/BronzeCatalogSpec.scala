package graft

import graft.pipeline.{BronzeIngest, OrderEventProducer}

/** The reference creates its bronze table under a catalog named
  * `bronze` and addresses it as `bronze.db.orders` everywhere
  * (KafkaAvroToIceberg.scala:79-100). This spec proves the rebuilt
  * catalog restores that exact identifier surface: reference-shaped
  * DDL runs verbatim, the batch job appends through it, and
  * `spark.table("bronze.db.orders")` reads it back. */
class BronzeCatalogSpec extends SparkSpec {

  test("3-level bronze.db.orders round-trips through the custom catalog") {
    BronzeIngest.registerBronzeCatalog(spark, tmpDir("bronze_wh"))

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
}
