package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.{BronzeIngest, OrderEventProducer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One stream fanned into TWO bronze tables in a single foreachBatch,
  * exactly-once in BOTH after a mid-stream kill — including the nasty
  * case: the crash lands BETWEEN the two tables' appends, so one table
  * has the batch and the other doesn't. The replayed batch must
  * rewrite the first table's files idempotently (no duplicates) and
  * deliver the second table's rows exactly once. */
class FanOutSpec extends SparkSpec {

  test("fan-out into two bronze tables survives a mid-fan-out kill exactly-once") {
    bronzeWarehouse
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    OrderEventProducer.produce(root, "orders", 2,
      (1 to 30).map(i => OrderEventProducer.Order(s"f$i", i * 1.0, "2026-05-01")))

    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.fan")
    BronzeIngest.ensureBronzeTable(spark, "bronze.fan.all_orders")
    BronzeIngest.ensureBronzeTable(spark, "bronze.fan.big_orders")

    // poison: route B throws on its SECOND batch — after route A has
    // already appended that batch (the partial-fan-out crash)
    val bCalls = new AtomicInteger(0)
    def routes(poisoned: Boolean): Seq[(String, DataFrame => DataFrame)] = Seq(
      "bronze.fan.all_orders" -> identity[DataFrame] _,
      "bronze.fan.big_orders" -> { (b: DataFrame) =>
        if (poisoned && bCalls.incrementAndGet() == 2)
          throw new RuntimeException("injected mid-fan-out kill")
        b.filter(col("amount") >= 15.0)
      })

    def run(poisoned: Boolean): Either[Throwable, Unit] =
      try {
        // 10 offsets per trigger → ≥3 batches, so the kill lands on a
        // MIDDLE batch with committed batches before and after it
        val query = BronzeIngest.fanOutJob(spark, root, "orders", ckpt,
          routes(poisoned), tag = "fanspec",
          readerOptions = Map("maxOffsetsPerTrigger" -> "10"))
        query.awaitTermination()
        Right(())
      } catch { case e: Throwable => Left(e) }

    val first = run(poisoned = true)
    assert(first.isLeft, "poisoned run should have failed")

    // partial state is allowed mid-crash; the restart must heal it
    val second = run(poisoned = false)
    assert(second.isRight, s"clean restart failed: $second")

    val all = spark.table("bronze.fan.all_orders")
    val big = spark.table("bronze.fan.big_orders")
    assert(all.count() == 30)
    assert(all.select("orderId").distinct().count() == 30)
    assert(big.count() == 16) // amounts 15..30
    assert(big.select("orderId").distinct().count() == 16)
    assert(big.agg(min(col("amount"))).collect().head.getDouble(0) == 15.0)

    spark.sql("DROP TABLE bronze.fan.all_orders")
    spark.sql("DROP TABLE bronze.fan.big_orders")
  }
}
