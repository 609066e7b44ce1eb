package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.OrderEventProducer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `foreachBatch` — the arbitrary-sink escape hatch production
  * streaming jobs use when the destination has no native connector
  * (JDBC, REST, multi-table fan-out). Each micro-batch arrives as a
  * plain DataFrame with its batchId; exactly-once then rests on the
  * (batchId, idempotent write) contract, which this spec exercises by
  * writing per-batch parquet directories keyed by batchId and
  * re-running from the same checkpoint. */
class ForeachBatchSpec extends SparkSpec {

  test("foreachBatch sees every batch once; restart does not re-deliver") {
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("fanout")
    OrderEventProducer.produce(root, "orders", 2,
      (1 to 30).map(i => OrderEventProducer.Order(s"o$i", i * 1.0, "2026-04-01")))

    def runOnce(): Seq[Long] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribe", "orders")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "10") // force multiple batches
        .load()
        .selectExpr("partition", "offset", "CAST(value AS BINARY) AS value")
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          seen += batchId
          // idempotent per-batch write: overwrite the batch's own dir
          batch.write.mode("overwrite").parquet(s"$out/batch_$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      seen.toSeq
    }

    val batches1 = runOnce()
    assert(batches1.size >= 3) // 30 rows / 10 per trigger
    assert(batches1 == batches1.sorted && batches1.distinct == batches1)
    val dirs = Files.list(Paths.get(out)).count()
    assert(dirs == batches1.size)
    val total = spark.read.parquet(s"$out/batch_*").count()
    assert(total == 30)
    // offsets are complete and unique across batch outputs
    assert(spark.read.parquet(s"$out/batch_*")
      .select(col("partition"), col("offset")).distinct().count() == 30)

    // restart from the same checkpoint with no new data: nothing re-runs
    val batches2 = runOnce()
    assert(batches2.isEmpty)
    assert(spark.read.parquet(s"$out/batch_*").count() == 30)
  }
}
