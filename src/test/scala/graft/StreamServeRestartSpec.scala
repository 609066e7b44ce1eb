package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once restart for the STREAMING SERVE loop (st17/st18's
  * foreachBatch landing): the query stream is stopped mid-workload
  * and a NEW query resumes from the same checkpoint. Batches already
  * landed must not be reprocessed (their files stay byte-identical),
  * the remaining queries must be answered exactly once, and the union
  * of all landed epochs must equal the batch filtered serve (s19)
  * row for row — the property that makes the foreachBatch landing a
  * real exactly-once sink, not just an at-least-once one. */
class StreamServeRestartSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5Of(f: java.io.File): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
  }

  private def stage(dir: String, name: String, modMs: Long,
      rows: DataFrame): Unit = {
    val tmp = s"$dir/_tmp_$name"
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = Files.list(Paths.get(tmp)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(f, Paths.get(s"$dir/$name.parquet"))
    Files.setLastModifiedTime(Paths.get(s"$dir/$name.parquet"),
      FileTime.fromMillis(modMs))
  }

  private def runServe(input: String, out: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(s"$input/00.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
      .select(col("vec_id").as("q_id"), col("embedding").as("av"),
        col("label"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        graft.operators.Similarity.servePqBatchFiltered(sess, sf, batch,
          graft.operators.Similarity.loadPqIndex(sess))
          .write.mode("overwrite").parquet(s"$out/b$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("stop/resume answers every query exactly once and never " +
      "reprocesses a landed epoch") {
    graft.operators.Similarity.ensurePqIndex(spark, sf)
    val input = tmpDir("serve-restart-in")
    val out = tmpDir("serve-restart-out")
    val ckpt = tmpDir("serve-restart-ckpt")
    val odd = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"), col("label"))

    // phase 1: the first half of the workload, then the stream ends
    stage(input, "00", 1000000L, odd.filter(col("vec_id") < 250))
    runServe(input, out, ckpt)
    val landed = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(landed.nonEmpty, "phase 1 landed no epoch")
    val phase1Sums = landed.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> md5Of(f))).toMap

    // phase 2: the rest arrives, a NEW query resumes the checkpoint
    stage(input, "01", 1060000L, odd.filter(col("vec_id") >= 250))
    runServe(input, out, ckpt)

    // landed epochs from phase 1 are byte-identical (not reprocessed)
    phase1Sums.foreach { case (path, sum) =>
      assert(md5Of(new java.io.File(path)) === sum,
        s"restart rewrote already-landed epoch file $path")
    }

    // and the union of every epoch equals the batch filtered serve
    val streamed = spark.read.parquet(s"$out/*")
      .orderBy(col("q_id")).collect()
    val batch = SparkEntry.queries("s19_filtered_ann")(spark, sf)
      .collect()
    assert(streamed.length === batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
    // exactly once: no query answered twice across epochs
    val qids = streamed.map(_.getLong(0))
    assert(qids.distinct.length === qids.length)
  }
}
