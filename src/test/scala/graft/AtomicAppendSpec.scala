package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.catalog.BronzeBatchAppend

/** The reference's batch job commits one atomic Iceberg snapshot
  * (KafkaBatchJob.java:95-98) — a crashed append leaves the table
  * untouched. These specs kill a write mid-flight (exception injection
  * in one task AFTER other tasks have produced data) and prove no
  * partial rows become visible, on both append paths:
  * the plain-directory [[BronzeBatchAppend]] and the bronze catalog's
  * stage-then-rename V2 batch write. */
class AtomicAppendSpec extends SparkSpec {

  import spark.implicits._

  /** Non-hidden filesystem entries — what a parquet reader can see. */
  private def visible(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .toSet

  /** Staged-garbage cleanup races the job abort: tasks still running
    * when the job fails delete their own staged files asynchronously.
    * Invisibility to READERS is immediate (dot-files); emptiness of
    * the hidden staging area is only eventual. */
  private def eventually(timeoutMs: Long = 10000)(cond: => Seq[String]): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var left = cond
    while (left.nonEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); left = cond
    }
    assert(left.isEmpty, s"staged garbage left behind: $left")
  }

  /** A 4-partition dataset whose LAST partition throws after the
    * earlier partitions have written all their rows. */
  private def poisoned = spark.range(0, 400, 1, 4).as[Long]
    .map { i => if (i >= 399) throw new RuntimeException("injected"); i }

  test("plain-dir atomic append: failed write leaves the table byte-identical") {
    val dir = tmpDir("atomic_plain")
    BronzeBatchAppend.append(spark.range(0, 100, 1, 4).toDF(), dir)
    val before = visible(dir)
    assert(spark.read.parquet(dir).count() == 100)

    intercept[Exception] { BronzeBatchAppend.append(poisoned.toDF(), dir) }

    assert(visible(dir) == before, "failed append changed visible files")
    assert(spark.read.parquet(dir).count() == 100)
    // the stage directory is swept on failure — no hidden garbage
    // either (eventually: lingering tasks may re-create entries for a
    // moment after the abort, then remove them)
    eventually() {
      Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith(".batch-stage")).toSeq
    }

    // and the next append still works
    BronzeBatchAppend.append(spark.range(100, 150, 1, 2).toDF(), dir)
    assert(spark.read.parquet(dir).count() == 150)
  }

  test("bronze catalog batch write: failed INSERT is invisible, abort sweeps stages") {
    bronzeWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.atomics")
    spark.sql(
      "CREATE TABLE bronze.atomics.t (id BIGINT) USING parquet")

    spark.range(0, 100, 1, 4).toDF("id")
      .write.mode("append").insertInto("bronze.atomics.t")
    assert(spark.table("bronze.atomics.t").count() == 100)
    // resolve the warehouse from the LIVE catalog instance (cached on
    // first use — conf may lag behind it)
    val w = spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog].warehouseDir
    val dir = s"$w/atomics/t"
    val before = visible(dir)

    intercept[Exception] {
      poisoned.toDF("id").write.mode("append").insertInto("bronze.atomics.t")
    }

    assert(visible(dir) == before, "failed insert changed visible files")
    assert(spark.table("bronze.atomics.t").count() == 100)
    // BatchWrite.abort swept every staged dot-file of the write
    // (eventually: a task committing concurrently with the job failure
    // can land its stage after the driver's sweep; the writer-side
    // abort then removes it)
    eventually() {
      Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith(".batch-q")).toSeq
    }

    spark.range(100, 150, 1, 2).toDF("id")
      .write.mode("append").insertInto("bronze.atomics.t")
    assert(spark.table("bronze.atomics.t").count() == 150)
    spark.sql("DROP TABLE bronze.atomics.t")
  }
}
