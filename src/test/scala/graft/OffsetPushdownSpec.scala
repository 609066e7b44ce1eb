package graft

import graft.sources.kafkasim.SimBroker

class OffsetPushdownSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("offset >= N narrows planned input partitions; results unchanged") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "orders", 2)
    SimBroker.append(root, "orders", 0, (0 until 50).map(i => (None, bytes(s"a$i"), 1L)))
    SimBroker.append(root, "orders", 1, (0 until 30).map(i => (None, bytes(s"b$i"), 1L)))

    val unfiltered = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders").load()
      .selectExpr("partition", "offset")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .filter(_._2 >= 20).sorted

    val q = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "orders").load()
      .filter("offset >= 20")
      .selectExpr("partition", "offset")

    // physical effect: every planned input partition starts at the
    // pushed bound, not at earliest
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val parts = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions
    }.flatten.collect {
      case p: graft.sources.kafkasim.KafkaSimInputPartition => p
    }
    assert(parts.nonEmpty && parts.forall(_.from == 20L),
      s"startingOffsets not pushed; partitions: $parts")
    // visible in explain via the scan description
    assert(q.queryExecution.executedPlan.toString
      .contains("pushedOffsetLowerBound=20"))

    val got = q.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(got.toSeq == unfiltered.toSeq && got.length == 40)
  }

  test("no offset bound → full-range scan (pushdown is a no-op)") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "t", 1)
    SimBroker.append(root, "t", 0, (0 until 10).map(i => (None, bytes(s"r$i"), 1L)))
    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "t").load()
      .filter("partition = 0")
    assert(df.count() == 10)
  }

  test("pushed bound composes with explicit startingOffsets (max wins)") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "t", 1)
    SimBroker.append(root, "t", 0, (0 until 40).map(i => (None, bytes(s"r$i"), 1L)))
    val hi = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "t")
      .option("startingOffsets", """{"t":{"0":30}}""").load()
      .filter("offset >= 10") // weaker than the explicit start
    assert(hi.count() == 10) // 30..39
    val lo = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "t")
      .option("startingOffsets", """{"t":{"0":5}}""").load()
      .filter("offset >= 20") // stronger than the explicit start
    assert(lo.count() == 20) // 20..39
  }
}
