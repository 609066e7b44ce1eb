package graft

import graft.sources.kafkasim.SimBroker

/** The reference job subscribes to a single literal topic; the source
  * keeps Kafka's comma-list `subscribe` surface (SURVEY §2.3 "grouping
  * of streams") — verified here. */
class MultiTopicSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("comma-list subscribe reads all topics with correct attribution") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "alpha", 2)
    SimBroker.createTopic(root, "beta", 1)
    SimBroker.append(root, "alpha", 0, (0 until 5).map(i => (None, bytes(s"a0-$i"), 1L)))
    SimBroker.append(root, "alpha", 1, (0 until 3).map(i => (None, bytes(s"a1-$i"), 1L)))
    SimBroker.append(root, "beta", 0, (0 until 7).map(i => (None, bytes(s"b0-$i"), 1L)))

    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "alpha, beta").load()
    val byTopic = df.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic == Map("alpha" -> 8L, "beta" -> 7L))

    // per-topic offset ranges honored independently
    val ranged = spark.read.format("kafkasim")
      .option("path", root).option("subscribe", "alpha,beta")
      .option("startingOffsets", """{"alpha":{"0":2,"1":0},"beta":{"0":5}}""")
      .load()
    val got = ranged.selectExpr("topic", "partition", "offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq(("alpha", 0, 2L), ("alpha", 0, 3L), ("alpha", 0, 4L),
      ("alpha", 1, 0L), ("alpha", 1, 1L), ("alpha", 1, 2L),
      ("beta", 0, 5L), ("beta", 0, 6L)))
  }

  test("assign pins explicit topic-partitions; no broker discovery") {
    val root = tmpDir("broker_assign")
    SimBroker.createTopic(root, "alpha", 3)
    SimBroker.createTopic(root, "beta", 1)
    (0 until 3).foreach(p => SimBroker.append(root, "alpha", p,
      (0 until (p + 2)).map(i => (None, bytes(s"a$p-$i"), 1L))))
    SimBroker.append(root, "beta", 0,
      (0 until 4).map(i => (None, bytes(s"b0-$i"), 1L)))

    // only alpha-0 and alpha-2 are assigned: alpha-1 and beta invisible
    val df = spark.read.format("kafkasim")
      .option("path", root)
      .option("assign", """{"alpha":[0,2]}""").load()
    val got = df.selectExpr("topic", "partition").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got.toSet == Set(("alpha", 0), ("alpha", 2)))
    assert(got.count(_ == ("alpha", 0)) == 2) // p0 holds 2 records
    assert(got.count(_ == ("alpha", 2)) == 4) // p2 holds 4
    // offsets ranges still honored per assigned partition
    val ranged = spark.read.format("kafkasim")
      .option("path", root)
      .option("assign", """{"alpha":[2],"beta":[0]}""")
      .option("startingOffsets", """{"alpha":{"2":3},"beta":{"0":2}}""")
      .load()
    assert(ranged.count() == 1 + 2)
    // a nonexistent partition fails loudly at plan time
    intercept[Exception] {
      spark.read.format("kafkasim")
        .option("path", root)
        .option("assign", """{"alpha":[7]}""").load().collect()
    }
    // mutual exclusion across ALL THREE subscription modes
    intercept[Exception] {
      spark.read.format("kafkasim")
        .option("path", root)
        .option("subscribe", "alpha")
        .option("assign", """{"alpha":[0]}""").load().collect()
    }
    intercept[Exception] {
      spark.read.format("kafkasim")
        .option("path", root)
        .option("subscribePattern", "al.*")
        .option("assign", """{"alpha":[0]}""").load().collect()
    }
  }

  test("subscribePattern resolves topics by regex against the broker") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "orders-v1", 1)
    SimBroker.createTopic(root, "orders-v2", 1)
    SimBroker.createTopic(root, "audit", 1)
    SimBroker.append(root, "orders-v1", 0, (0 until 4).map(i => (None, bytes(s"o1-$i"), 1L)))
    SimBroker.append(root, "orders-v2", 0, (0 until 2).map(i => (None, bytes(s"o2-$i"), 1L)))
    SimBroker.append(root, "audit", 0, (0 until 9).map(i => (None, bytes(s"x-$i"), 1L)))

    val df = spark.read.format("kafkasim")
      .option("path", root).option("subscribePattern", "orders-v[0-9]+").load()
    val byTopic = df.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic == Map("orders-v1" -> 4L, "orders-v2" -> 2L))
  }

  test("streaming subscribePattern picks up topics created after the stream starts") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("broker")
    val ckpt = tmpDir("ckpt")
    val sink = tmpDir("sink")
    SimBroker.createTopic(root, "orders-v1", 1)
    SimBroker.append(root, "orders-v1", 0,
      (0 until 4).map(i => (None, bytes(s"o1-$i"), 1L)))

    def runOnce(): Unit = {
      val q = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribePattern", "orders-v[0-9]+")
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false").load()
        .selectExpr("topic", "CAST(value AS STRING) AS v")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(sink).count() == 4)

    // a matching topic (and more rows on the old one) arrive AFTER the
    // first run; the pattern must re-resolve on restart/next batch
    SimBroker.createTopic(root, "orders-v2", 1)
    SimBroker.append(root, "orders-v2", 0,
      (0 until 3).map(i => (None, bytes(s"o2-$i"), 1L)))
    SimBroker.append(root, "orders-v1", 0,
      (0 until 2).map(i => (None, bytes(s"o1-late-$i"), 1L)))
    runOnce()

    val byTopic = spark.read.parquet(sink).groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic == Map("orders-v1" -> 6L, "orders-v2" -> 3L))
  }

  test("minPartitions splits offset ranges without changing results") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "big", 2)
    // several segments per partition so range splits cross segment
    // boundaries
    (0 until 5).foreach { g =>
      SimBroker.append(root, "big", 0,
        (0 until 40).map(i => (None, bytes(s"p0-${g * 40 + i}"), 1L)))
      SimBroker.append(root, "big", 1,
        (0 until 30).map(i => (None, bytes(s"p1-${g * 30 + i}"), 1L)))
    }
    def reader(min: Option[Int]) = {
      val r = spark.read.format("kafkasim")
        .option("path", root).option("subscribe", "big")
      min.fold(r)(m => r.option("minPartitions", m.toString)).load()
    }
    val plain = reader(None)
    val split = reader(Some(16))
    assert(plain.rdd.getNumPartitions == 2)
    assert(split.rdd.getNumPartitions >= 16)
    // same rows, same offsets, order within (partition, offset) intact
    val a = plain.selectExpr("partition", "offset", "CAST(value AS STRING)")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = split.selectExpr("partition", "offset", "CAST(value AS STRING)")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("maxOffsetsPerTrigger rate-limits every micro-batch") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("broker")
    val sink = tmpDir("sink")
    SimBroker.createTopic(root, "rl", 2)
    SimBroker.append(root, "rl", 0,
      (0 until 12).map(i => (None, bytes(s"p0-$i"), 1L)))
    SimBroker.append(root, "rl", 1,
      (0 until 8).map(i => (None, bytes(s"p1-$i"), 1L)))

    val q = spark.readStream.format("kafkasim")
      .option("path", root).option("subscribe", "rl")
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", "5").load()
      .selectExpr("partition", "offset")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // nothing lost, nothing duplicated
    assert(spark.read.parquet(sink).count() == 20)
    assert(spark.read.parquet(sink).distinct().count() == 20)
    // every batch admitted at most 5 rows, so it took ≥ 4 data batches
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.forall(_ <= 5), s"batch sizes: ${sizes.mkString(",")}")
    assert(sizes.length >= 4)
  }

  test("maxOffsetsPerTrigger below the partition count still drains (sub-1 shares ceil)") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("broker")
    val sink = tmpDir("sink")
    SimBroker.createTopic(root, "tiny", 3)
    (0 until 3).foreach { p =>
      SimBroker.append(root, "tiny", p,
        (0 until 4).map(i => (None, bytes(s"p$p-$i"), 1L)))
    }
    // 2 < 3 lagging partitions: a floor-only prorate would assign every
    // partition 0 rows and never terminate
    val q = spark.readStream.format("kafkasim")
      .option("path", root).option("subscribe", "tiny")
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", "2").load()
      .selectExpr("partition", "offset")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "rate-limited stream failed to drain")
    assert(spark.read.parquet(sink).count() == 12)
  }

  test("non-positive maxOffsetsPerTrigger is rejected") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "z", 1)
    SimBroker.append(root, "z", 0, Seq((None, bytes("x"), 1L)))
    val e = intercept[Exception] {
      val q = spark.readStream.format("kafkasim")
        .option("path", root).option("subscribe", "z")
        .option("maxOffsetsPerTrigger", "0").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("must be positive"))))
  }

  test("subscribe and subscribePattern are mutually exclusive") {
    val root = tmpDir("broker")
    SimBroker.createTopic(root, "t", 1)
    val e = intercept[Exception] {
      spark.read.format("kafkasim")
        .option("path", root).option("subscribe", "t")
        .option("subscribePattern", "t.*").load().count()
    }
    assert(e.getMessage.contains("exactly one of"))
  }
}
