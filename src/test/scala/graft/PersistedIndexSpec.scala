package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan

/** s13's scale claim, asserted on the plan: the persisted
  * LSH-bucketed corpus joins WITHOUT an exchange on its side — the
  * bucket shuffle was paid once at index-build time — while the
  * exploded query side shuffles to align. And the query agrees with
  * s11 (same oracle, same semantics, different physical path).
  */
class PersistedIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s13 equals s11 row for row (the layout changes, the answer doesn't)") {
    val viaIndex =
      SparkEntry.queries("s13_persisted_bucket_index")(spark, sf).collect()
    val selfJoin = SparkEntry.queries("s11_corpus_retrieval")(spark, sf).collect()
    assert(viaIndex.length == selfJoin.length && viaIndex.length > 0)
    viaIndex.zip(selfJoin).foreach { case (a, b) => assert(a == b) }
  }

  test("s13 probe join: no exchange under the bucketed corpus side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("s13_persisted_bucket_index")(spark, sf)
      def findJoin(p: SparkPlan): Option[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findJoin(a.executedPlan)
        case j: SortMergeJoinExec => Some(j)
        case j: ShuffledHashJoinExec => Some(j)
        case other => other.children.view.flatMap(findJoin).headOption
      }
      val join = findJoin(df.queryExecution.executedPlan)
      assert(join.isDefined, "expected a shuffle-family probe join")
      // query side explodes H+1 probes and MUST shuffle to align;
      // the corpus side's write-time bucketing must satisfy the join
      // distribution with no exchange of its own
      val Seq(left, right) = join.get.children
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      val corpusSide =
        if (right.toString.contains("s13_corpus_idx")) right else left
      assert(corpusSide.toString.contains("s13_corpus_idx"),
        s"couldn't locate the bucketed corpus side:\n${join.get}")
      assert(shuffles(corpusSide).isEmpty,
        s"persisted index side re-shuffled:\n$corpusSide")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS s13_corpus_idx")
    }
  }

  test("s17 delta append: base index files byte-identical, probe still exchange-free") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idxDir = new java.io.File(graft.operators.Similarity.s17IndexPath(sf))
      // byte-identity proof via CONTENT checksum — size+mtime would
      // falsely pass an in-place same-size rewrite landing in the
      // same millisecond
      def md5Of(f: java.io.File): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }
      def listing(): Map[String, String] =
        idxDir.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> md5Of(f)).toMap

      graft.operators.Similarity.s17BuildBase(spark, sf)
      val baseFiles = listing()
      assert(baseFiles.nonEmpty)

      graft.operators.Similarity.s17AppendDelta(spark, sf)
      val afterAppend = listing()

      // O(|delta|) maintenance: every base file survives the append
      // byte-identical (never rewritten), and the delta arrived as
      // strictly NEW files
      baseFiles.foreach { case (name, sum) =>
        assert(afterAppend.get(name).contains(sum),
          s"base index file $name was rewritten by the delta append")
      }
      assert(afterAppend.size > baseFiles.size,
        "append added no new files — did it rewrite in place?")
      val corpus = spark.table("s17_corpus_idx")
      assert(corpus.filter(col("c_id") % 10 === 0).count() > 0,
        "delta rows missing from the index")

      // the grown index must answer EXACTLY like a from-scratch full
      // index (s11's self-join over the same even stripe) — this is
      // what catches a bucketed-insert routing the delta into wrong
      // bucket files, which every file/plan assertion above survives
      val probe = graft.operators.Similarity.s17Probe(spark, sf)
      val viaIncremental = probe.collect()
      val fullIndex = SparkEntry.queries("s11_corpus_retrieval")(spark, sf)
        .collect()
      assert(viaIncremental.length == fullIndex.length &&
        viaIncremental.length > 0)
      viaIncremental.zip(fullIndex).foreach { case (a, b) => assert(a == b) }

      // and the probe over the grown index still plans exchange-free
      // on the corpus side (the s13 assertion, post-append) — a FRESH
      // probe frame over the existing table (no second build; and not
      // the collected one above, whose AQE run may have re-planned
      // the join as broadcast, hiding the shuffle-family node)
      val df = graft.operators.Similarity.s17Probe(spark, sf)
      def findJoin(p: SparkPlan): Option[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findJoin(a.executedPlan)
        case j: SortMergeJoinExec => Some(j)
        case j: ShuffledHashJoinExec => Some(j)
        case other => other.children.view.flatMap(findJoin).headOption
      }
      val join = findJoin(df.queryExecution.executedPlan)
      assert(join.isDefined, "expected a shuffle-family probe join")
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      val corpusSide = join.get.children
        .find(_.toString.contains("s17_corpus_idx"))
      assert(corpusSide.isDefined, s"no corpus side in:\n${join.get}")
      assert(shuffles(corpusSide.get).isEmpty,
        s"appended index re-shuffled at probe time:\n${corpusSide.get}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS s17_corpus_idx")
    }
  }

  test("s17 compaction crash recovery: a kill between DROP and RENAME " +
      "loses nothing — re-running compaction completes the swap") {
    try {
      graft.operators.Similarity.s17BuildBase(spark, sf)
      graft.operators.Similarity.s17AppendDelta(spark, sf)
      val expected = graft.operators.Similarity.s17Probe(spark, sf).collect()
      assert(expected.nonEmpty)

      // replicate the compaction rewrite by hand, then crash INSIDE
      // the swap window: staging table written, live table dropped,
      // rename never reached. The staging generation is now the ONLY
      // copy of the index (the old code's unconditional defensive
      // `DROP TABLE IF EXISTS s17_corpus_idx_next` destroyed it here).
      val next = graft.operators.Similarity.s17IndexPath(sf) + "-a"
      val scanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      spark.conf.set(scanKey, "false")
      try {
        spark.sql("DROP TABLE IF EXISTS s17_corpus_idx_next")
        spark.table("s17_corpus_idx")
          .write.mode("overwrite").option("path", next)
          .bucketBy(8, "bucket_c")
          .saveAsTable("s17_corpus_idx_next")
      } finally spark.conf.unset(scanKey)
      spark.sql("DROP TABLE s17_corpus_idx") // ← the crash point

      // re-running compaction must detect the half-finished swap,
      // complete the interrupted rename FIRST, and then compact as
      // normal — no rebuild, no data loss, answers identical
      graft.operators.Similarity.s17Compact(spark, sf)
      val recovered = graft.operators.Similarity.s17Probe(spark, sf).collect()
      assert(recovered.length === expected.length)
      recovered.zip(expected).foreach { case (a, b) => assert(a === b) }
      // and the staging name is free again (the swap completed)
      assert(!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier("s17_corpus_idx_next")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS s17_corpus_idx")
      spark.sql("DROP TABLE IF EXISTS s17_corpus_idx_next")
    }
  }

  test("s17 compaction: one file per bucket, answers and probe plan unchanged") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def parquets(dir: String): Array[java.io.File] = {
        val d = new java.io.File(dir)
        if (d.exists()) d.listFiles().filter(_.getName.endsWith(".parquet"))
        else Array.empty
      }
      graft.operators.Similarity.s17BuildBase(spark, sf)
      graft.operators.Similarity.s17AppendDelta(spark, sf)
      val basePath = graft.operators.Similarity.s17IndexPath(sf)
      val beforeCount = parquets(basePath).length
      val before = graft.operators.Similarity.s17Probe(spark, sf).collect()

      graft.operators.Similarity.s17Compact(spark, sf)

      // the rewrite landed in a sibling generation, bin-packed to at
      // most one file per bucket, and the superseded files are gone
      val genFiles = parquets(s"$basePath-a") ++ parquets(s"$basePath-b")
      assert(genFiles.nonEmpty, "compaction wrote no generation dir")
      assert(genFiles.length <= 8,
        s"${genFiles.length} files after compaction — not bin-packed per bucket")
      assert(genFiles.length < beforeCount,
        s"file count did not drop ($beforeCount -> ${genFiles.length})")
      assert(parquets(basePath).isEmpty,
        "superseded generation's files were not removed")

      // answers identical post-compaction
      val after = graft.operators.Similarity.s17Probe(spark, sf).collect()
      assert(after.length == before.length && after.length > 0)
      after.zip(before).foreach { case (a, b) => assert(a == b) }

      // and the probe still plans zero exchange under the corpus side
      val df = graft.operators.Similarity.s17Probe(spark, sf)
      def findJoin(p: SparkPlan): Option[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findJoin(a.executedPlan)
        case j: SortMergeJoinExec => Some(j)
        case j: ShuffledHashJoinExec => Some(j)
        case other => other.children.view.flatMap(findJoin).headOption
      }
      val join = findJoin(df.queryExecution.executedPlan)
      assert(join.isDefined, "expected a shuffle-family probe join")
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      val corpusSide = join.get.children
        .find(_.toString.contains("s17_corpus_idx"))
      assert(corpusSide.isDefined, s"no corpus side in:\n${join.get}")
      assert(shuffles(corpusSide.get).isEmpty,
        s"compacted index re-shuffled at probe time:\n${corpusSide.get}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS s17_corpus_idx")
    }
  }
}
