package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** The scale knobs (`spark.graft.*`) must actually re-derive the
  * operators' geometry at runtime — a 100× deployment changes them in
  * config, not in source. DuckDB isn't callable from here, so alternate
  * geometries are verified against brute-force equivalents computed in
  * Spark itself:
  *   - d04 at 32-bit/4-band: the banded candidate join must return
  *     EXACTLY the pairs a full O(n²) hamming scan of the same
  *     signatures returns (banding is lossless for hamming ≤ bands-1);
  *   - s02 at 4 hyperplanes: the native codegen'd bucket must equal the
  *     interpreted HOF bucket re-derived for 4 planes, and the probe
  *     explosion must produce exactly H+1 distinct keys per vector.
  */
class ScaleKnobsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("simhash at 32 bits / 4 bands: banded join == brute-force hamming scan") {
    withConf(GraftConf.SimHashBitsKey -> "32",
        GraftConf.SimHashBandsKey -> "4") {
      val sig = Dedup.simhashSignatures(spark, sf).cache()
      // geometry actually changed: every signature fits in 32 bits
      val maxSig = sig.agg(max(col("simhash"))).collect().head.getLong(0)
      assert(maxSig < (1L << 32))
      assert(maxSig >= (1L << 16)) // and uses the widened space

      val banded = SparkEntry.queries("d04_simhash")(spark, sf)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val brute = sig.as("a")
        .crossJoin(sig.withColumnRenamed("doc_id", "doc_id_b")
          .withColumnRenamed("simhash", "simhash_b"))
        .filter(col("doc_id") < col("doc_id_b"))
        .filter(bit_count(col("simhash").bitwiseXOR(col("simhash_b"))) <= 3)
        .select(col("doc_id"), col("doc_id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sig.unpersist()

      assert(banded == brute) // lossless at the re-derived geometry
      assert(brute.nonEmpty)  // 32-bit sigs on this corpus do collide
    }
  }

  test("LSH ANN at 4 hyperplanes: native == HOF and probe set is H+1 distinct keys") {
    withConf(GraftConf.LshHyperplanesKey -> "4") {
      graft.functions.VectorFunctions.register(spark)
      graft.functions.VectorFunctions.registerLshBucket(
        spark, Similarity.hyperplaneWeights(4))
      val e = new Tables(spark, sf).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("native", expr("vec_lsh_bucket(v)"))
        .withColumn("hof", expr(Similarity.bucketExprHof(4)))
      assert(e.filter(col("native") =!= col("hof")).count() == 0L)
      // 4 planes → 16 buckets max
      assert(e.agg(max(col("native"))).collect().head.getLong(0) < 16L)

      // the full query runs green at the narrow geometry and each
      // query vector found SOME neighbor (16 buckets over 500 vectors
      // leaves nobody stranded)
      val out = SparkEntry.queries("s02_cosine_lsh_bucketed")(spark, sf)
      assert(out.count() == 500L)
      val buckets = out.select(col("bucket")).distinct().collect()
        .map(_.getLong(0))
      assert(buckets.forall(b => b >= 0L && b < 16L))
    }
  }

  test("minhash at 8 hashes / 2 bands: banded candidates == brute-force band scan") {
    withConf(GraftConf.MinHashHashesKey -> "8",
        GraftConf.MinHashBandsKey -> "2") {
      val sh = Dedup.cappedShingles(spark, sf).cache()
      val sigs = Dedup.minhashSigs(sh, 8).cache()
      // geometry actually changed: 8 sig columns, not 16
      assert(sigs.columns.contains("s7") && !sigs.columns.contains("s8"))

      val cands = Dedup.minhashCands(sigs, 8, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // brute force: a pair is a candidate iff SOME band (s0..s3 or
      // s4..s7) matches in full — computed by an O(n²) scan instead
      // of the band-key join
      val renamed = sigs.select(col("doc_id").as("doc_b") +:
        (0 until 8).map(i => col(s"s$i").as(s"t$i")): _*)
      val bandEq = (b: Int) => (4 * b until 4 * b + 4)
        .map(i => col(s"s$i") === col(s"t$i")).reduce(_ && _)
      val brute = sigs.crossJoin(renamed)
        .filter(col("doc_id") < col("doc_b"))
        .filter(bandEq(0) || bandEq(1))
        .select(col("doc_id"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      sh.unpersist(); sigs.unpersist()

      assert(cands == brute)
      assert(brute.nonEmpty) // planted near-dups collide at 8×2 too

      // the full queries run green at the re-derived geometry, and
      // d06's estimate really divides by the CONFIGURED hash count
      assert(SparkEntry.queries("d03_minhash_lsh")(spark, sf).count() > 0)
      val d06 = SparkEntry.queries("d06_minhash_estimate")(spark, sf)
        .collect()
      assert(d06.nonEmpty)
      assert(d06.forall(r =>
        r.getDouble(3) == r.getLong(2).toDouble / 8.0d))
    }
  }

  test("simhash bands derive from corpus count (threshold tightens with n)") {
    // boundaries of the occupancy-1/4 rule at 60 bits: 2^(60/b) >= 4n
    assert(Dedup.adaptiveSimHashBands(60, 500) == 4)
    assert(Dedup.adaptiveSimHashBands(60, 5000) == 4)
    assert(Dedup.adaptiveSimHashBands(60, 8192) == 4)
    assert(Dedup.adaptiveSimHashBands(60, 8193) == 3)
    assert(Dedup.adaptiveSimHashBands(60, 50000) == 3)
    assert(Dedup.adaptiveSimHashBands(60, 262144) == 3)
    assert(Dedup.adaptiveSimHashBands(60, 262145) == 2)
    assert(Dedup.adaptiveSimHashBands(60, 268435456L) == 2)
    assert(Dedup.adaptiveSimHashBands(60, 268435457L) == 1)
    // non-dividing band counts are skipped (32 % 3 != 0)
    assert(Dedup.adaptiveSimHashBands(32, 50) == 4)
    assert(Dedup.adaptiveSimHashBands(32, 100) == 2)
    // the gated query runs at the adaptive default (sf0.001: 500 docs
    // -> 4 bands, the historical geometry — results unchanged)
    assert(SparkEntry.queries("d04_simhash")(spark, sf).count() > 0)
    // and the SQL twin derives bands from COUNT(*) (no literal pin)
    assert(SparkEntry.oracleSql("d04_simhash").contains("CASE"))
    withConf(GraftConf.SimHashBandsKey -> "2") {
      // an override pins the twin instead
      assert(SparkEntry.oracleSql("d04_simhash").contains("SELECT 2 AS bands"))
    }
    withConf(GraftConf.SimHashBitsKey -> "32") {
      // the twin embeds the overridden WIDTH too (bits/4 hex chars) —
      // a 60-bit twin against 32-bit Spark signatures would silently
      // invalidate the gate
      assert(SparkEntry.oracleSql("d04_simhash")
        .contains("substr(md5(tok), 1, 8)"))
    }
  }

  test("simhashRecallFirst pins 4 bands over the adaptive tightening") {
    // at 32 bits / 500 docs the adaptive rule picks 2 bands (hamming
    // <= 1); the recall-first policy must pin 4 (hamming <= 3) and be
    // indistinguishable from an explicit bands=4 override — the dial a
    // deployment sets when a downstream exact verifier re-checks pairs
    // and recall of weak candidates matters more than the hash-luck
    // tail the adaptive rule sheds
    def pairs(): Set[(Long, Long)] =
      SparkEntry.queries("d04_simhash")(spark, sf)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    var explicit4, adaptive, recallFirst = Set.empty[(Long, Long)]
    withConf(GraftConf.SimHashBitsKey -> "32",
        GraftConf.SimHashBandsKey -> "4") { explicit4 = pairs() }
    withConf(GraftConf.SimHashBitsKey -> "32") { adaptive = pairs() }
    withConf(GraftConf.SimHashBitsKey -> "32",
        GraftConf.SimHashRecallFirstKey -> "true") { recallFirst = pairs() }
    assert(recallFirst == explicit4)
    // the policy is LIVE at this geometry: the adaptive threshold
    // (hamming <= 1) returns strictly fewer pairs
    assert(adaptive.subsetOf(recallFirst))
    assert(adaptive.size < recallFirst.size)
    // the SQL twin pins the policy literal (override-aware)
    withConf(GraftConf.SimHashRecallFirstKey -> "true") {
      assert(SparkEntry.oracleSql("d04_simhash")
        .contains("SELECT 4 AS bands"))
      // ... and an explicit bands override still wins over the policy
      withConf(GraftConf.SimHashBandsKey -> "2") {
        assert(SparkEntry.oracleSql("d04_simhash")
          .contains("SELECT 2 AS bands"))
      }
    }
  }

  test("candBroadcastLimit=0: verify joins un-broadcast, output identical") {
    // the broadcast-overflow fallback: with the cap forced to 0 every
    // candidate-relation broadcast in d03/d06/d10 degrades to a plain
    // join — results must be bit-identical (same rows, same values)
    def snap(q: String): Seq[String] =
      SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
    val defaults = Seq("d03_minhash_lsh", "d06_minhash_estimate",
      "d10_incremental_dedup").map(q => q -> snap(q)).toMap
    withConf(GraftConf.CandBroadcastLimitKey -> "0") {
      defaults.foreach { case (q, expect) =>
        val got = snap(q)
        assert(got == expect, s"$q drifted under candBroadcastLimit=0")
        assert(got.nonEmpty)
      }
    }
    // and a cap big enough to keep broadcasting is also identical
    withConf(GraftConf.CandBroadcastLimitKey -> "1000000") {
      assert(snap("d03_minhash_lsh") == defaults("d03_minhash_lsh"))
    }
  }

  test("shingle df cap is conf-driven: a tiny cap drops hot shingles") {
    // default cap keeps everything on this corpus; cap=1 keeps ONLY
    // shingles unique to one document
    val defaultRows = Dedup.cappedShingles(spark, sf).count()
    withConf(GraftConf.ShingleDfCapKey -> "1") {
      val capped = Dedup.cappedShingles(spark, sf)
      val n = capped.count()
      assert(n < defaultRows)
      val maxDf = capped.groupBy(col("shingle")).count()
        .agg(max(col("count"))).collect().head.getLong(0)
      assert(maxDf == 1L)
      // and the SQL twin embeds the OVERRIDDEN cap (r13: a baked 100
      // against a capped Spark side would silently invalidate the
      // hash gate)
      assert(SparkEntry.oracleSql("d02_ngram_jaccard")
        .contains("COUNT(*) OVER (PARTITION BY shingle) <= 1"))
    }
    // default path: the twin carries the static default
    assert(SparkEntry.oracleSql("d02_ngram_jaccard")
      .contains("COUNT(*) OVER (PARTITION BY shingle) <= 100"))
  }

  test("lineDedupDf override reaches both engine and twin") {
    // t13's boilerplate threshold: a tighter df scrubs MORE segments
    // (more segments qualify as boilerplate), and the SQL twin embeds
    // the resolved value — the r13 override-awareness discipline
    val defRemoved = SparkEntry.queries("t13_line_dedup")(spark, sf)
      .agg(sum(col("n_removed"))).collect().head.getLong(0)
    withConf(GraftConf.LineDedupDfKey -> "2") {
      val tightRemoved = SparkEntry.queries("t13_line_dedup")(spark, sf)
        .agg(sum(col("n_removed"))).collect().head.getLong(0)
      assert(tightRemoved >= defRemoved)
      assert(SparkEntry.oracleSql("t13_line_dedup")
        .contains("WHERE seg_df >= 2)"))
    }
    assert(SparkEntry.oracleSql("t13_line_dedup")
      .contains("WHERE seg_df >= 3)"))
  }

  /** s14's whole pipeline recomputed in plain Scala from collected
    * vectors at GEOMETRY (bits, shortlist) — the brute-force referee
    * for conf-driven geometries the DuckDB oracle (pinned to the
    * defaults) can't see. */
  private def bruteBq(bits: Int, shortlist: Int): Seq[(Long, Int, Long, Int)] = {
    val vecs = new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    def sig(v: Seq[Float]): Seq[Boolean] = v.take(bits).map(_ >= 0f)
    def ham(a: Seq[Boolean], b: Seq[Boolean]): Int =
      a.zipAll(b, false, false).count { case (x, y) => x != y }
    def dot(a: Seq[Float], b: Seq[Float]): Double = // left-to-right fold
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    def nrm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    val queries = vecs.filter(_._1 % 251 == 0)
    val corpus = vecs.filter(_._1 % 251 != 0)
    queries.flatMap { case (qId, qv) =>
      val short = corpus
        .map { case (cId, cv) => (cId, cv, ham(sig(qv), sig(cv))) }
        .sortBy { case (cId, _, h) => (h, cId) }.take(shortlist)
      short
        .map { case (cId, cv, h) =>
          (cId, h, dot(qv, cv) / (nrm(qv) * nrm(cv))) }
        .sortBy { case (cId, _, cos) => (-cos, cId) }.take(3)
        .zipWithIndex
        .map { case ((cId, h, _), i) => (qId, i + 1, cId, h) }
    }
  }

  test("binary quantization at 32 bits / shortlist 8: gated query == brute recompute") {
    withConf(GraftConf.BqBitsKey -> "32",
        GraftConf.BqShortlistKey -> "8") {
      val out = SparkEntry.queries("s14_binary_quantization")(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("c_id"), r.getAs[Number]("hamming").intValue))
      val brute = bruteBq(bits = 32, shortlist = 8)
      assert(out.toSeq.sorted == brute.sorted)
      // geometry actually narrowed: 32-bit hamming never exceeds 32
      assert(out.forall(_._4 <= 32))
      assert(out.nonEmpty)
    }
  }

  test("binary quantization at the default geometry: gated query == brute recompute") {
    val out = SparkEntry.queries("s14_binary_quantization")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"), r.getAs[Number]("hamming").intValue))
    val brute = bruteBq(Similarity.BqBits, Similarity.BqShortlist)
    assert(out.toSeq.sorted == brute.sorted)
    assert(out.nonEmpty)
  }

  test("truncShortlist at corpus size: s07's coarse stage can exclude nothing") {
    // with the shortlist >= the corpus, the truncated coarse pass is
    // pure ordering — stage 2 reranks EVERY candidate, so the result
    // must equal the exact full-dimension top-1 (s01's rank-1 rows):
    // the conf provably drives the funnel width, and the widest
    // setting collapses the approximation entirely
    withConf(GraftConf.TruncShortlistKey -> "500") {
      val exact1 = SparkEntry.queries("s01_cosine_topk")(spark, sf)
        .filter(col("rank") === 1).select(col("id_a"), col("id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val s07 = SparkEntry.queries("s07_truncated_rerank")(spark, sf)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s07 == exact1)
    }
  }

  test("pqShortlist=1 degenerates s12 to pure ADC top-1") {
    // shortlist 1 makes the exact rerank a no-op (one candidate in,
    // the same one out) — the output must equal the ADC argmin, i.e.
    // the pre-round-8 behavior is still reachable through the conf
    val adc = withConfValue(GraftConf.PqShortlistKey -> "1") {
      SparkEntry.queries("s12_pq_adc")(spark, sf)
        .select(col("q_id"), col("c_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val reranked = SparkEntry.queries("s12_pq_adc")(spark, sf)
      .select(col("q_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adc.keySet == reranked.keySet) // same query set either way
    // and the rerank actually changes answers at the default (the
    // dial is live, not decorative)
    assert(adc != reranked)
  }

  private def withConfValue[T](pair: (String, String))(body: => T): T = {
    try { spark.conf.set(pair._1, pair._2); body }
    finally spark.conf.unset(pair._1)
  }
}
