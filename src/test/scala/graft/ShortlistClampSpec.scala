package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The s12/s18/st17 ADC-shortlist calibration clamp (the r14 ADVICE
  * medium): `pickShortlist` used to cap the calibrated percentile at
  * nprobe·64, assuming per-cell occupancy ≤ 64 — true only while
  * [[Similarity.adaptiveIvfCells]] is below its 4096-cell saturation
  * (corpus ≲ 262k vectors). Past saturation, occupancy is n/k > 64
  * and the old cap silently truncated the calibrated shortlist below
  * the percentile the recall target requires — at exactly the scale
  * the calibration exists for, and invisibly to the oracle gate
  * (whose `slcalib` CTE mirrored the same clamp). The fix drops the
  * formula cap on both sides: observed ranks are positions inside
  * REAL candidate sets, so the percentile is already bounded by
  * actual candidate-set sizes — even a mean-occupancy budget
  * nprobe·ceil(n/k) truncates queries that probed above-average
  * cells (measured here: 4 in-candidate true NNs lost at pct 100
  * before the cap was removed).
  *
  * Unit tier pins the formula; the integration tier constructs a
  * corpus with occupancy 128 > 64 (pinned `ivfCells`) and proves the
  * calibrated shortlist is no longer truncated to the old cap, then
  * that the pct-100 contract really holds (every sampled in-gate
  * query answered exactly). The final test pins the build-cache
  * release contract (the r14 ADVICE low): after a build, only the
  * frames carried by [[Similarity.PqIndex]] may stay cached. */
class ShortlistClampSpec extends SparkSpec {

  test("pickShortlist: exact integer-ceil order statistic + floor") {
    val ranks = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 120L, 300L)
    // pct 90 -> need = 9 -> 9th smallest = 120
    assert(Similarity.pickShortlist(ranks, 90) === 120)
    // small percentile clamps up to the 96 floor
    assert(Similarity.pickShortlist(ranks, 50) ===
      Similarity.PqShortlist)
    // empty sample falls back to the floor
    assert(Similarity.pickShortlist(Nil, 90) ===
      Similarity.PqShortlist)
  }

  test("pickShortlist: the calibrated percentile is never capped") {
    val ranks = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 300L, 400L)
    // pct 90 -> 300. Old code: min(2*64 = 128, 300) = 128 — silent
    // truncation. The percentile now survives intact.
    assert(Similarity.pickShortlist(ranks, 90) === 300)
    // pct 100 -> the max observed rank, exactly (the only bound that
    // never truncates an in-sample query)
    assert(Similarity.pickShortlist(ranks, 100) === 400)
  }

  /** Synthetic isotropic corpus (the ADC-hostile geometry): `nVec`
    * 64-dim md5-noise vectors — same generator family as
    * NprobeCalibrationSpec, shrunk to spec size. */
  private def writeIsoCorpus(nVec: Int): String = {
    val out = tmpDir("slclamp_corpus")
    val ids = spark.range(0, nVec).select(col("id").as("vec_id"))
    def noise(dd: Int) =
      conv(substring(md5(concat(col("vec_id").cast("string"),
        lit(s"~$dd"))), 1, 8), 16, 10).cast("double") /
        lit(4294967296.0) - lit(0.5)
    val vec = array((0 until 64).map(noise): _*).cast("array<float>")
    ids.select(col("vec_id"), vec.as("embedding"), lit("x").as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  test("occupancy > 64: the calibrated shortlist is not truncated " +
      "to the old np*64 cap") {
    // 4096 vectors -> 2048 corpus; ivfCells pinned to 16 -> occupancy
    // 128 > 64 (the adaptiveIvfCells-saturation regime, shrunk to
    // spec size). nprobe pinned to 1 and pct to 100 so the dial is
    // fully determined: old cap = 1*64 = 64 < the 96 floor, i.e. the
    // OLD code returned exactly 96 no matter what the sample said.
    val dir = writeIsoCorpus(4096)
    spark.conf.set(GraftConf.IvfCellsKey, "16")
    spark.conf.set(GraftConf.IvfNprobeKey, "1")
    spark.conf.set(GraftConf.IvfRecallTargetPctKey, "100")
    try {
      val idx = Similarity.buildPqIndex(spark, dir)
      assert(idx.np === 1)
      // observed ranks are bounded by real candidate-set sizes: with
      // np = 1 the deepest possible rank is the largest cell's
      // occupancy (never the 2048-row corpus)
      val maxOcc = idx.cellm.groupBy("cid").count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      assert(idx.sl <= maxOcc,
        s"shortlist ${idx.sl} exceeds the deepest candidate set $maxOcc")
      // the calibrated pct-100 ADC rank on an isotropic corpus with
      // ~128-deep candidate sets exceeds the floor — under the old
      // clamp this value was IMPOSSIBLE (always exactly 96: the
      // np*64 = 64 cap sat below the floor)
      assert(idx.sl > Similarity.PqShortlist,
        s"shortlist ${idx.sl} still truncated at the old cap")
      // and the dial is deterministic across rebuilds
      assert(Similarity.buildPqIndex(spark, dir).sl === idx.sl)
    } finally {
      spark.conf.unset(GraftConf.IvfCellsKey)
      spark.conf.unset(GraftConf.IvfNprobeKey)
      spark.conf.unset(GraftConf.IvfRecallTargetPctKey)
    }
  }

  test("pct-100 calibration honors the recall contract at " +
      "occupancy > 64: every sampled in-gate query is answered " +
      "exactly") {
    val dir = writeIsoCorpus(4096)
    spark.conf.set(GraftConf.IvfCellsKey, "16")
    spark.conf.set(GraftConf.IvfNprobeKey, "1")
    spark.conf.set(GraftConf.IvfRecallTargetPctKey, "100")
    try {
      val idx = Similarity.buildPqIndex(spark, dir)
      val served = Similarity.servePq(spark, dir, idx)
        .select(col("q_id"), col("c_id"))
      // brute-force referee + the build's own md5 calibration sample:
      // at pct 100 the shortlist must recover EVERY sampled query
      // whose true NN survived the nprobe gate (same cell as the
      // query's probed cell) — the contract the old clamp broke
      val e = new Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
      val corpus = e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("bv"))
      val qs = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("q_id"), col("v").as("av"))
      val (sq, nn) = Similarity.calibSampleNN(qs, corpus, 2048L)
      val sampled = nn.select(col("q_id"), col("c_id").as("true_nn"))
      val inGate = sampled
        .join(served, "q_id")
        .join(sq.select(col("q_id")), "q_id")
      val missed = inGate
        .filter(col("c_id") =!= col("true_nn"))
        // a miss only counts against the shortlist if the true NN
        // was IN the candidate set (shares the query's probed cell)
        .join(idx.cellm.select(col("c_id").as("true_nn"),
          col("cid").as("nn_cell")), "true_nn")
        .join(Similarity.rankedCells(sq, idx.scCent, idx.cellCent, 3)
          .filter(col("cellrank") <= idx.np)
          .select(col("q_id"), col("cid").as("probed_cell")), "q_id")
        .filter(col("nn_cell") === col("probed_cell"))
      assert(missed.count() === 0L,
        "pct-100 shortlist missed an in-candidate true NN")
    } finally {
      spark.conf.unset(GraftConf.IvfCellsKey)
      spark.conf.unset(GraftConf.IvfNprobeKey)
      spark.conf.unset(GraftConf.IvfRecallTargetPctKey)
    }
  }

  test("build releases every cache not carried by PqIndex") {
    val dir = writeIsoCorpus(1024)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val idx = Similarity.buildPqIndex(spark, dir)
    // a serve action, so lazily-cached carried frames materialize too
    assert(Similarity.servePq(spark, dir, idx).count() > 0)
    val newIds = sc.getPersistentRDDs.keySet -- before
    // carried: scCent, cellCent, cellm, cb1f, clut — five frames.
    // Build-only caches (sample, referee, routed sample, corpus
    // routing, residuals, init codebook) must be gone by now.
    assert(newIds.size <= 5,
      s"build left ${newIds.size} caches pinned (expected <= 5 " +
        "carried frames)")
    idx.cellm.unpersist(false); idx.scCent.unpersist(false)
    idx.cellCent.unpersist(false); idx.cb1f.unpersist(false)
    idx.clut.unpersist(false)
  }
}
