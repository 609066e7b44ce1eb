package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The s12 nprobe auto-calibration: unit tests for the order-statistic
  * clamp, plus end-to-end behavior on the two corpus geometries the
  * policy exists to tell apart — a CLUSTERED corpus (the deployment
  * case: calibration must stay at/near the floor, recall holds) and
  * the test corpus (isotropic: calibration must stay bounded by the
  * cap and the in-gate policy, never explode the scan). Determinism
  * and override behavior round out the oracle-parity contract (the
  * hash gate itself is checked by Verify/selfcheck — here we pin the
  * Scala-side invariants the twin mirrors). */
class NprobeCalibrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pickNprobe: empty ranks fall back to the floor") {
    assert(Similarity.pickNprobe(Nil, 90, 52) === Similarity.IvfNprobe)
  }

  test("pickNprobe: exact integer-ceil order statistic") {
    // 10 ranks, pct 90 -> need = ceil(9.0) = 9 -> 9th smallest
    val ranks = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 30L, 40L)
    assert(Similarity.pickNprobe(ranks, 90, 100) === 30)
    // pct 100 -> the max rank
    assert(Similarity.pickNprobe(ranks, 100, 100) === 40)
    // pct 50 -> need = 5 -> 5th smallest = 5 -> clamped up to floor 7
    assert(Similarity.pickNprobe(ranks, 50, 100) === 7)
  }

  test("pickNprobe: cap clamps, floor clamps, order ignored") {
    val ranks = Seq(500L, 1L, 2L)
    // need = ceil(2.7) = 3 -> 500, clamped to cap
    assert(Similarity.pickNprobe(ranks, 90, 52) === 52)
    // unsorted input must not matter; pct 66 of 3 -> need = 2 ->
    // 2nd smallest (at 67, ceil(2.01) = 3 would cap-clamp: 2/3 < 67%)
    assert(Similarity.pickNprobe(Seq(9L, 8L, 100L), 66, 64) === 9)
  }

  test("nprobeCap: 4*ceil(sqrt(k)) with the floor") {
    assert(Similarity.nprobeCap(8) === 12)
    assert(Similarity.nprobeCap(156) === 52)
    assert(Similarity.nprobeCap(4096) === 256)
    assert(Similarity.nprobeCap(2) === 8)
    assert(Similarity.nprobeCap(1) === Similarity.IvfNprobe)
  }

  test("calibration on the test corpus: bounded, deterministic") {
    val np1 = Similarity.effectiveNprobe(spark, dir)
    val np2 = Similarity.effectiveNprobe(spark, dir)
    assert(np1 === np2, "calibration must be deterministic")
    assert(np1 >= Similarity.IvfNprobe)
    // sf0.001: 250 corpus vectors -> k = 8 cells, cap = 12
    assert(np1 <= 12)
  }

  test("override pins the width and skips calibration") {
    spark.conf.set(GraftConf.IvfNprobeKey, "19")
    try assert(Similarity.effectiveNprobe(spark, dir) === 19)
    finally spark.conf.unset(GraftConf.IvfNprobeKey)
  }

  test("invalid override and target are rejected") {
    spark.conf.set(GraftConf.IvfNprobeKey, "0")
    try intercept[IllegalArgumentException] {
      Similarity.effectiveNprobe(spark, dir)
    } finally spark.conf.unset(GraftConf.IvfNprobeKey)
    spark.conf.set(GraftConf.IvfRecallTargetPctKey, "101")
    try intercept[IllegalArgumentException] {
      Similarity.effectiveNprobe(spark, dir)
    } finally spark.conf.unset(GraftConf.IvfRecallTargetPctKey)
  }

  /** Synthetic corpus writer: `nVec` 64-dim vectors, either isotropic
    * (pure md5 noise) or a `modes`-component mixture (md5 mode +
    * 0.3*md5 noise) — the same generator family RecallProbe uses at
    * scale, shrunk to spec size. */
  private def writeCorpus(nVec: Int, modes: Int): String = {
    val out = tmpDir("nprobe_corpus")
    val ids = spark.range(0, nVec).select(col("id").as("vec_id"))
    val base =
      if (modes <= 0) ids.withColumn("mode", lit(-1L))
      else ids.withColumn("mode",
        conv(substring(md5(concat(lit("cm:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long")
          % modes)
    def noise(saltCol: String, dd: Int, amp: Double) =
      (conv(substring(md5(concat(expr(saltCol), lit(s"~$dd"))),
        1, 8), 16, 10).cast("double")
        / lit(4294967296.0) - lit(0.5)) * lit(amp)
    val vec = array((0 until 64).map { dd =>
      if (modes <= 0) noise("cast(vec_id as string)", dd, 1.0)
      else
        noise(s"concat('m:', cast(mode as string))", dd, 1.0) +
          noise("cast(vec_id as string)", dd, 0.3)
    }: _*).cast("array<float>")
    base.select(col("vec_id"), vec.as("embedding"),
      lit("x").as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  test("geometry steers the width: clustered stays near the floor, " +
      "isotropic stays under the cap") {
    // 4096 vectors -> 2048 corpus -> k = 32 cells, cap = 4*6 = 24
    val clustered = Similarity.effectiveNprobe(
      spark, writeCorpus(4096, 16))
    val iso = Similarity.effectiveNprobe(spark, writeCorpus(4096, 0))
    val cap = Similarity.nprobeCap(32)
    assert(clustered >= Similarity.IvfNprobe && clustered <= cap)
    assert(iso >= Similarity.IvfNprobe && iso <= cap)
    // 16 tight modes over 32 cells: the true NN's cell ranks at the
    // very top of the query's ordering -> the floor must suffice
    assert(clustered === Similarity.IvfNprobe,
      s"clustered corpus calibrated to $clustered, expected the floor")
  }
}
