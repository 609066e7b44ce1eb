package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s12's PQ+ADC answer quality against the exact full-precision L2
  * nearest neighbor: the 4×8 codebook keeps 4 small ints per corpus
  * vector, so the question is how often the code-only distance still
  * finds the true neighbor. Deterministic — fixed corpus, exact
  * arithmetic on both sides. */
class PqAdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ADC top-1 tracks the exact L2 nearest neighbor far above random") {
    val pq = SparkEntry.queries("s12_pq_adc")(spark, sf)
      .select(col("q_id"), col("c_id").as("nn_pq"))

    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val corpus = raw.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("bv"))
    val qs = raw.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("q_id"), col("v").as("av"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2"), col("c_id"))
    val exact = qs.crossJoin(corpus) // spec-only exhaustive baseline
      .withColumn("d2", expr(
        "aggregate(zip_with(av, bv, (x, y) -> (x - y) * (x - y)), " +
          "cast(0.0 as double), (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("nn_exact"))

    val joined = pq.join(exact, "q_id").cache()
    val n = joined.count()
    assert(n > 0)
    val hits = joined.filter(col("nn_pq") === col("nn_exact")).count()
    val recall = hits.toDouble / n
    // two approximations stack here: the IVF candidate gate (nprobe
    // of the occupancy-64 cells) and the trained 4x64 sub-space
    // quantization ranking into the shortlist. Random would be
    // 1/250 = 0.4%; RecallDashboardSpec floors the measured band at
    // 0.85 — this assert is the collapse catch.
    assert(recall >= 0.5, s"recall@1 vs exact L2 = $recall (n=$n)")
  }

  test("s12 plans no CartesianProduct (codebook broadcast is the only NLJ)") {
    val plan = SparkEntry.queries("s12_pq_adc")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("residual ADC ranks within clusters: the default shortlist " +
      "keeps what the candidate gate admits on a clustered corpus") {
    // the geometry that broke the r13 absolute-vector encoding (×100
    // probe: candidate recall 0.979, end-to-end 0.368): a tight mode
    // mixture where same-mode candidates are near-identical. With
    // residual codes the ADC top-96 must return the same top-1 as an
    // effectively-unbounded shortlist (= exact rerank of EVERY
    // candidate the probe gate admits) on ~all queries.
    val out = tmpDir("pq_residual_clustered")
    val ids = spark.range(0, 4096).select(col("id").as("vec_id"))
    val modes = 16
    val base = ids.withColumn("mode",
      conv(substring(md5(concat(lit("cm:"),
        col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long")
        % modes)
    def noise(saltCol: String, dd: Int, amp: Double) =
      (conv(substring(md5(concat(expr(saltCol), lit(s"~$dd"))),
        1, 8), 16, 10).cast("double")
        / lit(4294967296.0) - lit(0.5)) * lit(amp)
    val vec = array((0 until 64).map { dd =>
      noise("concat('m:', cast(mode as string))", dd, 1.0) +
        noise("cast(vec_id as string)", dd, 0.3)
    }: _*).cast("array<float>")
    base.select(col("vec_id"), vec.as("embedding"), lit("x").as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val dflt = SparkEntry.queries("s12_pq_adc")(spark, out)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(GraftConf.PqShortlistKey, (1 << 24).toString)
    val unbounded =
      try SparkEntry.queries("s12_pq_adc")(spark, out)
        .select(col("q_id"), col("c_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset(GraftConf.PqShortlistKey)
    assert(dflt.keySet === unbounded.keySet)
    val agree = dflt.count { case (q, c) => unbounded(q) == c }
    val frac = agree.toDouble / dflt.size
    assert(frac >= 0.95,
      s"shortlist-96 vs unbounded top-1 agreement $frac (n=${dflt.size})")
  }
}
