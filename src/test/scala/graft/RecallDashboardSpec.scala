package graft

import org.apache.spark.sql.functions._

/** ONE consolidated recall dashboard: every approximate retrieval /
  * dedup tier measured against its exact referee at the DEFAULT
  * geometry, printed as a single table and floor-asserted — so a
  * recall regression (a geometry change, a broken probe expansion, a
  * rescore bug) fails the build as mechanically as `PlanAuditSpec`
  * fails a new cartesian. Floors sit under the measured band on this
  * corpus (values in the table), not at it: they catch collapses, not
  * noise.
  *
  * Individual specs (`NearDupRecallSpec`, `BinaryQuantRecallSpec`,
  * `TruncatedRerankSpec`, `PqAdcSpec`) keep the per-tier invariants
  * (subset-ness, hamming consistency, monotone amplification); this
  * one is the round-over-round scoreboard.
  */
class RecallDashboardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall scoreboard: every approximate tier vs its exact referee") {
    // ---- exact referees, computed once ----
    // s01: exact cosine top-3 for EVERY vector (rank column present)
    val exactTop = SparkEntry.queries("s01_cosine_topk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))) // (id_a, rank, id_b)
    val exactTop1 = exactTop.collect { case (a, 1, b) => a -> b }.toMap
    // s03: exact near-dup pairs at cos >= 0.4
    val exactPairs = pairs("s03_embedding_neardup")
    // d02: exact n-gram jaccard pairs at >= 0.5
    val exactJac = SparkEntry.queries("d02_ngram_jaccard")(spark, dir)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    val rows = Seq.newBuilder[(String, String, Double, Double)]
    def score(tier: String, metric: String, value: Double,
        floor: Double): Unit =
      rows += ((tier, metric, value, floor))

    // ---- ANN top-1 tiers: fraction of queries whose returned
    // neighbor IS the exact rank-1 neighbor ----
    def top1Recall(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, dir)
        .select("id_a", "id_b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      exactTop1.count { case (a, b) => got.get(a).contains(b) }.toDouble /
        exactTop1.size
    }
    // measured band on this corpus at the RECALL-MOTIVATED defaults
    // (adaptive H = occupancy-64 buckets → H=3 here; truncation 32
    // dims; shortlist 64): s02 0.70, s07 0.92, s09 0.68 — up from the
    // old bucket-count-motivated H=8 band of 0.11-0.22. Floors sit
    // under the band, not at it: they catch geometry regressions and
    // collapses, not sampling noise.
    score("s02_cosine_lsh_bucketed", "recall@1", top1Recall(
      "s02_cosine_lsh_bucketed"), 0.60)
    score("s07_truncated_rerank", "recall@1", top1Recall(
      "s07_truncated_rerank"), 0.80)
    score("s09_indexed_rerank", "recall@1", top1Recall(
      "s09_indexed_rerank"), 0.60)

    // ---- near-dup pair tiers vs exact s03 (precision is exact by
    // construction — subset-ness is NearDupRecallSpec's assert) ----
    score("s05_neardup_lsh_bucketed", "pair recall", pairs(
      "s05_neardup_lsh_bucketed").intersect(exactPairs).size.toDouble /
      exactPairs.size, 0.60)
    score("s10_neardup_multitable", "pair recall", pairs(
      "s10_neardup_multitable").intersect(exactPairs).size.toDouble /
      exactPairs.size, 0.85)

    // ---- s14 binary quantization: recall@3 over ITS query/corpus
    // split (queries vec_id%251==0 vs the rest; the s01 referee ranks
    // over ALL vectors, so re-rank exactly over the eligible corpus
    // in plain Scala — ~500 vectors) ----
    val s14 = SparkEntry.queries("s14_binary_quantization")(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecsById = new Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    val s14Exact = vecsById.filter(_._1 % 251 == 0).flatMap {
      case (qId, qv) =>
        vecsById.filter(_._1 % 251 != 0)
          .map { case (cId, cv) =>
            (cId, dot(qv, cv) / math.sqrt(dot(qv, qv) * dot(cv, cv))) }
          .sortBy { case (cId, cos) => (-cos, cId) }.take(3)
          .map { case (cId, _) => (qId, cId) }
    }.toSet
    score("s14_binary_quantization", "recall@3",
      s14.intersect(s14Exact).size.toDouble /
        math.max(1, s14Exact.size), 0.80)

    // ---- s12 product quantization: IVF-gated ADC-shortlist +
    // exact-rerank top-1 vs exact L2 top-1 over its query/corpus
    // split (even/odd) — plain-Scala referee. Measured 0.96 at the
    // round-9 defaults (own IVF coarse quantizer at nprobe 7 instead
    // of the shared LSH gate that capped r8 at 0.61; one-Lloyd-round
    // 4x64 codebooks; pqShortlist 96; exact L2 rerank) ----
    val s12 = SparkEntry.queries("s12_pq_adc")(spark, dir)
      .select("q_id", "c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val d = x.toDouble - y.toDouble; acc + d * d }
    val l2Exact = vecsById.filter(_._1 % 2 == 1).map { case (qId, qv) =>
      qId -> vecsById.filter(_._1 % 2 == 0)
        .map { case (cId, cv) => (cId, l2(qv, cv)) }
        .minBy { case (cId, d) => (d, cId) }._1
    }.toMap
    score("s12_pq_adc", "recall@1 (L2)",
      l2Exact.count { case (q, c) => s12.get(q).contains(c) }.toDouble /
        l2Exact.size, 0.85)

    // ---- minhash tiers vs exact jaccard ----
    // d03: verified LSH candidates — recall of the exact >=0.5 pairs
    val d03 = pairs("d03_minhash_lsh")
    score("d03_minhash_lsh", "pair recall",
      d03.intersect(exactJac.keySet).size.toDouble / exactJac.size, 0.80)
    // d06: sketch-only estimate — mean |est - exact| on pairs both
    // know (an ACCURACY dial, reported as 1 - MAE so bigger is better)
    val d06 = SparkEntry.queries("d06_minhash_estimate")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val common = d06.keySet.intersect(exactJac.keySet)
    assert(common.nonEmpty, "d06 and d02 share no pairs to compare")
    val mae = common.toSeq
      .map(k => math.abs(d06(k) - exactJac(k))).sum / common.size
    score("d06_minhash_estimate", "1 - jaccard MAE", 1.0 - mae, 0.70)

    // ---- the scoreboard: print EVERYTHING, then assert, so one run
    // shows the full picture even when a tier collapsed ----
    val table = rows.result()
    info(f"${"tier"}%-28s ${"metric"}%-16s ${"measured"}%9s ${"floor"}%6s")
    table.foreach { case (t, m, v, f) =>
      info(f"$t%-28s $m%-16s $v%9.3f $f%6.2f")
    }
    table.foreach { case (t, m, v, f) =>
      assert(v >= f, f"$t $m = $v%.3f fell below floor $f%.2f")
    }
  }
}
