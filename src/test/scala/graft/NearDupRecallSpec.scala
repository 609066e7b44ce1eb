package graft

/** Verification-tier / scale-tier pairing, measured end-to-end: the
  * bucketed near-dup query (s05) must return a strict SUBSET of the
  * exact all-pairs baseline (s03) — LSH can miss pairs but can never
  * invent one, because the cosine threshold is applied exactly to the
  * candidates it does surface. Recall is measured, not assumed. */
class NearDupRecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("s05 bucketed near-dups are a subset of exact s03 with nonzero recall") {
    val exact = SparkEntry.queries("s03_embedding_neardup")(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = SparkEntry.queries("s05_neardup_lsh_bucketed")(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact),
      s"false positives: ${bucketed.diff(exact).take(5)}")
    assert(bucketed.nonEmpty, "multi-probe found no pairs at all")
    val recall = bucketed.size.toDouble / exact.size
    info(f"recall at cos>=0.4, H=8, multi-probe<=1 flip: $recall%.2f " +
      s"(${bucketed.size}/${exact.size})")
  }

  test("s10 multi-table amplification: recall rises with table count") {
    val exact = SparkEntry.queries("s03_embedding_neardup")(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def at(tables: Int): Set[(Long, Long)] = {
      spark.conf.set(GraftConf.LshTablesKey, tables.toString)
      try SparkEntry.queries("s10_neardup_multitable")(spark, dir)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset(GraftConf.LshTablesKey)
    }

    val one = at(1)
    val three = at(3)
    // one table IS s05 (base family + same multi-probe) — the
    // amplification starts from the single-table recall, not below it
    val s05 = SparkEntry.queries("s05_neardup_lsh_bucketed")(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == s05)
    // never invents a pair, and the candidate set grows monotonically
    // with tables (table 1's probes are a subset of table 3's)
    assert(three.subsetOf(exact), s"false positives: ${three.diff(exact).take(5)}")
    assert(one.subsetOf(three))
    assert(three.size > one.size,
      s"3 tables found no more pairs than 1 (${three.size} vs ${one.size})")
    info(f"recall 1 table: ${one.size.toDouble / exact.size}%.2f, " +
      f"3 tables: ${three.size.toDouble / exact.size}%.2f " +
      s"(${one.size}/${three.size}/${exact.size})")
  }
}
