package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s19 filtered ANN: metadata-scoped vector search over the
  * unfiltered s18 index (cross-engine exactness is the DuckDB gate's
  * job — these pin the semantic invariants the gate can't express). */
class FilteredAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every answer satisfies the predicate: candidate label == " +
      "query label") {
    val res = SparkEntry.queries("s19_filtered_ann")(spark, sf)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    val breached = res
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("qlabel")), "q_id")
      .join(labels.select(col("vec_id").as("c_id"),
        col("label").as("clabel")), "c_id")
      .filter(col("qlabel") =!= col("clabel"))
    assert(res.count() > 0)
    assert(breached.count() === 0L,
      "a returned neighbor does not carry the query's label")
  }

  test("one answer per query, and it is the exact L2 argmin of the " +
      "gated shortlist's labels (never a non-matching vector)") {
    val res = SparkEntry.queries("s19_filtered_ann")(spark, sf)
      .select(col("q_id"), col("c_id")).collect()
    val qids = res.map(_.getLong(0))
    assert(qids.distinct.length === qids.length, "duplicate q_id rows")
    // answers only come from the even corpus stripe
    assert(res.forall(_.getLong(1) % 2 == 0))
  }

  test("the filtered serve is deterministic across index rebuilds") {
    spark.sql("DROP TABLE IF EXISTS s18_pq_meta")
    val a = SparkEntry.queries("s19_filtered_ann")(spark, sf).collect()
    spark.sql("DROP TABLE IF EXISTS s18_pq_meta") // force a rebuild
    val b = SparkEntry.queries("s19_filtered_ann")(spark, sf).collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("the corpus-side label rides the persisted codes table: the " +
      "filtered serve reads it off the index scan, the unfiltered " +
      "serve prunes it") {
    val idx = Similarity.ensurePqIndex(spark, sf)
    def codesScans(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("s18_pq_codes") && l.contains("Scan"))
        .toSeq
    val fil = codesScans(Similarity.servePqFilteredByLabel(spark, sf, idx))
    val unf = codesScans(Similarity.servePq(spark, sf, idx))
    assert(fil.nonEmpty && unf.nonEmpty, "no codes-table scan found")
    // the filter column comes from the INDEX scan (no per-serve join
    // back to the n-row source table for corpus labels)...
    assert(fil.exists(_.contains("label")),
      s"filtered serve does not read label from the codes table:\n$fil")
    // ...and the unfiltered path never pays for the column it does
    // not use — Catalyst prunes it at the same scan
    assert(unf.forall(!_.contains("label")),
      s"unfiltered serve failed to prune the attribute column:\n$unf")
  }

  test("the label gate can only deepen results, not change the " +
      "unfiltered winner's eligibility: when the unfiltered top-1 " +
      "matches the query's label, it stays in the filtered shortlist " +
      "and the filtered answer is at least as close") {
    val idx = Similarity.ensurePqIndex(spark, sf)
    val unf = Similarity.servePq(spark, sf, idx)
      .select(col("q_id"), col("c_id").as("u_nn"),
        col("l2sq").as("u_d"))
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    val fil = Similarity.servePqFilteredByLabel(spark, sf, idx)
      .select(col("q_id"), col("c_id").as("f_nn"),
        col("l2sq").as("f_d"))
    // queries whose unfiltered winner already matched the label: the
    // winner was ADC-rank-1 among matching candidates too, so it
    // survives the gated shortlist and the exact rerank can only pick
    // it or something strictly closer among matching candidates
    val matched = unf
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("ql")), "q_id")
      .join(labels.select(col("vec_id").as("u_nn"),
        col("label").as("ul")), "u_nn")
      .filter(col("ql") === col("ul"))
      .join(fil, "q_id")
    assert(matched.count() > 0, "no query had a label-matching winner")
    assert(matched.filter(col("f_d") > col("u_d")).count() === 0L,
      "the filtered answer is farther than a matching unfiltered winner")
  }
}
