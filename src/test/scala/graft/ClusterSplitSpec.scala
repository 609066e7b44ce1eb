package graft

/** p10 — leakage-free cluster split. The oracle proves the exact
  * audit matrix; this spec pins the CONTRACT against p04 on the same
  * corpus:
  *
  *  - p04's by-document split genuinely leaks (cross-split near-dup
  *    pairs exist) — the problem p10 exists to fix is real here;
  *  - p10's by-cluster split has ZERO cross-split pairs and no leaky
  *    row — leakage-free by construction, not by luck;
  *  - the verified pair relation is conserved: both splits see the
  *    same near-dup pairs, p10 just confines each pair to one side
  *    of the eval boundary;
  *  - no document is lost: per-split sizes still sum to the corpus. */
class ClusterSplitSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def matrix(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().map(r =>
      (r.getAs[String]("split_a"), r.getAs[String]("split_b"),
        r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_pairs"),
        r.getAs[Boolean]("leaky")))

  test("by-doc splitting leaks; by-cluster splitting cannot") {
    val byDoc = matrix("p04_split_leakage")
    assert(byDoc.exists(_._5),
      "setup: the corpus should exhibit real cross-split leakage " +
        "under a by-document split, or the fix proves nothing")

    val byCluster = matrix("p10_cluster_split")
    byCluster.foreach { case (a, b, _, pairs, leaky) =>
      assert(!leaky, s"cluster split leaked on ($a,$b)")
      if (a != b) assert(pairs === 0L,
        s"cross-split near-dup pair survived the cluster split ($a,$b)")
    }

    // the pair relation is conserved — p10 re-homes pairs, never
    // drops them (d08 is the dropping alternative)
    assert(byDoc.map(_._4).sum === byCluster.map(_._4).sum)

    // and no document is lost: diagonal sizes sum to the corpus
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val diag = byCluster.filter(r => r._1 == r._2).map(_._3).sum
    assert(diag === total)
  }
}
