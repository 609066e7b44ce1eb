package graft

import org.apache.spark.sql.functions._

/** d13 (SemDeDup, Abbas et al. 2023): the drop rule must be EXACT on
  * co-clustered pairs — of every in-cluster pair with cosine ≥ 0.4,
  * the member nearer its cluster centroid is dropped (ties: smaller
  * id) — and a vector is dropped ONLY for such a pair. The spec
  * recomputes the full characterization from the query's own output
  * (cluster id and exact centroid L2² are exposed columns) plus the
  * raw vectors, with plain-Scala arithmetic as the referee. The
  * cluster GATE itself is the paper's accepted approximation
  * (cross-cluster dup pairs are missed); its pair recall vs s03's
  * exact cos ≥ 0.4 pairs is measured and floored. */
class SemDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("drop rule exact on co-clustered pairs; drops have causes; recall floored") {
    val out = SparkEntry.queries("d13_semdedup")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.nonEmpty)

    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    assert(out.keySet == vecs.keySet) // one output row per vector

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }

    // referee: victims = nearer-to-centroid members of in-cluster
    // cos >= 0.4 pairs (tie -> smaller id)
    val byCluster = out.toSeq.groupBy(_._2._1)
    val expectedVictims = scala.collection.mutable.Set.empty[Long]
    var coClusteredDupPairs = 0
    for ((_, members) <- byCluster; // all pairs within a cluster
         Seq((idA, (_, cdA, _)), (idB, (_, cdB, _))) <-
           members.sortBy(_._1).combinations(2)) {
      if (cos(vecs(idA), vecs(idB)) >= 0.4) {
        coClusteredDupPairs += 1
        expectedVictims += (if (cdA < cdB) idA
          else if (cdB < cdA) idB
          else math.min(idA, idB))
      }
    }
    val dropped = out.filter(!_._2._3).keySet
    assert(dropped == expectedVictims,
      s"drop rule diverged: extra=${(dropped -- expectedVictims).take(5)} " +
        s"missing=${(expectedVictims -- dropped).take(5)}")

    // gate recall: fraction of ALL exact cos >= 0.4 pairs that were
    // co-clustered (the paper's accepted approximation, quantified).
    // The test corpus is isotropic — the worst case for a k-means
    // gate — so the floor is deliberately modest; clustered real
    // embeddings co-cluster their near-dups far more often.
    val ids = vecs.keys.toArray.sorted
    var exactPairs = 0
    for (i <- ids.indices; j <- (i + 1) until ids.length)
      if (cos(vecs(ids(i)), vecs(ids(j))) >= 0.4) exactPairs += 1
    assert(exactPairs > 0, "test corpus has no cos >= 0.4 pairs")
    val recall = coClusteredDupPairs.toDouble / exactPairs
    info(f"SemDeDup gate pair recall vs exact: $recall%.3f " +
      f"($coClusteredDupPairs of $exactPairs)")
    assert(recall >= 0.2, f"gate recall collapsed: $recall%.3f")

    // the rule actually bites on this corpus (dedup happened), and
    // never drops a whole cluster (the furthest member survives)
    assert(dropped.nonEmpty)
    for ((cid, members) <- byCluster if members.exists(m => !m._2._3))
      assert(members.exists(_._2._3), s"cluster $cid fully dropped")
  }
}
