package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** p05 — cluster-balanced sample over TRAINED centroids (the r17
  * VERDICT item 3: with fixed seed centroids on a skewed embedding
  * distribution, "cluster-balanced" degraded toward "hash-balanced";
  * the one-round Lloyd chain is now shared with s08 via
  * Similarity.lloydAssign/lloydCentroids).
  *
  * The skewed synthetic mode: 400 vectors spread across a dense mode
  * A (axis e1, slight within-mode spread), 100 vectors in a distinct
  * orthogonal mode B (axis e3) — and ALL 8 seeds (the lowest ids)
  * inside mode A, the adversarial case for training-free seeds.
  * Untrained, mode B ties onto a seed cluster shared with A members;
  * after one Lloyd round the B-dominated cluster's mean moves to B's
  * axis, giving B its own clean cluster — which is exactly what lets
  * the equal quota cap the dense mode instead of splitting it eight
  * ways while B shares a bucket. */
class ClusterBalanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** 4-dim synthetic: ids 0-399 mode A = [1, 0.001·(i%10), 0, 0],
    * ids 400-499 mode B = [0, 0, 1, 0.001·(i%10)]. */
  private def skewed() = {
    val rows = (0 until 500).map { i =>
      val v: Array[Double] =
        if (i < 400) Array(1.0, 0.001 * (i % 10), 0.0, 0.0)
        else Array(0.0, 0.0, 1.0, 0.001 * (i % 10))
      Row(i.toLong, v, math.sqrt(v.map(x => x * x).sum))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)),
        StructField("nrm", DoubleType))))
  }

  test("one Lloyd round gives the minority mode its own cluster; " +
      "untrained seeds fold it in with dense-mode members") {
    val e = skewed()
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("c"),
        col("nrm").as("cnrm"))

    def clusterOf(assign: org.apache.spark.sql.DataFrame) = assign
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val untrained = clusterOf(Similarity.lloydAssign(e, seeds))
    val trained = clusterOf(
      Similarity.lloydAssign(e, Similarity.lloydCentroids(e)))

    val bIds = (400L until 500L)
    // both assignments are deterministic and give B one cluster (the
    // cosine tie against all-A seeds breaks by cid)
    val bClusterUntrained = untrained(400L)
    assert(bIds.forall(untrained(_) == bClusterUntrained))
    val bClusterTrained = trained(400L)
    assert(bIds.forall(trained(_) == bClusterTrained))

    // UNTRAINED: B shares its cluster with dense-mode members — the
    // skew case the verdict called "hash-balanced"
    val aInBUntrained =
      (0L until 400L).count(untrained(_) == bClusterUntrained)
    assert(aInBUntrained > 0,
      "expected the untrained seeds to fold mode-A members into B's " +
        "cluster (the skew this spec exists to demonstrate)")

    // TRAINED: the Lloyd update moved the B-dominated centroid onto
    // B's axis — B's cluster is pure
    val aInBTrained =
      (0L until 400L).count(trained(_) == bClusterTrained)
    assert(aInBTrained === 0,
      "one Lloyd round must give the minority mode its own cluster")
  }

  test("the quota then caps every mode: per-cluster sample counts " +
      "are min(16, cluster size) on the real corpus") {
    val sample = SparkEntry
      .queries("p05_cluster_balanced_sample")(spark, sf).collect()
    assert(sample.nonEmpty)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("nrm",
        sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)))
      .select(col("vec_id"), col("embedding").as("v"), col("nrm"))
    val clusterSizes = Similarity
      .lloydAssign(e, Similarity.lloydCentroids(e))
      .groupBy(col("cid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val picked = sample.groupBy(_.getAs[Long]("cid"))
      .map { case (cid, rs) => cid -> rs.length.toLong }
    picked.foreach { case (cid, n) =>
      assert(n === math.min(16L, clusterSizes(cid)),
        s"cluster $cid: quota violated ($n picked, " +
          s"size ${clusterSizes(cid)})")
    }
    // ranks dense per cluster
    sample.groupBy(_.getAs[Long]("cid")).foreach { case (cid, rs) =>
      assert(rs.map(_.getAs[Long]("pick_rank")).sorted.toSeq
        === (1L to rs.length.toLong), s"cluster $cid ranks not dense")
    }
  }
}
