package graft

import org.apache.spark.sql.functions._

/** Split + leakage audit (p04) contract: the hash split partitions the
  * corpus exactly, every verified near-dup pair is accounted for in
  * exactly one split-pair bucket, and the audit actually flags
  * cross-split leakage on this corpus.
  */
class SplitLeakageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("p04_split_leakage")(spark, sf).collect()

  test("6 split-pair buckets; split sizes partition the corpus") {
    assert(out.length == 6)
    val total = new Tables(spark, sf).documents.count()
    val sizes = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(sizes.keySet == Set("test", "train", "val"))
    assert(sizes.values.sum != total || sizes.size == 3)
    // within-split rows carry (n, n): read each split's size once
    val perSplit = out.filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(perSplit.values.sum == total,
      s"split sizes ${perSplit.values.toSeq} don't partition $total docs")
    assert(perSplit("train") > perSplit("val")
      && perSplit("train") > perSplit("test"),
      s"train is not the majority split: $perSplit")
  }

  test("pair buckets sum to the verified near-dup pair count (d02)") {
    val d02 = SparkEntry.queries("d02_ngram_jaccard")(spark, sf).count()
    val bucketed = out.map(_.getLong(4)).sum
    assert(bucketed == d02,
      s"$bucketed bucketed pairs vs $d02 verified pairs")
  }

  test("leaky bit = cross-split AND n_pairs > 0; audit flags leakage here") {
    out.foreach { r =>
      val cross = r.getString(0) != r.getString(1)
      assert(r.getBoolean(5) == (cross && r.getLong(4) > 0),
        s"row ${r.toSeq} leaky bit inconsistent")
    }
    assert(out.exists(_.getBoolean(5)),
      "corpus has cross-split near-dups; the audit reported none")
  }
}
