package graft

import org.apache.spark.sql.functions._

/** The doc-frequency cap is the property that keeps d02/d03 linear at
  * scale: one stopword-like shingle shared by n documents would
  * otherwise fan the shingle self-join out to n(n-1)/2 pairs. This
  * spec plants exactly that corpus — every doc shares one hot
  * 3-gram — and proves the cap removes it before the join.
  */
class DedupDfCapSpec extends SparkSpec {

  private val nDocs = 150 // > ShingleDfCap = 100

  /** 150 docs: all contain the hot shingle "common shared phrase";
    * docs 0 and 1 are additionally exact near-dups of each other
    * (same 9-token tail); every other doc's tail is unique. */
  private lazy val corpusDir: String = {
    val dir = tmpDir("dfcap")
    import spark.implicits._
    val dupTail = "alpha beta gamma delta epsilon zeta eta theta iota"
    val rows = (0 until nDocs).map { i =>
      val tail =
        if (i <= 1) dupTail
        else s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e " +
          s"unique${i}f unique${i}g unique${i}h unique${i}i"
      (i.toLong, s"common shared phrase $tail", "en", "spec", 0L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("capped relation drops the df > cap shingle") {
    val capped = operators.Dedup.cappedShingles(spark, corpusDir)
    // the hot shingle appears in all 150 docs (> cap = 100) → gone
    assert(capped.filter(col("shingle") === "common shared phrase")
      .count() === 0)
    // no surviving shingle exceeds the cap
    val maxDf = capped.groupBy(col("shingle")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDf <= operators.Dedup.ShingleDfCap)
  }

  test("d02 candidate pairs stay bounded: only the planted dup survives") {
    // without the cap the hot shingle alone yields 150*149/2 = 11,175
    // candidate pairs; with it, only genuinely-similar docs pair up
    val d02 = SparkEntry.queries("d02_ngram_jaccard")(spark, corpusDir)
    val rows = d02.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(rows.head.fieldIndex("id_a")) === 0L)
    assert(rows.head.getLong(rows.head.fieldIndex("id_b")) === 1L)
  }

  test("d03 LSH finds the planted dup and nothing else") {
    val d03 = SparkEntry.queries("d03_minhash_lsh")(spark, corpusDir)
    val rows = d03.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(rows.head.fieldIndex("id_a")) === 0L)
    assert(rows.head.getLong(rows.head.fieldIndex("id_b")) === 1L)
  }
}
