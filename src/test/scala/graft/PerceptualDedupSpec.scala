package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** m08 — perceptual-hash media dedup. The oracle gate proves the
  * end-to-end pair set (banded engine == all-pairs twin,
  * hash-exact); this spec pins the SEMANTICS on planted content:
  *
  *  - bit-identical payloads get identical fingerprints (hamming 0);
  *  - a tail-edited copy (the corpus's duplication mode — append /
  *    truncate) moves only the edited block's bit: the pair survives
  *    the hamming gate and the banded join FINDS it (banding is
  *    lossless at threshold bands−1);
  *  - unrelated content of the same length lands far away and is
  *    not paired;
  *  - emitted pairs respect the threshold and id ordering, and the
  *    gated query stays inside the video stripe. */
class PerceptualDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // 38 full blocks (608 chars) of template-ish text, a tail-edited
  // copy, an exact copy, and an unrelated doc of the same length
  private val baseText = ("spark table row " * 38).take(608)
  private val tailText = baseText + "EXTRA-TAIL-16chr"
  private val otherText = ("zq7w vp9k mx2j " * 41).take(608)

  private def planted() = {
    import spark.implicits._
    Seq(
      (2L, baseText), (5L, tailText), (8L, otherText),
      (11L, baseText) // exact copy of doc 2
    ).toDF("doc_id", "text")
  }

  test("fingerprints: exact copy identical, tail edit within one " +
      "block bit, unrelated content far") {
    val ph = Multimodal.perceptualHashesOf(planted())
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    assert(ph(2L) === ph(11L), "bit-identical payloads must collide")
    val hamTail = java.lang.Long.bitCount(ph(2L) ^ ph(5L))
    assert(hamTail <= 1,
      s"a pure tail append touches one block, got hamming $hamTail")
    val hamOther = java.lang.Long.bitCount(ph(2L) ^ ph(8L))
    assert(hamOther > 3,
      s"unrelated same-length content should be far, got $hamOther")
  }

  test("the banded join finds the planted near-dups and only them") {
    val pairs = Multimodal.perceptualPairsOf(planted(), bands = 4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((2L, 11L)), "exact copy pair missed")
    assert(keys.contains((2L, 5L)) && keys.contains((5L, 11L)),
      "tail-edited near-dup pair missed by the banded join")
    assert(!keys.exists(k => k._1 == 8L || k._2 == 8L),
      "unrelated doc must not pair")
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h <= 3, s"pair ($a,$b,$h) violates the contract")
    }
  }

  test("the gated query stays inside the video stripe and matches " +
      "the adaptive band geometry") {
    val rows = graft.SparkEntry.queries("m08_perceptual_dedup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 2).count()
    val thr = Dedup.adaptiveSimHashBands(Multimodal.PHashBits, n) - 1
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") % 3 === 2L)
      assert(r.getAs[Long]("id_b") % 3 === 2L)
      assert(r.getAs[Long]("hamming") <= thr)
    }
  }

  test("the oracle's generated band-geometry ladder agrees with " +
      "adaptiveSimHashBands at and across every boundary") {
    // evaluate the generated WHEN ladder in Scala for a sweep of n
    // (each boundary, its neighbors, and a spread of interior points)
    // and compare with the rule the engine side calls directly
    val whenRe = """WHEN n <= (\d+) THEN (\d+)""".r
    val ladder = Multimodal.phashGeomWhens.map {
      case whenRe(bound, b) => (bound.toLong, b.toInt)
      case other => fail(s"unexpected WHEN clause: $other")
    }
    assert(ladder == ladder.sortBy(_._1),
      "CASE evaluates top-down: bounds must be ascending")
    def ladderBands(n: Long): Int =
      ladder.find(n <= _._1).map(_._2).getOrElse(1)
    val probes = ladder.flatMap { case (bound, _) =>
      Seq(bound - 1, bound, bound + 1)
    } ++ Seq(1L, 100L, 1000000L, Long.MaxValue / 8)
    probes.filter(_ >= 1).foreach { n =>
      assert(ladderBands(n)
          == Dedup.adaptiveSimHashBands(Multimodal.PHashBits, n),
        s"oracle geometry diverges from the Scala rule at n=$n")
    }
  }
}
