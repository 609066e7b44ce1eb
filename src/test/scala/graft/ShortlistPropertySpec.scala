package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Property tier for the fixed (r16) shortlist calibration: since the
  * formula is now the pure order statistic over observed ADC ranks
  * (floored at 96, never capped), these invariants must hold for ANY
  * sample — the properties a formula cap provably violated. */
class ShortlistPropertySpec extends AnyFunSuite {

  private def samples(seed: Long): Seq[(List[Long], Int)] = {
    val gen = for {
      n <- Gen.choose(1, 400)
      ranks <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
      pct <- Gen.choose(1, 100)
    } yield (ranks, pct)
    (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))
  }

  test("never below the floor, never above the max observed rank") {
    samples(11L).foreach { case (ranks, pct) =>
      val sl = Similarity.pickShortlist(ranks, pct)
      assert(sl >= Similarity.PqShortlist)
      assert(sl <= math.max(Similarity.PqShortlist.toLong, ranks.max),
        s"sl=$sl exceeds the deepest observed rank ${ranks.max}")
    }
  }

  test("monotone in the target: raising pct never shrinks the shortlist") {
    samples(23L).foreach { case (ranks, pct) =>
      if (pct < 100) {
        val lo = Similarity.pickShortlist(ranks, pct)
        val hi = Similarity.pickShortlist(ranks, pct + 1)
        assert(hi >= lo, s"pct ${pct}->${pct + 1} shrank $lo -> $hi")
      }
    }
  }

  test("the recall contract: at least ceil(pct% of the sample) has " +
      "rank <= the calibrated shortlist — the property the old caps broke") {
    samples(37L).foreach { case (ranks, pct) =>
      val sl = Similarity.pickShortlist(ranks, pct)
      val need = math.max(1, (ranks.length * pct + 99) / 100)
      val covered = ranks.count(_ <= sl)
      assert(covered >= need,
        s"shortlist $sl covers $covered of ${ranks.length}, needs $need")
    }
  }

  test("pct 100 covers every sampled rank exactly") {
    samples(53L).foreach { case (ranks, _) =>
      val sl = Similarity.pickShortlist(ranks, 100)
      assert(ranks.forall(_ <= sl))
    }
  }
}
