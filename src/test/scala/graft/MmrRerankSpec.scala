package graft

import org.apache.spark.sql.functions._

/** MMR diversity-aware top-k (s15) contract, checked against an
  * independent in-memory reimplementation: rank-1 is the pure cosine
  * argmax, selection-time scores are non-increasing in rank (greedy
  * with a monotone penalty), and the picked ids match exact greedy
  * MMR computed from the raw embeddings in plain Scala.
  */
class MmrRerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Lambda = 0.7d
  private val TopN = 16
  private val K = 5

  private lazy val out =
    SparkEntry.queries("s15_mmr_diverse_topk")(spark, sf).collect()

  /** (vec_id, v) sorted by id; dot/norm as the same left-to-right
    * double folds the engines use. */
  private lazy val corpus: Array[(Long, Array[Float])] =
    new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Exact greedy MMR per query, mirroring the operator's spec. */
  private def mmrReference(): Map[Long, Seq[Long]] = {
    val byId = corpus.toMap
    val norms = corpus.map { case (id, v) => id -> nrm(v) }.toMap
    corpus.map(_._1).filter(_ % 25 == 0).map { q =>
      val cands = corpus.filter(_._1 != q)
        .map { case (id, v) =>
          (id, dot(byId(q), v) / (norms(q) * norms(id)))
        }
        .sortBy { case (id, c) => (-c, id) }
        .take(TopN)
      var picked = Vector.empty[Long]
      while (picked.size < K) {
        val best = cands.filterNot(c => picked.contains(c._1))
          .map { case (id, rel) =>
            val pen = picked.map(p =>
              dot(byId(id), byId(p)) / (norms(id) * norms(p)))
              .reduceOption((a, b) => math.max(a, b)).getOrElse(0.0d)
            (id, Lambda * rel - (1 - Lambda) * pen)
          }
          .reduceLeft { (b, c) =>
            if (c._2 > b._2 || (c._2 == b._2 && c._1 < b._1)) c else b
          }
        picked :+= best._1
      }
      q -> picked.toSeq
    }.toMap
  }

  test("every query returns exactly k distinct results, ranks 1..k") {
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to K),
        s"query $q ranks: ${rows.map(_.getLong(1)).toSeq}")
      assert(rows.map(_.getLong(2)).distinct.length == K,
        s"query $q picked a duplicate")
    }
  }

  test("rank 1 is the pure cosine argmax; scores non-increasing in rank") {
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val first = sorted.head
      assert(first.getDouble(3) == sorted.map(_.getDouble(3)).max,
        s"query $q rank-1 relevance ${first.getDouble(3)} is not the max")
      // monotone only from rank 2 on: the empty-set penalty is
      // DEFINED as 0, so a negative-cosine corpus can raise the score
      // across the 1->2 transition; from rank 2 the penalty is a max
      // over a growing set, hence non-decreasing, hence scores
      // non-increasing
      val scores = sorted.map(_.getDouble(4)).drop(1)
      scores.sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"query $q mmr_score increased: $a -> $b")
      case _ => ()
      }
    }
  }

  test("picked ids match the independent Scala greedy MMR exactly") {
    val ref = mmrReference()
    val got = out.groupBy(_.getLong(0)).map { case (q, rows) =>
      q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    }
    assert(got.keySet == ref.keySet)
    got.foreach { case (q, ids) =>
      assert(ids == ref(q), s"query $q: got $ids, reference ${ref(q)}")
    }
  }

  test("diversity bites: some query's MMR set differs from plain top-k") {
    val byId = corpus.toMap
    val norms = corpus.map { case (id, v) => id -> nrm(v) }.toMap
    val differs = corpus.map(_._1).filter(_ % 25 == 0).exists { q =>
      val top5 = corpus.filter(_._1 != q)
        .map { case (id, v) =>
          (id, dot(byId(q), v) / (norms(q) * norms(id)))
        }
        .sortBy { case (id, c) => (-c, id) }.take(K).map(_._1).toSeq
      val mmr = out.filter(_.getLong(0) == q).sortBy(_.getLong(1))
        .map(_.getLong(2)).toSeq
      mmr != top5
    }
    assert(differs, "MMR never deviated from plain top-k on any query")
  }
}
