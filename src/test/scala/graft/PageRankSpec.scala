package graft

import org.apache.spark.sql.functions._

/** q82's PageRank against an INDEPENDENT plain-Scala referee (the
  * MmrRerankSpec discipline): same graph, same damping, same 6
  * rounds, same 1e-12 contribution quantization — but computed in a
  * driver loop over plain Maps with a completely different summation
  * order. The quantized-BIGINT contribution sums are
  * order-independent by construction, so the distributed frames and
  * the sequential referee must agree BIT-FOR-BIT; any drift means the
  * determinism contract (not just the answer) broke. Plus the two
  * invariants worth failing loudly on: rank mass is conserved
  * (teleport + dangling redistribution sum to ~1), and rank orders
  * with degree on this graph's extremes.
  */
class PageRankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q82 ranks equal a sequential plain-Scala referee bit-for-bit") {
    val got = SparkEntry.queries("q82_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // referee: rebuild the graph in driver code from the same parquet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder: Map[Long, Seq[Long]] =
      li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    val e0: Set[(Long, Long)] = byOrder.values.flatMap { ps =>
      for { u <- ps; v <- ps if u < v } yield (u, v)
    }.toSet
    val edges: Seq[(Long, Long)] =
      e0.toSeq ++ e0.toSeq.map { case (u, v) => (v, u) }
    val nodes = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSeq
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val nD = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / nD).toMap
    for (_ <- 1 to 6) {
      val dangQ = nodes.filterNot(outd.contains)
        .map(n => math.floor(r(n) * 1e12 + 0.5).toLong).sum
      val dq = dangQ.toDouble
      val contribQ = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        math.floor((r(u) / outd(u)) * 1e12 + 0.5).toLong
      }.sum).toMap
      r = nodes.map(n => n ->
        (0.15 / nD + 0.85 *
          (contribQ.get(n).map(_.toDouble).getOrElse(0.0) / 1e12
            + dq / 1e12 / nD))).toMap
    }
    assert(got.keySet == r.keySet)
    val drift = got.count { case (k, v) => v != r(k) }
    assert(drift == 0, s"$drift of ${got.size} ranks differ from the referee")
  }

  test("rank mass conserved; degree extremes order correctly") {
    val rows = SparkEntry.queries("q82_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val total = rows.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-6,
      s"rank mass $total drifted from 1.0 beyond quantization slack")
    // degree extremes: the max-degree node must outrank the mean
    // (a complete-graph-degenerate corpus would fail this — the probe
    // that made us reject the supplier/token graphs)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
    val deg = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
      .orderBy(col("dg").desc, col("x")).head()
    val topDegNode = deg.getLong(0)
    val mean = total / rows.length
    val rankOfTop = rows.toMap.apply(topDegNode)
    assert(rankOfTop > mean,
      s"max-degree node $topDegNode ranks $rankOfTop <= mean $mean")
  }
}
