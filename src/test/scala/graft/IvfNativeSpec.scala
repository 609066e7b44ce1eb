package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{shim => graftshim}
import org.apache.spark.sql.types._

/** Per-row equivalence of the r19 native IVF-PQ expressions against
  * the HOF/join chains they replaced (the NativeLshBucketSpec
  * discipline): same fold arithmetic, same (distance, id) tie-breaks,
  * asserted on a real embeddings slice — the oracle gate proves
  * end-to-end equality, this pins WHERE it comes from so a future
  * edit to one side fails here, not in a 223-query sweep. */
class IvfNativeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def vecs(): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    new Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").as("v"))
  }

  test("vec_l2sq matches the aggregate(zip_with(...)) HOF per row") {
    val hof =
      """aggregate(zip_with(a, b,
           (x, y) -> (cast(x as double) - cast(y as double))
                   * (cast(x as double) - cast(y as double))),
         cast(0.0 as double), (acc, x) -> acc + x)"""
    val e = vecs()
    val pairs = e.limit(8).select(col("vec_id").as("ia"), col("v").as("a"))
      .crossJoin(e.limit(8).select(col("vec_id").as("ib"), col("v").as("b")))
    val diff = pairs
      .select(expr("vec_l2sq(a, b)").as("nat"), expr(hof).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() === 0L) // bit-equality, not tolerance
  }

  test("IvfRouteRanked matches the crossJoin→window routing chain") {
    val e = vecs()
    val corpus = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("bv"))
    val n = corpus.count()
    val (scCent, cellCent) =
      Similarity.twoLevelTrain(corpus, "s12s:", n, 8)
    val wSup = 3
    // the r18 chain, reconstructed verbatim over the SAME centroids
    val l2 = (a: String, c: String) => expr(
      s"""aggregate(zip_with($a, $c,
            (x, w) -> (cast(x as double) - cast(w as double))
                    * (cast(x as double) - cast(w as double))),
          cast(0.0 as double), (acc, x) -> acc + x)""")
    val wSc = Window.partitionBy(col("c_id"))
      .orderBy(col("sd"), col("scid"))
    val wCell = Window.partitionBy(col("c_id"))
      .orderBy(col("cd"), col("cid"))
    val ref = corpus.crossJoin(broadcast(scCent))
      .withColumn("sd", l2("bv", "sc"))
      .withColumn("rn", row_number().over(wSc))
      .filter(col("rn") <= wSup)
      .select(col("c_id"), col("bv"), col("scid"))
      .join(broadcast(cellCent), "scid")
      .withColumn("cd", l2("bv", "c"))
      .withColumn("cellrank", row_number().over(wCell))
      .select(col("c_id"), col("cid"), col("cd"), col("cellrank"))
    val nat = Similarity.rankedCells(
        corpus.select(col("c_id").as("q_id"), col("bv").as("av")),
        scCent, cellCent, wSup)
      .select(col("q_id").as("c_id"), col("cid"), col("cd"),
        col("cellrank"))
    assert(nat.count() === ref.count())
    assert(nat.except(ref).count() === 0L)
    assert(ref.except(nat).count() === 0L)
  }

  test("PqEncodeCodes matches the explode×codebook argmin chain") {
    import scala.jdk.CollectionConverters._
    // 3 residual vectors of 8 dims, sub = 2 per m (4 sub-spaces),
    // codebook with 3 entries per m including an exact tie (entries
    // 0 and 2 identical) — the tie must resolve to the SMALLEST c
    val rvs = Seq(
      Seq(0.5, -0.5, 1.0, 2.0, -1.0, 0.0, 3.0, 0.25),
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(-2.0, 1.5, 0.5, 0.5, 2.0, -3.0, 1.0, 1.0))
    val entries = Vector.tabulate(4) { m =>
      Vector(
        (0, Vector(0.1 * m, -0.2)),
        (1, Vector(1.0, 1.0 + m)),
        (2, Vector(0.1 * m, -0.2))) // duplicate of entry 0: exact tie
    }
    val cb = graft.functions.PqCodebook(entries)
    val df = spark.createDataFrame(
      rvs.zipWithIndex.map { case (rv, i) => Row(i.toLong, rv) }.asJava,
      StructType(Seq(StructField("c_id", LongType),
        StructField("rv", ArrayType(DoubleType)))))
    val nat = df.select(col("c_id"),
        graftshim.column(graft.functions.PqEncodeCodes(
          graftshim.expression(col("rv")), cb, 2)).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // reference: the r18 explode+argmin, computed directly
    def refCode(rv: Seq[Double], m: Int): Int =
      entries(m).map { case (c, cv) =>
        val sub = rv.slice(m * 2, m * 2 + 2)
        val d = sub.zip(cv).foldLeft(0.0) { case (acc, (x, e)) =>
          acc + (x - e) * (x - e)
        }
        (d, c)
      }.minBy(identity)._2 // (dist, c) lexicographic — ties to min c
    rvs.zipWithIndex.foreach { case (rv, i) =>
      assert(nat(i.toLong) === (0 until 4).map(refCode(rv, _)))
      // the planted tie really exercises the tie-break
      assert(!nat(i.toLong).contains(2),
        "an exact codebook tie must resolve to the smallest c")
    }
  }

  test("PqQlut/PqClut match the explode→join→groupBy LUT chains") {
    import scala.jdk.CollectionConverters._
    val entries = Vector.tabulate(4)(m =>
      Vector.tabulate(3)(c => (c, Vector(0.25 * (m + 1), -0.5 * c))))
    val cb = graft.functions.PqCodebook(entries)
    val cbDf = spark.createDataFrame(
      (for { m <- 0 until 4; (c, cv) <- entries(m) }
        yield Row(m, c, cv)).asJava,
      StructType(Seq(StructField("m", IntegerType),
        StructField("c", IntegerType),
        StructField("cv", ArrayType(DoubleType)))))
    val v = Seq(1.0, -2.0, 0.5, 0.25, 3.0, -0.75, 0.0, 2.0)
    val vDf = spark.createDataFrame(
      Seq(Row(1L, v)).asJava,
      StructType(Seq(StructField("q_id", LongType),
        StructField("av", ArrayType(DoubleType)))))
    // reference qlut: the r18 chain verbatim (sub = 2)
    val refQ = vDf
      .withColumn("m", explode(expr("sequence(0, 3)")))
      .join(broadcast(cbDf), Seq("m"))
      .withColumn("pdist", expr(
        """aggregate(zip_with(
             slice(av, m * 2 + 1, 2), cv,
             (x, c) -> -2.0d * cast(x as double) * c),
           cast(0.0 as double), (acc, x) -> acc + x)"""))
      .withColumn("kk", col("m") * 64 + col("c"))
      .groupBy(col("q_id"))
      .agg(expr(
        """transform(sort_array(collect_list(struct(kk, pdist))),
           t -> t.pdist)""").as("qpl"))
      .head().getSeq[Double](1)
    val natQ = vDf.select(graftshim.column(graft.functions.PqQlut(
        graftshim.expression(col("av")), cb, 2)).as("qpl"))
      .head().getSeq[Double](0)
    assert(natQ === refQ)
    // reference clut over the same vector standing in as a centroid
    val refC = vDf.select(col("q_id").as("cid"), col("av").as("cvec"))
      .withColumn("m", explode(expr("sequence(0, 3)")))
      .join(broadcast(cbDf), Seq("m"))
      .withColumn("pdist", expr(
        """aggregate(zip_with(
             slice(cvec, m * 2 + 1, 2), cv,
             (w, e) -> 2.0d * w * e + e * e),
           cast(0.0 as double), (acc, x) -> acc + x)"""))
      .withColumn("kk", col("m") * 64 + col("c"))
      .groupBy(col("cid"))
      .agg(expr(
        """transform(sort_array(collect_list(struct(kk, pdist))),
           t -> t.pdist)""").as("cpl"))
      .head().getSeq[Double](1)
    val natC = vDf.select(graftshim.column(graft.functions.PqClut(
        graftshim.expression(col("av")), cb, 2)).as("cpl"))
      .head().getSeq[Double](0)
    assert(natC === refC)
  }
}
