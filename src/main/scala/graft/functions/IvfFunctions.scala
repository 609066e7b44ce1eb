package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF-PQ primitives (r19 optimization round).
  *
  * The two-level coarse quantizer, the PQ codebook, and every
  * calibration sample are BOUNDED BY CONSTRUCTION (≤ 4096 cells,
  * ≤ ceil(√k) super-centroids, 256 codebook entries, E[256]-query
  * samples) — planning-scale data the build already ships through
  * broadcast joins. These expressions carry that geometry as
  * driver-collected constructor fields (the [[VectorLshBucket]]
  * precedent: value-equal Vectors so plan canonicalization still
  * works, flat arrays for the eval loop) and turn corpus routing /
  * residual / PQ encoding / LUT derivation into EXCHANGE-FREE
  * per-row projections: the r18 plan shuffled the corpus through a
  * crossJoin→window→join→groupBy chain per routing (two full-corpus
  * exchanges each) and through an explode×64→groupBy×2 chain per
  * encoding — pure scheduling wall at sf0.1 and pure shuffle cost at
  * 100 TB, for per-row functions of bounded shared state.
  *
  * ARITHMETIC CONTRACT: every fold is the exact left-to-right
  * double-precision accumulation of the `aggregate(zip_with(...))`
  * HOF it replaces (floats widened per element), every argmin
  * tie-breaks ascending on id exactly like the `min(struct(d, id))` /
  * `ROW_NUMBER() OVER (ORDER BY d, id)` forms, so engine results stay
  * bit-identical to the unchanged DuckDB oracle twins
  * (IvfNativeSpec asserts the per-row equivalences).
  */
object IvfFunctions {

  /** (d, id) ascending — Spark's (double ASC, long ASC) sort order on
    * our value domain (sums of squares: no NaN, no -0.0). */
  private[functions] def cmp(d1: Double, i1: Long, d2: Double,
      i2: Long): Int =
    if (d1 < d2) -1
    else if (d1 > d2) 1
    else java.lang.Long.compare(i1, i2)

  /** ArrayData (float or double elements) → Array[Double], the shared
    * widening read. Returns null if any element is null (the HOF
    * forms propagate element nulls to a null result). */
  private[functions] def toDoubles(x: ArrayData,
      elemDouble: Boolean): Array[Double] = {
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      out(i) = if (elemDouble) x.getDouble(i) else x.getFloat(i).toDouble
      i += 1
    }
    out
  }

  /** Exact L2² of `v` against centroid `c` — strict left-to-right
    * fold of (v_i − c_i)², the [[graft.operators.Similarity]] `l2d`
    * arithmetic. Caller guarantees equal lengths (geometry vectors
    * share the corpus dimensionality). */
  private[functions] def l2sq(v: Array[Double],
      c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = c.length
    while (i < n) {
      val dx = v(i) - c(i)
      acc += dx * dx
      i += 1
    }
    acc
  }
}

/** `vec_l2sq(a, b)` — exact L2² between two float/double vectors with
  * the same left-to-right double fold as the
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0d, +)` HOF it
  * replaces (per-element widening; unequal lengths or a null element
  * yield NULL exactly like the null-padded zip_with fold), but
  * whole-stage-codegen'd — the brute-force calibration referee and
  * the exact rerank run this over |sample|·n / shortlist·|q| pairs. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(left.dataType, right.dataType))

  override def dataType: DataType = DoubleType

  // result is null on length mismatch even for non-null children
  override def nullable: Boolean = true

  @transient private lazy val leftDouble = isDoubleVec(left.dataType)
  @transient private lazy val rightDouble = isDoubleVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val dx = elem(x, i, leftDouble) - elem(y, i, rightDouble)
      acc += dx * dx
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dx = ctx.freshName("dx")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $dx = ${elemJava(a, i, leftDouble)}
         |      - ${elemJava(b, i, rightDouble)};
         |    $acc += $dx * $dx;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq"
}

/** Driver-collected two-level IVF geometry: super-centroids and, per
  * super-cell, its cell centroids — the bounded structures
  * [[graft.operators.Similarity.twoLevelTrain]] produces (≤ ceil(√k)
  * supers, ≤ 4096 cells). Vectors (value-equal) for plan
  * canonicalization; flat arrays + a hash lookup, built lazily once
  * per (expression, executor), for the eval loop. `route`/`ranked`
  * are also called DIRECTLY from the driver for sample-sized
  * calibration (the same single implementation both sides — no
  * engine/driver divergence possible). */
final case class IvfGeom(
    scIds: Vector[Long],
    scVecs: Vector[Vector[Double]],
    cellIds: Vector[Long],
    cellScids: Vector[Long],
    cellVecs: Vector[Vector[Double]],
    wSup: Int) {

  @transient private lazy val scVecsArr: Array[Array[Double]] =
    scVecs.map(_.toArray).toArray
  @transient private lazy val scIdsArr: Array[Long] = scIds.toArray

  /** scid → (cell ids, cell centroids), cid-ascending within group. */
  @transient private lazy val cellsOf
      : java.util.HashMap[Long, (Array[Long], Array[Array[Double]])] = {
    val m = new java.util.HashMap[Long, (Array[Long], Array[Array[Double]])]()
    val bySc = cellIds.indices.groupBy(cellScids(_))
    bySc.foreach { case (scid, idxs) =>
      val sorted = idxs.sortBy(cellIds(_))
      m.put(scid, (sorted.map(cellIds(_)).toArray,
        sorted.map(cellVecs(_).toArray).toArray))
    }
    m
  }

  @transient private[functions] lazy val centroidOf
      : java.util.HashMap[Long, Array[Double]] = {
    val m = new java.util.HashMap[Long, Array[Double]]()
    cellIds.indices.foreach(i => m.put(cellIds(i), cellVecs(i).toArray))
    m
  }

  def isEmpty: Boolean = scIds.isEmpty

  /** All cells admitted by the wSup super-cell gate, ranked by
    * (cd, cid) ascending — the [[graft.operators.Similarity.rankedCells]]
    * ordering. Empty when the geometry is empty or no admitted
    * super-cell has cells. */
  def ranked(v: Array[Double]): Array[(Double, Long)] = {
    val k1 = scIdsArr.length
    if (k1 == 0) return Array.empty
    // top-wSup super-cells by (sd, scid): full sort of ≤ 64 entries
    val sd = new Array[Double](k1)
    var i = 0
    while (i < k1) {
      sd(i) = IvfFunctions.l2sq(v, scVecsArr(i)); i += 1
    }
    val order = Array.range(0, k1)
    scala.util.Sorting.stableSort(order, (a: Int, b: Int) =>
      IvfFunctions.cmp(sd(a), scIdsArr(a), sd(b), scIdsArr(b)) < 0)
    val nSup = math.min(wSup, k1)
    val buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
    i = 0
    while (i < nSup) {
      val cells = cellsOf.get(scIdsArr(order(i)))
      if (cells != null) {
        val (ids, vecs) = cells
        var j = 0
        while (j < ids.length) {
          buf += ((IvfFunctions.l2sq(v, vecs(j)), ids(j)))
          j += 1
        }
      }
      i += 1
    }
    val out = buf.toArray
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        IvfFunctions.cmp(a._1, a._2, b._1, b._2) < 0)
    out
  }

  /** The single nearest cell, or None when no cell is admitted —
    * mirrors the topN = 1 inner-join-drop semantics. */
  def route1(v: Array[Double]): Option[(Double, Long)] = {
    val r = ranked(v)
    if (r.isEmpty) None else Some(r(0))
  }
}

/** `ivf_route_ranked(v)` → array<struct<cd double, cid bigint>> of the
  * geometry's admitted cells ranked (cd, cid) ascending, truncated to
  * `topN` (topN ≤ 0 keeps all). Replaces the
  * crossJoin(sc)→window→join(cells)→window/groupBy routing chain —
  * two exchanges per routed relation — with one projection. */
case class IvfRouteRanked(child: Expression, geom: IvfGeom, topN: Int)
    extends UnaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cd", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val v = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (v == null) return null
    val ranked = geom.ranked(v)
    val n = if (topN > 0) math.min(topN, ranked.length) else ranked.length
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(
        Array[Any](ranked(i)._1, ranked(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "ivf_route_ranked"
}

/** `ivf_residual(v, cid)` → array<double>: v − centroid(cid), the
  * per-element widened subtraction of the
  * `zip_with(bv, cvec, (x, w) -> cast(x as double) - w)` form —
  * evaluated against the geometry's centroid map instead of a join
  * against the broadcast centroid table. NULL for an unknown cid
  * (cannot happen for cids the route emitted). */
case class IvfResidual(left: Expression, right: Expression,
    geom: IvfGeom)
    extends BinaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && right.dataType == LongType)
      TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(left.dataType, right.dataType))

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val elemDouble = isDoubleVec(left.dataType)

  override def nullSafeEval(a: Any, c: Any): Any = {
    val cent = geom.centroidOf.get(c.asInstanceOf[Long])
    if (cent == null) return null
    val v = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (v == null) return null
    val n = math.min(v.length, cent.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = v(i) - cent(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivf_residual"
}

/** Driver-collected PQ codebook: entries(m)(j) = (code id c,
  * sub-vector), c-ascending per sub-space — built from the 256-row
  * cb table (or the 64-entry init set, whose entries are FULL
  * residual vectors sliced per sub-space by the caller). */
final case class PqCodebook(entries: Vector[Vector[(Int, Vector[Double])]]) {
  @transient private[functions] lazy val arr: Array[Array[(Int, Array[Double])]] =
    entries.map(_.map { case (c, v) => (c, v.toArray) }.toArray).toArray
  def numM: Int = entries.length
}

/** `pq_encode(rv)` → array<int> of the per-sub-space nearest codebook
  * entries of residual `rv`: for each m, argmin over entries of the
  * left-to-right (x − c)² fold on `rv[m·sub … m·sub+sub)`, ties to
  * the smallest c — exactly the `min(struct(dist, c))` /
  * explode×|codebook| chain it replaces (two exchanges and a ×64 row
  * blow-up per encoded relation). */
case class PqEncodeCodes(child: Expression, cb: PqCodebook, sub: Int)
    extends UnaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val rv = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (rv == null) return null
    val m = cb.numM
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val entries = cb.arr(mi)
      if (entries.length == 0) return null // no codebook: no codes
      var bestC = entries(0)._1
      var bestD = Double.MaxValue
      var first = true
      var j = 0
      while (j < entries.length) {
        val (c, cv) = entries(j)
        var acc = 0.0
        var i = 0
        val off = mi * sub
        val n = math.min(cv.length, math.max(0, rv.length - off))
        while (i < n) {
          val dx = rv(off + i) - cv(i)
          acc += dx * dx
          i += 1
        }
        // ascending c iteration + strict < keeps the smallest c on
        // ties — the min(struct(dist, c)) winner
        if (first || acc < bestD) { bestD = acc; bestC = c; first = false }
        j += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** `pq_qlut(av)` → the per-QUERY positional ADC LUT: for each
  * codebook entry (m, c) in kk = m·64+c order, the left-to-right fold
  * of −2·q_i·e_i over the m-th sub-slice of `av` — the array the
  * explode→join→groupBy qlut chain aggregated, emitted by one
  * projection. */
case class PqQlut(child: Expression, cb: PqCodebook, sub: Int)
    extends UnaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val v = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (v == null) return null
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var mi = 0
    while (mi < cb.numM) {
      val entries = cb.arr(mi)
      var j = 0
      while (j < entries.length) {
        val cv = entries(j)._2
        var acc = 0.0
        var i = 0
        val off = mi * sub
        val n = math.min(cv.length, math.max(0, v.length - off))
        while (i < n) {
          acc += -2.0d * v(off + i) * cv(i)
          i += 1
        }
        out += acc
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_qlut"
}

/** `pq_clut(cvec)` → the per-CELL ADC term table: for each (m, c) in
  * kk order, the fold of 2·w_i·e_i + e_i² over the m-th sub-slice of
  * the cell centroid. */
case class PqClut(child: Expression, cb: PqCodebook, sub: Int)
    extends UnaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val w = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (w == null) return null
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var mi = 0
    while (mi < cb.numM) {
      val entries = cb.arr(mi)
      var j = 0
      while (j < entries.length) {
        val cv = entries(j)._2
        var acc = 0.0
        var i = 0
        val off = mi * sub
        val n = math.min(cv.length, math.max(0, w.length - off))
        while (i < n) {
          val e = cv(i)
          acc += 2.0d * w(off + i) * e + e * e
          i += 1
        }
        out += acc
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_clut"
}

/** `vec_nearest(v)` → the id of the (d, id)-ascending nearest entry
  * among a bounded driver-collected set (Lloyd seeds /
  * super-centroids), or NULL when the set is empty — the
  * crossJoin(broadcast(seeds))→window rn=1 argmin as a projection. */
case class VecNearestId(child: Expression, ids: Vector[Long],
    cents: Vector[Vector[Double]])
    extends UnaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)
  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idsArr: Array[Long] = ids.toArray

  override def nullSafeEval(a: Any): Any = {
    if (idsArr.length == 0) return null
    val v = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (v == null) return null
    var bestI = 0
    var bestD = IvfFunctions.l2sq(v, centsArr(0))
    var j = 1
    while (j < idsArr.length) {
      val d = IvfFunctions.l2sq(v, centsArr(j))
      if (IvfFunctions.cmp(d, idsArr(j), bestD, idsArr(bestI)) < 0) {
        bestD = d; bestI = j
      }
      j += 1
    }
    idsArr(bestI)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "vec_nearest"
}

/** `vec_nearest_in(v, gid)` → nearest entry id among the group `gid`'s
  * entries (cell seeds within one super-cell), NULL when the group is
  * absent/empty — the join(broadcast(subSeeds), "scid")→window argmin
  * as a projection. */
case class VecNearestIdInGroup(left: Expression, right: Expression,
    groupIds: Map[Long, Vector[Long]],
    groupCents: Map[Long, Vector[Vector[Double]]])
    extends BinaryExpression with CodegenFallback {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && right.dataType == LongType)
      TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(left.dataType, right.dataType))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val elemDouble = isDoubleVec(left.dataType)
  @transient private lazy val byGroup
      : java.util.HashMap[Long, (Array[Long], Array[Array[Double]])] = {
    val m = new java.util.HashMap[Long, (Array[Long], Array[Array[Double]])]()
    groupIds.foreach { case (g, ids) =>
      m.put(g, (ids.toArray, groupCents(g).map(_.toArray).toArray))
    }
    m
  }

  override def nullSafeEval(a: Any, g: Any): Any = {
    val grp = byGroup.get(g.asInstanceOf[Long])
    if (grp == null || grp._1.length == 0) return null
    val v = IvfFunctions.toDoubles(a.asInstanceOf[ArrayData], elemDouble)
    if (v == null) return null
    val (ids, cents) = grp
    var bestI = 0
    var bestD = IvfFunctions.l2sq(v, cents(0))
    var j = 1
    while (j < ids.length) {
      val d = IvfFunctions.l2sq(v, cents(j))
      if (IvfFunctions.cmp(d, ids(j), bestD, ids(bestI)) < 0) {
        bestD = d; bestI = j
      }
      j += 1
    }
    ids(bestI)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_nearest_in"
}
