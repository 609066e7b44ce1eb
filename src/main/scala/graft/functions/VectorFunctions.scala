package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native vector primitives for similarity search over
  * `array<float>` (or `array<double>`) embedding columns.
  *
  * All expressions compute a LEFT-TO-RIGHT double-precision fold with
  * per-element widening — bit-identical to the
  * `aggregate(zip_with(...))` higher-order-function formulation and to
  * DuckDB's `list_sum(list_transform(...))`, but with real codegen: a
  * tight primitive loop inside whole-stage codegen instead of one
  * lambda invocation per element. On the brute-force top-k benchmark
  * (4M pairs × 64 dims) this is the difference between interpreted
  * lambda dispatch and ~vectorizable machine code.
  *
  * ELEMENT TYPE: both `array<float>` and `array<double>` are accepted
  * — float elements widen losslessly to double (the shipped
  * `embeddings` encoding), double elements are read natively. The
  * driver has regenerated testdata with changed physical types before
  * (events.ts NANOS → micros broke 32 queries in round 10); accepting
  * both here keeps the whole similarity surface alive — identically
  * to DuckDB, which also computes the fold in double either way —
  * should `embeddings` ever re-encode. Any other element type still
  * fails at ANALYSIS time (an int array read via getDouble would be
  * garbage, not an error).
  */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VectorNorm(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_signbits", exprs => VectorSignBits(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VectorL2Sq(exprs(0), exprs(1)), "built-in")
  }

  /** Registers `vec_lsh_bucket(v)` bound to a fixed hyperplane matrix.
    * The weights ride along as a constructor field (value-equal Vector,
    * so plan canonicalization/caching still work) instead of a 512-
    * element nested array literal in the expression tree — r3 embedded
    * that literal inside `aggregate(transform(zip_with(...)))` and the
    * interpreted higher-order functions re-walked it per row, kicking
    * the projection out of whole-stage codegen (s02 5.3 → 6.9 s). */
  def registerLshBucket(
      spark: SparkSession, weights: Seq[Seq[Double]]): Unit =
    registerLshBucketAs(spark, "vec_lsh_bucket", weights)

  /** Same, under a caller-chosen name — multi-table LSH amplification
    * registers one bucket function per independent hyperplane family
    * (`vec_lsh_bucket_t0`, `_t1`, …). */
  def registerLshBucketAs(spark: SparkSession, name: String,
      weights: Seq[Seq[Double]]): Unit = {
    val w = weights.map(_.toVector).toVector
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => VectorLshBucket(exprs.head, w), "built-in")
  }

  /** Whether `dt` is a float/double array — the accepted vector shape. */
  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private[functions] def isDoubleVec(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Interpreted-path element read, widened to double. */
  private[functions] def elem(x: ArrayData, i: Int,
      double: Boolean): Double =
    if (double) x.getDouble(i) else x.getFloat(i).toDouble

  /** Codegen element read, widened to double. */
  private[functions] def elemJava(a: String, i: String,
      double: Boolean): String =
    if (double) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"

  private[functions] def vecTypeFailure(name: String,
      dts: Seq[DataType]): TypeCheckFailure =
    TypeCheckFailure(s"$name requires array<float> or array<double> " +
      s"vector inputs, got ${dts.map(_.simpleString).mkString(", ")}")
}

/** dot(a, b) over float/double arrays, double accumulation,
  * left-to-right. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorFunctions._

  // strict analysis-time typing: a non-float/double array would
  // otherwise be read via getFloat/getDouble — garbage, not an error
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(left.dataType, right.dataType))

  override def dataType: DataType = DoubleType

  @transient private lazy val leftDouble = isDoubleVec(left.dataType)
  @transient private lazy val rightDouble = isDoubleVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(x, i, leftDouble) * elem(y, i, rightDouble)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc +=
         |    ${elemJava(a, i, leftDouble)} * ${elemJava(b, i, rightDouble)};
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** sqrt(dot(a, a)) — L2 norm with the same fold semantics. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType = DoubleType

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = elem(x, i, elemDouble)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${elemJava(a, i, elemDouble)};
         |  ${ev.value}_acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_norm"
}

/** `vec_signbits(v, off)` — the 32 SIGN BITS of vector elements
  * `v[off] .. v[off+31]` (0-based `off`), packed little-endian into a
  * long: bit i is set iff element `off+i` exists, is non-null, and is
  * `>= 0`. This is binary quantization's signature builder (s14): one
  * word per 32 dims, built in a tight codegen'd loop. Semantics are
  * bit-identical to the interpreted HOF it replaces —
  * `aggregate(sequence(0,31), 0L, (acc,i) -> acc +
  * IF(element_at(v, i+off+1) >= 0, shiftleft(1L,i), 0L))` — where
  * out-of-range `element_at` yields NULL and `IF(NULL…)` takes the
  * else branch, so short vectors simply contribute 0 bits
  * (NativeSignBitsSpec asserts the per-row equivalence). */
case class VectorSignBits(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorFunctions._

  // (float/double array, IntegerType): a BIGINT offset would hit
  // asInstanceOf[Int] (runtime ClassCastException) and any other
  // array element type would be read via the wrong getter (silently
  // wrong sign bits) — both fail at ANALYSIS time instead
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && right.dataType == IntegerType)
      TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(left.dataType, right.dataType))

  override def dataType: DataType = LongType

  @transient private lazy val elemDouble = isDoubleVec(left.dataType)

  override def nullSafeEval(a: Any, o: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    val n = x.numElements()
    var word = 0L
    var i = 0
    while (i < 32) {
      val j = off + i
      // SQL comparison semantics, not Java's: NaN sorts ABOVE every
      // number in Spark SQL, so `x >= 0` is TRUE for NaN — the HOF
      // twin sets the bit for a NaN coordinate and so must we
      if (j >= 0 && j < n && !x.isNullAt(j) && {
        val v = elem(x, j, elemDouble)
        v >= 0d || java.lang.Double.isNaN(v)
      }) word |= (1L << i)
      i += 1
    }
    word
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, o) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val w = ctx.freshName("word")
      s"""
         |int $n = $a.numElements();
         |long $w = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  int $j = $o + $i;
         |  if ($j >= 0 && $j < $n && !$a.isNullAt($j)) {
         |    double $v = ${elemJava(a, j, elemDouble)};
         |    // SQL semantics: NaN >= 0 is TRUE (NaN sorts above all)
         |    if ($v >= 0d || java.lang.Double.isNaN($v)) {
         |      $w |= (1L << $i);
         |    }
         |  }
         |}
         |${ev.value} = $w;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_signbits"
}

/** Random-hyperplane LSH bucket id of a vector: for each plane p,
  * bit p of the result is set iff `v · weights(p) > 0`. Arithmetic is
  * the exact left-to-right double fold of the HOF formulation it
  * replaces (`aggregate(zip_with(v, w, (x,w) -> x*w), 0d, +)` per
  * plane, then `sum(2^p)`), so results — and the DuckDB oracle that
  * derives the same weights via md5 in SQL — are bit-identical; only
  * the evaluation strategy changes (tight codegen'd loop over a
  * reference-object `double[]`, vs interpreted lambdas per row).
  * NativeLshBucketSpec asserts the per-row equivalence. */
case class VectorLshBucket(child: Expression, weights: Vector[Vector[Double]])
    extends UnaryExpression {
  import VectorFunctions._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckSuccess
    else vecTypeFailure(prettyName, Seq(child.dataType))

  override def dataType: DataType = LongType

  @transient private lazy val elemDouble = isDoubleVec(child.dataType)

  private def numPlanes: Int = weights.length

  /** Row-major [plane][dim] flattening for the codegen path. */
  @transient private lazy val flat: Array[Double] = {
    val dim = weights.head.length
    val a = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      var i = 0
      while (i < dim) { a(p * dim + i) = weights(p)(i); i += 1 }
      p += 1
    }
    a
  }

  /** Inputs must match the hyperplane dimensionality exactly — a
    * silent prefix fold would disagree with both the HOF twin (whose
    * zip_with null-pads and zeroes the bit) and the SQL oracle, so a
    * mismatch fails fast instead. */
  private def dimMismatch(got: Int): Nothing =
    throw new IllegalArgumentException(
      s"vec_lsh_bucket: input has $got elements, hyperplanes have " +
        s"${weights.head.length}")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = weights.head.length
    if (x.numElements() != dim) dimMismatch(x.numElements())
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val w = weights(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += elem(x, i, elemDouble) * w(i); i += 1 }
      if (acc > 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("lshWeights", flat, "double[]")
      val selfRef = ctx.addReferenceObj("lshExpr", this, classOf[VectorLshBucket].getName)
      val dim = weights.head.length
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bkt = ctx.freshName("bucket")
      s"""
         |if ($a.numElements() != $dim) {
         |  $selfRef.dimMismatchJava($a.numElements());
         |}
         |long $bkt = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += ${elemJava(a, i, elemDouble)} * $wRef[$p * $dim + $i];
         |  }
         |  if ($acc > 0) $bkt += (1L << $p);
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })

  /** Codegen entry point for the mismatch error (public for generated
    * code). */
  def dimMismatchJava(got: Int): Unit = dimMismatch(got)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_lsh_bucket"
}
