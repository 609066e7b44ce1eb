package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The scale shape this enables (t11): when the "small" side of a
  * semi-join-like filter outgrows what an exact broadcast set should
  * hold — a benchmark suite's distinct 5-grams are KBs at test scale
  * but 10⁸+ entries in a production decontamination run — the 100 TB
  * play is the classic two-stage filter:
  *
  *   1. broadcast a BLOOM of the small side (~10 bits/entry at 1% fpp
  *      instead of a 16-byte key plus hash-set overhead, a 20–30×
  *      footprint cut) and prefilter the huge side IN THE SCAN
  *      PROJECTION — no join, no shuffle, survivors ≈ true hits +
  *      fpp·|corpus grams|;
  *   2. run the EXACT broadcast join only on the survivors, so bloom
  *      false positives are eliminated and the final answer is
  *      bit-identical to the exact single-stage plan — which is why
  *      t11 hash-checks against the same DuckDB oracle as t10.
  *
  * This mirrors Spark's own runtime row-level filtering
  * (`BloomFilterMightContain` injected by `InjectRuntimeFilter`) but
  * as a user-buildable filter over any DataFrame column, so a
  * pipeline can build once and reuse across stages (the reference's
  * engine has no equivalent; capability class per SURVEY.md §2.3
  * "custom-mechanism surface").
  */
object BloomFunctions {

  /** Distributed bloom build over `df(colName)` cast to string:
    * per-partition filters merged pairwise on the driver. Insertion
    * sets bits (OR) — order- and partitioning-independent, so the
    * result is deterministic for a given value set. Oversubscribing
    * `expectedItems` only raises the false-positive rate; the exact
    * verify stage downstream keeps answers unchanged. */
  def buildBloom(df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double): BloomFilter = {
    val rows = df.select(col(colName).cast(StringType))
      .filter(col(colName).isNotNull)
      .asInstanceOf[org.apache.spark.sql.classic.DataFrame].rdd
    rows.mapPartitions { it =>
      val bf = BloomFilter.create(expectedItems, fpp)
      it.foreach(r =>
        bf.putBinary(r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      Iterator.single(bf)
    }.treeReduce((a, b) => a.mergeInPlace(b))
  }

  /** Registers `name(s)` → "s might be in `bloom`" for SQL use, bound
    * to the given filter (the [[VectorFunctions.registerLshBucketAs]]
    * pattern: the sketch rides the expression as a reference object,
    * not a literal in the tree). */
  def registerMightContain(spark: SparkSession, name: String,
      bloom: BloomFilter): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContain(exprs.head, bloom), "built-in")
}

/** `true` iff `child` (string) might be in `bloom`: never false for a
  * member (no false negatives), rarely true for a non-member (fpp).
  * Probes the UTF-8 bytes — the same bytes [[BloomFunctions.buildBloom]]
  * inserted, with no String materialization per row. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any =
    bloom.mightContainBinary(a.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bfRef = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bfRef.mightContainBinary($a.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
