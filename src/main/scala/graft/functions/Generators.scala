package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native UDTF: explode a text column into positional word n-grams —
  * `ngrams(text, n)` → rows of (pos INT, ngram STRING).
  *
  * Tokenization contract matches the dedup operators:
  * `split(lower(trim(text)), '\s+')`; the n-gram at position i joins
  * tokens i..i+n-1 with single spaces. One generator evaluation per
  * input row — the row explosion happens inside the Generate operator
  * (no intermediate array materialization per row in the plan, unlike
  * explode(transform(...))).
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val toks = raw.asInstanceOf[UTF8String].toString
      .trim.toLowerCase.split("\\s+")
    if (toks.length < n) return Iterator.empty
    (0 to toks.length - n).iterator.map { i =>
      InternalRow(i, UTF8String.fromString(
        toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngrams"
}

object Generators {
  /** SQL builder — shared by per-session [[register]] and the
    * cluster-wide [[graft.GraftExtensions]] injection. */
  private[graft] val ngramsBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    { exprs =>
      require(exprs.size == 2, "ngrams(text, n)")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"ngrams: n must be an integer literal, got $other")
      }
      NGramGenerator(exprs.head, n)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", ngramsBuilder, "built-in")
}
