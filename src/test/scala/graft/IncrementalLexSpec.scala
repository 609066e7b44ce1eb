package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s22 — incremental lexical-index maintenance. The oracle gate
  * already proves serve-level equality (incremental == from-scratch,
  * hash-exact); this spec pins the MECHANISM:
  *
  *  - table-level equality: after base-build + delta-append, the
  *    postings / df / dl tables and the meta scalars are row-for-row
  *    what a from-scratch full build produces;
  *  - the append APPENDS: every base postings segment file is still
  *    present and byte-identical afterwards (the delta bucketed only
  *    itself through the catalog spec — s17's discipline);
  *  - the half-landed guard: a base build alone is scope "partial"
  *    and [[Similarity.ensureLexIndex]] refuses to serve it (rebuilds
  *    a full index instead of answering from half a corpus). */
class IncrementalLexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dropLexTables(): Unit =
    Seq("s21_lex_post", "s21_lex_df", "s21_lex_dl", "s21_lex_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def snapshot(): Map[String, Array[String]] = Map(
    "post" -> spark.table("s21_lex_post")
      .orderBy(col("doc_id"), col("term"))
      .collect().map(_.toString),
    "df" -> spark.table("s21_lex_df").orderBy(col("term"))
      .collect().map(_.toString),
    "dl" -> spark.table("s21_lex_dl").orderBy(col("doc_id"))
      .collect().map(_.toString),
    "meta" -> spark.table("s21_lex_meta")
      .select(col("nd"), col("tl"), col("scope"))
      .collect().map(_.toString))

  private def md5Of(path: String): String = {
    val f = new java.io.File(new java.net.URI(path))
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
  }

  test("base build + delta append produces EXACTLY the from-scratch " +
      "tables, without rewriting a single base segment") {
    dropLexTables()
    Similarity.persistLexIndex(spark, sf) // from-scratch reference
    val full = snapshot()

    dropLexTables()
    Similarity.persistLexIndex(spark, sf,
      col("doc_id") % 5 =!= 0, scope = "partial")
    val baseFiles = spark.table("s21_lex_post").inputFiles
      .map(p => p -> md5Of(p)).toMap
    assert(baseFiles.nonEmpty)
    Similarity.appendLexDelta(spark, sf, col("doc_id") % 5 === 0)

    // every base segment survives byte-identical — the delta appended
    val afterFiles = spark.table("s21_lex_post").inputFiles.toSet
    baseFiles.foreach { case (p, sum) =>
      assert(afterFiles.contains(p), s"base segment $p was rewritten")
      assert(md5Of(p) === sum, s"base segment $p changed bytes")
    }
    assert(afterFiles.size > baseFiles.size,
      "the delta landed no new segment")

    // and the assembled tables are the from-scratch tables
    val inc = snapshot()
    full.foreach { case (name, rows) =>
      assert(inc(name).sameElements(rows),
        s"incremental $name table differs from the from-scratch build")
    }
  }

  test("a half-landed increment is never served: scope 'partial' is " +
      "stale and ensureLexIndex rebuilds the full index") {
    dropLexTables()
    Similarity.persistLexIndex(spark, sf,
      col("doc_id") % 5 =!= 0, scope = "partial")
    val partialNd = spark.table("s21_lex_meta").head().getAs[Long]("nd")
    val lex = Similarity.ensureLexIndex(spark, sf)
    val meta = spark.table("s21_lex_meta").head()
    assert(meta.getAs[String]("scope") === "full")
    assert(meta.getAs[Long]("nd") > partialNd,
      "ensureLexIndex served the half-landed base instead of rebuilding")
    assert(lex.nd === meta.getAs[Long]("nd"))
  }
}
