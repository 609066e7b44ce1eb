package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s24 — incremental PQ-codes maintenance. The oracle gate proves the
  * end-to-end semantics (serve from base-build + frozen-quantizer
  * append == the two-phase twin, hash-exact); this spec pins the
  * MECHANISM:
  *
  *  - the append APPENDS: every base codes segment survives
  *    byte-identical (the delta bucketed only itself through the
  *    catalog spec — s17/s22's discipline), and the appended rows
  *    make every delta vector servable;
  *  - the generation bumps and a serving cache picks the delta up
  *    without restart (the PqIndexCache contract extended to
  *    appends);
  *  - the scope guard: an incrementally-maintained index is NOT the
  *    from-scratch build (different training corpus), so
  *    ensurePqIndex treats scope "incremental" as stale and rebuilds
  *    a "full" one for the from-scratch-contract consumers. */
class IncrementalPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dropIndexTables(): Unit =
    Seq("s18_pq_sc", "s18_pq_cells", "s18_pq_cb", "s18_pq_codes",
      "s18_pq_meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def md5Of(path: String): String = {
    val f = new java.io.File(new java.net.URI(path))
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
  }

  test("the delta lands as a byte-level append and its vectors become " +
      "servable; the generation bump carries it into a serving cache") {
    dropIndexTables()
    Similarity.persistPqIndex(spark, sf,
      Similarity.buildPqIndex(spark, sf,
        Some(col("vec_id") % 10 =!= 0)))
    assert(Similarity.loadPqMetaGen(spark) === 1L)
    val cache = new Similarity.PqIndexCache(spark)
    val baseIdx = cache.current(spark)
    val baseFiles = spark.table("s18_pq_codes").inputFiles
      .map(p => p -> md5Of(p)).toMap
    assert(baseFiles.nonEmpty)
    val baseIds = spark.table("s18_pq_codes")
      .select(col("c_id")).collect().map(_.getLong(0)).toSet
    assert(!baseIds.exists(_ % 10 == 0), "base build leaked the delta")

    Similarity.appendPqDelta(spark, sf, col("vec_id") % 10 === 0)

    // every base segment survives byte-identical — the delta appended
    val afterFiles = spark.table("s18_pq_codes").inputFiles.toSet
    baseFiles.foreach { case (p, sum) =>
      assert(afterFiles.contains(p), s"base segment $p was rewritten")
      assert(md5Of(p) === sum, s"base segment $p changed bytes")
    }
    assert(afterFiles.size > baseFiles.size,
      "the delta landed no new segment")
    // and the codes table now covers the WHOLE even corpus
    val allIds = spark.table("s18_pq_codes")
      .select(col("c_id")).collect().map(_.getLong(0)).toSet
    val evenAll = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(allIds === evenAll)

    // the serving cache sees the bump and reloads — no restart; the
    // reloaded candidate map reaches the delta rows
    assert(Similarity.loadPqMetaGen(spark) === 2L)
    val refreshed = cache.current(spark)
    assert(!(refreshed eq baseIdx),
      "the append's generation bump did not refresh the cache")
    assert(refreshed.cellm.filter(col("c_id") % 10 === 0).count() > 0)
    // dials are the BASE build's (calibration belongs to the nightly
    // train, not the delta)
    assert(refreshed.np === baseIdx.np && refreshed.sl === baseIdx.sl)
  }

  test("scope guard: ensurePqIndex rebuilds over an incremental index " +
      "(the from-scratch contract), never serves it silently") {
    dropIndexTables()
    Similarity.persistPqIndex(spark, sf,
      Similarity.buildPqIndex(spark, sf,
        Some(col("vec_id") % 10 =!= 0)))
    Similarity.appendPqDelta(spark, sf, col("vec_id") % 10 === 0)
    assert(spark.table("s18_pq_meta").head()
      .getAs[String]("scope") === "incremental")
    val gBefore = Similarity.loadPqMetaGen(spark)
    Similarity.ensurePqIndex(spark, sf)
    val m = spark.table("s18_pq_meta").head()
    assert(m.getAs[String]("scope") === "full",
      "ensurePqIndex served the incremental index as the " +
        "from-scratch build")
    assert(m.getAs[Long]("gen") === gBefore + 1L)
  }
}
