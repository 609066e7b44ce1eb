package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Test-support bridge into `private[spark]` surface: mutate the LIVE
  * SparkContext conf (public `getConf` returns a copy). Used by
  * `ExtensionsSpec` to exercise the `spark.sql.extensions` config
  * string against the shared test context — `getOrCreate` reads the
  * extension class list from the existing context's conf, which a
  * production deployment sets in spark-defaults before launch. */
object TestShims {
  def setContextConf(sc: SparkContext, k: String, v: String): Unit =
    sc.conf.set(k, v)
  def removeContextConf(sc: SparkContext, k: String): Unit =
    sc.conf.remove(k)

  /** Destroy EVERY cached / localCheckpoint RDD block in the block
    * manager — the single-JVM moral equivalent of losing the executor
    * that held them. Cached-only RDDs recompute from lineage;
    * localCheckpoint'd RDDs cannot (their lineage was truncated), so
    * this is the failure `spark.graft.ccReliableCheckpoint` exists to
    * survive. Returns the number of blocks removed. */
  def dropAllRddBlocks(sc: SparkContext): Int = {
    val master = org.apache.spark.SparkEnv.get.blockManager.master
    val ids = master.getMatchingBlockIds(_.isRDD, askStorageEndpoints = true)
    ids.foreach(master.removeBlock)
    ids.size
  }
}
