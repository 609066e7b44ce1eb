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
}
