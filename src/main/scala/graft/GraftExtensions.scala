package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`):
  * injects every native-Expression SQL function at session build time, so
  * a cluster deployment gets the graft SQL surface in EVERY session —
  * including ones a notebook service or job server creates — without any
  * imperative registration call. The UDF-backed helpers (codec/time
  * functions) still come from `Registry.registerAll(spark)`, which needs a
  * live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Registry.injectNative(ext)
}
