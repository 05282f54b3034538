package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time injection of the engine's SQL functions — the
  * idiomatic cluster deployment path:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftSparkExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftSparkExtensions) ...
  * }}}
  *
  * Uses only the public SparkSessionExtensions API (no private[sql]
  * access needed at this seam). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
