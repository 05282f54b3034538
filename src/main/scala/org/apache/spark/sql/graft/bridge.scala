package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` surface (Spark 4 classic
  * API): the Column↔Expression converters plus function-registry
  * access for registering the engine's native expressions as SQL
  * functions on a live session. Lives in the org.apache.spark.sql
  * namespace solely for access; keep it to these forwarders.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function on an existing session (the builder-time path
    * is GraftSparkExtensions, which needs no private access). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)

  /** Apply already-built extensions to a live session's registry —
    * lets a spec prove the injectFunction path end-to-end without
    * tearing down the shared test session. */
  def applyExtensionsToSession(ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
