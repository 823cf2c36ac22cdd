package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Compile-time bridge into Spark's `private[sql]` Column ⇄ Expression
  * conversion, placed in a subpackage of `org.apache.spark.sql` — the
  * standard technique used by Spark extension libraries (Delta, Iceberg,
  * Sedona) to expose native Catalyst expressions as user-facing Columns
  * without reflection. Everything here delegates to public-at-bytecode
  * Spark methods; no behavior is redefined.
  */
object Bridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression builder under a SQL function name so
    * `spark.sql("SELECT graft_fn(...)")` and
    * `functions.call_function("graft_fn", ...)` resolve to it.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)
  }
}
