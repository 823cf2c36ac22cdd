package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 wraps Columns around `ColumnNode`s and gates the
  * Expression-level conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This object lives in
  * a subpackage of `org.apache.spark.sql` solely to re-export those two
  * conversions to graft code; it contains no logic of its own.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DSv2 literal from an internal value + type (`LiteralValue` itself is
    * `private[sql]`).
    */
  def v2Literal(value: Any, dataType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[_] =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dataType)
}
