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
}
