package org.apache.spark.sql.graftx

import org.apache.spark.sql.connector.expressions.{FieldReference, Literal, LiteralValue, NamedReference}
import org.apache.spark.sql.types.DataType

/** Test-only constructors for the `private[sql]` DSv2 expression case
  * classes (FieldReference/LiteralValue), mirroring [[Bridge]].
  */
object TestExprs {
  def field(parts: String*): NamedReference = FieldReference(parts.toSeq)
  def lit(value: Any, dt: DataType): Literal[Any] = LiteralValue(value, dt)
}
