package graft.plans

import graft.sources.jdbc.{Dialect, Unparser}
import org.apache.spark.sql.catalyst.expressions._

/** Catalyst `Expression` → dialect SQL, for the federation rule.
  *
  * Distinct from [[graft.sources.jdbc.Unparser]] (which renders DSv2
  * connector expressions fed to the ScanBuilder by
  * `V2ScanRelationPushDown`): the federation rule runs earlier, inside
  * the optimizer, where join conditions and filters are still Catalyst
  * trees. Column references resolve through `attrSql` — the caller's
  * ExprId → rendered-SQL map — so the same attribute renders as
  * `"f0"."col"` or a derived-table alias depending on where its leaf
  * landed in the generated query.
  *
  * All-or-nothing per expression (reference: a filter the dialect cannot
  * render is never partially pushed,
  * `crates/common/src/sql/sql_provider_datafusion/mod.rs:352-424`).
  */
final class CatalystUnparser(dialect: Dialect, attrSql: Map[ExprId, String]) {

  private val lits = new Unparser(dialect)

  def expr(e: Expression): Option[String] = e match {
    case a: AttributeReference => attrSql.get(a.exprId)
    case l: Literal =>
      lits.literal(org.apache.spark.sql.graftx.Bridge.v2Literal(l.value, l.dataType))
    case And(l, r) => bin("AND", l, r)
    case Or(l, r) => bin("OR", l, r)
    case Not(c) => expr(c).map(s => s"(NOT $s)")
    case EqualTo(l, r) => bin("=", l, r)
    case LessThan(l, r) => bin("<", l, r)
    case LessThanOrEqual(l, r) => bin("<=", l, r)
    case GreaterThan(l, r) => bin(">", l, r)
    case GreaterThanOrEqual(l, r) => bin(">=", l, r)
    case IsNull(c) => expr(c).map(s => s"($s IS NULL)")
    case IsNotNull(c) => expr(c).map(s => s"($s IS NOT NULL)")
    case In(v, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      for { vs <- expr(v); ls <- all(list) }
        yield s"($vs IN (${ls.mkString(", ")}))"
    case a: Add => bin("+", a.left, a.right)
    case a: Subtract => bin("-", a.left, a.right)
    case a: Multiply => bin("*", a.left, a.right)
    case a: Remainder =>
      for (l <- expr(a.left); r <- expr(a.right)) yield dialect.modSql(l, r)
    // temporal extraction — dialect-routed like the DSv2 unparser's
    // Extract case (Derby functions / ANSI EXTRACT / SQLite strftime)
    case Year(c) => expr(c).flatMap(s => dialect.extractSql("YEAR", s))
    case Quarter(c) => expr(c).flatMap(s => dialect.extractSql("QUARTER", s))
    case Month(c) => expr(c).flatMap(s => dialect.extractSql("MONTH", s))
    case DayOfMonth(c) => expr(c).flatMap(s => dialect.extractSql("DAY", s))
    case Hour(c, _) => expr(c).flatMap(s => dialect.extractSql("HOUR", s))
    case Minute(c, _) => expr(c).flatMap(s => dialect.extractSql("MINUTE", s))
    case Second(c, _) => expr(c).flatMap(s => dialect.extractSql("SECOND", s))
    case c: Cast if c.foldable =>
      // analyzer-inserted literal widenings fold to plain literals
      expr(Literal(c.eval(null), c.dataType))
    case c: Cast if dialect.supportsType(c.dataType) =>
      expr(c.child).map(s => s"CAST($s AS ${dialect.typeName(c.dataType)})")
    case _ => None
  }

  private def all(es: Seq[Expression]): Option[Seq[String]] = {
    val rendered = es.map(expr)
    if (rendered.forall(_.isDefined)) Some(rendered.map(_.get)) else None
  }

  private def bin(op: String, l: Expression, r: Expression): Option[String] =
    for { ls <- expr(l); rs <- expr(r) } yield s"($ls $op $rs)"
}
