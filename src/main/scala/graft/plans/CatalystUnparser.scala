package graft.plans

import graft.sources.jdbc.{Dialect, Unparser}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}

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
    // Spark `<=>`; Catalyst's INTERSECT/EXCEPT → semi/anti-join rewrite
    // emits these as the join conditions (set-op equality is null-safe)
    case EqualNullSafe(l, r) =>
      for { ls <- expr(l); rs <- expr(r); s <- dialect.nullSafeEqSql(ls, rs) } yield s
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

  /** ORDER BY key with the direction AND null ordering always explicit:
    * engines disagree on defaults (Postgres ASC puts nulls LAST, Spark
    * FIRST), so implicit null placement silently reorders; the MySQL
    * dialect's repairSql rewrites the explicit spelling to its
    * emulation (reference `mysql_window.rs:44-73`).
    */
  def sortOrder(so: SortOrder): Option[String] =
    expr(so.child).map { s =>
      val dir = so.direction match {
        case Ascending => "ASC"
        case Descending => "DESC"
      }
      val nulls = so.nullOrdering match {
        case NullsFirst => "NULLS FIRST"
        case NullsLast => "NULLS LAST"
      }
      s"$s $dir $nulls"
    }

  /** A complete `fn(...) OVER (PARTITION BY … ORDER BY … [frame])`
    * rendering, or None when any piece is outside the translatable set
    * (all-or-nothing, like [[expr]]).
    *
    * Ranking/offset functions omit the frame clause (Catalyst attaches
    * their implied frame, which MySQL REJECTS on ranking functions and
    * every engine ignores); aggregate functions render the plan's frame
    * explicitly when it is one of the exactly-portable shapes.
    */
  def windowExpr(we: WindowExpression): Option[String] = {
    val spec = we.windowSpec
    val (fnSql, needsFrame): (Option[String], Boolean) = we.windowFunction match {
      case _: RowNumber => (Some("ROW_NUMBER()"), false)
      case _: Rank => (Some("RANK()"), false)
      case _: DenseRank => (Some("DENSE_RANK()"), false)
      // only POSITIVE literal offsets push: Lead/Lag.unapply yield the
      // raw user-typed inputOffset, so lead(c, -1) (legal, behaves as
      // lag) must stay local rather than render as the wrong direction
      case Lead(in, Literal(off: Int, _), default, false) if off > 0 =>
        (offsetFn("LEAD", in, off, default), false)
      case Lag(in, Literal(off: Int, _), default, false) if off > 0 =>
        (offsetFn("LAG", in, off, default), false)
      case AggregateExpression(fn, _, false, None, _) =>
        val sql = fn match {
          case Sum(c, _) => expr(c).map(s => s"SUM($s)")
          case Min(c) => expr(c).map(s => s"MIN($s)")
          case Max(c) => expr(c).map(s => s"MAX($s)")
          case Count(Seq(Literal(1, _))) => Some("COUNT(*)")
          case Count(Seq(c)) => expr(c).map(s => s"COUNT($s)")
          case _ => None
        }
        (sql, true)
      case _ => (None, false)
    }
    for {
      f <- fnSql
      parts <- all(spec.partitionSpec)
      orders <- {
        val rendered = spec.orderSpec.map(sortOrder)
        if (rendered.forall(_.isDefined)) Some(rendered.map(_.get)) else None
      }
      frame <- frameSql(spec.frameSpecification, needsFrame)
    } yield {
      val clauses = Seq(
        if (parts.isEmpty) "" else s"PARTITION BY ${parts.mkString(", ")}",
        if (orders.isEmpty) "" else s"ORDER BY ${orders.mkString(", ")}",
        frame).filter(_.nonEmpty)
      s"$f OVER (${clauses.mkString(" ")})"
    }
  }

  /** LEAD/LAG with a positive literal offset (the caller's guard). */
  private def offsetFn(kw: String, in: Expression, n: Int,
      default: Expression): Option[String] = {
    val d = default match {
      case Literal(null, _) => Some(None)
      case l: Literal => expr(l).map(Some(_))
      case _ => None
    }
    for { i <- expr(in); ds <- d }
      yield ds.fold(s"$kw($i, $n)")(s => s"$kw($i, $n, $s)")
  }

  /** Only the exactly-portable frames render; anything else refuses the
    * pushdown rather than risking engine-specific frame semantics.
    */
  private def frameSql(frame: WindowFrame, wanted: Boolean): Option[String] =
    if (!wanted) Some("")
    else frame match {
      case UnspecifiedFrame => Some("")
      case SpecifiedWindowFrame(ft, lo, hi) =>
        val kw = ft match { case RowFrame => "ROWS"; case RangeFrame => "RANGE" }
        def bound(b: Expression): Option[String] = b match {
          case UnboundedPreceding => Some("UNBOUNDED PRECEDING")
          case UnboundedFollowing => Some("UNBOUNDED FOLLOWING")
          case CurrentRow => Some("CURRENT ROW")
          case _ => None
        }
        for { l <- bound(lo); h <- bound(hi) } yield s"$kw BETWEEN $l AND $h"
      case _ => None
    }

  private def all(es: Seq[Expression]): Option[Seq[String]] = {
    val rendered = es.map(expr)
    if (rendered.forall(_.isDefined)) Some(rendered.map(_.get)) else None
  }

  private def bin(op: String, l: Expression, r: Expression): Option[String] =
    for { ls <- expr(l); rs <- expr(r) } yield s"($ls $op $rs)"
}
