package graft.sources.document

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.expressions.{Expression, GeneralScalarExpression, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 predicate → document filter translation + evaluation.
  *
  * The translation mirrors the reference's Expr→BSON layer
  * (`crates/mongodb/src/utils/expression.rs:43-236`): comparisons become
  * `{"col": {"$op": v}}`, AND/OR become `$and`/`$or`, NOT becomes
  * `$nor`, IN becomes `$in`, IS (NOT) NULL compares to null, and the
  * string predicates become anchored `$regex` with regex metacharacters
  * escaped (the reference's `sql_like_to_regex`). Multi-part field
  * references render as dotted paths.
  *
  * A remote document store would execute the doc server-side; the
  * JSONL-backed [[DocumentTable]] executes it in [[FilterDoc.matches]] —
  * the same observable contract (rows are filtered by the translated
  * document, not by Spark; Spark only sees what the "server" returns).
  */
sealed trait FilterDoc extends Serializable {
  /** Canonical JSON rendering (sorted, deterministic) — the wire form. */
  def json: String
  def matches(doc: JsonNode): Boolean
}

object FilterDoc {

  /** Conjunction of already-translated documents. */
  def and(kids: Seq[FilterDoc]): FilterDoc = Bool("and", kids)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def regexEscape(s: String): String =
    s.flatMap(c => if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else c.toString)

  /** One comparison value, held as a plain JVM value. */
  private def litValue(l: Literal[_]): Option[Any] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | BooleanType => Some(l.value)
    case StringType => Some(l.value.asInstanceOf[UTF8String].toString)
    case NullType => Some(null)
    case _ => None
  }

  private def renderValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + esc(s) + "\""
    case other => other.toString
  }

  /** Dots inside a part act as path separators (the document-store
    * convention, and how a filter on a FLATTENED dotted column —
    * `flattendepth` — reaches the nested value: Spark pushes it as the
    * single field name "props.k").
    */
  private def path(doc: JsonNode, p: Seq[String]): JsonNode =
    p.iterator.flatMap(_.split('.')).foldLeft(doc) { (n, part) =>
      if (n == null) null else n.get(part)
    }

  private def isNullish(n: JsonNode): Boolean = n == null || n.isNull

  /** Numeric-or-string three-way compare; None = incomparable.
    *
    * Integral node vs integral literal compares in exact integer
    * arithmetic (BigInteger covers int64 and beyond): these predicates
    * are reported as EXACTLY pushed, so Spark drops its own copy of the
    * filter — a double-rounded compare would silently match wrong rows
    * for values beyond 2^53. Doubles stay IEEE compares.
    */
  private def cmp(n: JsonNode, v: Any): Option[Int] = v match {
    case null => None
    case s: String => if (n.isTextual) Some(n.asText.compareTo(s)) else None
    case b: Boolean => if (n.isBoolean) Some(java.lang.Boolean.compare(n.asBoolean, b)) else None
    case num: java.lang.Number if n.isNumber =>
      num match {
        case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
             _: java.lang.Long if n.isIntegralNumber =>
          Some(n.bigIntegerValue.compareTo(java.math.BigInteger.valueOf(num.longValue)))
        case _ => Some(java.lang.Double.compare(n.asDouble, num.doubleValue))
      }
    case _ => None
  }

  private case class Cmp(field: Seq[String], op: String, value: Any) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$$op": ${renderValue(value)}}}"""
    def matches(doc: JsonNode): Boolean = {
      val n = path(doc, field)
      op match {
        case "eq" if value == null => isNullish(n)
        case "ne" if value == null => !isNullish(n)
        case _ if isNullish(n) => false
        case "eq" => cmp(n, value).contains(0)
        case "ne" => cmp(n, value).exists(_ != 0)
        case "lt" => cmp(n, value).exists(_ < 0)
        case "lte" => cmp(n, value).exists(_ <= 0)
        case "gt" => cmp(n, value).exists(_ > 0)
        case "gte" => cmp(n, value).exists(_ >= 0)
      }
    }
  }

  private case class InList(field: Seq[String], values: Seq[Any]) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$in": [${values.map(renderValue).mkString(", ")}]}}"""
    def matches(doc: JsonNode): Boolean = {
      val n = path(doc, field)
      !isNullish(n) && values.exists(v => cmp(n, v).contains(0))
    }
  }

  private case class Regex(field: Seq[String], pattern: String) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$regex": "${esc(pattern)}"}}"""
    private val rx = java.util.regex.Pattern.compile(pattern)
    def matches(doc: JsonNode): Boolean = {
      val n = path(doc, field)
      !isNullish(n) && n.isTextual && rx.matcher(n.asText).find()
    }
  }

  private case class Bool(op: String, kids: Seq[FilterDoc]) extends FilterDoc {
    def json: String = s"""{"$$$op": [${kids.map(_.json).mkString(", ")}]}"""
    def matches(doc: JsonNode): Boolean = op match {
      case "and" => kids.forall(_.matches(doc))
      case "or" => kids.exists(_.matches(doc))
      case "nor" => !kids.exists(_.matches(doc))
    }
  }

  private[document] def fieldOf(e: Expression): Option[Seq[String]] = e match {
    case n: NamedReference => Some(n.fieldNames.toSeq)
    case _ => None
  }

  /** One sort key of a pushed TopN — the Mongo sort-document analog
    * (reference builds a sort doc from the pushed orderings,
    * `crates/mongodb/src/table.rs:266-311`).
    */
  final case class SortKey(path: Seq[String], asc: Boolean, nullsFirst: Boolean)
      extends Serializable {
    def json: String = s"""{"${esc(path.mkString("."))}": ${if (asc) 1 else -1}}"""
  }

  /** Comparator over documents for the pushed sort keys. */
  def ordering(keys: Seq[SortKey]): Ordering[JsonNode] = new Ordering[JsonNode] {
    override def compare(a: JsonNode, b: JsonNode): Int = {
      keys.foreach { k =>
        val (x, y) = (path(a, k.path), path(b, k.path))
        val c = (isNullish(x), isNullish(y)) match {
          case (true, true) => 0
          case (true, false) => if (k.nullsFirst) -1 else 1
          case (false, true) => if (k.nullsFirst) 1 else -1
          case _ =>
            val base =
              if (x.isNumber && y.isNumber) java.lang.Double.compare(x.asDouble, y.asDouble)
              else if (x.isBoolean && y.isBoolean) java.lang.Boolean.compare(x.asBoolean, y.asBoolean)
              else x.asText.compareTo(y.asText)
            if (k.asc) base else -base
        }
        if (c != 0) return c
      }
      0
    }
  }

  private def cmpOf(op: String, g: GeneralScalarExpression): Option[FilterDoc] =
    (g.children.lift(0), g.children.lift(1)) match {
      case (Some(f), Some(l: Literal[_])) =>
        for { p <- fieldOf(f); v <- litValue(l) } yield Cmp(p, op, v)
      // operand flip: `lit op col` (reference handles both orders)
      case (Some(l: Literal[_]), Some(f)) =>
        val flip = Map("lt" -> "gt", "lte" -> "gte", "gt" -> "lt", "gte" -> "lte")
        for { p <- fieldOf(f); v <- litValue(l) }
          yield Cmp(p, flip.getOrElse(op, op), v)
      case _ => None
    }

  /** Translate; None = untranslatable, the predicate stays in Spark. */
  def translate(p: Predicate): Option[FilterDoc] = p match {
    case g: GeneralScalarExpression => g.name match {
      case "=" => cmpOf("eq", g)
      case "<>" | "!=" => cmpOf("ne", g)
      case "<" => cmpOf("lt", g)
      case "<=" => cmpOf("lte", g)
      case ">" => cmpOf("gt", g)
      case ">=" => cmpOf("gte", g)
      case "AND" => kids(g).map(Bool("and", _))
      case "OR" => kids(g).map(Bool("or", _))
      case "NOT" => kids(g).map(Bool("nor", _))
      case "IS_NULL" =>
        g.children.lift(0).flatMap(fieldOf).map(Cmp(_, "eq", null))
      case "IS_NOT_NULL" =>
        g.children.lift(0).flatMap(fieldOf).map(Cmp(_, "ne", null))
      case "IN" =>
        for {
          f <- g.children.lift(0).flatMap(fieldOf)
          vs <- {
            val rendered = g.children.drop(1).toSeq.map {
              case l: Literal[_] => litValue(l)
              case _ => None
            }
            if (rendered.nonEmpty && rendered.forall(_.isDefined)) Some(rendered.map(_.get))
            else None
          }
        } yield InList(f, vs)
      case "STARTS_WITH" => regexOf(g, pre = "^", post = "")
      case "ENDS_WITH" => regexOf(g, pre = "", post = "$")
      case "CONTAINS" => regexOf(g, pre = "", post = "")
      case _ => None
    }
    case _ => None
  }

  private def regexOf(g: GeneralScalarExpression, pre: String, post: String): Option[FilterDoc] =
    (g.children.lift(0).flatMap(fieldOf), g.children.lift(1)) match {
      case (Some(f), Some(l: Literal[_])) if l.dataType == StringType =>
        Some(Regex(f, pre + regexEscape(l.value.asInstanceOf[UTF8String].toString) + post))
      case _ => None
    }

  private def kids(g: GeneralScalarExpression): Option[Seq[FilterDoc]] = {
    val sub = g.children.toSeq.map {
      case p: Predicate => translate(p)
      case _ => None
    }
    if (sub.nonEmpty && sub.forall(_.isDefined)) Some(sub.map(_.get)) else None
  }
}
