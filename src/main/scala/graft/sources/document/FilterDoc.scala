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
  /** SQL three-valued evaluation: Some(true/false) definite, None =
    * UNKNOWN (a null/missing operand). Kleene logic composes UNKNOWN
    * through AND/OR/NOT, so a pushed `NOT(k = 5)` over a document
    * missing `k` evaluates UNKNOWN — not true — exactly as Spark's own
    * post-scan filter would.
    */
  def eval(doc: JsonNode): Option[Boolean]
  /** A pushed filter returns a row only when DEFINITELY true (SQL
    * semantics drop UNKNOWN rows; these predicates are reported as
    * exactly pushed, so Spark never re-checks).
    */
  final def matches(doc: JsonNode): Boolean = eval(doc).contains(true)
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

  /** The converter's string form of a node ([[DocumentSource]]'s
    * StringType getter: text as-is, anything else JSON-serialized). */
  private def asConvertedString(n: JsonNode): String =
    if (n.isTextual) n.asText else DocumentTable.mapper.writeValueAsString(n)

  /** Numeric-or-string three-way compare over a NON-null node.
    *
    * Integral node vs integral literal compares in exact integer
    * arithmetic (BigInteger covers int64 and beyond): these predicates
    * are reported as EXACTLY pushed, so Spark drops its own copy of the
    * filter — a double-rounded compare would silently match wrong rows
    * for values beyond 2^53. Doubles stay IEEE compares. Type-mismatched
    * nodes COERCE exactly as the scan's [[DocumentSource]] converter
    * does (Jackson asLong/asDouble/asBoolean, JSON text form) — the
    * pushed filter and a scan-then-filter plan must agree row-for-row
    * even over irregular documents.
    */
  private def cmp(n: JsonNode, v: Any): Option[Int] = v match {
    case null => None
    case s: String => Some(asConvertedString(n).compareTo(s))
    case b: Boolean => Some(java.lang.Boolean.compare(n.asBoolean, b))
    case num: java.lang.Number =>
      num match {
        case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
             _: java.lang.Long =>
          if (n.isIntegralNumber)
            Some(n.bigIntegerValue.compareTo(java.math.BigInteger.valueOf(num.longValue)))
          else if (n.isNumber)
            Some(java.lang.Double.compare(n.asDouble, num.doubleValue))
          else Some(java.lang.Long.compare(n.asLong, num.longValue))
        case _ => Some(java.lang.Double.compare(n.asDouble, num.doubleValue))
      }
    case _ => None
  }

  private case class Cmp(field: Seq[String], op: String, value: Any) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$$op": ${renderValue(value)}}}"""
    def eval(doc: JsonNode): Option[Boolean] = {
      val n = path(doc, field)
      op match {
        case "eq" if value == null => Some(isNullish(n)) // IS NULL: never unknown
        case "ne" if value == null => Some(!isNullish(n))
        case _ if isNullish(n) => None // null operand → UNKNOWN
        case "eq" => cmp(n, value).map(_ == 0)
        case "ne" => cmp(n, value).map(_ != 0)
        case "lt" => cmp(n, value).map(_ < 0)
        case "lte" => cmp(n, value).map(_ <= 0)
        case "gt" => cmp(n, value).map(_ > 0)
        case "gte" => cmp(n, value).map(_ >= 0)
      }
    }
  }

  private case class InList(field: Seq[String], values: Seq[Any]) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$in": [${values.map(renderValue).mkString(", ")}]}}"""
    def eval(doc: JsonNode): Option[Boolean] = {
      val n = path(doc, field)
      if (isNullish(n)) None
      else {
        val cs = values.map(v => if (v == null) None else cmp(n, v))
        if (cs.exists(_.contains(0))) Some(true)
        // SQL IN: no match but a NULL in the list → UNKNOWN, not false
        else if (cs.exists(_.isEmpty)) None
        else Some(false)
      }
    }
  }

  private case class Regex(field: Seq[String], pattern: String) extends FilterDoc {
    def json: String =
      s"""{"${esc(field.mkString("."))}": {"$$regex": "${esc(pattern)}"}}"""
    private val rx = java.util.regex.Pattern.compile(pattern)
    def eval(doc: JsonNode): Option[Boolean] = {
      val n = path(doc, field)
      if (isNullish(n)) None
      else Some(rx.matcher(asConvertedString(n)).find())
    }
  }

  private case class Bool(op: String, kids: Seq[FilterDoc]) extends FilterDoc {
    def json: String = s"""{"$$$op": [${kids.map(_.json).mkString(", ")}]}"""
    def eval(doc: JsonNode): Option[Boolean] = {
      val es = kids.map(_.eval(doc))
      op match { // Kleene three-valued AND / OR / NOT(OR)
        case "and" =>
          if (es.exists(_.contains(false))) Some(false)
          else if (es.exists(_.isEmpty)) None
          else Some(true)
        case "or" =>
          if (es.exists(_.contains(true))) Some(true)
          else if (es.exists(_.isEmpty)) None
          else Some(false)
        case "nor" =>
          if (es.exists(_.contains(true))) Some(false)
          else if (es.exists(_.isEmpty)) None
          else Some(true)
      }
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
