package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused match-count + replacement — `struct(n, t)` ≡
  * `(regexp_count(s, p), regexp_replace(s, p, r))` from ONE matcher
  * pass (r19 optimization: the redaction family ran every pattern
  * twice — once to count, once to rewrite — so the q115 chain paid six
  * full regex scans per row for three patterns, and q84 two for one).
  * Same java.util.regex engine, same pattern string, same
  * appendReplacement loop Spark's RegExpReplace runs, so the pair is
  * value-identical to the built-ins on every input; the replacement is
  * restricted to a literal (no `$` group refs, no `\`), which is all
  * the redaction operators use. RegexRedactSpec pins both fields
  * against the built-ins.
  */
case class RegexRedact(child: Expression, regex: String, replacement: String)
  extends UnaryExpression {

  require(!replacement.contains('$') && !replacement.contains('\\'),
    "regex_redact: replacement must be literal (no $ refs or escapes)")

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("t", StringType, nullable = true)))
  override def prettyName: String = "regex_redact"

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(regex)

  override protected def nullSafeEval(input: Any): Any =
    RegexRedact.redact(input.asInstanceOf[UTF8String], compiled, replacement)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("redactPattern", compiled,
      "java.util.regex.Pattern")
    val r = ctx.addReferenceObj("redactRepl", replacement, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.RegexRedact.redact($c, $p, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexRedact =
    copy(child = newChild)
}

object RegexRedact {

  def redact(s: UTF8String, p: java.util.regex.Pattern,
      repl: String): InternalRow = {
    val m = p.matcher(s.toString)
    val sb = new java.lang.StringBuffer
    var n = 0
    while (m.find()) { n += 1; m.appendReplacement(sb, repl) }
    m.appendTail(sb)
    new GenericInternalRow(
      Array[Any](n, UTF8String.fromString(sb.toString)))
  }

  def regex_redact(c: Column, regex: String, replacement: String): Column =
    Bridge.column(RegexRedact(Bridge.expression(c.cast("string")),
      regex, replacement))
}
