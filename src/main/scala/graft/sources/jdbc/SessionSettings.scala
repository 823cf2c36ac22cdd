package graft.sources.jdbc

/** Validated per-connection session settings — the Spark-native
  * re-expression of the reference's DuckDB settings framework
  * (`crates/duckdb/src/settings.rs:107-330`): a registry of named
  * settings, each pulling its value from the table options, VALIDATING
  * it driver-side (a bad value fails the query at planning, not as N
  * executor task failures), and rendering one `SET name = value`
  * statement applied to every physical connection the pool opens for
  * that identity.
  *
  * Differences from the reference, by design:
  *   - No Global/Local scope split: a remote server reached over JDBC
  *     has no "instance we own" — every setting is per-connection
  *     (the reference's Local scope), applied at physical connect.
  *   - The settings fingerprint joins the pool key
  *     ([[ConnectionPool]]), so two tables on the same server with
  *     different session settings never share a physical connection.
  *   - `sessioninit` is the unconditional escape hatch (the reference's
  *     always-apply settings): raw `;`-separated statements executed
  *     verbatim after the registry-rendered ones.
  *
  * Library users extend exactly like the reference's trait:
  * {{{
  *   object QueryTimeout extends ConnectionSetting {
  *     val name = "query_timeout"
  *     override def validate(v: String): Unit = v.toLong
  *   }
  *   SessionSettings.register(QueryTimeout)
  * }}}
  */
trait ConnectionSetting extends Serializable {
  /** Option key AND the `SET <name>` target. */
  def name: String

  /** Value for this setting, if configured (default: the option map). */
  def getValue(options: Map[String, String]): Option[String] = options.get(name)

  /** Throw `IllegalArgumentException` on a bad value. */
  def validate(value: String): Unit = ()

  /** Render the value for SQL (quote strings, leave numerics raw). */
  def formatSqlValue(value: String): String = value

  def setStatement(value: String): String = s"SET $name = ${formatSqlValue(value)}"
}

object SessionSettings {

  /** Byte-quantity setting (`2GB`, `512MiB`, `1000000`): validated like
    * the reference's `MemoryLimitSetting` byte-unit parse, rendered
    * quoted.
    */
  class ByteSizeSetting(val name: String) extends ConnectionSetting {
    private val Pattern = """(?i)^\s*\d+(\.\d+)?\s*(B|KB|MB|GB|TB|PB|KIB|MIB|GIB|TIB|PIB)?\s*$""".r
    override def validate(value: String): Unit =
      if (Pattern.findFirstIn(value).isEmpty)
        throw new IllegalArgumentException(
          s"$name: '$value' is not a byte quantity (e.g. 2GB, 512MiB, 1048576)")
    override def formatSqlValue(value: String): String =
      "'" + value.replace("'", "''") + "'"
  }

  /** Quoted-string setting (paths etc.). */
  class StringSetting(val name: String) extends ConnectionSetting {
    override def formatSqlValue(value: String): String =
      "'" + value.replace("'", "''") + "'"
  }

  /** Boolean setting rendered raw. */
  class BooleanSetting(val name: String) extends ConnectionSetting {
    override def validate(value: String): Unit =
      if (!Set("true", "false").contains(value.toLowerCase))
        throw new IllegalArgumentException(s"$name: '$value' is not true|false")
  }

  // the reference's three defaults (settings.rs:160-166)
  object MemoryLimit extends ByteSizeSetting("memory_limit")
  object TempDirectory extends StringSetting("temp_directory")
  object PreserveInsertionOrder extends BooleanSetting("preserve_insertion_order")

  @volatile private var registered: Vector[ConnectionSetting] =
    Vector(MemoryLimit, TempDirectory, PreserveInsertionOrder)

  /** Register a custom setting JVM-wide (reference `registry.register`). */
  def register(s: ConnectionSetting): Unit = synchronized {
    if (!registered.exists(_.name == s.name)) registered = registered :+ s
  }

  /** Validated `SET` statements + raw `sessioninit` tail for `options`.
    * Throws driver-side on any invalid value.
    */
  def statements(options: Map[String, String]): Seq[String] = {
    val fromRegistry = registered.flatMap { s =>
      s.getValue(options).map { v =>
        s.validate(v)
        s.setStatement(v)
      }
    }
    val raw = options.get("sessioninit").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
    fromRegistry ++ raw
  }
}
