package graft.sources.jdbc

import org.apache.spark.sql.types._

/** SQL dialect abstraction for external relational stores.
  *
  * Mirrors the reference's per-connector dialect layer: quoting and type
  * names (`crates/common/src/sql/arrow_sql_gen/statement.rs:37-142`),
  * limit/fetch syntax (`mod.rs:587-607`), upsert statement generation
  * (`crates/common/src/util/on_conflict.rs:22-105`), and the dialect
  * "AST repair" quirks — MySQL window `NULLS FIRST` stripping
  * (`crates/mysql/src/mysql_window.rs:44-73`) and SQLite interval →
  * `datetime()` rewriting (`crates/sqlite/src/sqlite_interval.rs:10-60`).
  *
  * Live coverage in this environment (zero egress): Derby and DuckDB
  * run wire-level JDBC in every spec run; the postgres and sqlite
  * dialects execute their generated SQL with semantic assertions on a
  * real PostgreSQL 15 and real sqlite3 via
  * `scripts/dialect_live_check.py`; MySQL and ClickHouse rest on
  * golden-SQL tests mirroring the reference's vectors (no server
  * binaries exist here — SURVEY §5 records the descope).
  */
trait Dialect extends Serializable {
  def name: String

  /** Quote an identifier (one level; callers join parts with '.'). */
  def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  def quoted(parts: Seq[String]): String = parts.map(quote).mkString(".")

  /** Render a LIMIT clause appended to a complete SELECT. */
  def limitClause(n: Int): String = s"LIMIT $n"

  /** Combined limit/offset tail: `LIMIT n OFFSET m` order for the
    * LIMIT-style engines; Derby overrides with the ANSI
    * `OFFSET m ROWS FETCH FIRST n ROWS ONLY` (offset first). Renders
    * exactly [[limitClause]] when no offset is present.
    */
  def limitOffsetClause(limit: Option[Int], offset: Option[Int]): String =
    (limit.map(limitClause) ++ offset.map(m => s"OFFSET $m")).mkString(" ")

  /** The dialect's unbounded-text column type (nested-as-JSON storage
    * and the UnsupportedTypeAction=string fallback both use it).
    */
  def stringType: String = "TEXT"

  /** Column type name for DDL generation from a Spark type. */
  def typeName(dt: DataType): String = dt match {
    case ByteType => "SMALLINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case StringType => stringType
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    // Day-time intervals store as BIGINT microseconds (the reference
    // maps Duration to a big-integer column, statement.rs:313-326,1302);
    // they introspect back as plain BIGINT — declare the schema to read
    // them as intervals again.
    case _: DayTimeIntervalType => "BIGINT"
    // Nested types fall back to a JSON-encoded text column — the same
    // compromise the reference makes for SQLite/MySQL
    // (statement.rs:82-104).
    case _: ArrayType | _: MapType | _: StructType => stringType
    case other => throw new IllegalArgumentException(
      s"$name: unsupported type $other")
  }

  /** Engines with a native ARRAY column type bind Spark ArrayType
    * through `Connection.createArrayOf` instead of nested-as-JSON
    * (reference: pg arrays -> List, `arrow_sql_gen/schema.rs:163-190`).
    */
  def supportsNativeArrays: Boolean = false

  /** Element type name passed to `createArrayOf` (native-array dialects). */
  def arrayElementName(et: DataType): String = typeName(et)

  /** Typed VALUES placeholders (per-column [[insertPlaceholder]]s when
    * the caller supplied them, plain `?` otherwise) — shared by the
    * upsert renderers so an array column's remote JSON cast rides into
    * conflict statements too, not just plain INSERTs.
    */
  protected def valuesPlaceholders(cols: Seq[String],
      placeholders: Seq[String]): Seq[String] =
    Option(placeholders).getOrElse(cols.map(_ => "?"))

  /** Whether `et` can bind through `createArrayOf` (the same set the
    * dialect's array DDL declares natively); false → JSON-text fallback.
    */
  def supportsArrayElement(et: DataType): Boolean =
    try { arrayElementName(et); true }
    catch { case _: IllegalArgumentException => false }

  /** Whether DDL/DML may reference this type at all. */
  def supportsType(dt: DataType): Boolean =
    try { typeName(dt); true } catch { case _: IllegalArgumentException => false }

  /** Column definition list for CREATE TABLE from a Spark schema. */
  def columnDefs(schema: StructType): String =
    schema.fields.map { f =>
      s"${quote(f.name)} ${typeName(f.dataType)}${if (f.nullable) "" else " NOT NULL"}"
    }.mkString(", ")

  /** String literal with dialect escaping. */
  def stringLiteral(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Upsert statement for `table(cols)` keyed on `keys`, with `?` binds.
    * Default: PostgreSQL/SQLite/DuckDB-style ON CONFLICT. `doNothing`
    * selects the reference's do-nothing conflict mode (existing keys
    * keep their rows untouched, `crates/common/src/util/on_conflict.rs:
    * 14,73-106`) instead of DO UPDATE.
    */
  def upsertStatement(table: String, cols: Seq[String], keys: Seq[String],
      doNothing: Boolean = false, placeholders: Seq[String] = null): String = {
    // Empty keys = the reference's DoNothingAll: a target-less
    // ON CONFLICT DO NOTHING (any constraint violation skips the row,
    // `on_conflict.rs:32`).
    val target = if (keys.isEmpty) "" else s" (${keys.map(quote).mkString(", ")})"
    val insert =
      s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
        s"VALUES (${valuesPlaceholders(cols, placeholders).mkString(", ")}) " +
        s"ON CONFLICT$target"
    val non = cols.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
    // All columns in the conflict target leaves nothing to update — the
    // reference degrades that upsert to DO NOTHING (`on_conflict.rs:53-59`).
    if (doNothing || non.isEmpty) s"$insert DO NOTHING"
    else s"$insert DO UPDATE SET ${non.map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")}"
  }

  /** Statement refreshing the remote optimizer's statistics after a
    * bulk write (the reference runs ANALYZE after its writes,
    * `crates/duckdb/src/write.rs:990`); None = dialect has no analog.
    */
  def analyzeStatement(ns: String, table: String): Option[String] =
    Some(s"ANALYZE ${quoted(Seq(ns, table))}")

  /** Dialect repair applied to a complete generated SELECT before it is
    * sent to the remote engine (reference: `federation.rs:56-88`).
    */
  def repairSql(sql: String): String = sql

  /** String concatenation: ANSI `||` chain by default; MySQL overrides
    * (its `||` is logical OR unless PIPES_AS_CONCAT is set).
    */
  def concatSql(parts: Seq[String]): String = parts.mkString("(", " || ", ")")

  /** Modulo: the `%` operator where it exists; Derby has only MOD(). */
  def modSql(a: String, b: String): String = s"($a % $b)"

  /** Render a DATE literal from its ISO-8601 text. ANSI `DATE '…'` by
    * default; SQLite has no typed literals (dates are TEXT) and takes
    * the bare string.
    */
  def dateLiteralSql(iso: String): String = s"DATE '$iso'"

  /** Render a TIMESTAMP literal from `yyyy-MM-dd HH:mm:ss[.SSSSSS]`. */
  def timestampLiteralSql(text: String): String = s"TIMESTAMP '$text'"

  /** A TZ-AWARE (instant) timestamp literal; `text` is UTC wall time.
    * Defaults to the naive form — correct wherever the column type is
    * itself naive (Derby/SQLite/MySQL map TimestampType to plain
    * TIMESTAMP/TEXT). Dialects whose TimestampType columns are
    * timestamptz MUST anchor the offset.
    */
  def zonedTimestampLiteralSql(text: String): String = timestampLiteralSql(text)

  /** Render a temporal-field extraction over an already-rendered source
    * expression, or None when this dialect cannot (the predicate then
    * stays on the Spark side — graceful partial pushdown, the same
    * contract as the rest of the unparser). ANSI `EXTRACT(f FROM x)` by
    * default; field names arrive in Spark's V2 spelling and only fields
    * every engine numbers identically are pushed (DAY_OF_WEEK / WEEK /
    * YEAR_OF_WEEK numbering is engine-specific — never rendered).
    */
  def extractSql(field: String, src: String): Option[String] = field match {
    case "YEAR" | "MONTH" | "DAY" | "HOUR" | "MINUTE" | "SECOND" | "QUARTER" =>
      Some(s"EXTRACT($field FROM $src)")
    case _ => None
  }

  /** Per-connection statements attaching sibling database FILES so one
    * connection federates across them (reference: DuckDB multi-database
    * ATTACH with search-path management, `crates/duckdb/src/conn.rs:102-230`
    * — `ATTACH IF NOT EXISTS … (READ_ONLY)` + `SET search_path`).
    * Default: no file-attach concept — a non-empty attach list is a
    * configuration error surfaced at option-parse time on the driver,
    * not as N executor task failures.
    */
  def attachStatements(mainDb: String, attachments: Seq[(String, String)]): Seq[String] =
    if (attachments.isEmpty) Nil
    else throw new IllegalArgumentException(
      s"dialect '$name' does not support attach= (only duckdb and sqlite attach database files)")

  /** Render one VALUES placeholder for a column of `dt` in generated
    * INSERT statements — plain `?` everywhere by default. Engines whose
    * JDBC driver cannot bind a native array (DuckDB throws
    * NotSupported on `createArrayOf` — live-wire finding) override to
    * wrap the array placeholder in a remote cast over a TEXT bind.
    */
  def insertPlaceholder(dt: DataType): String = "?"

  /** Whether native-array columns bind as the engine's list-literal
    * TEXT (paired with [[insertPlaceholder]]'s cast) instead of
    * `Connection.createArrayOf`.
    */
  def arrayBindAsText: Boolean = false

  /** Rows per INSERT statement on the append path: engines whose JDBC
    * batch machinery degenerates to row-at-a-time execution get
    * multi-row `VALUES (…),(…),…` statements instead. 1 = the plain
    * single-row prepared batch. DuckDB overrides: measured 31×
    * (200 k rows, 47.5 s single-row batch → 1.5 s at 100 rows/stmt).
    * Derby measured the other way (round-9 A/B, BASELINE.md): 100-row
    * VALUES is 2.16 s vs 2.07 s for its real batch at 200 k rows — its
    * executeBatch already saturates, so it stays at 1. `insertrows=`
    * overrides per table either way.
    */
  def multiRowInsertBatch: Int = 1

  /** Table rename DDL. ANSI-ish `ALTER TABLE … RENAME TO` is what
    * Postgres / DuckDB / SQLite accept; Derby and MySQL override with
    * their `RENAME TABLE` forms.
    */
  def renameTableSql(oldQualified: String, newName: String): String =
    s"ALTER TABLE $oldQualified RENAME TO ${quote(newName)}"

  /** Null-safe equality (Spark `<=>`) over two rendered operands, or
    * None when this dialect has no spelling for it. ANSI
    * `IS NOT DISTINCT FROM` by default (DuckDB / Postgres / ClickHouse);
    * MySQL spells it `<=>`, SQLite `IS`, Derby has nothing. Gates the
    * federation collapse of Catalyst's INTERSECT/EXCEPT rewrites, whose
    * semi/anti join conditions are null-safe per SQL set-op semantics.
    */
  def nullSafeEqSql(a: String, b: String): Option[String] =
    Some(s"($a IS NOT DISTINCT FROM $b)")

  /** Whether FULL OUTER JOIN may be rendered for this dialect. */
  def supportsFullOuterJoin: Boolean = true

  /** Whether window functions (`fn() OVER (…)`) may be rendered for
    * this dialect — gates the federation rule's Window collapse.
    * Derby's OVER clause takes neither PARTITION BY nor ORDER BY, so it
    * opts out; MySQL opts in and its NULLS-ordering repair
    * ([[MySqlDialect.repairSql]], reference `mysql_window.rs:44-73`)
    * applies inside OVER clauses too.
    */
  def supportsWindowFunctions: Boolean = true

  /** Whether one statement may hold two DISTINCT aggregates (Derby
    * cannot); plans that need more stay local over the scanned rows. */
  def supportsMultipleDistinctAggregates: Boolean = true

  /** A typed NULL select-list item aliased to `name` — how a ghost pin
    * (a `pincolumns` entry the remote table lacks) renders in scan SQL.
    * The default casts through [[stringType]], which doubles as a CAST
    * target on the standard-SQL engines; dialects whose CAST grammar
    * rejects their own DDL string type override.
    */
  def nullColumnSql(name: String): String =
    s"CAST(NULL AS $stringType) AS ${quote(name)}"

  /** Whether `INTERSECT ALL` / `EXCEPT ALL` may be rendered — gates the
    * bag-semantics set-op federation collapse (the DISTINCT forms ride
    * the semi/anti/aggregate rewrites instead and are gated by
    * [[nullSafeEqSql]]). Probed LIVE on Derby 10.16 and DuckDB (both
    * accept the ALL forms); PostgreSQL has them since forever. SQLite's
    * compound SELECT has no ALL variants, ClickHouse's bare
    * INTERSECT/EXCEPT are already bag-semantics with no `ALL` keyword,
    * and MySQL grew them only in 8.0.31 (version-dependent, never
    * executable here) — all three stay local.
    */
  def supportsSetOpAll: Boolean = false

  /** Whether upserts must run as ONE writer: page-locking embedded
    * stores (Derby) serialize concurrent update-else-insert writers on
    * lock waits; row-locking servers take key-clustered parallelism. */
  def singleWriterUpserts: Boolean = false

  /** Whether `(SELECT … ORDER BY …) alias` is accepted AND its order
    * observed by a plain enclosing SELECT — the gate for collapsing a
    * global Sort (without LIMIT) into an already-federated derived leg.
    * True only where the behavior is LIVE-PROBED: dialect_live_check
    * executes the Sort arm's exact rendering (derived ORDER BY with
    * explicit direction + NULLS placement over synthesized NULLs) on
    * real DuckDB, real sqlite3, and a real PostgreSQL 15 and asserts
    * the exact row order; the ordered federation spec additionally
    * proves it end-to-end on the DuckDB wire, and SortedDerivedDerbySpec
    * proves it on live embedded Derby (10.16, exact 4096-row order incl.
    * NULLS placement — r12). MySQL documents that it IGNORES
    * derived-table ORDER BY without LIMIT — stays false; ClickHouse is
    * unprobed/unspecified — false.
    */
  def supportsSortedDerivedTable: Boolean = false
}

/** Apache Derby — the live embedded backend for tests and queries. */
object DerbyDialect extends Dialect {
  val name = "derby"
  override def renameTableSql(oldQualified: String, newName: String): String =
    s"RENAME TABLE $oldQualified TO ${quote(newName)}"
  override def limitClause(n: Int): String = s"FETCH FIRST $n ROWS ONLY"
  override def limitOffsetClause(limit: Option[Int], offset: Option[Int]): String =
    (offset.map(m => s"OFFSET $m ROWS") ++ limit.map(limitClause)).mkString(" ")
  // Derby has no FULL OUTER JOIN.
  override def supportsFullOuterJoin: Boolean = false
  // Derby's ROW_NUMBER() OVER () takes no PARTITION BY / ORDER BY.
  override def supportsWindowFunctions: Boolean = false
  override def supportsMultipleDistinctAggregates: Boolean = false
  override def singleWriterUpserts: Boolean = true
  // Live-probed (SortedDerivedDerbySpec, Derby 10.16): the Sort arm's
  // exact parenthesized-ORDER-BY rendering executes AND its order —
  // DESC NULLS LAST / ASC NULLS FIRST included — survives the enclosing
  // SELECT across a 4096-row scrambled heap.
  override def supportsSortedDerivedTable: Boolean = true
  // Derby has no IS NOT DISTINCT FROM / <=> — null-safe comparisons
  // (and hence the DISTINCT INTERSECT/EXCEPT collapse) stay on the
  // Spark side. The ALL forms collapse fine: Derby's own set-op
  // machinery handles NULL grouping (live-probed, Derby 10.16).
  override def nullSafeEqSql(a: String, b: String): Option[String] = None
  override def supportsSetOpAll: Boolean = true
  override def modSql(a: String, b: String): String = s"MOD($a, $b)"
  // Derby has no EXTRACT; YEAR()..SECOND() exist, QUARTER does not.
  override def extractSql(field: String, src: String): Option[String] = field match {
    case "YEAR" | "MONTH" | "DAY" | "HOUR" | "MINUTE" | "SECOND" =>
      Some(s"$field($src)")
    case _ => None
  }
  override def stringType: String = "VARCHAR(32672)"
  override def typeName(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType | ShortType => "SMALLINT"
    case BinaryType => "BLOB"
    case d: DecimalType if d.precision > 31 =>
      throw new IllegalArgumentException(s"$name: DECIMAL precision ${d.precision} > 31")
    case other => super.typeName(other)
  }
  // Derby has no ON CONFLICT / MERGE-over-VALUES; the writer falls back
  // to UPDATE-then-INSERT per row inside the partition transaction.
  override def upsertStatement(table: String, cols: Seq[String], keys: Seq[String],
      doNothing: Boolean = false, placeholders: Seq[String] = null): String =
    throw new UnsupportedOperationException("derby: use update-else-insert")
  def updateStatement(table: String, cols: Seq[String], keys: Seq[String]): String = {
    val sets = cols.filterNot(keys.contains).map(c => s"${quote(c)} = ?").mkString(", ")
    val cond = keys.map(c => s"${quote(c)} = ?").mkString(" AND ")
    s"UPDATE $table SET $sets WHERE $cond"
  }
  // Derby's statistics refresh is a system procedure over the stored
  // (case-exact) identifiers.
  override def analyzeStatement(ns: String, table: String): Option[String] =
    Some(s"CALL SYSCS_UTIL.SYSCS_UPDATE_STATISTICS(" +
      s"${stringLiteral(ns)}, ${stringLiteral(table)}, NULL)")

  /** Existence probe for the do-nothing mode: a value-preserving
    * `SET c = c` UPDATE whose per-row batch counts tell the writer which
    * keys already exist, keeping the probe batched (a SELECT probe
    * cannot batch over JDBC). Binds: key columns only.
    */
  def touchStatement(table: String, cols: Seq[String], keys: Seq[String]): String = {
    val c0 = cols.find(c => !keys.exists(_.equalsIgnoreCase(c))).getOrElse(cols.head)
    val cond = keys.map(c => s"${quote(c)} = ?").mkString(" AND ")
    s"UPDATE $table SET ${quote(c0)} = ${quote(c0)} WHERE $cond"
  }
}

/** PostgreSQL. The base trait's defaults ARE the Postgres forms (the
  * ON CONFLICT upsert mirrors `on_conflict.rs:73-106`, DOUBLE
  * PRECISION/TEXT the common DDL generator); the overrides below track
  * the reference's pg type table (`crates/postgres/src/arrow_sql_gen/
  * schema.rs:60-90`): binary is BYTEA, a zoned instant is TIMESTAMPTZ
  * (`schema.rs:72`) while NTZ stays TIMESTAMP.
  */
object PostgresDialect extends Dialect {
  val name = "postgres"
  override def supportsSortedDerivedTable: Boolean = true
  override def supportsNativeArrays: Boolean = true
  override def supportsSetOpAll: Boolean = true
  override def typeName(dt: DataType): String = dt match {
    case BinaryType => "BYTEA"
    case TimestampType => "TIMESTAMPTZ"
    // native array DDL; nested element types still fall back to TEXT
    case ArrayType(et, _) if Dialect.isNativeArrayElement(et) =>
      s"${typeName(et)}[]"
    case other => super.typeName(other)
  }
  override def arrayElementName(et: DataType): String = et match {
    case ShortType => "int2"
    case IntegerType => "int4"
    case LongType => "int8"
    case FloatType => "float4"
    case DoubleType => "float8"
    case BooleanType => "bool"
    case StringType => "text"
    case _: DecimalType => "numeric"
    case other => throw new IllegalArgumentException(
      s"postgres: unsupported array element $other")
  }
  /** TimestampType columns are TIMESTAMPTZ here: a naive literal would
    * be read in the remote SESSION's timezone, silently shifting pushed
    * comparisons on any server not set to UTC — anchor the UTC text.
    */
  override def zonedTimestampLiteralSql(text: String): String =
    s"TIMESTAMP WITH TIME ZONE '$text+00'"
}

/** DuckDB — Postgres-family quoting, types, and ON CONFLICT; the
  * post-write `ANALYZE t` matches `crates/duckdb/src/write.rs:990`.
  */
object DuckDbDialect extends Dialect {
  val name = "duckdb"
  override def supportsSortedDerivedTable: Boolean = true
  // live-probed: DuckDB executes INTERSECT ALL / EXCEPT ALL natively
  override def supportsSetOpAll: Boolean = true
  // DuckDB has native LIST columns (the reference's duckdb connector
  // maps them to Arrow List, crates/duckdb); same `element[]` DDL as
  // Postgres, proven by dialect_live_check executing it live.
  override def supportsNativeArrays: Boolean = true
  override def typeName(dt: DataType): String = dt match {
    case ArrayType(et, _) if Dialect.isNativeArrayElement(et) =>
      s"${typeName(et)}[]"
    case other => super.typeName(other)
  }
  // Throwing whitelist so supportsArrayElement is false exactly where
  // the DDL above falls back to TEXT — without it the trait default
  // (typeName succeeds for e.g. DATE) routes temporal/binary elements
  // into createArrayOf against a TEXT column (review finding).
  override def arrayElementName(et: DataType): String =
    if (Dialect.isNativeArrayElement(et)) typeName(et)
    else throw new IllegalArgumentException(s"duckdb: unsupported array element $et")
  /** DuckDB's JDBC driver reads arrays natively but throws
    * NotSupported on `createArrayOf` (live-wire finding): arrays bind
    * as JSON text, cast remotely through JSON — the plain
    * VARCHAR→LIST cast in v1.0 splits on commas with NO quoting
    * mechanism (probed live: `'["a,b"]'` becomes `['"a', 'b"']`-ish),
    * while the JSON route round-trips every element exactly.
    */
  override def arrayBindAsText: Boolean = true
  /** The driver's executeBatch runs its prepared statement once per
    * row internally — multi-row VALUES is the measured 31× fix. */
  override def multiRowInsertBatch: Int = 100
  override def insertPlaceholder(dt: DataType): String = dt match {
    case ArrayType(et, _) if Dialect.isNativeArrayElement(et) =>
      s"CAST(CAST(? AS JSON) AS ${typeName(dt)})"
    case _ => "?"
  }
  /** The reference's attachment recipe verbatim-in-semantics
    * (`crates/duckdb/src/conn.rs:225-236`): read-only ATTACH per file,
    * then a search_path of main + every attachment so unqualified names
    * resolve across all of them (qualified `name.table` also works).
    */
  override def attachStatements(mainDb: String, attachments: Seq[(String, String)]): Seq[String] =
    if (attachments.isEmpty) Nil
    else attachments.map { case (n, p) =>
      s"ATTACH IF NOT EXISTS ${stringLiteral(p)} AS ${quote(n)} (READ_ONLY)"
    } :+ s"SET search_path = ${stringLiteral((mainDb +: attachments.map(_._1)).mkString(","))}"
}

object SqliteDialect extends Dialect {
  val name = "sqlite"
  override def supportsSortedDerivedTable: Boolean = true
  // SQLite's null-safe equality operator is `IS`
  override def nullSafeEqSql(a: String, b: String): Option[String] = Some(s"($a IS $b)")
  override def typeName(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    // SQLite has no decimal; the reference downgrades to float
    // (crates/sqlite/src/arrow_sql_gen.rs:175).
    case _: DecimalType => "REAL"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }
  private val IntervalAdd =
    """(?i)(\S+)\s*\+\s*INTERVAL\s+'(\d+)'\s+(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)""".r
  /** `col + INTERVAL 'n' unit` → `datetime(col, '+n units')` — the
    * reference's sqlite_interval.rs rewrite, at the SQL-text level.
    */
  override def repairSql(sql: String): String =
    IntervalAdd.replaceAllIn(sql, m =>
      s"datetime(${m.group(1)}, '+${m.group(2)} ${m.group(3).toLowerCase}s')")
  // SQLite has no EXTRACT; strftime returns text, so cast back to int.
  private val Strftime = Map("YEAR" -> "%Y", "MONTH" -> "%m", "DAY" -> "%d",
    "HOUR" -> "%H", "MINUTE" -> "%M", "SECOND" -> "%S")
  override def extractSql(field: String, src: String): Option[String] =
    Strftime.get(field).map(f => s"CAST(strftime('$f', $src) AS INTEGER)")
  // SQLite has no typed literal syntax — `DATE '…'` is a parse error on
  // the real engine (found by scripts/dialect_live_check.py once it ran
  // this dialect in live sqlite3 instead of DuckDB). Dates/timestamps
  // are TEXT; ISO-8601 strings compare correctly.
  override def dateLiteralSql(iso: String): String = stringLiteral(iso)
  override def timestampLiteralSql(text: String): String = stringLiteral(text)
  /** SQLite's native multi-file federation: `ATTACH DATABASE`.
    * Unqualified names already resolve across attached databases in
    * attach order (no search-path concept), so only the ATTACHes render.
    */
  override def attachStatements(mainDb: String, attachments: Seq[(String, String)]): Seq[String] =
    attachments.map { case (n, p) =>
      s"ATTACH DATABASE ${stringLiteral(p)} AS ${quote(n)}"
    }
}

object MySqlDialect extends Dialect {
  val name = "mysql"
  // MySQL has no IS NOT DISTINCT FROM; its null-safe equality is `<=>`
  override def nullSafeEqSql(a: String, b: String): Option[String] = Some(s"($a <=> $b)")
  // MySQL's CAST grammar takes CHAR, not the LONGTEXT DDL type
  override def nullColumnSql(name: String): String =
    s"CAST(NULL AS CHAR) AS ${quote(name)}"
  override def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
  // MySQL string literals treat backslash as an escape character (the
  // one engine here that does) — without doubling, the unparser's
  // LIKE-escape rendering ('%10\%%' ESCAPE '\') parses as garbage
  override def stringLiteral(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
  override def renameTableSql(oldQualified: String, newName: String): String =
    s"RENAME TABLE $oldQualified TO ${quote(newName)}"
  override def stringType: String = "LONGTEXT"
  override def typeName(dt: DataType): String = dt match {
    case BooleanType => "TINYINT(1)"
    case _ => super.typeName(dt)
  }
  override def upsertStatement(table: String, cols: Seq[String], keys: Seq[String],
      doNothing: Boolean = false, placeholders: Seq[String] = null): String = {
    val ph = valuesPlaceholders(cols, placeholders).mkString(", ")
    if (doNothing)
      // MySQL's do-nothing conflict form (keys are whatever unique
      // constraints exist; the column list is ignored by the syntax)
      s"INSERT IGNORE INTO $table (${cols.map(quote).mkString(", ")}) " +
        s"VALUES ($ph)"
    else {
      val non = cols.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
      if (non.isEmpty)
        // all columns are constraint columns: nothing to update — degrade
        // to the do-nothing form like the reference (`on_conflict.rs:53-59`)
        s"INSERT IGNORE INTO $table (${cols.map(quote).mkString(", ")}) " +
          s"VALUES ($ph)"
      else {
        val sets = non.map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
        s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) VALUES ($ph) " +
          s"ON DUPLICATE KEY UPDATE $sets"
      }
    }
  }
  override def analyzeStatement(ns: String, table: String): Option[String] =
    Some(s"ANALYZE TABLE ${quoted(Seq(ns, table))}")
  override def concatSql(parts: Seq[String]): String =
    parts.mkString("CONCAT(", ", ", ")")
  private val NullsOrder =
    ("""(?i)([\w.]+|`(?:[^`]|``)+`|"[^"]+")""" +
      """(\s+(?:ASC|DESC))?\s+NULLS\s+(FIRST|LAST)""").r
  /** MySQL rejects NULLS FIRST/LAST (reference mysql_window.rs strips
    * them) — but a blanket strip CHANGES RESULTS for half the cases:
    * MySQL's defaults are ASC→nulls-first, DESC→nulls-last, so only
    * those two spellings strip safely; the other two rewrite to the
    * standard `IS [NOT] NULL` leading-key emulation. Operands more
    * complex than an identifier are left untouched — MySQL then errors
    * loudly instead of silently reordering.
    */
  override def repairSql(sql: String): String =
    NullsOrder.replaceAllIn(sql, m => {
      val x = m.group(1)
      val dir = Option(m.group(2)).map(_.trim.toUpperCase).getOrElse("ASC")
      val keep = if (m.group(2) == null) x else s"$x ${dir}"
      val rep = (dir, m.group(3).toUpperCase) match {
        case ("ASC", "FIRST") => keep              // MySQL ASC default
        case ("DESC", "LAST") => keep              // MySQL DESC default
        case ("ASC", "LAST") => s"$x IS NULL, $keep"
        case ("DESC", "FIRST") => s"$x IS NOT NULL, $keep"
        case _ => keep
      }
      java.util.regex.Matcher.quoteReplacement(rep)
    })
}

/** ClickHouse: backtick quoting, native type names, no OVERWRITE-style
  * upsert (ReplacingMergeTree dedups at merge time — upsert statements
  * are plain INSERTs). Parameterized views ride [[JdbcOptions.tableArgs]]
  * (reference `crates/common/src/util/table_arg_replace.rs:10-80`).
  */
object ClickHouseDialect extends Dialect {
  val name = "clickhouse"
  // merge-tree engines keep their own part statistics; no ANALYZE analog
  override def analyzeStatement(ns: String, table: String): Option[String] = None
  // ClickHouse rejects CAST(NULL AS String) — NULL needs a Nullable type
  override def nullColumnSql(name: String): String =
    s"CAST(NULL AS Nullable(String)) AS ${quote(name)}"
  override def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
  override def renameTableSql(oldQualified: String, newName: String): String =
    s"RENAME TABLE $oldQualified TO ${quote(newName)}"
  override def stringType: String = "String"
  override def typeName(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "Bool"
    case BinaryType => "String"
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
    case _ => super.typeName(dt)
  }
  override def upsertStatement(table: String, cols: Seq[String], keys: Seq[String],
      doNothing: Boolean = false, placeholders: Seq[String] = null): String =
    // ReplacingMergeTree semantics: the insert IS the upsert (and the
    // engine keeps one version at merge time either way)
    s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${valuesPlaceholders(cols, placeholders).mkString(", ")})"
}

object Dialect {
  /** `DatabaseMetaData.getTables` type filter that matches base tables on
    * every live engine: Derby reports "TABLE", DuckDB "BASE TABLE" — the
    * filter is an exact-match list, so carrying both is harmless where
    * only one exists.
    */
  private[jdbc] val TableTypes: Array[String] = Array("TABLE", "BASE TABLE")

  /** The ONE whitelist of array element types the native-array dialects
    * declare in DDL, bind via `createArrayOf` (TypeMapping's boxing
    * match covers exactly this set), and read back — shared so the
    * DDL, bind-guard, and element-name paths cannot drift.
    */
  private[jdbc] def isNativeArrayElement(et: DataType): Boolean = et match {
    case BooleanType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | StringType | _: DecimalType => true
    case _ => false
  }

  val all: Map[String, Dialect] = Seq(
    DerbyDialect, PostgresDialect, DuckDbDialect, SqliteDialect, MySqlDialect,
    ClickHouseDialect)
    .map(d => d.name -> d).toMap
  def forName(n: String): Dialect = all.getOrElse(n.toLowerCase,
    throw new IllegalArgumentException(s"unknown dialect $n"))
  def forUrl(url: String): Dialect =
    if (url.startsWith("jdbc:derby")) DerbyDialect
    else if (url.startsWith("jdbc:postgresql")) PostgresDialect
    else if (url.startsWith("jdbc:mysql")) MySqlDialect
    else if (url.startsWith("jdbc:sqlite")) SqliteDialect
    else if (url.startsWith("jdbc:duckdb")) DuckDbDialect
    else if (url.startsWith("jdbc:clickhouse") || url.startsWith("jdbc:ch")) ClickHouseDialect
    else DerbyDialect
}
