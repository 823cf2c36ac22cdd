package graft.sources.jdbc

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._

/** DSv2 scan over an external JDBC table with projection / predicate /
  * limit / TopK pushdown and optional range-partitioned parallelism.
  *
  * The Spark-native re-expression of the reference's `SqlTable.scan` →
  * `SqlExec` pipeline (`crates/common/src/sql/sql_provider_datafusion/
  * mod.rs:122-165,278-334`): Catalyst's `V2ScanRelationPushDown` drives
  * the same per-filter Exact/Unsupported decision the reference makes in
  * `supports_filters_pushdown` (`mod.rs:211-217`) — a predicate the
  * [[Unparser]] cannot render stays in Spark, so partial pushdown is
  * never a correctness risk. TopK pushdown mirrors `try_pushdown_sort`
  * (`mod.rs:516-585`) including its safety property: Spark keeps a local
  * `TakeOrderedAndProject` above the scan, so the remote ORDER BY only
  * reduces transferred rows.
  *
  * Scale: the reference's SQL scans are always 1 partition
  * (`mod.rs:313`). Here `partitionColumn/lowerBound/upperBound/
  * numPartitions` splits the scan into range predicates executed by N
  * executors concurrently — the improvement SURVEY §4.2 calls out.
  */
final class JdbcScanBuilder(options: JdbcOptions, tableSchema: StructType)
  extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownOffset
    with SupportsPushDownAggregates
    with Logging {

  private val unparser = new Unparser(options.dialect)
  private var schema: StructType = tableSchema

  /** Pins declared but absent from the remote table (lower-cased). The
    * exposed schema gives them the reference's Utf8 fallback
    * (`schema_projection.rs` `field_for`); the scan renders them as a
    * typed NULL (null-for-missing-field semantics) and they are excluded
    * from every pushdown surface exactly like the catch-all column.
    * Cheap: `fullRemoteSchema` is cached per compute context + FROM.
    */
  private lazy val ghostPins: Set[String] = options.pinColumns match {
    case None => Set.empty
    case Some(pins) =>
      val remote = SchemaProjection.fullRemoteSchema(options)
      pins.filterNot(p => remote.fields.exists(_.name.equalsIgnoreCase(p)))
        .map(_.toLowerCase).toSet
  }

  /** With a pincolumns projection, the catch-all column — and any ghost
    * pin — has no remote existence: any pushdown piece referencing one
    * must refuse (the rendered `"data"` would be a remote unknown-column
    * error). Truly-remote pinned columns keep the whole pushdown surface.
    */
  private def touchesCatchAll(e: Expression): Boolean =
    options.pinColumns.isDefined && {
      val ca = options.catchAllColumn
      def walk(x: Expression): Boolean = x match {
        case n: NamedReference => n.fieldNames.exists(f =>
          f.equalsIgnoreCase(ca) || ghostPins(f.toLowerCase))
        case other => other.children().exists(walk)
      }
      walk(e)
    }
  private var pushedSql: Seq[String] = Nil
  private var pushed: Array[Predicate] = Array.empty
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var orderBy: Seq[String] = Nil
  private var sortIsPartial = false
  private var aggSelect: Seq[String] = Nil // rendered "expr AS alias" items
  private var groupBySql: Seq[String] = Nil
  private var aggSchema: Option[StructType] = None

  override def pruneColumns(required: StructType): Unit = {
    // Once an aggregate is pushed, the scan's output IS the aggregate
    // schema — ignore later pruning passes (same as Spark's own JDBC v2).
    if (aggSchema.isDefined) return
    // Empty required schema (e.g. COUNT(*)) keeps one narrow column so the
    // generated SQL stays valid — the reference synthesizes `SELECT 1`
    // (`mod.rs:255-276`); we project the first column and let Spark count.
    schema =
      if (required.isEmpty) StructType(tableSchema.take(1)) else required
  }

  // ---- aggregate pushdown (SURVEY §4.1 "whole-subplan federation":
  // the GROUP BY leg; reference unparses aggregates to remote SQL via
  // datafusion-federation, `federation.rs:62-110`) -----------------------

  private def fieldOf(e: Expression): Option[StructField] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(f.fieldNames.head))
    case _ => None
  }

  /** Spark's expected result type for a completely-pushed aggregate —
    * the scan schema must match what the optimizer substitutes, or it
    * inserts casts (or worse, mis-types rows read from JDBC).
    */
  private def aggResultType(f: AggregateFunc): Option[DataType] = f match {
    case _: CountStar => Some(LongType)
    case _: Count => Some(LongType)
    case s: Sum => fieldOf(s.column).map(_.dataType).flatMap {
      case ByteType | ShortType | IntegerType | LongType => Some(LongType)
      case DoubleType => Some(DoubleType)
      case d: DecimalType =>
        Some(DecimalType(math.min(DecimalType.MAX_PRECISION, d.precision + 10), d.scale))
      // Float excluded: remote REAL accumulation differs from Spark's
      // float-widened-to-double sum.
      case _ => None
    }
    case m: Min => fieldOf(m.column).map(_.dataType)
    case m: Max => fieldOf(m.column).map(_.dataType)
    // AVG only over doubles: integer AVG is integer division in many
    // dialects (Derby included) — Spark semantics say double.
    case a: Avg => fieldOf(a.column).map(_.dataType).collect { case DoubleType => DoubleType }
    case _ => None
  }

  private def isDistinctAgg(f: AggregateFunc): Boolean = f match {
    case c: Count => c.isDistinct
    case s: Sum => s.isDistinct
    case a: Avg => a.isDistinct
    case _ => false
  }

  private def translate(agg: Aggregation): Option[(Seq[String], Seq[String], StructType)] = {
    // catch-all references cannot exist remotely — whole aggregate stays local
    if (agg.groupByExpressions.exists(touchesCatchAll) ||
      agg.aggregateExpressions.exists(touchesCatchAll)) return None
    // Derby cannot evaluate two DISTINCT aggregates in one statement
    // ("Multiple DISTINCT aggregates are not supported") — such plans
    // stay local over the scanned rows. Found by AggPushdownPropertySpec.
    if (!options.dialect.supportsMultipleDistinctAggregates &&
      agg.aggregateExpressions.count(isDistinctAgg) > 1) return None
    val grpFields = agg.groupByExpressions.toSeq.map(fieldOf)
    val aggTypes = agg.aggregateExpressions.toSeq.map(aggResultType)
    val aggSqls = agg.aggregateExpressions.toSeq.map(unparser.agg)
    if (aggSqls.exists(_.isEmpty)) return None
    if (grpFields.exists(_.isEmpty) || aggTypes.exists(_.isEmpty))
      return translateGeneral(agg, aggSqls.map(_.get))
    val d = options.dialect
    val grpCols = grpFields.map(_.get)
    val sel =
      grpCols.map(f => d.quote(f.name)) ++
        aggSqls.zipWithIndex.map { case (s, i) => s"${s.get} AS ${d.quote(s"agg$i")}" }
    val schema = StructType(
      grpCols.map(f => StructField(f.name, f.dataType, nullable = true)) ++
        aggTypes.zipWithIndex.map { case (t, i) => StructField(s"agg$i", t.get, nullable = true) })
    Some((sel, grpCols.map(f => d.quote(f.name)), schema))
  }

  /** General-expression aggregate pushdown: GROUP BY keys and aggregate
    * arguments that are rendered EXPRESSIONS (`YEAR(ts)`, `SUM(a * b)`)
    * rather than plain columns. The result types of such expressions
    * are the REMOTE engine's business (Derby's YEAR() is INTEGER,
    * another dialect's EXTRACT may be BIGINT), so the scan schema comes
    * from prepared-statement introspection of the generated statement —
    * the same source of truth Spark's own JDBC v2 uses
    * (`JDBCRDD.getQueryOutputSchema`); `V2ScanRelationPushDown` then
    * casts the scan's columns to the plan's expected types positionally.
    * Introspection is cached per (url, sql) and a remote failure simply
    * keeps the aggregate local.
    */
  private def translateGeneral(agg: Aggregation,
      aggSqls: Seq[String]): Option[(Seq[String], Seq[String], StructType)] = {
    val d = options.dialect
    val grpSqls = agg.groupByExpressions.toSeq.map(unparser.expr)
    if (grpSqls.exists(_.isEmpty)) return None
    val sel =
      grpSqls.zipWithIndex.map { case (s, i) => s"${s.get} AS ${d.quote(s"g$i")}" } ++
        aggSqls.zipWithIndex.map { case (s, i) => s"$s AS ${d.quote(s"agg$i")}" }
    val group = grpSqls.map(_.get)
    val whereClause =
      if (pushedSql.isEmpty) "" else pushedSql.mkString(" WHERE ", " AND ", "")
    val groupClause = if (group.isEmpty) "" else group.mkString(" GROUP BY ", ", ", "")
    val probe = d.repairSql(
      s"SELECT ${sel.mkString(", ")} FROM ${options.fromClause}$whereClause$groupClause")
    try {
      val sch = JdbcOptions.schemaCache.getOrElseUpdate((options.url, probe), {
        val c = options.connect()
        try {
          val ps = c.prepareStatement(probe)
          try TypeMapping.schemaOf(ps.getMetaData,
            unsupportedAsString = options.readUnsupportedAsString)
          finally ps.close()
        } finally c.close()
      })
      Some((sel, group, sch))
    } catch {
      case e: Exception =>
        logInfo(s"graft-jdbc: expression-aggregate introspection failed, staying local: $e")
        None
    }
  }

  // Complete-only pushdown: with one input partition the remote result
  // IS the final aggregate (the reference's federation executes the
  // whole GROUP BY remotely for the same reason). Partial/merge pushdown
  // across range partitions is deliberately not claimed.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    options.numPartitions <= 1 && translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    if (options.numPartitions > 1) false
    else translate(agg) match {
      case Some((sel, grp, sch)) =>
        aggSelect = sel; groupBySql = grp; aggSchema = Some(sch)
        true
      case None => false
    }

  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    val rendered = predicates.map(p =>
      p -> (if (touchesCatchAll(p)) None else unparser.expr(p)))
    pushed = rendered.collect { case (p, Some(_)) => p }
    pushedSql = rendered.collect { case (_, Some(s)) => s }.toSeq
    rendered.collect { case (p, None) => p }
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def pushLimit(n: Int): Boolean = {
    // After an aggregate is pushed, sort/limit expressions reference the
    // aggregate's output attributes, which have no stable remote name —
    // keep them in Spark.
    if (aggSchema.isDefined) return false
    limit = Some(n)
    true
  }

  // Partial: the remote engine orders its rows but Spark still runs the
  // final TopK merge (exactly the reference's Inexact contract, A2).
  override def isPartiallyPushed: Boolean = sortIsPartial || options.numPartitions > 1

  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (aggSchema.isDefined) return false
    // a sort key on the catch-all column has no remote rendering
    if (orders.exists(o => touchesCatchAll(o.expression()))) return false
    val rendered = orders.toSeq.map(unparser.sort)
    if (rendered.forall(_.isDefined)) {
      orderBy = rendered.map(_.get)
      limit = Some(n)
      // Single JDBC cursor => the remote ORDER BY + FETCH is the exact
      // answer and Spark may drop its local TopN (same contract as
      // Spark's own JDBC v2). Range-split scans re-sort locally.
      sortIsPartial = options.numPartitions > 1
      true
    } else false
  }

  /** OFFSET is accepted only when the remote result is exactly the
    * rows Spark must see: one partition (a per-partition OFFSET skips
    * rows per range split), a pushed total ORDER (Spark only pushes
    * offset below a fully-pushed TopN, and an unsorted remote OFFSET
    * would be nondeterministic anyway), and a pushed limit strictly
    * above the offset. Spark's contract is take-limit-THEN-skip-offset
    * (it pushes limit = n + m for `offset(m).limit(n)`), which SQL's
    * skip-then-take renders as `OFFSET m` + `FETCH FIRST (limit - m)`
    * — composed in [[JdbcScan.sqlFor]]. Spark removes its local Offset
    * when this returns true.
    */
  override def pushOffset(n: Int): Boolean = {
    if (aggSchema.isDefined || options.numPartitions > 1 || orderBy.isEmpty ||
      !limit.exists(_ > n)) false
    else { offset = Some(n); true }
  }

  override def build(): Scan = {
    // pincolumns projection: when the surviving schema still carries the
    // catch-all column, the scan must fetch every non-pinned remote
    // column and fold it in the reader (alphabetical — reference
    // BTreeMap ordering). Pruned-away catch-all = a plain pinned scan.
    val catchAll: Option[(String, StructType)] =
      if (aggSchema.isDefined) None
      else options.pinColumns.flatMap { pins =>
        schema.fields.find(_.name.equalsIgnoreCase(options.catchAllColumn)).map { _ =>
          (options.catchAllColumn,
            SchemaProjection.restFields(SchemaProjection.fullRemoteSchema(options), pins))
        }
      }
    JdbcScan(options, aggSchema.getOrElse(schema), pushedSql, orderBy, limit,
      aggSelect, groupBySql, pushedOffset = offset, catchAll = catchAll,
      ghostPins = if (aggSchema.isDefined) Set.empty else ghostPins)
  }
}

final case class JdbcScan(
    options: JdbcOptions,
    schema: StructType,
    where: Seq[String],
    orderBy: Seq[String],
    limit: Option[Int],
    aggSelect: Seq[String] = Nil,
    groupBy: Seq[String] = Nil,
    pushedOffset: Option[Int] = None,
    catchAll: Option[(String, StructType)] = None,
    ghostPins: Set[String] = Set.empty) extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics with Logging {

  override def readSchema(): StructType = schema

  /** Optimizer statistics (opt-in via `remotestats=count`): row count
    * from one remote COUNT(*) over the SAME pushed predicates this scan
    * carries, size estimated as rows × schema default width. Lazily
    * computed once per planned scan; unknown (Spark's conservative
    * default) when disabled, when an aggregate was pushed (base-row
    * counts would overstate the grouped output), or on any remote error.
    */
  private lazy val stats: Statistics = {
    def unknown = new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
    if (options.remoteStats != "count" || aggSelect.nonEmpty) unknown
    else try {
      val whereClause =
        if (where.isEmpty) "" else where.mkString(" WHERE ", " AND ", "")
      val countSql = s"SELECT COUNT(*) FROM ${options.fromClause}$whereClause"
      val n = JdbcScan.cachedCount(options.url + "\u0000" + countSql) {
        val c = options.connect()
        try {
          val st = c.createStatement()
          try {
            val rs = st.executeQuery(countSql)
            rs.next()
            val cnt = rs.getLong(1)
            logInfo(s"graft-jdbc stats: $countSql -> $cnt rows")
            cnt
          } finally st.close()
        } finally c.close()
      }
      val size = math.max(1L, n * schema.defaultSize)
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(size)
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
      }
    } catch {
      case e: Exception =>
        logWarning(s"graft-jdbc stats failed, planning without: $e")
        unknown
    }
  }

  override def estimateStatistics(): Statistics = stats

  override def description(): String = s"GraftJdbcScan(${options.table}) [$sql]"

  // Runtime filters (DPP / semi-join reduction, SURVEY §4.1: the
  // physical-phase filter injection P3 maps to this in Spark): join-key
  // values discovered at RUNTIME arrive here before partitions are
  // planned and splice into the remote WHERE — the reference's
  // `insert_where_clause` string surgery (`mod.rs:442-479,609-655`),
  // driven by Spark instead of hand-rolled plan mutation.
  private var runtimeWhere: Seq[String] = Nil

  /** Runtime filters must never compose with a pushed fetch: SQL applies
    * WHERE before ORDER BY/FETCH, so splicing a join-driven runtime
    * predicate under a pushed LIMIT/OFFSET would return "top-n of the
    * filtered rows" instead of "filtered top-n" — and with the complete
    * TopN/Offset pushdown (A2/A3) no local operator remains to repair it.
    * Same guard shape as the pushed-aggregate case.
    */
  private def fetchIsPushed: Boolean = limit.isDefined || pushedOffset.isDefined

  override def filterAttributes(): Array[NamedReference] =
    if (aggSelect.nonEmpty || fetchIsPushed) Array.empty // no remote names / fetch pushed
    else schema.fields
      .filterNot(f => catchAll.exists(_._1.equalsIgnoreCase(f.name)) ||
        ghostPins(f.name.toLowerCase))
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  override def filter(predicates: Array[Predicate]): Unit = {
    if (fetchIsPushed || aggSelect.nonEmpty) return // see filterAttributes
    val u = new Unparser(options.dialect)
    runtimeWhere = runtimeWhere ++ predicates.toSeq.flatMap(p => u.expr(p))
  }

  /** The single remote SQL statement, before per-partition range splicing. */
  def sql: String = sqlFor(None)

  private def sqlFor(rangePred: Option[String]): String = {
    val d = options.dialect
    // A ghost pin (declared but absent remotely) renders as a typed NULL
    // aliased to its exposed name — the reference's null-for-missing-field
    // semantics — instead of a quoted column the remote would reject.
    // Dialect-routed: MySQL/ClickHouse CAST grammars reject their own
    // DDL string type.
    def colSql(name: String): String =
      if (ghostPins(name.toLowerCase)) d.nullColumnSql(name)
      else d.quote(name)
    val cols =
      if (aggSelect.nonEmpty) aggSelect.mkString(", ")
      else catchAll match {
        // pinned survivors first, then every folded remote column; a
        // degenerate all-empty projection renders the reference's
        // synthetic SELECT 1
        case Some((ca, rest)) =>
          val sel = schema.fields.filterNot(_.name.equalsIgnoreCase(ca))
            .map(f => colSql(f.name)) ++ rest.fields.map(f => d.quote(f.name))
          if (sel.isEmpty) "1" else sel.mkString(", ")
        case None => schema.fields.map(f => colSql(f.name)).mkString(", ")
      }
    val conds = where ++ runtimeWhere ++ rangePred
    val whereClause =
      if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    val group =
      if (groupBy.isEmpty) "" else groupBy.mkString(" GROUP BY ", ", ", "")
    val order =
      if (orderBy.isEmpty) "" else orderBy.mkString(" ORDER BY ", ", ", "")
    // Spark's pushed limit is the take-BEFORE-skip count; SQL's
    // LIMIT/OFFSET skips first, so the rendered fetch is limit - offset.
    val lim =
      if (limit.isEmpty && pushedOffset.isEmpty) ""
      else " " + d.limitOffsetClause(
        limit.map(n => n - pushedOffset.getOrElse(0)), pushedOffset)
    d.repairSql(s"SELECT $cols FROM ${options.fromClause}$whereClause$group$order$lim")
  }

  override def toBatch: Batch = this

  /** Incremental streaming read ([[JdbcMicroBatchStream]]): pushed
    * predicates and pruned columns ride into every micro-batch; fetch
    * pushdowns cannot occur on the streaming path (Spark pushes no
    * TopN/limit/aggregate into an unbounded scan), so the guard is an
    * invariant check, not a policy.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val wcol = options.streamColumn.getOrElse(throw new IllegalStateException(
      "streaming read requires streamcolumn=<monotonically increasing numeric column>"))
    require(aggSelect.isEmpty && orderBy.isEmpty && limit.isEmpty && pushedOffset.isEmpty,
      "fetch/aggregate pushdown cannot compose with a streaming scan")
    // NULL watermark values fall outside every (start, end] range and
    // are never delivered — surface the hazard once, at stream start
    schema.fields.find(_.name.equalsIgnoreCase(wcol)).filter(_.nullable).foreach { _ =>
      logWarning(s"graft-jdbc stream: column '$wcol' is nullable — rows with a " +
        "NULL watermark value are never delivered (declare it NOT NULL)")
    }
    new JdbcMicroBatchStream(options, schema, where, wcol)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    (options.partitionColumn, options.lowerBound, options.upperBound) match {
      case (Some(col), Some(lo), Some(hi)) if options.numPartitions > 1 =>
        val d = options.dialect
        val q = d.quote(col)
        val n = options.numPartitions.toLong
        val width = math.max(1L, (hi - lo) / n + (if ((hi - lo) % n == 0) 0 else 1))
        (0L until n).map { i =>
          val lo2 = lo + i * width
          val hi2 = lo + (i + 1) * width
          val pred =
            if (i == 0) s"($q < $hi2 OR $q IS NULL)"
            else if (i == n - 1) s"($q >= $lo2)"
            else s"($q >= $lo2 AND $q < $hi2)"
          JdbcInputPartition(sqlFor(Some(pred)), i.toInt): InputPartition
        }.toArray
      case _ => Array(JdbcInputPartition(sqlFor(None), 0))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    JdbcReaderFactory(options, schema, catchAll)
}

object JdbcScan {
  /** Driver-side remote COUNT(*) cache: every action plans a fresh scan,
    * so without this each action over the same (connection, FROM, WHERE)
    * re-issues a blocking remote count at planning time (ADVICE r6).
    * Short TTL keeps estimates fresh for mutating tables; bounded size.
    */
  private val statsTtlMs = 30000L
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private[jdbc] def cachedCount(key: String)(compute: => Long): Long = {
    val now = System.currentTimeMillis()
    val hit = statsCache.get(key)
    if (hit != null && now - hit._2 < statsTtlMs) hit._1
    else {
      val n = compute
      if (statsCache.size > 1024) statsCache.clear()
      statsCache.put(key, (n, now))
      n
    }
  }

  /** Test hook. */
  private[jdbc] def clearStatsCache(): Unit = statsCache.clear()
}

final case class JdbcInputPartition(sql: String, idx: Int) extends InputPartition

final case class JdbcReaderFactory(options: JdbcOptions, schema: StructType,
    catchAll: Option[(String, StructType)] = None)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JdbcPartitionReader(options, schema,
      partition.asInstanceOf[JdbcInputPartition].sql, catchAll)
}

/** Executor-side cursor: streams `fetchSize`-row chunks from the remote
  * statement (reference: Postgres 4000-row chunking, `conn.rs:443`).
  *
  * With a `catchAll` projection the physical cursor carries the pinned
  * survivors followed by every folded remote column; `get()` re-shapes
  * each physical row into the output schema, serializing the folded
  * tail as one sorted-key JSON object string (the reference's
  * `project_row`, `schema_projection.rs`). No folded columns at all →
  * the catch-all reads as SQL NULL.
  */
final class JdbcPartitionReader(options: JdbcOptions, schema: StructType, sql: String,
    catchAll: Option[(String, StructType)] = None)
  extends PartitionReader[InternalRow] with Logging {

  // physical result schema (what the rendered SQL actually selects)
  private val physSchema: StructType = catchAll match {
    case Some((ca, rest)) =>
      StructType(schema.fields.filterNot(_.name.equalsIgnoreCase(ca)) ++ rest.fields)
    case None => schema
  }
  // output index → physical index, -1 marking the catch-all slot
  private val outIndex: Option[Array[Int]] = catchAll.map { case (ca, _) =>
    var p = 0
    schema.fields.map { f =>
      if (f.name.equalsIgnoreCase(ca)) -1 else { val i = p; p += 1; i }
    }
  }

  // per-resource open flags guard close(): forcing the lazies there
  // would EXECUTE the remote query for readers that never produced a
  // row — e.g. the N−1 tasks a satisfied LIMIT kills before their
  // first next() would each fire a full remote scan just to close it
  // (and a lazy whose initializer THREW must never be re-forced)
  @volatile private var connOpened = false
  @volatile private var stmtOpened = false
  @volatile private var rsOpened = false
  private lazy val conn = {
    val c = options.connect(); connOpened = true; c
  }
  private lazy val stmt = {
    val s = conn.createStatement()
    stmtOpened = true
    s.setFetchSize(options.fetchSize)
    s
  }
  private lazy val rs = {
    logInfo(s"graft-jdbc scan: $sql")
    val r = stmt.executeQuery(sql)
    rsOpened = true
    r
  }
  // metadata-aware: TIME columns normalize to the epoch day regardless
  // of the driver's date-component convention
  private lazy val getters = TypeMapping.getters(physSchema, rs.getMetaData)

  override def next(): Boolean = rs.next()
  override def get(): InternalRow = {
    val phys = TypeMapping.readRow(rs, getters)
    outIndex match {
      case None => phys
      case Some(idx) =>
        val (_, rest) = catchAll.get
        val pinnedCount = idx.count(_ >= 0)
        def physGet(p: Int): Any =
          if (phys.isNullAt(p)) null else phys.get(p, physSchema.fields(p).dataType)
        val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(idx.length)
        var i = 0
        while (i < idx.length) {
          if (idx(i) >= 0) out.update(i, physGet(idx(i)))
          else if (rest.isEmpty) out.update(i, null)
          else {
            val restRow =
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rest.length)
            var j = 0
            while (j < rest.length) {
              restRow.update(j, physGet(pinnedCount + j)); j += 1
            }
            out.update(i, org.apache.spark.unsafe.types.UTF8String.fromString(
              TypeMapping.toJson(rest, restRow)))
          }
          i += 1
        }
        out
    }
  }
  override def close(): Unit = {
    try { if (rsOpened) rs.close() }
    finally {
      try { if (stmtOpened) stmt.close() }
      finally { if (connOpened) conn.close() }
    }
  }
}
