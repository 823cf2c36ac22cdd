package graft.sources.jdbc

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import java.sql.Connection

/** DSv2 write path for external JDBC tables: append, truncate-overwrite,
  * and keyed upsert, with per-partition transactions.
  *
  * Re-expresses the reference's `DataSink` trio (`PostgresDataSink`
  * `crates/postgres/src/write.rs:106-218`, `SqliteDataSink`,
  * `DuckDBDataSink`) in Spark's distributed commit model: the reference
  * streams all batches through ONE transaction on one thread; Spark runs
  * one `DataWriter` per partition, each with its own transaction, and the
  * driver's `BatchWrite.commit` finalizes. Overwrite maps to
  * `SupportsTruncate` (reference `InsertOp::Overwrite` → `DELETE FROM`,
  * `write.rs:149-160`). Upsert maps to the dialect's ON CONFLICT /
  * ON DUPLICATE KEY statement (reference `on_conflict.rs:22-105`);
  * Derby, lacking both, falls back to UPDATE-else-INSERT inside the
  * partition transaction.
  *
  * Scale: rows bind into a JDBC `PreparedStatement` batch of
  * `batchSize` (prepared-path throughput is the one performance result
  * the reference publishes — `benches/sqlite_insert_benchmark.rs`), and
  * N partitions write concurrently, which the reference cannot do.
  */
final class JdbcWriteBuilder(options: JdbcOptions, schema: StructType)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = JdbcBatchWrite(options, schema, doTruncate)
  }
}

final case class JdbcBatchWrite(options: JdbcOptions, schema: StructType, truncate: Boolean)
  extends BatchWrite with Logging {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Truncate BEFORE tasks launch — same barrier the reference gets from
    // running `DELETE FROM` at the head of its single transaction.
    if (truncate) {
      val conn = options.connect()
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"DELETE FROM ${options.table}") finally st.close()
      } finally conn.close()
    }
    JdbcWriterFactory(options, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case JdbcCommit(n) => n }.sum
    logInfo(s"graft-jdbc write committed: $rows rows into ${options.table}")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class JdbcCommit(rows: Long) extends WriterCommitMessage

final case class JdbcWriterFactory(options: JdbcOptions, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (options.upsertKeys.nonEmpty && options.dialect == DerbyDialect)
      new DerbyUpsertWriter(options, schema)
    else new JdbcRowWriter(options, schema)
}

/** Batched INSERT (or dialect upsert) inside one partition transaction. */
class JdbcRowWriter(options: JdbcOptions, schema: StructType)
  extends DataWriter[InternalRow] {

  protected val conn: Connection = options.connect()
  conn.setAutoCommit(false)

  private val d = options.dialect
  private val cols = schema.fields.map(_.name).toSeq
  private val insertSql =
    if (options.upsertKeys.nonEmpty)
      d.upsertStatement(options.table, cols, options.upsertKeys)
    else
      s"INSERT INTO ${options.table} (${cols.map(d.quote).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
  private val ps = conn.prepareStatement(insertSql)
  private val setters = schema.fields.map(f => TypeMapping.setter(f.dataType))
  private val sqlTypes = schema.fields.map(f => TypeMapping.jdbcType(f.dataType))
  private var inBatch = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < setters.length) {
      if (row.isNullAt(i)) ps.setNull(i + 1, sqlTypes(i))
      else setters(i)(ps, row, i, i + 1)
      i += 1
    }
    ps.addBatch()
    inBatch += 1
    total += 1
    if (inBatch >= options.batchSize) flush()
  }

  protected def flush(): Unit = {
    if (inBatch > 0) { ps.executeBatch(); inBatch = 0 }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    conn.commit()
    JdbcCommit(total)
  }

  override def abort(): Unit = conn.rollback()

  override def close(): Unit = {
    try ps.close() finally conn.close()
  }
}

/** Derby has no ON CONFLICT / MERGE-over-VALUES: try UPDATE by key, fall
  * back to INSERT when no row matched — correct inside the partition's
  * transaction because upsert keys are hash-partitioned by the caller or
  * unique in the incoming data (same precondition the reference's
  * constraint validation enforces, `constraints.rs:28-95`).
  */
final class DerbyUpsertWriter(options: JdbcOptions, schema: StructType)
  extends DataWriter[InternalRow] {

  private val conn: Connection = options.connect()
  conn.setAutoCommit(false)

  private val d = DerbyDialect
  private val cols = schema.fields.map(_.name).toSeq
  private val keys = options.upsertKeys
  private val nonKeys = cols.filterNot(keys.contains)
  private val colIdx = cols.zipWithIndex.toMap
  private val setters = schema.fields.map(f => TypeMapping.setter(f.dataType))
  private val sqlTypes = schema.fields.map(f => TypeMapping.jdbcType(f.dataType))

  private val updatePs = conn.prepareStatement(
    d.updateStatement(options.table, cols, keys))
  private val insertPs = conn.prepareStatement(
    s"INSERT INTO ${options.table} (${cols.map(d.quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})")
  private var total = 0L

  private def bind(ps: java.sql.PreparedStatement, row: InternalRow,
      order: Seq[String]): Unit = {
    order.zipWithIndex.foreach { case (c, p) =>
      val f = colIdx(c)
      if (row.isNullAt(f)) ps.setNull(p + 1, sqlTypes(f))
      else setters(f)(ps, row, f, p + 1)
    }
  }

  override def write(row: InternalRow): Unit = {
    bind(updatePs, row, nonKeys ++ keys)
    if (updatePs.executeUpdate() == 0) {
      bind(insertPs, row, cols)
      insertPs.executeUpdate()
    }
    total += 1
  }

  override def commit(): WriterCommitMessage = { conn.commit(); JdbcCommit(total) }
  override def abort(): Unit = conn.rollback()
  override def close(): Unit = {
    try { updatePs.close(); insertPs.close() } finally conn.close()
  }
}
