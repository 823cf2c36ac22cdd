package graft.sources.jdbc

import java.sql.{SQLException, SQLRecoverableException, SQLTransientException}

/** Transient/permanent classification of remote-store failures, with a
  * bounded retry loop for the transient class.
  *
  * Spark-native analog of the reference's retriable-error taxonomy
  * (`crates/common/src/util/retriable_error.rs:19-60`): the reference
  * wraps transient read/write errors so upper layers retry them while
  * invalid-plan errors fail fast. In Spark, task-level retries already
  * re-run a failed `DataWriter`/`PartitionReader`; this layer adds
  * (a) the classification itself, and (b) in-task retries for
  * connection establishment, where retrying is cheap and a full task
  * retry would re-stream the partition.
  */
object RetriableErrors {

  /** Is this failure worth retrying? Connection loss (SQLState 08xxx),
    * transaction rollbacks/deadlocks (40xxx), insufficient resources
    * (57xxx, e.g. Postgres connection-limit), and the JDBC transient
    * exception hierarchy. Syntax/constraint/type errors are permanent.
    */
  def isTransient(e: SQLException): Boolean =
    e.isInstanceOf[SQLTransientException] ||
      e.isInstanceOf[SQLRecoverableException] || {
        val st = Option(e.getSQLState).getOrElse("")
        st.startsWith("08") || st.startsWith("40") || st.startsWith("57") ||
          st == "XJ040" // Derby: database in use by another boot attempt
      }

  /** Run `f`, retrying up to `attempts` times on transient SQLExceptions
    * with linear backoff. Permanent errors propagate immediately.
    */
  def withRetries[A](attempts: Int, backoffMs: Long = 100L)(f: => A): A = {
    var n = 0
    while (true) {
      try return f
      catch {
        case e: SQLException if isTransient(e) && n < attempts - 1 =>
          n += 1
          Thread.sleep(backoffMs * n)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
