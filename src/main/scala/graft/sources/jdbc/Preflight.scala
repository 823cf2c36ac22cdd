package graft.sources.jdbc

import java.net.{InetAddress, InetSocketAddress, Socket, UnknownHostException}
import java.sql.SQLTransientConnectionException
import scala.collection.concurrent.TrieMap

/** Connect-time preflight validation — the Spark-side analog of the
  * reference's `crates/common/src/util/ns_lookup.rs:1-60`
  * (`verify_ns_lookup_and_tcp_connect`): before any pool construction,
  * turn connection-string typos into crisp, CLASSIFIED errors instead
  * of whatever stack trace the driver eventually produces.
  *
  * Opt-in via `preflight=true`. Checks, by URL family:
  *   - every URL: `jdbc:<subprotocol>:<rest>` shape;
  *   - embedded file engines (derby/duckdb/sqlite): the database path's
  *     parent directory must exist (a missing parent is always a typo;
  *     a missing FILE alone is allowed — the write path legitimately
  *     creates new databases), and a Derby database directory must
  *     exist unless `;create=true` asks for it;
  *   - server engines (`jdbc:x://host[:port]/…`): hostname resolves
  *     (DNS) and the port accepts a TCP connection, bounded by
  *     `preflighttimeoutms` (default 3000).
  *
  * The retriable/permanent taxonomy applies ([[RetriableErrors]]):
  * malformed URLs, missing paths and unknown hosts throw
  * `IllegalArgumentException` (permanent — retrying cannot help), while
  * an unreachable port throws `SQLTransientConnectionException` with
  * SQLState 08001 (the server may simply not be up yet), which the
  * connect retry loop classifies as transient.
  *
  * One SUCCESSFUL probe is cached per compute context per JVM —
  * preflight costs one socket per server, not one per task. Failures
  * are never cached: a server coming up is re-probed on the next
  * connect.
  */
object Preflight {

  private val passed = TrieMap.empty[String, Boolean]

  /** Run [[check]] once per compute context (successes cached). */
  def ensure(o: JdbcOptions): Unit =
    if (!passed.contains(o.computeContext)) {
      check(o)
      passed.put(o.computeContext, true)
    }

  /** Validate `o.url`'s shape and probe reachability. Throws on the
    * first problem found; returns silently when everything checks out.
    */
  def check(o: JdbcOptions): Unit = {
    val url = o.url
    if (!url.startsWith("jdbc:"))
      bad(s"malformed JDBC url '$url': must start with 'jdbc:'")
    val rest = url.stripPrefix("jdbc:")
    val sub = rest.takeWhile(c => c != ':' && c != '/')
    if (sub.isEmpty || !rest.startsWith(sub + ":"))
      bad(s"malformed JDBC url '$url': expected 'jdbc:<subprotocol>:…'")
    val tail = rest.substring(sub.length + 1)
    sub match {
      case "derby" => checkDerby(tail, url, o)
      case "duckdb" => checkFilePath(tail, url)
      case "sqlite" =>
        if (tail != ":memory:" && !tail.isEmpty) checkFilePath(tail, url)
      case _ if tail.startsWith("//") => checkServer(sub, tail, url, o)
      case _ => () // unknown embedded scheme: nothing further checkable
    }
  }

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"preflight: $msg")

  private def checkDerby(tail: String, url: String, o: JdbcOptions): Unit = {
    if (tail.isEmpty) bad(s"malformed Derby url '$url': empty database name")
    // Derby Network Server form (jdbc:derby://host:port/db) is a SERVER
    // url, not an embedded path — route it to the DNS/TCP probe
    if (tail.startsWith("//")) { checkServer("derby", tail, url, o); return }
    // non-filesystem subsubprotocols have no path to validate
    if (Seq("memory:", "classpath:", "jar:").exists(tail.startsWith)) return
    val pathTail = if (tail.startsWith("directory:")) tail.stripPrefix("directory:") else tail
    val attrs = pathTail.split(';')
    val path = attrs.head
    if (path.isEmpty) return // attribute-only URLs (e.g. ;shutdown=true)
    val create = attrs.tail.exists(_.equalsIgnoreCase("create=true"))
    val p = java.nio.file.Paths.get(path).toAbsolutePath
    if (create) {
      // Derby creates the db directory itself, but only under an
      // existing parent — a missing parent is a typo'd path
      if (p.getParent != null && !java.nio.file.Files.isDirectory(p.getParent))
        bad(s"database parent directory does not exist: ${p.getParent} (url '$url')")
    } else if (!java.nio.file.Files.isDirectory(p))
      bad(s"Derby database does not exist: $p (url '$url'; add ;create=true to create it)")
  }

  private def checkFilePath(tail: String, url: String): Unit = {
    if (tail.isEmpty) return // in-memory database
    val path = tail.split('?').head.split(';').head
    if (path.isEmpty) return
    val p = java.nio.file.Paths.get(path).toAbsolutePath
    if (java.nio.file.Files.exists(p)) return
    // the engine creates a missing FILE on demand (the write path
    // depends on that), but never a missing directory chain
    if (p.getParent == null || !java.nio.file.Files.isDirectory(p.getParent))
      bad(s"database parent directory does not exist: ${p.getParent} (url '$url')")
  }

  private def checkServer(sub: String, tail: String, url: String,
      o: JdbcOptions): Unit = {
    val rawAuthority = tail.stripPrefix("//").takeWhile(c => c != '/' && c != '?')
    if (rawAuthority.isEmpty) bad(s"malformed server url '$url': no host")
    // credentials-in-URL (user:pass@host:port, legal Connector/J syntax):
    // everything up to the LAST '@' is userinfo, not host — without this
    // strip the ':' split would parse host='user:pass@host' and fail a
    // perfectly valid URL as a permanent error
    val authority = rawAuthority.substring(rawAuthority.lastIndexOf('@') + 1)
    if (authority.isEmpty) bad(s"malformed server url '$url': no host after userinfo")
    // bracketed IPv6 hosts ([::1], [::1]:5433) carry colons INSIDE the
    // brackets — only a colon AFTER the closing bracket is a port
    val (host, port) =
      if (authority.startsWith("[")) {
        val close = authority.indexOf(']')
        if (close < 0) bad(s"malformed server url '$url': unterminated IPv6 bracket")
        val h = authority.substring(1, close)
        authority.substring(close + 1) match {
          case "" => (h, defaultPort(sub))
          case p if p.startsWith(":") => (h, parsePort(p.substring(1), url))
          case junk => bad(s"malformed server url '$url': unexpected '$junk' after IPv6 host")
        }
      } else authority.lastIndexOf(':') match {
        case -1 => (authority, defaultPort(sub))
        case i => (authority.substring(0, i), parsePort(authority.substring(i + 1), url))
      }
    if (host.isEmpty) bad(s"malformed server url '$url': empty host")
    // a malformed timeout is a CONFIG error — route it through the same
    // permanent-IllegalArgument taxonomy as every other option typo
    // instead of leaking a raw NumberFormatException
    val timeoutRaw = o.map.getOrElse("preflighttimeoutms", "3000")
    val timeoutMs = timeoutRaw.trim match {
      case t if t.nonEmpty && t.forall(_.isDigit) && t.length <= 9 && t.toInt > 0 => t.toInt
      case _ => bad(s"preflighttimeoutms must be a positive integer, got '$timeoutRaw'")
    }
    // DNS first (ns_lookup.rs's lookup_host step): an unresolvable name
    // is a config error — permanent, fail fast with the hostname.
    // NOTE: this resolution runs on the OS resolver's own timeout, not
    // preflighttimeoutms — the JDK offers no bounded getByName, and a
    // watchdog thread would leak the lookup. Only the TCP connect below
    // honors the configured bound.
    val addr =
      try InetAddress.getByName(host)
      catch {
        case _: UnknownHostException =>
          bad(s"cannot resolve host '$host' (url '$url')")
      }
    // then a bounded TCP connect (the tcp_connect step): refusal or
    // timeout is TRANSIENT — the server may not be up yet
    val s = new Socket()
    try s.connect(new InetSocketAddress(addr, port), timeoutMs)
    catch {
      case e: Exception =>
        throw new SQLTransientConnectionException(
          s"preflight: $host:$port is not accepting TCP connections " +
            s"(url '$url'): ${e.getMessage}", "08001")
    } finally {
      try s.close() catch { case _: Exception => () }
    }
  }

  private def parsePort(ps: String, url: String): Int = {
    if (ps.isEmpty || !ps.forall(_.isDigit) || ps.length > 5)
      bad(s"malformed server url '$url': bad port '$ps'")
    val p = ps.toInt
    if (p < 1 || p > 65535) bad(s"malformed server url '$url': port $p out of range")
    p
  }

  private def defaultPort(sub: String): Int = sub match {
    case "postgresql" => 5432
    case "mysql" | "mariadb" => 3306
    case "clickhouse" => 8123
    case "derby" => 1527 // Derby Network Server
    case _ => bad(s"no default port known for 'jdbc:$sub'; specify one explicitly")
  }

  /** Test hook: forget cached successes. */
  private[jdbc] def reset(): Unit = passed.clear()
}
