package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException}

/** In-JVM fake of the PostgreSQL driver's COPY surface, used to drive
  * `PgCopySink.copyPartition`'s REAL reflective bytes end-to-end (the
  * sandbox has no pg driver / no live server). The fake registers as a
  * JDBC driver for `jdbc:fakepg:` URLs and hands out connections that
  * implement the test-classpath `org.postgresql.PGConnection`, whose
  * `getCopyAPI` returns a manager with the exact `copyIn(String,
  * Reader)` signature the sink reflects on.
  *
  * All state is JVM-global (local-mode executors share the JVM), guarded
  * by `FakePgCopyServer`'s lock. */
object FakePgCopyServer {
  private val lock = new Object
  private var copies = List.empty[(String, String)] // (sql, received text)
  private var openedN = 0
  private var closedN = 0
  /** When set, copyIn throws SQLException once this many chars arrive. */
  @volatile var failAfterChars: Option[Int] = None

  def reset(): Unit = lock.synchronized {
    copies = Nil; openedN = 0; closedN = 0; failAfterChars = None
  }
  def record(sql: String, text: String): Unit =
    lock.synchronized { copies = (sql, text) :: copies }
  def completedCopies: List[(String, String)] = lock.synchronized(copies.reverse)
  def connectionOpened(): Unit = lock.synchronized { openedN += 1 }
  def connectionClosed(): Unit = lock.synchronized { closedN += 1 }
  def opened: Int = lock.synchronized(openedN)
  def closed: Int = lock.synchronized(closedN)
}

/** `copyIn` drains the sink's RowReader through a deliberately tiny,
  * odd-sized buffer (exercises the reader's partial-fill paths), then
  * records the transcript. Public class + method: the sink looks the
  * method up via `mgr.getClass.getMethod`. */
final class FakeCopyManager {
  def copyIn(sql: String, reader: java.io.Reader): Long = {
    val sb = new StringBuilder
    val buf = new Array[Char](7)
    var n = reader.read(buf, 0, buf.length)
    while (n >= 0) {
      sb.appendAll(buf, 0, n)
      FakePgCopyServer.failAfterChars.foreach { lim =>
        if (sb.length >= lim)
          throw new SQLException("COPY aborted mid-stream by fake server")
      }
      n = reader.read(buf, 0, buf.length)
    }
    FakePgCopyServer.record(sql, sb.toString)
    sb.count(_ == '\n').toLong
  }
}

/** Canned pg_catalog rows served by the fake connection's
  * prepareStatement(Indexes.pgIndexSql) path — keyed by the
  * (schema, table) bind parameters, shaped exactly like the live
  * query's result set. */
object FakePgCatalog {
  // (index_name, position, column_expr, is_unique, is_primary, where_pred)
  type Row = (String, Int, String, Boolean, Boolean, Option[String])
  @volatile var rows: Map[(String, String), Seq[Row]] = Map.empty
  def reset(): Unit = rows = Map.empty
}

final class FakePgDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:fakepg:")

  override def connect(url: String, info: java.util.Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours -> null
    FakePgCopyServer.connectionOpened()
    val handler = new InvocationHandler {
      @volatile private var isClosed = false
      override def invoke(proxy: Object, m: Method, args: Array[Object]): Object =
        m.getName match {
          case "getCopyAPI" => new FakeCopyManager
          case "prepareStatement"
              if args != null && args.length == 1 &&
                args(0) == graft.core.Indexes.pgIndexSql =>
            FakePgDriver.preparedCatalogStatement()
          case "close" =>
            if (!isClosed) { isClosed = true; FakePgCopyServer.connectionClosed() }
            null
          case "isClosed" => java.lang.Boolean.valueOf(isClosed)
          case "isWrapperFor" =>
            java.lang.Boolean.valueOf(args(0).asInstanceOf[Class[_]].isInstance(proxy))
          case "unwrap" => proxy
          case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
          case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
          case "toString" => "FakePgConnection"
          case other =>
            // any unexpected call is a test failure, not a silent null
            throw new UnsupportedOperationException(
              s"FakePgConnection does not fake Connection.$other")
        }
    }
    Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array[Class[_]](classOf[Connection], classOf[org.postgresql.PGConnection]),
      handler).asInstanceOf[Connection]
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

object FakePgDriver {
  /** PreparedStatement double for the pg_catalog index query: binds
    * (schema, table) positionally, executeQuery serves the matching
    * `FakePgCatalog.rows` through a label-addressed ResultSet — the
    * exact JDBC surface `Indexes.fromPgCatalog` drives. */
  private[sources] def preparedCatalogStatement(): Object = {
    val params = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val handler = new InvocationHandler {
      override def invoke(proxy: Object, m: Method, args: Array[Object]): Object =
        m.getName match {
          case "setString" =>
            params.put(args(0).asInstanceOf[Integer].intValue(), args(1).asInstanceOf[String])
            null
          case "executeQuery" =>
            val key = (params.get(1), params.get(2))
            catalogResultSet(FakePgCatalog.rows.getOrElse(key, Seq.empty))
          case "close" => null
          case "toString" => "FakePgPreparedStatement"
          case other =>
            throw new UnsupportedOperationException(
              s"FakePgPreparedStatement does not fake $other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[java.sql.PreparedStatement]), handler)
  }

  private def catalogResultSet(rows: Seq[FakePgCatalog.Row]): java.sql.ResultSet = {
    var i = -1
    val handler = new InvocationHandler {
      private def cur = rows(i)
      override def invoke(proxy: Object, m: Method, args: Array[Object]): Object =
        m.getName match {
          case "next" =>
            i += 1
            java.lang.Boolean.valueOf(i < rows.size)
          case "getString" => args(0).asInstanceOf[String] match {
            case "index_name" => cur._1
            case "column_expr" => cur._3
            case "where_pred" => cur._6.orNull
            case other => throw new IllegalArgumentException(s"no column $other")
          }
          case "getInt" if args(0) == "position" => Integer.valueOf(cur._2)
          case "getBoolean" => args(0).asInstanceOf[String] match {
            case "is_unique" => java.lang.Boolean.valueOf(cur._4)
            case "is_primary" => java.lang.Boolean.valueOf(cur._5)
            case other => throw new IllegalArgumentException(s"no bool column $other")
          }
          case "close" => null
          case "toString" => "FakePgResultSet"
          case other =>
            throw new UnsupportedOperationException(s"FakePgResultSet does not fake $other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[java.sql.ResultSet]), handler)
      .asInstanceOf[java.sql.ResultSet]
  }
}
