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
