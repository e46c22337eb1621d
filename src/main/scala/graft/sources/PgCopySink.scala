package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import graft.core.TableSink

/** PostgreSQL COPY-protocol bulk sink — the one reference performance
  * idea with no Spark built-in analogue: the reference's wire is
  * `COPY ... TO STDOUT | COPY ... FROM STDIN` through a single psql
  * pipe (transport.rb:83-110); Spark's JDBC sink is batched INSERTs,
  * measurably slower for live-PG bulk loads (SURVEY §4.1).
  *
  * Shape: one COPY pipe PER PARTITION — each executor task opens its
  * own connection and streams its partition through `CopyManager
  * .copyIn("COPY t (cols) FROM STDIN", reader)`, so a 100 TB load
  * drives N parallel COPY pipes where the reference drives exactly one.
  * The text encoding (`PgCopyText`) is the protocol's documented TEXT
  * format: tab-separated, `\N` nulls, backslash escapes.
  *
  * The PostgreSQL driver jar is NOT present in this sandbox (zero
  * egress), so the CopyManager calls go through reflection — this file
  * compiles and its encoder half is fully specced; the wire half
  * documents its own untestability and fails with a clear error on
  * non-PG connections. On a real deployment, drop the pg JDBC jar on
  * the classpath and the same bytes run. */
object PgCopyText {

  /** One field in COPY TEXT format. Escape order matters: backslash
    * first, then the three control separators the protocol reserves. */
  def encodeField(v: Any): String = v match {
    case null => "\\N"
    case s: String =>
      s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    case b: Boolean => if (b) "t" else "f"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case bytes: Array[Byte] =>
      // bytea hex form is \x<hex>; the leading backslash must itself be
      // escaped in the COPY text stream.
      "\\\\x" + bytes.map("%02x".format(_)).mkString
    case t: java.sql.Timestamp => t.toString // ISO-ish, PG-accepted
    case d: java.sql.Date => d.toString
    case other => other.toString // numeric types
  }

  /** One row: tab-joined fields, newline-terminated. */
  def encodeRow(row: Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append('\t')
      sb.append(encodeField(if (row.isNullAt(i)) null else row.get(i)))
      i += 1
    }
    sb.append('\n').toString
  }

  /** The COPY statement for a table + explicit column list (quoted with
    * embedded-quote doubling — Spark-written tables carry exact-case
    * column names, and a legal name may itself contain a quote). The
    * table name is caller-provided SQL (possibly schema-qualified) and
    * passes through as-is. */
  def copySql(table: String, columns: Seq[String]): String = {
    val cols = columns.map(c => "\"" + c.replace("\"", "\"\"") + "\"")
    s"""COPY $table (${cols.mkString(", ")}) FROM STDIN"""
  }

  /** A Reader streaming the encoded rows — CopyManager pulls from this,
    * so the partition never materializes as one string. */
  final class RowReader(rows: Iterator[Row]) extends java.io.Reader {
    private var buf: String = ""
    private var pos = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      if (pos >= buf.length) {
        if (!rows.hasNext) return -1
        buf = encodeRow(rows.next()); pos = 0
      }
      val n = math.min(len, buf.length - pos)
      buf.getChars(pos, pos + n, cbuf, off)
      pos += n
      n
    }
    override def close(): Unit = ()
  }
}

/** TableSink over the COPY protocol. `write` appends (bulk load); the
  * caller owns table creation/hotswap (compose with `JdbcSource` for
  * the catalog half — this class is only the fast data pipe). */
final class PgCopySink(url: String, props: java.util.Properties) extends TableSink {

  override def write(df: DataFrame, name: String): Unit = {
    val columns = df.columns.toSeq
    val sql = PgCopyText.copySql(name, columns)
    val propPairs = {
      val b = Seq.newBuilder[(String, String)]
      props.stringPropertyNames().forEach(k => b += k -> props.getProperty(k))
      b.result()
    }
    val u = url
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) PgCopySink.copyPartition(u, propPairs, sql, rows)
    }
  }
}

object PgCopySink {
  /** Executor-side: one connection + one COPY pipe for one partition.
    * Reflection against org.postgresql.{PGConnection,copy.CopyManager}
    * so the class compiles without the driver jar; a non-PG connection
    * (or a missing driver) fails with the real cause. */
  private[sources] def copyPartition(url: String, props: Seq[(String, String)],
      sql: String, rows: Iterator[Row]): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    Option(p.getProperty("driver")).foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url, p)
    try {
      val pgClass =
        try Class.forName("org.postgresql.PGConnection")
        catch {
          case e: ClassNotFoundException =>
            throw new IllegalStateException(
              "PgCopySink needs the PostgreSQL JDBC driver on the executor " +
                "classpath (org.postgresql.PGConnection not found)", e)
        }
      if (!pgClass.isInstance(conn) && !conn.isWrapperFor(pgClass.asInstanceOf[Class[java.sql.Connection]]))
        throw new IllegalStateException(
          s"PgCopySink requires a PostgreSQL connection; got ${conn.getClass.getName}")
      val pgConn =
        if (pgClass.isInstance(conn)) conn
        else conn.unwrap(pgClass.asInstanceOf[Class[java.sql.Connection]])
      val mgr = pgClass.getMethod("getCopyAPI").invoke(pgConn)
      val copyIn = mgr.getClass.getMethod("copyIn", classOf[String], classOf[java.io.Reader])
      // Unwrap reflection's InvocationTargetException so a mid-stream
      // COPY failure surfaces as the real SQLException — the task retry
      // / abort decision upstream keys on the actual cause.
      try copyIn.invoke(mgr, sql, new PgCopyText.RowReader(rows))
      catch {
        case e: java.lang.reflect.InvocationTargetException if e.getCause != null =>
          throw e.getCause
      }
      ()
    } finally conn.close()
  }
}
