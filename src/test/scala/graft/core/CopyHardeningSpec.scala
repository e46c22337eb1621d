package graft.core

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Copy-path hardening (ADVICE r5): stored-case hotswap rename,
  * first-load incremental copy, schema evolution through the JDBC
  * hotswap, and dest-index preservation when the JDBC source has none. */
class CopyHardeningSpec extends AnyFunSuite with SparkFixture {

  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")

  private def freshUrl() =
    s"jdbc:derby:memory:graft_h_${java.util.UUID.randomUUID().toString.take(8)};create=true"

  private def props() = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def exec(url: String, sql: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sql.foreach(st.executeUpdate)
      finally st.close()
    } finally conn.close()
  }

  test("hotswap re-copy survives a LOWERCASE-stored destination (stored-case rename)") {
    val srcUrl = freshUrl()
    val dstUrl = freshUrl()
    exec(srcUrl,
      "CREATE TABLE SRC_T (ID BIGINT NOT NULL, V INT)",
      "INSERT INTO SRC_T VALUES (1, 10), (2, 20)")
    // quoted lowercase identifier: stored case differs from Derby's
    // UPPER fold direction — unquoted swap DDL would miss this table
    exec(dstUrl, """CREATE TABLE "items_lc" (ID BIGINT NOT NULL, V INT)""",
      """INSERT INTO "items_lc" VALUES (9, 90)""")
    val src = new JdbcSource(srcUrl, props())
    val dst = new JdbcSource(dstUrl, props())
    val res = CopyPipeline.copyTable(spark, src, dst, "SRC_T", destTable = Some("items_lc"))
    assert(res.rows == 2, "hotswap must REPLACE the lowercase-stored dest")
    // still stored lowercase, readable, with the new data only
    val conn = DriverManager.getConnection(dstUrl)
    try {
      val rs = conn.createStatement().executeQuery("""SELECT count(*) FROM "items_lc"""")
      rs.next()
      assert(rs.getInt(1) == 2)
    } finally conn.close()
  }

  test("copyIncremental on a nonexistent destination falls back to a full first load") {
    val sf = "/root/testdata/sf0.001"
    val src = new ParquetDir(sf)
    val dstDir = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val dst = new ParquetDir(dstDir)
    assert(!dst.tableExists("region"))
    val n0 = CopyPipeline.copyIncremental(spark, src, dst, "region", "r_regionkey")
    assert(n0 == 5, s"first load must copy the whole backlog, saw $n0")
    // second call: nothing new -> zero-row delta, idempotent
    val n1 = CopyPipeline.copyIncremental(spark, src, dst, "region", "r_regionkey")
    assert(n1 == 0)
    assert(dst.read(spark, "region").count() == 5)
  }

  test("JDBC hotswap auto-creates when the incoming frame carries NEW columns") {
    import org.apache.spark.sql.functions._
    val url = freshUrl()
    exec(url,
      "CREATE TABLE EVO (ID BIGINT NOT NULL, V INT)",
      "INSERT INTO EVO VALUES (1, 10)")
    val dst = new JdbcSource(url, props())
    val evolved = spark.range(3).toDF("ID")
      .withColumn("V", (col("ID") * 10).cast("int"))
      .withColumn("EXTRA", concat(lit("x"), col("ID"))) // not in the dest
    dst.write(evolved, "EVO")
    val defs = dst.columnDefinitions("EVO")
    assert(defs.map(_._1.toUpperCase).toSet == Set("ID", "V", "EXTRA"),
      s"evolved column must survive the hotswap, saw ${defs.map(_._1)}")
    assert(dst.read(spark, "EVO").count() == 3)
  }

  test("copy from an index-less JDBC source preserves the dest's pre-existing indexes") {
    val srcUrl = freshUrl()
    val dstUrl = freshUrl()
    exec(srcUrl,
      "CREATE TABLE T3 (ID BIGINT NOT NULL, V INT)", // no indexes at all
      "INSERT INTO T3 VALUES (1, 10), (2, 20)")
    exec(dstUrl,
      "CREATE TABLE T3 (ID BIGINT NOT NULL, V INT, CONSTRAINT PK_T3 PRIMARY KEY (ID))",
      "INSERT INTO T3 VALUES (9, 90)")
    val src = new JdbcSource(srcUrl, props())
    val dst = new JdbcSource(dstUrl, props())
    val res = CopyPipeline.copyTable(spark, src, dst, "T3")
    assert(res.rows == 2)
    val conn = DriverManager.getConnection(dstUrl)
    try {
      val specs = Indexes.fromJdbc(conn, "APP", "T3")
      assert(specs.exists(s => s.primary && s.columns == Seq("ID")),
        "dest PK must survive a copy from a source that has no indexes to replay")
    } finally conn.close()
  }
}
