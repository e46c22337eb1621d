package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog

/** The SQL surface of the `graft-log` source through the session
  * catalog: `CREATE TABLE ... USING graft-log` registers a
  * log-backed table that SELECT reads with manifest pruning, INSERT
  * INTO appends as a log commit, and INSERT OVERWRITE replaces —
  * the full DDL/DML path a SQL-only user takes, no DataFrame API. */
class LogSqlSurfaceSpec extends AnyFunSuite with SparkFixture {

  test("CREATE TABLE USING graft-log: SELECT prunes, INSERT INTO appends, OVERWRITE replaces") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("graft_sql_").toString
    (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(5, col("id"))
      .write.format("graft-log").option("statsFor", "id")
      .mode("append").save(t)
    spark.sql(s"CREATE TABLE graft_sql_t USING `graft-log` OPTIONS (path '$t')")
    try {
      // SELECT goes through the batch relation WITH pushdown: the
      // catalog's file: URI location lands on the same log
      val before = LogSourceAudit.filesOpened.get()
      val got = spark.sql("SELECT id FROM graft_sql_t WHERE id BETWEEN 80 AND 90")
        .collect().map(_.getLong(0)).toSet
      val opened = LogSourceAudit.filesOpened.get() - before
      assert(got == (80L to 90L).toSet)
      assert(opened == 1L, s"SQL SELECT must manifest-prune, opened $opened of 5")

      spark.sql("INSERT INTO graft_sql_t VALUES (100, 'new')")
      assert(SnapshotLog.versions(t) == Seq(1L, 2L),
        "INSERT INTO must land an append commit")
      assert(spark.sql("SELECT count(*) AS n FROM graft_sql_t")
        .collect().head.getLong(0) == 101L)

      spark.sql("INSERT OVERWRITE graft_sql_t VALUES (7, 'only')")
      val rows = spark.sql("SELECT id, payload FROM graft_sql_t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((7L, "only")))
      // the log kept history: pre-overwrite snapshot is still there
      assert(SnapshotLog.read(spark, t, asOf = Some(2L)).count() == 101L)
    } finally spark.sql("DROP TABLE graft_sql_t")
  }

  test("CTAS into graft-log and a SQL star join with runtime pruning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("graft_sql_fact_").toString
    (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(5, col("id"))
      .write.format("graft-log").option("statsFor", "id")
      .mode("append").save(t)
    spark.sql(s"CREATE TABLE graft_sql_fact USING `graft-log` OPTIONS (path '$t')")
    val dimDir = Files.createTempDirectory("graft_sql_dim_").toString
    (0 until 100).map(i => (i.toLong, if (i < 10) "hot" else "cold"))
      .toDF("id", "cat").write.mode("overwrite").parquet(dimDir)
    spark.sql(s"CREATE TABLE graft_sql_dim USING parquet OPTIONS (path '$dimDir')")
    try {
      val before = LogSourceAudit.filesOpened.get()
      val got = spark.sql(
        """SELECT f.id FROM graft_sql_fact f
          |JOIN graft_sql_dim d ON f.id = d.id WHERE d.cat = 'hot'""".stripMargin)
        .collect().map(_.getLong(0)).toSet
      val opened = LogSourceAudit.filesOpened.get() - before
      assert(got == (0L until 10L).toSet)
      assert(opened == 1L,
        s"the SQL star join must runtime-prune to the hot keys' file, opened $opened")
    } finally {
      spark.sql("DROP TABLE graft_sql_fact")
      spark.sql("DROP TABLE graft_sql_dim")
    }
  }
}
