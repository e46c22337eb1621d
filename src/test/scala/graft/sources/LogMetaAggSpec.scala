package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog
import graft.core.SnapshotLog.Pred

/** Metadata-only aggregate pushdown and limit pushdown on the batch
  * `graft-log` relation: a bare COUNT(*)/MIN/MAX resolves from the
  * manifest with ZERO file opens (LocalScan), declines soundly
  * whenever manifest numbers are not authoritative (deletion vectors,
  * missing bounds, filters, groupBy), and LIMIT stops the file
  * listing at the ask. */
class LogMetaAggSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(rows: Int = 100, parts: Int = 5): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_metaagg_").toString
    SnapshotLog.commit(spark,
      (0 until rows).map(i => (i.toLong, i * 1.5, s"p$i")).toDF("id", "score", "payload")
        .repartitionByRange(parts, col("id")),
      t, statsFor = Seq("id", "score"))
    t
  }

  private def opened[A](f: => A): (A, Long) = {
    val before = LogSourceAudit.filesOpened.get()
    val r = f
    (r, LogSourceAudit.filesOpened.get() - before)
  }

  test("COUNT(*) / MIN / MAX answer from the manifest with zero file opens") {
    val t = freshTable()
    val df = spark.read.format("graft-log").load(t)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"),
        min("score").as("slo"), max("score").as("shi"))
    val (row, n) = opened(df.collect().head)
    assert(row.getLong(0) == 100L && row.getLong(1) == 0L && row.getLong(2) == 99L)
    assert(row.getDouble(3) == 0.0 && row.getDouble(4) == 148.5)
    assert(n == 0L, s"metadata aggregate must open zero files, opened $n")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "a pushed metadata aggregate plans as a driver-local scan")
  }

  test("deletion vectors: COUNT(*) stays exact (subtracts dv rows), MIN/MAX declines") {
    val t = freshTable()
    SnapshotLog.deleteWhere(spark, t, Pred.Between("id", 0.0, 9.0))
    val (cnt, n1) = opened(
      spark.read.format("graft-log").load(t).count())
    assert(cnt == 90L, "count must subtract deletion-vectored rows")
    assert(n1 == 0L, "dv-aware count is still metadata-only")
    // the true min (10) is invisible to bounds (file min 0 is a dead
    // row) — the push must decline and the scan compute it exactly
    val (mn, n2) = opened(spark.read.format("graft-log").load(t)
      .agg(min("id")).collect().head.getLong(0))
    assert(mn == 10L)
    assert(n2 > 0L, "MIN over a vectored table must fall back to reading files")
  }

  test("declines under filters, groupBy, an unbounded column, and strings") {
    val t = freshTable()
    // filter: residual stays in plan -> Spark never offers the push;
    // answer must be computed, not taken from whole-table stats
    val (c, n1) = opened(spark.read.format("graft-log").load(t)
      .filter(col("id") < 10L).count())
    assert(c == 10L && n1 > 0L)
    // groupBy: declined, computed
    val (g, _) = opened(spark.read.format("graft-log").load(t)
      .groupBy(col("id") % 2).count().collect())
    assert(g.map(_.getLong(1)).sum == 100L)
    // payload has no recorded bounds; min must read
    val (p, n3) = opened(spark.read.format("graft-log").load(t)
      .agg(min("payload")).collect().head.getString(0))
    assert(p == "p0" && n3 > 0L)
  }

  test("time travel aggregates at the asked version; empty table answers 0/null") {
    import spark.implicits._
    val t = freshTable(rows = 50)
    SnapshotLog.commit(spark,
      (50 until 80).map(i => (i.toLong, i * 1.5, s"p$i")).toDF("id", "score", "payload"),
      t, append = true)
    val (v1, n) = opened(spark.read.format("graft-log")
      .option("versionAsOf", "1").load(t)
      .agg(count(lit(1)).as("n"), max("id").as("hi")).collect().head)
    assert(v1.getLong(0) == 50L && v1.getLong(1) == 49L)
    assert(n == 0L)

    val empty = Files.createTempDirectory("graft_metaagg_e_").toString
    SnapshotLog.commit(spark, Seq.empty[(Long, String)].toDF("id", "payload"), empty)
    val r = spark.read.format("graft-log").load(empty)
      .agg(count(lit(1)).as("n"), min("id").as("lo")).collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("GROUP BY a partition column answers per-group from the manifest: zero opens") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_metaagg_g_").toString
    SnapshotLog.commit(spark,
      (0 until 120).map(i => (i.toLong, i % 3, s"p$i")).toDF("id", "bucket", "payload"),
      t, partitionBy = Seq("bucket"), statsFor = Seq("id"))
    def agg() = spark.read.format("graft-log").load(t)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val df = agg()
    val (rows, n) = opened(df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap)
    assert(n == 0L, s"per-partition aggregates must open zero files, opened $n")
    assert(rows == Map(0 -> ((40L, 0L, 117L)), 1 -> ((40L, 1L, 118L)), 2 -> ((40L, 2L, 119L))))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "a pushed per-partition aggregate plans as a driver-local scan")
    // the DEFAULT partition (__HIVE_DEFAULT_PARTITION__) groups as a
    // null key, still metadata-only
    val t2 = Files.createTempDirectory("graft_metaagg_gn_").toString
    SnapshotLog.commit(spark,
      (0 until 60).map(i =>
        (i.toLong, if (i % 2 == 0) java.lang.Integer.valueOf(i % 4) else null, s"p$i"))
        .toDF("id", "bucket", "payload"),
      t2, partitionBy = Seq("bucket"), statsFor = Seq("id"))
    val (withNull, n2) = opened(spark.read.format("graft-log").load(t2)
      .groupBy("bucket").agg(count(lit(1)).as("n"), max("id").as("hi")).collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> ((r.getLong(1), r.getLong(2)))).toMap)
    assert(n2 == 0L, s"null-partition grouping is still metadata-only, opened $n2")
    assert(withNull(-1) == ((30L, 59L)) && withNull(0) == ((15L, 56L)) && withNull(2) == ((15L, 58L)))
    // grouping by a NON-partition column: declined, computed exactly
    val (g2, n4) = opened(spark.read.format("graft-log").load(t)
      .groupBy("payload").count().count())
    assert(g2 == 120L && n4 > 0L)
  }

  test("LIMIT stops the file listing: 10 rows plan one file of five") {
    val t = freshTable()
    val df = spark.read.format("graft-log").load(t).limit(10)
    assert(df.collect().length == 10)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the limit plan"))
    assert(scan.inputPartitions.size == 1,
      s"pushed LIMIT 10 over 5x20-row files must plan 1 file, planned ${scan.inputPartitions.size}")
  }
}
