package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog

/** Storage-partitioned joins over `graft-log` tables: with v2
  * bucketing opted in, two tables hive-partitioned on the same column
  * report KeyGroupedPartitioning and join with NO shuffle on either
  * side; a groupBy on the partition column aggregates shuffle-free.
  * Off by default: a plain scan keeps per-file parallelism. */
class LogSpjSpec extends AnyFunSuite with SparkFixture {

  private def mkTable(prefix: String, rows: Range, payload: Int => String): String = {
    import spark.implicits._
    val t = Files.createTempDirectory(prefix).toString
    SnapshotLog.commit(spark,
      rows.map(i => (i.toLong, i % 4, payload(i))).toDF("id", "bucket", "payload"),
      t, partitionBy = Seq("bucket"))
    t
  }

  private def withBucketing[A](f: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE: the final plan exists only after execution
    df.queryExecution.executedPlan.toString
  }

  test("co-partitioned tables join with zero shuffles; result matches the shuffled join") {
    import spark.implicits._
    val fact = mkTable("graft_spj_a_", 0 until 80, i => s"a$i")
    val dim = Files.createTempDirectory("graft_spj_b_").toString
    SnapshotLog.commit(spark,
      (0 until 4).map(b => (b, s"name$b")).toDF("bucket", "bname"),
      dim, partitionBy = Seq("bucket"))
    def joined = spark.read.format("graft-log").load(fact)
      .join(spark.read.format("graft-log").load(dim), Seq("bucket"))
      .select(col("id"), col("bucket"), col("payload"), col("bname"))
    val spj = withBucketing {
      val plan = finalPlan(joined)
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must plan no shuffle, got:\n$plan")
      joined.collect().map(_.toSeq).toSet
    }
    val shuffled = joined.collect().map(_.toSeq).toSet
    assert(spj == shuffled && spj.size == 80,
      "SPJ and the default shuffled join must agree row for row")
  }

  test("groupBy on the partition column aggregates without a shuffle") {
    val a = mkTable("graft_spj_g_", 0 until 100, i => s"p$i")
    withBucketing {
      val agg = spark.read.format("graft-log").load(a)
        .groupBy("bucket").agg(count(lit(1)).as("n"), sum("id").as("s"))
      val plan = finalPlan(agg)
      assert(!plan.contains("Exchange"),
        s"partition-aligned aggregation must plan no shuffle, got:\n$plan")
      val rows = agg.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(rows == Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
    }
  }

  test("SPJ key groups read columnar: every grouped file opens through the vectorized reader") {
    import spark.implicits._
    val fact = mkTable("graft_spj_c_", 0 until 80, i => s"a$i")
    val dim = Files.createTempDirectory("graft_spj_d_").toString
    SnapshotLog.commit(spark,
      (0 until 4).map(b => (b, s"name$b")).toDF("bucket", "bname"),
      dim, partitionBy = Seq("bucket"))
    withBucketing {
      val joined = spark.read.format("graft-log").load(fact)
        .join(spark.read.format("graft-log").load(dim), Seq("bucket"))
        .select(col("id"), col("bname"))
      val f0 = LogSourceAudit.filesOpened.get()
      val c0 = LogSourceAudit.columnarOpened.get()
      assert(joined.collect().length == 80)
      val nOpened = LogSourceAudit.filesOpened.get() - f0
      val nColumnar = LogSourceAudit.columnarOpened.get() - c0
      assert(nOpened > 0L && nColumnar == nOpened,
        s"grouped scan must stay vectorized: opened=$nOpened columnar=$nColumnar")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && plan.contains("ColumnarToRow"),
        s"SPJ must keep both the no-shuffle plan and columnar decode:\n$plan")
    }
  }

  test("opt-in only: without the conf a partitioned table keeps per-file task parallelism") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_spj_off_").toString
    SnapshotLog.commit(spark,
      (0 until 100).map(i => (i.toLong, i % 4, s"p$i")).toDF("id", "bucket", "payload")
        .repartition(3), // 3 files per bucket directory
      t, partitionBy = Seq("bucket"))
    val df = spark.read.format("graft-log").load(t)
    assert(df.count() == 100L)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    assert(scan.inputPartitions.size > 4,
      s"without v2 bucketing the scan must stay per-file (${scan.inputPartitions.size} <= 4 groups)")
  }
}
