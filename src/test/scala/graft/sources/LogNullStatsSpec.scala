package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog
import graft.core.SnapshotLog.Pred

/** Per-file NULL COUNTS in the manifest (Delta's nullCount): IS NULL /
  * IS NOT NULL prune files at planning time, metadata MIN/MAX resolves
  * when bound-less files are provably all-null, and COUNT(c) answers
  * exactly from `liveRows - nulls`. */
class LogNullStatsSpec extends AnyFunSuite with SparkFixture {

  /** 4 key-clustered files over ids [0,100): maybe is NULL for ids
    * < 50 (so ~2 files all-null, ~2 null-free). */
  private def halfNullTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_nullstats_").toString
    SnapshotLog.commit(spark,
      (0 until 100).map(i =>
        (i.toLong, if (i < 50) None else Some(i * 1.5), s"p$i"))
        .toDF("id", "maybe", "payload")
        .repartitionByRange(4, col("id")),
      t, statsFor = Seq("id", "maybe"))
    t
  }

  private def opened[A](f: => A): (A, Long) = {
    val before = LogSourceAudit.filesOpened.get()
    val r = f
    (r, LogSourceAudit.filesOpened.get() - before)
  }

  test("the stats pass records null counts; IS NOT NULL / IS NULL prune files") {
    val t = halfNullTable()
    val entries = SnapshotLog.resolve(t, 1L).entries
    assert(entries.forall(e => e.nulls.contains("maybe") && e.nulls.contains("id")))
    assert(entries.forall(_.nulls("id") == 0L))
    val allNull = entries.count(e => e.nulls("maybe") == e.rows)
    val noNull = entries.count(e => e.nulls("maybe") == 0L)
    assert(allNull >= 1 && noNull >= 1, s"layout: $entries")
    // manifest-level pruning agrees with the semantics
    val (keptNN, skippedNN) = SnapshotLog.prunedFilesWhere(t, Pred.NotNull("maybe"))
    assert(skippedNN.size == allNull && keptNN.size == entries.size - allNull)
    val (keptN, skippedN) = SnapshotLog.prunedFilesWhere(t, Pred.IsNull("maybe"))
    assert(skippedN.size == noNull && keptN.size == entries.size - noNull)
    // and through the DSv2 relation: IS NOT NULL opens only non-all-null files
    val (cnt, n1) = opened(spark.read.format("graft-log").load(t)
      .filter(col("maybe").isNotNull).count())
    assert(cnt == 50L && n1 == keptNN.size.toLong,
      s"IS NOT NULL must open ${keptNN.size}, opened $n1")
    val (ids, n2) = opened(spark.read.format("graft-log").load(t)
      .filter(col("maybe").isNull).select("id").collect().map(_.getLong(0)).toSet)
    assert(ids == (0L until 50L).toSet && n2 == keptN.size.toLong,
      s"IS NULL must open ${keptN.size}, opened $n2")
  }

  test("SQL DELETE WHERE c IS NULL is row-exact through the vector path") {
    val t = halfNullTable()
    spark.sql("DROP TABLE IF EXISTS ns_del_t")
    spark.sql(s"CREATE TABLE ns_del_t USING `graft-log` OPTIONS (path '$t')")
    try {
      spark.sql("DELETE FROM ns_del_t WHERE maybe IS NULL")
      val left = SnapshotLog.read(spark, t).select("id").collect().map(_.getLong(0)).toSet
      assert(left == (50L until 100L).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS ns_del_t")
  }

  test("metadata MIN/MAX resolves past provably all-null files; COUNT(c) is metadata-exact") {
    val t = halfNullTable()
    val df = spark.read.format("graft-log").load(t)
      .agg(count(lit(1)).as("n"), count(col("maybe")).as("nm"),
        min("maybe").as("lo"), max("maybe").as("hi"))
    val (row, n) = opened(df.collect().head)
    assert(row.getLong(0) == 100L && row.getLong(1) == 50L)
    assert(row.getDouble(2) == 75.0 && row.getDouble(3) == 148.5)
    assert(n == 0L,
      s"all-null files are provable from null counts — zero opens, got $n")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // a column with NO recorded stats still declines
    val (p, n2) = opened(spark.read.format("graft-log").load(t)
      .agg(count(col("payload"))).collect().head.getLong(0))
    assert(p == 100L && n2 > 0L, "COUNT(c) without null counts must read")
  }

  test("an ENTIRELY null column answers MIN/MAX/COUNT as null/0 from metadata") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_nullstats_all_").toString
    SnapshotLog.commit(spark,
      (0 until 10).map(i => (i.toLong, Option.empty[Double])).toDF("id", "maybe"),
      t, statsFor = Seq("maybe"))
    val (row, n) = opened(spark.read.format("graft-log").load(t)
      .agg(min("maybe"), max("maybe"), count(col("maybe"))).collect().head)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.getLong(2) == 0L)
    assert(n == 0L, s"all-null MIN/MAX/COUNT is metadata-only, opened $n")
  }

  test("hive partition constants contribute null facts: NOT NULL prunes the default partition") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_nullstats_hive_").toString
    SnapshotLog.commit(spark,
      Seq((1L, "en"), (2L, "de"), (3L, null.asInstanceOf[String])).toDF("id", "lang"),
      t, partitionBy = Seq("lang"))
    val (got, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("lang").isNotNull).select("id").collect().map(_.getLong(0)).toSet)
    assert(got == Set(1L, 2L))
    assert(n == 2L, s"the __HIVE_DEFAULT_PARTITION__ file must not open, opened $n")
    val (gotNull, n2) = opened(spark.read.format("graft-log").load(t)
      .filter(col("lang").isNull).select("id").collect().map(_.getLong(0)).toSet)
    assert(gotNull == Set(3L) && n2 == 1L,
      s"IS NULL opens only the default partition, opened $n2")
  }

  test("DML-inserted files carry null counts: skipping survives a MERGE") {
    import spark.implicits._
    val t = halfNullTable()
    spark.sql("DROP TABLE IF EXISTS ns_merge_t")
    spark.sql(s"CREATE TABLE ns_merge_t USING `graft-log` OPTIONS (path '$t')")
    try {
      Seq((1000L, 5.0), (1001L, 6.0)).toDF("k", "nv").createOrReplaceTempView("ns_src")
      spark.sql(
        """MERGE INTO ns_merge_t g USING ns_src s ON g.id = s.k
          |WHEN NOT MATCHED THEN INSERT (id, maybe, payload) VALUES (s.k, s.nv, 'new')
          |""".stripMargin)
      val inserted = SnapshotLog.resolve(t,
        SnapshotLog.latestVersion(t).get).entries.filter(_.path.nonEmpty)
        .filter(e => e.num.get("id").exists(_._1 >= 1000.0))
      assert(inserted.nonEmpty && inserted.forall(_.nulls.get("maybe").contains(0L)),
        s"task-written insert files must record null counts: $inserted")
    } finally spark.sql("DROP TABLE IF EXISTS ns_merge_t")
  }
}
