package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog

/** The WRITE side of the `graft-log` DSv2 source: `df.write` lands
  * snapshot-log commits — append/overwrite modes, hive partitioning
  * via `partitionBy`, per-file stats via the `statsFor` option,
  * idempotent-writer txns, maintenance commits — and everything the
  * writer stages reads back through the batch relation with its
  * pruning intact. */
class LogBatchWriteSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    Files.createTempDirectory("graft_logwrite_").toString

  private def df(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"p$i")).toDF("id", "payload")
  }

  private def ids(t: String): Set[Long] =
    spark.read.format("graft-log").load(t)
      .select("id").collect().map(_.getLong(0)).toSet

  test("append creates the table at v1; a second append lands v2; overwrite replaces") {
    val t = freshTable()
    df(1, 2).write.format("graft-log").mode("append").save(t)
    assert(SnapshotLog.versions(t) == Seq(1L))
    assert(ids(t) == Set(1L, 2L))
    df(3).write.format("graft-log").mode("append").save(t)
    assert(SnapshotLog.versions(t) == Seq(1L, 2L))
    assert(ids(t) == Set(1L, 2L, 3L))
    df(9).write.format("graft-log").mode("overwrite").save(t)
    assert(ids(t) == Set(9L))
    // the log keeps history: the pre-overwrite snapshot time-travels
    val v2 = spark.read.format("graft-log").option("versionAsOf", "2")
      .load(t).select("id").collect().map(_.getLong(0)).toSet
    assert(v2 == Set(1L, 2L, 3L))
  }

  test("statsFor records bounds the batch relation prunes on") {
    import spark.implicits._
    val t = freshTable()
    (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(5, col("id"))
      .write.format("graft-log").option("statsFor", "id")
      .mode("overwrite").save(t)
    val before = LogSourceAudit.filesOpened.get()
    val got = spark.read.format("graft-log").load(t)
      .filter(col("id") >= 80L && col("id") <= 90L)
      .select("id").collect().map(_.getLong(0)).toSet
    val opened = LogSourceAudit.filesOpened.get() - before
    assert(got == (80L to 90L).toSet)
    assert(opened == 1L,
      s"a writer-side statsFor must make the read prune, opened $opened of 5")
  }

  test("partitionBy stages a hive layout; the read restores and prunes it") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("id", "lang").repartition(1)
      .write.format("graft-log").partitionBy("lang")
      .mode("overwrite").save(t)
    val all = spark.read.format("graft-log").load(t).collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("lang")))).toSet
    assert(all == Set((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr")))
    val before = LogSourceAudit.filesOpened.get()
    val en = spark.read.format("graft-log").load(t)
      .filter(col("lang") === "en").select("id").collect().map(_.getLong(0)).toSet
    val opened = LogSourceAudit.filesOpened.get() - before
    assert(en == Set(1L, 3L) && opened == 1L, s"opened $opened")
  }

  test("txnAppId/txnVersion make a replayed write a no-op") {
    val t = freshTable()
    def once(v: Int): Unit =
      df(v.toLong).write.format("graft-log")
        .option("txnAppId", "writer-1").option("txnVersion", v.toString)
        .mode("append").save(t)
    once(1); once(2)
    once(2) // the replay: same appId, same version -> no new commit
    assert(SnapshotLog.versions(t) == Seq(1L, 2L),
      s"replayed txn must not land a commit, got ${SnapshotLog.versions(t)}")
    assert(ids(t) == Set(1L, 2L))
    val e = intercept[Exception] {
      df(3).write.format("graft-log").option("txnAppId", "writer-1")
        .mode("append").save(t)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("txnAppId and txnVersion")), s"got ${msgs(e)}")
  }

  test("dataChange=false writes a maintenance commit streams skip") {
    val t = freshTable()
    df(1).write.format("graft-log").mode("append").save(t)          // v1
    df(1).write.format("graft-log").option("dataChange", "false")
      .mode("overwrite").save(t)                                    // v2: maintenance
    assert(!SnapshotLog.readRecord(t, 2L).dataChange)
    // the change feed (exclusive-since range covering ONLY v2) sees
    // nothing: a maintenance commit is invisible to consumers
    assert(SnapshotLog.readChangeFeed(spark, t, 1L, 2L).count() == 0L)
  }

  test("the default ErrorIfExists mode fails loudly, like other path-based v2 sources") {
    val t = freshTable()
    val e = intercept[Exception] { df(1).write.format("graft-log").save(t) }
    assert(Option(e.getMessage).exists(m =>
      m.toLowerCase.contains("append") || m.toLowerCase.contains("save mode")), e.getMessage)
  }
}
