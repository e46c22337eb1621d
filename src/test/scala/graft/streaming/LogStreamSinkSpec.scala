package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog
import graft.sources.LogStreamSink

/** The `graft-log` STREAMING SINK: every micro-batch is one log
  * commit, exactly once. Pins the txn-idempotence contract (a
  * replayed batchId is a no-op), checkpoint-resume without
  * duplicates, Complete-mode replace commits, partitioned staging,
  * and Update-mode rejection. */
class LogStreamSinkSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"p$i")).toDF("id", "payload")
  }

  /** log -> log streaming copy, AvailableNow. */
  private def pump(src: String, dst: String, ck: String,
                   maxVersionsPerTrigger: Option[Int] = None): Unit = {
    val r0 = spark.readStream.format("graft-log")
    val r = maxVersionsPerTrigger.fold(r0)(n => r0.option("maxVersionsPerTrigger", n.toString))
    val q = r.load(src).writeStream.format("graft-log")
      .option("checkpointLocation", ck)
      .option("statsFor", "id")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
  }

  test("writeStream lands one append commit per micro-batch; resume adds only the new rows") {
    val src = tmp("graft_sink_src_"); val dst = tmp("graft_sink_dst_")
    val ck = tmp("graft_sink_ck_")
    SnapshotLog.commit(spark, df(1, 2), src)
    SnapshotLog.commit(spark, df(3), src, append = true)
    pump(src, dst, ck, maxVersionsPerTrigger = Some(1))
    def rows(t: String) = SnapshotLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(dst) == Set((1L, "p1"), (2L, "p2"), (3L, "p3")))
    assert(SnapshotLog.versions(dst) == Seq(1L, 2L),
      "one micro-batch = one commit (2 triggers over 2 source versions)")

    // resume from the same checkpoint after upstream appends: the dst
    // gets exactly the delta — no re-delivery of committed batches
    SnapshotLog.commit(spark, df(4), src, append = true)
    pump(src, dst, ck)
    assert(rows(dst) == Set((1L, "p1"), (2L, "p2"), (3L, "p3"), (4L, "p4")))
    assert(SnapshotLog.versions(dst) == Seq(1L, 2L, 3L))

    // the sink indexed statsFor columns on every commit: batch reads
    // over dst manifest-prune on id from the first trigger
    val head = SnapshotLog.resolve(dst, 3L)
    assert(head.entries.forall(_.num.contains("id")),
      "statsFor must index per-file bounds on streamed commits")
  }

  test("a replayed micro-batch is a txn no-op: same batchId commits nothing twice") {
    val dst = tmp("graft_sink_replay_")
    val sink = new LogStreamSink(dst, Map("txnAppId" -> "writer-1"),
      Seq.empty, OutputMode.Append())
    sink.addBatch(0, df(1, 2))
    sink.addBatch(0, df(1, 2)) // crash-between-commit-and-checkpoint replay
    assert(SnapshotLog.versions(dst) == Seq(1L), "replayed batch must not commit")
    sink.addBatch(1, df(3))
    assert(SnapshotLog.versions(dst) == Seq(1L, 2L))
    assert(SnapshotLog.read(spark, dst).count() == 3L)
    // a DIFFERENT writer identity gets its own txn lane
    val other = new LogStreamSink(dst, Map("txnAppId" -> "writer-2"),
      Seq.empty, OutputMode.Append())
    other.addBatch(0, df(9))
    assert(SnapshotLog.read(spark, dst).count() == 4L)
  }

  test("Complete mode publishes full-replace commits; history stays time-travelable") {
    val src = tmp("graft_sink_csrc_"); val dst = tmp("graft_sink_cdst_")
    SnapshotLog.commit(spark, df(1, 2), src)
    SnapshotLog.commit(spark, df(3, 4), src, append = true)
    val q = spark.readStream.format("graft-log")
      .option("maxVersionsPerTrigger", "1").load(src)
      .groupBy().agg(count(lit(1)).as("n"), sum("id").as("s"))
      .writeStream.format("graft-log")
      .option("checkpointLocation", tmp("graft_sink_cck_"))
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    val last = SnapshotLog.read(spark, dst).collect()
    assert(last.length == 1 && last.head.getLong(0) == 4L && last.head.getLong(1) == 10L)
    // two triggers -> two versions, each a complete snapshot of the agg
    val vs = SnapshotLog.versions(dst)
    assert(vs.length == 2, s"expected 2 replace commits, got $vs")
    val v1 = SnapshotLog.read(spark, dst, asOf = Some(vs.head)).collect()
    assert(v1.length == 1 && v1.head.getLong(0) == 2L && v1.head.getLong(1) == 3L,
      "version 1 must be the first trigger's full aggregate")
  }

  test("partitionBy stages a hive layout the batch relation prunes") {
    val src = tmp("graft_sink_psrc_"); val dst = tmp("graft_sink_pdst_")
    import spark.implicits._
    SnapshotLog.commit(spark,
      (0L until 20L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "cat"), src)
    val q = spark.readStream.format("graft-log").load(src)
      .writeStream.format("graft-log")
      .partitionBy("cat")
      .option("checkpointLocation", tmp("graft_sink_pck_"))
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    val entries = SnapshotLog.resolve(dst, SnapshotLog.versions(dst).last).entries
    assert(entries.forall(e => e.path.contains("cat=even") || e.path.contains("cat=odd")),
      s"streamed commit must stage hive col=value segments, got ${entries.map(_.path)}")
    val evens = SnapshotLog.read(spark, dst).filter($"cat" === "even")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(evens == (0L until 20L by 2).toSet)
  }

  test("Update output mode is rejected with the foreachBatch pointer") {
    val src = tmp("graft_sink_usrc_")
    SnapshotLog.commit(spark, df(1), src)
    val e = intercept[Exception] {
      spark.readStream.format("graft-log").load(src)
        .writeStream.format("graft-log")
        .option("checkpointLocation", tmp("graft_sink_uck_"))
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start(tmp("graft_sink_udst_"))
    }
    assert(e.getMessage.contains("foreachBatch") || e.getCause != null &&
      e.getCause.getMessage.contains("foreachBatch"))
  }
}
