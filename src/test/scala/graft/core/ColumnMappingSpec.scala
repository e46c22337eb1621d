package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog.Pred
import graft.sources.LogSourceAudit

/** COLUMN MAPPING (Delta's name mode): RENAME/DROP COLUMN as
  * metadata-only commits — physical file names are immutable, logical
  * names are a log indirection. Old snapshots keep their names,
  * data-skipping stats stay live (they key by physical name), writes
  * stage physical, and streams fail loudly on a mid-stream rename. */
class ColumnMappingSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    Files.createTempDirectory("graft_colmap_").toString

  /** 100 rows, 5 id-clustered files, id+score indexed. */
  private def clusteredTable(): String = {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark,
      (0 until 100).map(i => (i.toLong, i * 1.5, s"p$i")).toDF("id", "score", "payload")
        .repartitionByRange(5, col("id")),
      t, statsFor = Seq("id", "score"))
    t
  }

  private def opened[A](f: => A): (A, Long) = {
    val before = LogSourceAudit.filesOpened.get()
    val r = f
    (r, LogSourceAudit.filesOpened.get() - before)
  }

  test("rename is metadata-only; reads, skipping stats, and time travel follow") {
    val t = clusteredTable()
    val v = SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    assert(SnapshotLog.readRecord(t, v).kind == "schema")
    assert(SnapshotLog.resolve(t, v).entries.map(_.path) ==
      SnapshotLog.resolve(t, 1L).entries.map(_.path), "zero data files touched")
    // head reads under the new name
    val head = SnapshotLog.read(spark, t)
    assert(head.schema.fieldNames.toSeq == Seq("doc_id", "score", "payload"))
    assert(head.agg(sum("doc_id")).head().getLong(0) == 4950L)
    // time travel reads under the OLD name
    assert(SnapshotLog.read(spark, t, Some(1L)).schema.fieldNames.head == "id")
    // data skipping keys by the logical name and still prunes (the
    // stats live under the physical name)
    val (kept, skipped) = SnapshotLog.prunedFilesWhere(t,
      Pred.Between("doc_id", 80.0, 90.0))
    assert(kept.size < 5 && skipped.nonEmpty, s"$kept / $skipped")
    val got = SnapshotLog.readWhere(spark, t, Pred.Between("doc_id", 80.0, 90.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == (80L to 90L).toSet)
  }

  test("writes after a rename stage under the physical name; appends/merges work") {
    import spark.implicits._
    val t = clusteredTable()
    SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    SnapshotLog.commit(spark,
      Seq((1000L, 5.0, "new")).toDF("doc_id", "score", "payload"), t, append = true)
    val head = SnapshotLog.read(spark, t)
    assert(head.count() == 101L)
    assert(head.filter(col("doc_id") === 1000L).count() == 1L)
    // the appended FILE carries the physical name (old snapshots of
    // mixed stages stay self-consistent)
    val newest = SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
      .entries.last
    assert(newest.schema.exists(_.contains("\"id\"")),
      s"staged schema must be physical: ${newest.schema}")
    // merge by the LOGICAL key
    SnapshotLog.merge(spark, t, Seq((50L, 99.0, "upd")).toDF("doc_id", "score", "payload"),
      "doc_id")
    val row = SnapshotLog.read(spark, t).filter(col("doc_id") === 50L).collect().head
    assert(row.getDouble(row.fieldIndex("score")) == 99.0)
    // deleteWhere by the logical name
    SnapshotLog.deleteWhere(spark, t, Pred.Between("doc_id", 0.0, 9.0))
    assert(SnapshotLog.read(spark, t).count() == 91L)
  }

  test("rename chains and rename-back resolve; collisions refuse") {
    import spark.implicits._
    val t = clusteredTable()
    SnapshotLog.renameColumn(spark, t, "id", "a2")
    SnapshotLog.renameColumn(spark, t, "a2", "a3")
    assert(SnapshotLog.read(spark, t).schema.fieldNames.head == "a3")
    assert(SnapshotLog.read(spark, t).agg(sum("a3")).head().getLong(0) == 4950L)
    // rename back to the original physical name: the map empties
    SnapshotLog.renameColumn(spark, t, "a3", "id")
    assert(SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get).colmap.isEmpty)
    assert(SnapshotLog.read(spark, t).schema.fieldNames.head == "id")
    // renaming onto an existing logical name refuses
    intercept[Exception] { SnapshotLog.renameColumn(spark, t, "id", "score") }
    // a write whose column name equals a renamed column's PHYSICAL
    // name refuses (it would collide in storage)
    SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    val bad = Seq((1L, 1.0, "x", 9L)).toDF("doc_id", "score", "payload", "id")
    intercept[Exception] { SnapshotLog.commit(spark, bad, t, append = true) }
  }

  test("drop excludes the column; old snapshots still carry it; storage-name reuse refuses") {
    import spark.implicits._
    val t = clusteredTable()
    val v = SnapshotLog.dropColumn(spark, t, "score")
    assert(SnapshotLog.read(spark, t).schema.fieldNames.toSeq == Seq("id", "payload"))
    assert(SnapshotLog.read(spark, t, Some(v - 1)).schema.fieldNames.size == 3)
    // a new column re-using the dropped storage name refuses (it
    // would resurrect the dropped data in old files)
    intercept[Exception] {
      SnapshotLog.commit(spark, Seq((1L, "x", 2.0)).toDF("id", "payload", "score"),
        t, append = true)
    }
    // a DIFFERENT new column is ordinary schema evolution
    SnapshotLog.commit(spark, Seq((1000L, "x", 2.0)).toDF("id", "payload", "rank"),
      t, append = true)
    val head = SnapshotLog.read(spark, t)
    assert(head.schema.fieldNames.toSeq == Seq("id", "payload", "rank"))
    assert(head.filter(col("id") === 1000L).count() == 1L)
  }

  test("the DSv2 relation reads mapped tables: pushdown prunes, constants restore, DML lands") {
    val t = clusteredTable()
    SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    // batch relation under the new name, with manifest pruning
    val (got, nOpened) = opened {
      spark.read.format("graft-log").load(t)
        .filter(col("doc_id") >= 80L).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }
    assert(got == (80L until 100L).toSet)
    assert(nOpened < 5L, s"pushdown must still prune on the renamed column: $nOpened")
    // metadata aggregates translate too (zero opens)
    val (mm, nMeta) = opened {
      spark.read.format("graft-log").load(t)
        .agg(min("doc_id"), max("doc_id"), count(col("doc_id"))).collect().head
    }
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 99L && mm.getLong(2) == 100L)
    assert(nMeta == 0L, s"metadata agg must resolve from the manifest, opened $nMeta")
    // SQL row-level DML by the new name
    spark.sql("DROP TABLE IF EXISTS cm_dml_t")
    spark.sql(s"CREATE TABLE cm_dml_t USING `graft-log` OPTIONS (path '$t')")
    try {
      spark.sql("UPDATE cm_dml_t SET score = 0.0 WHERE doc_id >= 90")
      val z = SnapshotLog.read(spark, t)
        .filter(col("doc_id") >= 90L).agg(sum("score")).head().getDouble(0)
      assert(z == 0.0)
    } finally spark.sql("DROP TABLE IF EXISTS cm_dml_t")
  }

  test("hive partition columns rename: pruning and restored constants follow") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark,
      Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang"),
      t, partitionBy = Seq("lang"))
    SnapshotLog.renameColumn(spark, t, "lang", "language")
    val (got, nOpened) = opened {
      spark.read.format("graft-log").load(t)
        .filter(col("language") === "en")
        .select("id", "language").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(got == Set((1L, "en"), (3L, "en")))
    assert(nOpened < 3L, s"directory pruning must follow the rename: $nOpened")
    // writes into the renamed partition column keep the hive layout
    SnapshotLog.commit(spark, Seq((4L, "fr")).toDF("id", "language"), t,
      append = true, partitionBy = Seq("language"))
    val newest = SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get).entries.last
    assert(newest.path.contains("lang=fr"),
      s"staged directories carry the physical name: ${newest.path}")
    assert(SnapshotLog.read(spark, t).filter(col("language") === "fr").count() == 1L)
  }

  test("a RESTART resumes the same checkpoint across a rename; a MID-RUN rename still fails loudly") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, Seq((1L, "p1")).toDF("id", "payload"), t)
    val ck = Files.createTempDirectory("graft_colmap_ck_").toString
    val out = Files.createTempDirectory("graft_colmap_out_").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-log").load(t)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    SnapshotLog.commit(spark, Seq((2L, "p2")).toDF("doc_id", "payload"), t, append = true)
    // the restarted stream captures the post-rename mapping, ADOPTS the
    // schema commit in its pending range, and resumes from the SAME
    // checkpoint — no fresh checkpoint, no lost offset, no redelivery
    drain()
    val delivered = spark.read.option("mergeSchema", "true").parquet(out)
    assert(delivered.count() == 2L, "row 1 not redelivered, row 2 delivered once")
    assert(delivered.filter(col("payload") === "p2")
      .select("doc_id").head().getLong(0) == 2L, "pending rows arrive under the NEW name")
    // the row-level change feed surfaces its range under the CURRENT
    // names (physical identity makes one mapping correct); the schema
    // commit itself is invisible (dataChange=false)
    val feed = SnapshotLog.readChangeFeed(spark, t, 1L,
      SnapshotLog.latestVersion(t).get)
    assert(feed.schema.fieldNames.contains("doc_id") &&
      !feed.schema.fieldNames.contains("id"))
    assert(feed.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))

    // MID-RUN: a rename landing while the query RUNS is still a loud
    // failure — the stream captured the pre-rename mapping at start
    val ck2 = Files.createTempDirectory("graft_colmap_ck2_").toString
    val out2 = Files.createTempDirectory("graft_colmap_out2_").toString
    val q = spark.readStream.format("graft-log").load(t)
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ck2)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    try {
      q.processAllAvailable() // first batch done under the captured mapping
      SnapshotLog.renameColumn(spark, t, "doc_id", "key2")
      SnapshotLog.commit(spark, Seq((3L, "p3")).toDF("key2", "payload"), t, append = true)
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage != null)
    } finally if (q.isActive) q.stop()
  }
}
