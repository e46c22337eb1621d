package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Merge-on-read deletes (deletion vectors): `deleteWhere` writes
  * position sidecars instead of rewriting data files; readers apply
  * them at scan time; rewrites materialize them; vacuum retires them.
  * The shape COW cannot serve — a predicate matching a few rows in
  * many files deletes in O(matched rows), not O(touched files). */
class DeletionVectorSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    Files.createTempDirectory("graft_dv_").toString

  private def idsAt(table: String, v: Option[Long] = None): Set[Long] =
    SnapshotLog.read(spark, table, v).select("id").collect().map(_.getLong(0)).toSet

  /** 100 rows in 5 id-clustered files, id-indexed. */
  private def clusteredTable(): String = {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark,
      (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
        .repartitionByRange(5, col("id")),
      t, statsFor = Seq("id"))
    t
  }

  test("deleteWhere writes sidecars, rewrites no data file, and the head reads exactly") {
    import SnapshotLog.Pred._
    val t = clusteredTable()
    val before = SnapshotLog.resolve(t, 1L)
    val mtimes = before.entries.map(e =>
      e.path -> Files.getLastModifiedTime(Paths.get(t, e.path))).toMap
    // kill ids 15..25: spans the [0,19] and [20,39] files, sparse rows
    val v = SnapshotLog.deleteWhere(spark, t, Between("id", 15.0, 25.0))
    assert(v == 2L)
    val rec = SnapshotLog.readRecord(t, 2L)
    assert(rec.kind == "rewrite")
    assert(rec.removes.size == 2 && rec.adds.size == 2,
      s"two files overlap [15,25]: ${rec.removes}")
    assert(rec.adds.map(_.path).toSet == rec.removes.toSet,
      "a dv commit re-lists the SAME data files, vector attached")
    rec.adds.foreach { e =>
      assert(e.dv.isDefined && e.dvRows > 0L, s"entry $e must carry its vector")
    }
    assert(rec.adds.map(_.dvRows).sum == 11L)
    // NO data file was touched
    mtimes.foreach { case (f, mt) =>
      assert(Files.getLastModifiedTime(Paths.get(t, f)) == mt,
        s"deleteWhere rewrote data file $f")
    }
    // head content exact; pre-delete snapshot intact (time travel)
    assert(idsAt(t) == (0L until 100L).toSet -- (15L to 25L).toSet)
    assert(idsAt(t, Some(1L)) == (0L until 100L).toSet)
    // bounds survive: the same index still prunes, results stay exact
    val (kept, skipped) = SnapshotLog.prunedFiles(t, "id", 80.0, 90.0)
    assert(skipped.nonEmpty && kept.nonEmpty)
    assert(SnapshotLog.readPruned(spark, t, "id", 10.0, 30.0)
      .select("id").collect().map(_.getLong(0)).toSet ==
      ((10L to 30L).toSet -- (15L to 25L).toSet))
  }

  test("a second overlapping delete unions vectors: both stay applied, counts accumulate") {
    import SnapshotLog.Pred._
    val t = clusteredTable()
    SnapshotLog.deleteWhere(spark, t, Between("id", 15.0, 25.0)) // v2
    val v3 = SnapshotLog.deleteWhere(spark, t, Between("id", 22.0, 41.0)) // overlaps file 2
    assert(v3 == 3L)
    assert(idsAt(t) == (0L until 100L).toSet -- (15L to 41L).toSet)
    // the [20,39] file's entry accumulated both deletes
    val e2 = SnapshotLog.resolve(t, 3L).entries
      .filter(_.dv.isDefined).map(_.dvRows).sum
    assert(e2 == 27L, s"11 + 16 new dead positions, got $e2") // 15..25 + 26..41
    // deleting already-dead rows is a NO-OP (no live row matches)
    assert(SnapshotLog.deleteWhere(spark, t, SnapshotLog.Pred.Between("id", 16.0, 18.0)) == 3L)
    assert(SnapshotLog.versions(t).last == 3L)
  }

  test("the change feed delivers deleteWhere's rows as deletes with their version") {
    import SnapshotLog.Pred._
    import spark.implicits._
    val t = clusteredTable()
    SnapshotLog.commit(spark, Seq((500L, "a")).toDF("id", "payload"), t, append = true) // v2
    SnapshotLog.deleteWhere(spark, t, Between("id", 3.0, 5.0)) // v3
    val feed = SnapshotLog.readChangeFeed(spark, t, 1L, 3L).collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet
    assert(feed == Set((500L, "insert", 2L),
      (3L, "delete", 3L), (4L, "delete", 3L), (5L, "delete", 3L)), s"got $feed")
  }

  test("compaction and merge read THROUGH vectors: rewrites materialize the deletions") {
    import SnapshotLog.Pred._
    import spark.implicits._
    val t = clusteredTable()
    SnapshotLog.deleteWhere(spark, t, Between("id", 10.0, 19.0)) // v2
    // a merge touching a dv-carrying file: the update applies, the
    // dead rows stay dead, the rewritten file drops its vector
    SnapshotLog.merge(spark, t, Seq((5L, "upd5")).toDF("id", "payload"), "id") // v3
    val head3 = SnapshotLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(head3(5L) == "upd5" && !head3.contains(12L) && head3.size == 90)
    val rewritten = SnapshotLog.readRecord(t, 3L).adds
    assert(rewritten.forall(_.dv.isEmpty), "a rewrite materializes the vector")
    // full compaction: content identical, no vectors left anywhere
    SnapshotLog.compact(spark, t, targetFiles = 2) // v4
    assert(SnapshotLog.resolve(t, 4L).entries.forall(_.dv.isEmpty))
    assert(idsAt(t) == (0L until 100L).toSet -- (10L to 19L).toSet)
  }

  test("vacuum retires dead sidecars; the orphan sweep spares live ones and eats litter") {
    import SnapshotLog.Pred._
    import spark.implicits._
    val t = clusteredTable()
    SnapshotLog.deleteWhere(spark, t, Between("id", 0.0, 4.0))  // v2: dv A
    SnapshotLog.deleteWhere(spark, t, Between("id", 5.0, 9.0))  // v3: dv B (A folded in)
    val dvA = SnapshotLog.readRecord(t, 2L).adds.flatMap(_.dv).distinct
    val dvB = SnapshotLog.readRecord(t, 3L).adds.flatMap(_.dv).distinct
    assert(dvA != dvB)
    // crashed-writer litter under dv/ and a crashed row-level DML's
    // transient position staging under dvtmp/
    Seq(("x", 1L)).toDF("path", "pos").write.parquet(s"$t/dv/crashed")
    Seq(("x", 2L)).toDF("path", "pos").write.parquet(s"$t/dvtmp/crashed")
    val swept = SnapshotLog.vacuumOrphans(t, olderThanMs = -1000L)
    assert(swept.contains("dv/crashed") && swept.contains("dvtmp/crashed") &&
      !swept.exists(dvB.contains),
      s"sweep must eat litter, not the live vector: $swept")
    // retire v1-v2: dv A dies with its record, dv B survives with the head
    SnapshotLog.vacuum(t, keepFrom = 3L)
    dvA.foreach(d => assert(!Files.exists(Paths.get(t, d)), s"dead sidecar $d survived"))
    dvB.foreach(d => assert(Files.isDirectory(Paths.get(t, d))))
    assert(idsAt(t) == (10L until 100L).toSet)
  }

  test("bin-packing counts LIVE bytes: a mostly-dead file reorganizes and drops its vector") {
    import SnapshotLog.Pred._
    import spark.implicits._
    val t = freshTable()
    // two sizeable files; kill 90% of the first one's rows
    SnapshotLog.commit(spark,
      (0 until 20000).map(i => (i.toLong, s"pay-$i" * 3)).toDF("id", "payload")
        .repartitionByRange(2, col("id")),
      t, statsFor = Seq("id"))
    SnapshotLog.deleteWhere(spark, t, Between("id", 0.0, 8999.0)) // v2
    val entries = SnapshotLog.resolve(t, 2L).entries
    val dved = entries.filter(_.dv.isDefined)
    assert(dved.size == 1 && dved.head.dvRows == 9000L)
    val threshold = entries.map(_.bytes).min // below any PHYSICAL size
    val v = SnapshotLog.compactSmall(spark, t, minFileBytes = threshold, minSmall = 1)
    assert(v == 3L, "the 90%-dead file's LIVE bytes fall under the threshold")
    val rec = SnapshotLog.readRecord(t, 3L)
    assert(rec.removes == Seq(dved.head.path),
      s"only the mostly-dead file reorganizes: ${rec.removes}")
    assert(SnapshotLog.resolve(t, 3L).entries.forall(_.dv.isEmpty),
      "the reorg materializes the deletions and drops the vector")
    assert(SnapshotLog.read(spark, t).count() == 11000L)
  }

  test("deleteWhere prunes first and no-ops cleanly") {
    import SnapshotLog.Pred._
    val t = clusteredTable()
    // provably-out-of-range predicate: no commit at all
    assert(SnapshotLog.deleteWhere(spark, t, Between("id", 5000.0, 6000.0)) == 1L)
    assert(SnapshotLog.versions(t) == Seq(1L))
    // a hive-partitioned table refuses merge-on-read
    import spark.implicits._
    val t2 = freshTable()
    SnapshotLog.commit(spark, Seq((1L, "en")).toDF("id", "lang"), t2,
      partitionBy = Seq("lang"), statsFor = Seq("id"))
    val e = intercept[RuntimeException] {
      SnapshotLog.deleteWhere(spark, t2, Between("id", 0.0, 9.0))
    }
    assert(e.getMessage.contains("flat staged layouts"), e.getMessage)
  }

  test("a delete past the shard threshold writes a per-path sharded sidecar that reads identically") {
    import SnapshotLog.Pred._
    val t = clusteredTable()
    val saved = SnapshotLog.dvShardRowsLimit
    SnapshotLog.dvShardRowsLimit = 5L // force sharding: 31 positions span 2 files
    try {
      val v = SnapshotLog.deleteWhere(spark, t, Between("id", 10.0, 40.0))
      assert(v == 2L)
      val rec = SnapshotLog.readRecord(t, 2L)
      val dvDirs = rec.adds.flatMap(_.dv).distinct
      assert(dvDirs.size == 1)
      val shards = {
        val st = Files.list(Paths.get(t, dvDirs.head))
        try {
          val it = st.iterator()
          var n = 0
          while (it.hasNext) {
            if (it.next().getFileName.toString.endsWith(".parquet")) n += 1
          }
          n
        } finally st.close()
      }
      assert(shards > 1, s"expected a sharded sidecar, got $shards file(s)")
      assert(idsAt(t) == (0L until 100L).toSet -- (10L to 40L).toSet,
        "sharded vectors must read identically to a single-file sidecar")
      // a second delete over the same files unions old shards correctly
      SnapshotLog.deleteWhere(spark, t, Eq("id", 50.0))
      assert(idsAt(t) == (0L until 100L).toSet -- (10L to 40L).toSet - 50L)
      // the DSv2 relation reads the sharded sidecars identically (its
      // readers footer-prune to path-overlapping shards only)
      val dsv2 = spark.read.format("graft-log").load(t)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(dsv2 == idsAt(t), "graft-log batch read through sharded vectors")
    } finally SnapshotLog.dvShardRowsLimit = saved
  }
}
