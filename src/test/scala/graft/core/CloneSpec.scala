package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.SnapshotLog.Pred

/** SHALLOW CLONE (Delta's CLONE): a metadata-only table copy — v1 of
  * the clone references the source head's files in place via per-entry
  * `base`; the clone then evolves independently (local appends, DVs,
  * OPTIMIZE-materialization) while the source never notices. */
class CloneSpec extends AnyFunSuite with SparkFixture {

  private def srcTable(partitioned: Boolean = false): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_clone_src_").toString
    val df = (0 until 400).map(i =>
      (i.toLong, f"k$i%04d", if (i % 2 == 0) "en" else "de"))
      .toDF("id", "key", "lang")
    SnapshotLog.commit(spark,
      df.repartitionByRange(4, col("id")), t,
      partitionBy = if (partitioned) Seq("lang") else Seq.empty,
      statsFor = Seq("id"))
    t
  }

  private def cloneDir(): String = {
    val d = Files.createTempDirectory("graft_clone_dst_").toString
    d
  }

  private def dataFilesUnder(t: String): Seq[String] = {
    val d = Paths.get(t, "data")
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val st = Files.walk(d)
      try {
        val it = st.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".parquet")) buf += p.toString }
        buf.toSeq
      } finally st.close()
    }
  }

  test("clone is metadata-only: zero local data files, reads identical, pruning intact") {
    val src = srcTable()
    val dst = cloneDir()
    val v = SnapshotLog.cloneTable(src, dst)
    assert(v == 1L)
    assert(dataFilesUnder(dst).isEmpty, "a shallow clone copies NO data")
    val a = SnapshotLog.read(spark, src).collect().map(_.toSeq).toSet
    val b = SnapshotLog.read(spark, dst).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 400)
    // entries carry the source base; stats survive, so skipping works
    val st = SnapshotLog.resolve(dst, 1L)
    assert(st.entries.forall(_.base.isDefined))
    val (kept, skipped) = SnapshotLog.prunedFilesWhere(dst, Pred.Between("id", 0.0, 50.0))
    assert(skipped.nonEmpty, "clone keeps the source's bounds")
    val viaDsv2 = spark.read.format("graft-log").load(dst)
      .filter(col("id") < 10L).select("key").collect().map(_.getString(0)).toSet
    assert(viaDsv2 == (0 until 10).map(i => f"k$i%04d").toSet)
  }

  test("the clone evolves independently: appends and merge-on-read deletes never touch the source") {
    import spark.implicits._
    val src = srcTable()
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    // local append lands under the CLONE
    SnapshotLog.commit(spark,
      Seq((9000L, "x9000", "fr")).toDF("id", "key", "lang"), dst, append = true)
    assert(dataFilesUnder(dst).nonEmpty)
    assert(SnapshotLog.read(spark, dst).count() == 401L)
    assert(SnapshotLog.read(spark, src).count() == 400L)
    // merge-on-read DELETE on the clone: dv row keys are the SOURCE-
    // relative paths, so vectors kill exactly the asked rows
    SnapshotLog.deleteWhere(spark, dst, Pred.Between("id", 100.0, 199.0))
    val ids = SnapshotLog.read(spark, dst).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.exists(i => i >= 100L && i <= 199L))
    assert(ids.size == 301 && ids.contains(9000L))
    // the source never noticed any of it
    assert(SnapshotLog.read(spark, src).count() == 400L)
    // and the source evolving does not move the clone (pinned at clone time)
    SnapshotLog.commit(spark,
      Seq((7777L, "y7777", "en")).toDF("id", "key", "lang"), src, append = true)
    assert(SnapshotLog.read(spark, dst).count() == 301L)
  }

  test("a partitioned source clones with hive constants and directory pruning intact") {
    val src = srcTable(partitioned = true)
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    val en = spark.read.format("graft-log").load(dst)
      .filter(col("lang") === "en")
    assert(en.count() == 200L)
    assert(en.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("bloom sidecars ride the clone: point lookups keep index-skipping") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_clone_bsrc_").toString
    SnapshotLog.commit(spark,
      (0 until 1000).map(i => (i.toLong, f"k$i%04d", i % 8)).toDF("id", "key", "f")
        .repartitionByRange(8, col("f")).drop("f"),
      src, statsFor = Seq("id", "key"),
      props = Some(Map(BloomIndex.ColumnsProp -> "key",
        BloomIndex.ItemsProp -> "1000", BloomIndex.FppProp -> "0.001")))
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    val st = SnapshotLog.resolve(dst, 1L)
    assert(st.props(BloomIndex.ColumnsProp) == "key")
    assert(st.entries.forall(_.idx.exists(_.startsWith("/"))))
    val before = graft.sources.LogSourceAudit.filesOpened.get()
    val rows = spark.read.format("graft-log").load(dst)
      .filter(col("key") === "k0123").select("id").collect()
    val n = graft.sources.LogSourceAudit.filesOpened.get() - before
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n <= 2L, s"clone must keep bloom skipping, opened $n")
  }

  test("OPTIMIZE materializes the clone; vacuum afterwards never deletes source files") {
    val src = srcTable()
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    val v2 = SnapshotLog.compact(spark, dst, targetFiles = 2)
    val st = SnapshotLog.resolve(dst, v2)
    assert(st.entries.forall(_.base.isEmpty), "compaction rewrites locally")
    assert(dataFilesUnder(dst).nonEmpty)
    SnapshotLog.vacuum(dst, keepFrom = v2)
    // the source is intact: every row still reads
    assert(SnapshotLog.read(spark, src).count() == 400L)
    assert(SnapshotLog.read(spark, dst).count() == 400L)
  }

  test("clone of a renamed (column-mapped) table keeps logical names; clone-of-clone keeps the ORIGINAL base") {
    val src = srcTable()
    SnapshotLog.renameColumn(spark, src, "key", "doc_key")
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    assert(SnapshotLog.read(spark, dst).columns.toSeq == Seq("id", "doc_key", "lang"))
    assert(SnapshotLog.read(spark, dst).count() == 400L)
    val dst2 = cloneDir()
    SnapshotLog.cloneTable(dst, dst2)
    val srcRoot = Paths.get(src).toAbsolutePath.normalize.toString
    assert(SnapshotLog.resolve(dst2, 1L).entries.forall(_.base.contains(srcRoot)),
      "a clone of a clone references the ORIGINAL files, not the middle clone")
    assert(SnapshotLog.read(spark, dst2).count() == 400L)
  }

  test("cloning a table that ALREADY carries deletion vectors keeps them; clone-local deletes layer on top") {
    val src = srcTable()
    SnapshotLog.deleteWhere(spark, src, Pred.Between("id", 0.0, 49.0))
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    val st = SnapshotLog.resolve(dst, 1L)
    assert(st.entries.exists(_.dv.exists(_.startsWith("/"))),
      "source dv refs record absolute on the clone")
    val ids0 = SnapshotLog.read(spark, dst).select("id").collect().map(_.getLong(0)).toSet
    assert(ids0 == (50L until 400L).toSet, "the source's vectors apply on the clone")
    // a clone-local delete UNIONS with the source's vectors
    SnapshotLog.deleteWhere(spark, dst, Pred.Between("id", 50.0, 99.0))
    val ids1 = SnapshotLog.read(spark, dst).select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == (100L until 400L).toSet)
    // and through the vectorized DSv2 path too
    assert(spark.read.format("graft-log").load(dst).count() == 300L)
    // the source still sees only its own vectors
    assert(SnapshotLog.read(spark, src).count() == 350L)
  }

  test("a stream over a clone delivers the referenced snapshot (AvailableNow == batch read)") {
    val src = srcTable()
    val dst = cloneDir()
    SnapshotLog.cloneTable(src, dst)
    val out = Files.createTempDirectory("graft_clone_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_clone_stream_ck_").toString
    val q = spark.readStream.format("graft-log").load(dst)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val streamed = spark.read.parquet(out).select("id", "key", "lang")
      .collect().map(_.toSeq).toSet
    val batch = SnapshotLog.read(spark, dst).collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 400)
  }

  test("SQL: CALL graft.system.clone — zero-copy by name, guarded targets") {
    val root = Files.createTempDirectory("graft_clonecat_").toString
    spark.conf.set("spark.sql.catalog.graftc",
      classOf[graft.sources.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftc.root", root)
    org.apache.spark.sql.graft.Bridge.resetCatalogs(spark)
    spark.sql("CREATE NAMESPACE graftc.ml")
    spark.sql("CREATE TABLE graftc.ml.src (id BIGINT, k STRING)")
    spark.sql("INSERT INTO graftc.ml.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val res = spark.sql("CALL graftc.system.clone('ml.src', 'ml.dst')").collect()
    assert(res.head.getLong(0) == 1L)
    assert(spark.sql("SELECT * FROM graftc.ml.dst").count() == 3L)
    assert(dataFilesUnder(s"$root/ml/dst").isEmpty)
    intercept[Exception] { // existing target refuses
      spark.sql("CALL graftc.system.clone('ml.src', 'ml.dst')")
    }
    intercept[Exception] { // missing namespace refuses
      spark.sql("CALL graftc.system.clone('ml.src', 'nope.dst')")
    }
    spark.sql("DROP TABLE graftc.ml.dst")
    spark.sql("DROP TABLE graftc.ml.src")
  }
}
