package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Partition-scoped OPTIMIZE (Delta's `OPTIMIZE ... WHERE part = v`):
  * compaction is per-partition at scale — one hive value's files
  * rewrite, everything else carries by reference, the commit is
  * feed-silent. */
class CompactWhereSpec extends AnyFunSuite with SparkFixture {

  /** lang-partitioned table fed by 4 appends: each partition holds
    * multiple small files. */
  private def table(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_cw_").toString
    (0 until 4).foreach { b =>
      SnapshotLog.commit(spark,
        (0 until 50).map(i => (b * 50L + i, if (i % 2 == 0) "en" else "de"))
          .toDF("id", "lang").repartition(2),
        t, append = b > 0, partitionBy = Seq("lang"), statsFor = Seq("id"))
    }
    t
  }

  private def filesOf(t: String, lang: String): Seq[String] =
    SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
      .entries.map(_.path).filter(_.contains(s"lang=$lang"))

  test("one partition compacts; the other carries by reference; content identical; feed-silent") {
    val t = table()
    val before = SnapshotLog.read(spark, t).collect().map(_.toSeq).toSet
    val deBefore = filesOf(t, "de")
    assert(filesOf(t, "en").size > 2)
    val v = SnapshotLog.compactWhere(spark, t, "lang", Some("en"), targetFiles = 2)
    assert(v == 5L)
    assert(filesOf(t, "en").size <= 2, s"en must compact: ${filesOf(t, "en")}")
    assert(filesOf(t, "de") == deBefore, "de carries BY REFERENCE, untouched")
    assert(SnapshotLog.read(spark, t).collect().map(_.toSeq).toSet == before)
    assert(SnapshotLog.readRecord(t, v).kind == "optimize", "feed-silent maintenance")
    // directory pruning survives the restage
    val en = spark.read.format("graft-log").load(t).filter(col("lang") === "en")
    assert(en.count() == 100L)
    assert(en.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("an already-compact partition is a NO-OP (no commit); flat tables refuse") {
    import spark.implicits._
    val t = table()
    SnapshotLog.compactWhere(spark, t, "lang", Some("en"), targetFiles = 2)
    val head = SnapshotLog.latestVersion(t).get
    assert(SnapshotLog.compactWhere(spark, t, "lang", Some("en"), targetFiles = 2) == head)
    assert(SnapshotLog.latestVersion(t).get == head)
    intercept[RuntimeException] { // a value no partition has
      SnapshotLog.compactWhere(spark, t, "lang", Some("zz"), targetFiles = 2)
    }
    val flat = Files.createTempDirectory("graft_cw_flat_").toString
    SnapshotLog.commit(spark, Seq((1L, "a")).toDF("id", "lang"), flat)
    intercept[RuntimeException] {
      SnapshotLog.compactWhere(spark, flat, "lang", Some("a"), targetFiles = 1)
    }
  }

  test("the DEFAULT (null) partition compacts via value=None") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_cw_null_").toString
    (0 until 3).foreach { b =>
      SnapshotLog.commit(spark,
        Seq((b * 2L, Some("en")), (b * 2L + 1L, Option.empty[String]))
          .toDF("id", "lang"),
        t, append = b > 0, partitionBy = Seq("lang"))
    }
    val nullsBefore = SnapshotLog.read(spark, t).filter(col("lang").isNull)
      .collect().map(_.getLong(0)).toSet
    assert(filesOf(t, "en").size == 3)
    SnapshotLog.compactWhere(spark, t, "lang", None, targetFiles = 1)
    val st = SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
    assert(st.entries.count(_.path.contains("__HIVE_DEFAULT_PARTITION__")) == 1)
    assert(filesOf(t, "en").size == 3, "en untouched")
    val nullsAfter = SnapshotLog.read(spark, t).filter(col("lang").isNull)
      .collect().map(_.getLong(0)).toSet
    assert(nullsAfter == nullsBefore)
  }

  test("clusterBy on a column-MAPPED table translates to the physical frame (clustering survives)") {
    val t = table()
    SnapshotLog.renameColumn(spark, t, "id", "doc_id")
    SnapshotLog.compactWhere(spark, t, "lang", Some("en"), targetFiles = 2,
      clusterBy = Seq("doc_id"))
    val st = SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
    val enBounds = st.entries.filter(_.path.contains("lang=en"))
      .flatMap(_.num.get("id")) // stats key by the PHYSICAL name
    assert(enBounds.size == 2, s"stats must survive the mapped rewrite: $st")
    val sorted = enBounds.sortBy(_._1)
    assert(sorted(0)._2 <= sorted(1)._1,
      s"range clustering on the renamed column must hold: $sorted")
  }

  test("CLI: optimize --where scopes the compaction like the procedure") {
    val t = table()
    val deBefore = filesOf(t, "de")
    graft.tools.Cli.optimize(spark,
      Array("optimize", t, "--target-files", "1", "--where", "lang=en"))
    assert(filesOf(t, "en").size == 1 && filesOf(t, "de") == deBefore)
  }

  test("SQL: CALL optimize(where) scopes to the partition; CALL detail reports the table") {
    val root = Files.createTempDirectory("graft_cw_cat_").toString
    spark.conf.set("spark.sql.catalog.graftw",
      classOf[graft.sources.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftw.root", root)
    org.apache.spark.sql.graft.Bridge.resetCatalogs(spark)
    spark.sql("CREATE NAMESPACE graftw.ml")
    spark.sql("CREATE TABLE graftw.ml.p (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    (0 until 3).foreach { _ =>
      spark.sql("INSERT INTO graftw.ml.p VALUES (1, 'en'), (2, 'de')")
    }
    val t = s"$root/ml/p"
    val deBefore = filesOf(t, "de")
    spark.sql("CALL graftw.system.optimize('ml.p', 1, NULL, 'lang=en')").collect()
    assert(filesOf(t, "en").size == 1 && filesOf(t, "de") == deBefore)
    val d = spark.sql("CALL graftw.system.detail('ml.p')").collect().head
    assert(d.getLong(2) == 6L, s"live_rows: $d") // 6 rows
    // num_files counts every live entry (incl. the CREATE commit's
    // 0-row schema file)
    assert(d.getLong(1) ==
      SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get).entries.size.toLong)
    spark.sql("DROP TABLE graftw.ml.p")
  }
}
