package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog

/** SQL row-level DML through `SupportsDelta` — UPDATE, MERGE INTO,
  * and arbitrary-predicate DELETE — merge-on-read: every statement is
  * ONE rewrite commit that attaches deletion vectors and appends
  * staged inserts, with ZERO data files rewritten, pre-state
  * time-travelable, and the change feed carrying delete pre-images +
  * inserted rows. */
class LogRowLevelDmlSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_dml_").toString
    SnapshotLog.commit(spark,
      (0 until 100).map(i => (i.toLong, s"p$i", i * 1.0)).toDF("id", "payload", "v")
        .repartitionByRange(5, col("id")),
      t, statsFor = Seq("id"))
    t
  }

  private def sum(name: String): Double =
    spark.sql(s"SELECT sum(v) AS s FROM $name").collect().head.getDouble(0)

  test("UPDATE is a delete+insert delta: vectors on touched files, no rewrites") {
    val t = freshTable()
    spark.sql(s"CREATE TABLE dml_upd USING `graft-log` OPTIONS (path '$t')")
    try {
      val beforeFiles = SnapshotLog.resolve(t, 1L).entries.map(_.path).toSet
      spark.sql("UPDATE dml_upd SET v = v + 1000 WHERE id < 10")
      assert(sum("dml_upd") == 4950.0 + 10000.0)
      assert(spark.sql("SELECT count(*) AS n FROM dml_upd").collect().head.getLong(0) == 100L)
      val head = SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
      assert(beforeFiles.subsetOf(head.entries.map(_.path).toSet),
        "original data files must survive untouched (merge-on-read)")
      assert(head.entries.exists(_.dv.isDefined), "the touched file carries a vector")
      assert(head.entries.exists(e => !beforeFiles.contains(e.path)),
        "updated rows land as a staged insert file")
      // pre-state time travels
      assert(SnapshotLog.read(spark, t, asOf = Some(1L))
        .agg(org.apache.spark.sql.functions.sum("v")).collect().head.getDouble(0) == 4950.0)
    } finally spark.sql("DROP TABLE dml_upd")
  }

  test("DELETE with a non-translatable predicate routes through the row-level rewrite") {
    val t = freshTable()
    spark.sql(s"CREATE TABLE dml_del USING `graft-log` OPTIONS (path '$t')")
    try {
      spark.sql("DELETE FROM dml_del WHERE payload LIKE 'p9%'") // p9, p90..p99
      assert(spark.sql("SELECT count(*) AS n FROM dml_del").collect().head.getLong(0) == 89L)
      assert(spark.sql("SELECT count(*) AS n FROM dml_del WHERE payload LIKE 'p9%'")
        .collect().head.getLong(0) == 0L)
      val head = SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
      assert(head.entries.exists(_.dv.isDefined))
    } finally spark.sql("DROP TABLE dml_del")
  }

  test("MERGE INTO with update + delete + insert clauses, and its change feed") {
    import spark.implicits._
    val t = freshTable()
    spark.sql(s"CREATE TABLE dml_mrg USING `graft-log` OPTIONS (path '$t')")
    try {
      Seq((5L, "five", 5.5), (7L, "seven", -1.0), (200L, "new", 200.0))
        .toDF("id", "payload", "v").createOrReplaceTempView("dml_src")
      spark.sql(
        """MERGE INTO dml_mrg USING dml_src ON dml_mrg.id = dml_src.id
          |WHEN MATCHED AND dml_src.v < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val rows = spark.sql("SELECT id, payload, v FROM dml_mrg WHERE id IN (5, 7, 200)")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((5L, "five", 5.5), (200L, "new", 200.0)),
        s"merge must update 5, delete 7, insert 200; got $rows")
      assert(spark.sql("SELECT count(*) AS n FROM dml_mrg").collect().head.getLong(0) == 100L)

      // the change feed of the merge commit: pre-images of the two
      // killed rows (update's delete half + the delete clause) plus
      // the two inserted rows
      val v = SnapshotLog.versions(t).last
      val feed = SnapshotLog.readChangeFeed(spark, t, v - 1, v)
        .select("_change_type", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(feed == Set(("delete", 5L), ("delete", 7L), ("insert", 5L), ("insert", 200L)),
        s"merge change feed mismatch: $feed")
    } finally spark.sql("DROP TABLE dml_mrg")
  }

  test("DML over a table that already carries vectors unions them: both deletes stay applied") {
    val t = freshTable()
    SnapshotLog.deleteWhere(spark, t, SnapshotLog.Pred.Between("id", 0.0, 4.0))
    spark.sql(s"CREATE TABLE dml_dv USING `graft-log` OPTIONS (path '$t')")
    try {
      spark.sql("UPDATE dml_dv SET v = -1 WHERE id BETWEEN 5 AND 9")
      val ids = spark.sql("SELECT id FROM dml_dv WHERE id < 20").collect()
        .map(_.getLong(0)).toSet
      assert(ids == (5L until 20L).toSet,
        s"the earlier deleteWhere's rows must stay dead after the UPDATE: $ids")
      assert(spark.sql("SELECT count(*) AS n FROM dml_dv WHERE v = -1")
        .collect().head.getLong(0) == 5L)
      assert(spark.sql("SELECT count(*) AS n FROM dml_dv")
        .collect().head.getLong(0) == 95L)
    } finally spark.sql("DROP TABLE dml_dv")
  }

  test("row-level DML on a hive-partitioned table fails fast with the COW pointer") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_dml_part_").toString
    SnapshotLog.commit(spark,
      (0 until 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "par"),
      t, partitionBy = Seq("par"))
    spark.sql(s"CREATE TABLE dml_part USING `graft-log` OPTIONS (path '$t')")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE dml_part SET par = 'c' WHERE id = 3")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("flat staged layouts")), s"got: ${msgs(e)}")
      assert(spark.sql("SELECT count(*) AS n FROM dml_part")
        .collect().head.getLong(0) == 20L, "the failed DML must change nothing")
    } finally spark.sql("DROP TABLE dml_part")
  }

  test("DML-inserted files carry writer-tracked bounds: skipping stays alive after a MERGE") {
    import spark.implicits._
    val t = freshTable()
    spark.sql(s"CREATE TABLE dml_bnd USING `graft-log` OPTIONS (path '$t')")
    try {
      Seq((500L, "n500", 1.0), (501L, "n501", 2.0)).toDF("id", "payload", "v")
        .createOrReplaceTempView("dml_bnd_src")
      spark.sql(
        """MERGE INTO dml_bnd g USING dml_bnd_src s ON g.id = s.id
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val head = SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
      // inserted rows landed in one file per task; each carries its
      // own exact bounds
      val inserted = head.entries.filter(_.num.get("id").exists(_._1 >= 500.0))
      assert(inserted.nonEmpty && inserted.forall(e => {
        val (lo, hi) = e.num("id"); lo >= 500.0 && hi <= 501.0 && lo <= hi
      }), s"the staged insert files must carry id bounds: ${head.entries.map(e => (e.path, e.num))}")
      // a key-band read over the ORIGINAL range prunes the new file away
      val before = LogSourceAudit.filesOpened.get()
      val got = spark.read.format("graft-log").load(t)
        .filter(col("id") >= 20 && col("id") <= 39).count()
      val opened = LogSourceAudit.filesOpened.get() - before
      assert(got == 20L)
      assert(opened == 1L,
        s"the DML-inserted file must skip on its own bounds, opened $opened")
    } finally spark.sql("DROP TABLE dml_bnd")
  }

  test("insert-only MERGE appends without touching existing entries") {
    import spark.implicits._
    val t = freshTable()
    spark.sql(s"CREATE TABLE dml_ins USING `graft-log` OPTIONS (path '$t')")
    try {
      Seq((300L, "new300", 1.0)).toDF("id", "payload", "v")
        .createOrReplaceTempView("dml_ins_src")
      spark.sql(
        """MERGE INTO dml_ins USING dml_ins_src ON dml_ins.id = dml_ins_src.id
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql("SELECT count(*) AS n FROM dml_ins").collect().head.getLong(0) == 101L)
      val rec = SnapshotLog.readRecord(t, SnapshotLog.versions(t).last)
      assert(rec.append && rec.removes.isEmpty,
        "a pure-insert merge must land as an append commit")
      assert(SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
        .entries.forall(_.dv.isEmpty))
    } finally spark.sql("DROP TABLE dml_ins")
  }
}
