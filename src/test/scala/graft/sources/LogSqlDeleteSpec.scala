package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.SnapshotLog

/** SQL `DELETE FROM` on graft-log tables (`SupportsDelete`):
  * merge-on-read semantics — matching rows die via deletion-vector
  * sidecars with zero data-file rewrites; only row-exact predicate
  * translations are accepted; bare DELETE truncates as an empty
  * replace commit with history intact. */
class LogSqlDeleteSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_sqldel_").toString
    SnapshotLog.commit(spark,
      (0 until 100).map(i => (i.toLong, s"p$i", if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "payload", "par")
        .repartitionByRange(5, col("id")),
      t, statsFor = Seq("id"))
    t
  }

  private def register(t: String, name: String): Unit =
    spark.sql(s"CREATE TABLE $name USING `graft-log` OPTIONS (path '$t')")

  test("DELETE FROM ... WHERE lands deletion vectors, no file rewrites") {
    val t = freshTable()
    register(t, "sqldel_t")
    try {
      val beforeFiles = SnapshotLog.resolve(t, 1L).entries.map(_.path).toSet
      spark.sql("DELETE FROM sqldel_t WHERE id >= 10 AND id < 30")
      assert(spark.sql("SELECT count(*) AS n FROM sqldel_t")
        .collect().head.getLong(0) == 80L)
      assert(spark.sql("SELECT min(id) AS lo FROM sqldel_t WHERE id >= 5")
        .collect().head.getLong(0) == 5L)
      val head = SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
      assert(head.entries.map(_.path).toSet == beforeFiles,
        "merge-on-read delete must not rewrite data files")
      assert(head.entries.exists(_.dv.isDefined), "matching entries must carry vectors")
      // string + OR predicates translate exactly too
      spark.sql("DELETE FROM sqldel_t WHERE par = 'odd' OR id = 0")
      assert(spark.sql("SELECT count(*) AS n FROM sqldel_t")
        .collect().head.getLong(0) == 39L) // evens 2..98 minus the 10 dead in [10,30)
    } finally spark.sql("DROP TABLE sqldel_t")
  }

  test("a non-exact predicate is NEVER served from the metadata fast path") {
    // payload LIKE has no exact Pred translation — canDeleteWhere must
    // refuse so Spark routes it through the row-level REWRITE instead
    // (LogRowLevelDmlSpec pins that path end-to-end); a fast path that
    // accepted it would delete whole bound-ranges, not matching rows
    val t = freshTable()
    val table = new LogStreamTable(t, SnapshotLog.read(spark, t).schema)
    import org.apache.spark.sql.sources._
    assert(!table.canDeleteWhere(Array[Filter](StringStartsWith("payload", "p1"))))
    assert(!table.canDeleteWhere(Array[Filter](
      EqualTo("id", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))))
    assert(table.canDeleteWhere(Array[Filter](
      And(GreaterThanOrEqual("id", 10L), LessThan("id", 30L)))))
    assert(table.canDeleteWhere(Array[Filter](EqualTo("payload", "p1"))))
    // and end-to-end: the LIKE delete still WORKS via the rewrite path
    register(t, "sqldel_ne")
    try {
      spark.sql("DELETE FROM sqldel_ne WHERE payload LIKE 'p1%'") // p1, p10..p19
      assert(spark.sql("SELECT count(*) AS n FROM sqldel_ne")
        .collect().head.getLong(0) == 89L)
    } finally spark.sql("DROP TABLE sqldel_ne")
  }

  test("bare DELETE truncates as an empty replace; history time-travels") {
    val t = freshTable()
    register(t, "sqldel_tr")
    try {
      spark.sql("DELETE FROM sqldel_tr")
      assert(spark.sql("SELECT count(*) AS n FROM sqldel_tr")
        .collect().head.getLong(0) == 0L)
      assert(SnapshotLog.read(spark, t, asOf = Some(1L)).count() == 100L,
        "pre-truncate snapshot must stay readable")
    } finally spark.sql("DROP TABLE sqldel_tr")
  }
}
