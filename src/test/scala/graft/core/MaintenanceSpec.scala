package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Maintenance + format/source operators against the sf0.001 corpus. */
class MaintenanceSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("zValue: known interleavings") {
    import spark.implicits._
    // (x=3,y=1): bits x0=1->b0, y0=1->b1, x1=1->b2, y1=0 => 0b0111 = 7
    // (x=0,y=3): y0=1->b1, y1=1->b3 => 0b1010 = 10
    val got = Seq((3L, 1L), (0L, 3L), (0L, 0L))
      .toDF("x", "y")
      .select(Maintenance.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 10L, 0L))
  }

  test("compactFiles: report shows the expected layout change and zero row loss") {
    val rows = Maintenance.compactFiles(spark, sf, fragments = 8, target = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = Tables.orders(spark, sf).count()
    assert(rows.toSeq == Seq(("after", 2L, n), ("before", 8L, n)))
  }

  test("jdbcRoundtrip: every nation row survives the Derby write/partitioned-read cycle") {
    val back = graft.sources.Formats.jdbcRoundtrip(spark, sf)
    val orig = Tables.nation(spark, sf).orderBy("n_nationkey")
    assert(back.collect().map(_.toSeq).toSeq == orig.collect().map(_.toSeq).toSeq)
  }
}
