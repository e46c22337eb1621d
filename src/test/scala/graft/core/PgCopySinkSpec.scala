package graft.core

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.sources.{PgCopySink, PgCopyText}

/** COPY-protocol sink: the text-format encoder is fully specced (it is
  * the protocol's documented TEXT format); the wire half is reflection
  * against the PostgreSQL driver, absent in this zero-egress sandbox,
  * so its spec pins the failure mode instead of the happy path. */
class PgCopySinkSpec extends AnyFunSuite with SparkFixture {

  test("encodeField: nulls, escapes, booleans, decimals, bytea") {
    assert(PgCopyText.encodeField(null) == "\\N")
    assert(PgCopyText.encodeField("plain") == "plain")
    assert(PgCopyText.encodeField("a\tb\nc\rd") == "a\\tb\\nc\\rd")
    // a literal backslash-N in DATA must not read back as NULL
    assert(PgCopyText.encodeField("\\N") == "\\\\N")
    assert(PgCopyText.encodeField(true) == "t")
    assert(PgCopyText.encodeField(false) == "f")
    assert(PgCopyText.encodeField(new java.math.BigDecimal("12.3400")) == "12.3400")
    assert(PgCopyText.encodeField(Array[Byte](0x01, 0xff.toByte)) == "\\\\x01ff")
    assert(PgCopyText.encodeField(42L) == "42")
    assert(PgCopyText.encodeField(1.5) == "1.5")
  }

  test("encodeRow: tab-joined, newline-terminated, null-aware") {
    val row = Row(1L, null, "x\ty")
    assert(PgCopyText.encodeRow(row) == "1\t\\N\tx\\ty\n")
  }

  test("copySql quotes the column list, doubling embedded quotes") {
    assert(PgCopyText.copySql("public.t", Seq("id", "Mixed")) ==
      """COPY public.t ("id", "Mixed") FROM STDIN""")
    assert(PgCopyText.copySql("t", Seq("a\"b")) ==
      "COPY t (\"a\"\"b\") FROM STDIN")
  }

  test("RowReader streams rows without materializing the partition") {
    val rows = Iterator(Row("a"), Row("b\tc"), Row(null))
    val r = new PgCopyText.RowReader(rows)
    val out = new StringBuilder
    val buf = new Array[Char](4) // tiny buffer: forces multi-read per row
    var n = r.read(buf, 0, 4)
    while (n >= 0) { out.appendAll(buf, 0, n); n = r.read(buf, 0, 4) }
    assert(out.toString == "a\nb\\tc\n\\N\n")
  }

  test("write against a non-PostgreSQL connection fails with a clear error") {
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    val url = s"jdbc:derby:memory:graft_pgc_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val sink = new PgCopySink(url, props)
    val df = spark.range(3).toDF("id")
    val e = intercept[Exception] {
      sink.write(df, "t")
    }
    // Spark wraps the task failure; the root cause must name the
    // missing-driver / wrong-engine condition, not an opaque NPE.
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        (c.getMessage.contains("PostgreSQL") || c.getMessage.contains("PGConnection"))),
      s"expected a clear PG-requirement error, got: $e")
  }
}
