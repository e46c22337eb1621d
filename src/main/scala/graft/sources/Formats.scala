package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Non-parquet source/sink formats (SURVEY §2b "Scans/sources/sinks"):
  * CSV and JSON read/write, exercised as round-trips so the DuckDB
  * oracle can verify byte-level fidelity against the original table.
  * The reference's only non-COPY format was CSV ingest
  * (lib/pgcp/postgres.rb:122-135); JSON is the natural Spark addition.
  *
  * Reads always pass an explicit schema (inference is a second scan —
  * wasteful at scale, and type-unstable). */
object Formats {

  // Roundtrip scratch dirs come from TempDirs (stable per (format,
  // corpus): repeated bench runs overwrite instead of leaking one full
  // table copy per call, and JVM exit sweeps the base away).
  private def scratch(tag: String, dir: String): String =
    s"${graft.core.TempDirs.stable(s"$tag:$dir")}/data"

  /** parquet -> CSV (header) -> read back with explicit schema.
    * Whitespace trimming is OFF both ways (the writer default silently
    * trims edge whitespace — a fidelity loss on string payloads).
    * Remaining CSV-format caveat: '' and NULL are conflated by the
    * format itself unless quoting conventions distinguish them. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.nation(spark, dir)
    val out = scratch("csv_rt", dir)
    src.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    spark.read.schema(src.schema).option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
      .orderBy("n_nationkey")
  }

  /** parquet -> JSON lines -> read back with explicit schema. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.region(spark, dir)
    val out = scratch("json_rt", dir)
    src.write.mode("overwrite").json(out)
    spark.read.schema(src.schema).json(out)
      .orderBy("r_regionkey")
  }

  /** parquet -> ORC -> read back (columnar alternative; ORC ships with
    * Spark). Schema carries in the ORC footer — no explicit pass. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.supplier(spark, dir)
    val out = scratch("orc_rt", dir)
    src.write.mode("overwrite").orc(out)
    spark.read.orc(out).orderBy("s_suppkey")
  }

  /** REAL JDBC source/sink roundtrip — the project north star's
    * codepath — against embedded Derby (a genuine JDBC database running
    * in-JVM; ships with Spark). Exercises exactly what a live-Postgres
    * copy runs: dialect-mapped CREATE TABLE + batched INSERTs on write,
    * then a PARTITIONED read (min/max bounds discovery + 4 parallel
    * range scans) through `graft.core.JdbcSource`. Swapping the url for
    * jdbc:postgresql://... is the only change a production copy needs. */
  def jdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    val db = s"memory:graft_${java.util.UUID.randomUUID().toString.take(8)}"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val jdbc = new graft.core.JdbcSource(s"jdbc:derby:$db;create=true", props,
      partitionColumn = Some("n_nationkey"), numPartitions = 4)
    val (rows, schema) =
      try {
        jdbc.write(Tables.nation(spark, dir), "nation")
        val back = jdbc.read(spark, "nation").orderBy("n_nationkey")
        (back.collect(), back.schema) // materialize THROUGH the partitioned read
      } finally {
        // in-memory Derby DBs outlive their connections until dropped —
        // repeated bench runs would otherwise pin one loaded DB per
        // call. The drop "succeeds" by throwing 08006.
        try { java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"); () }
        catch { case _: java.sql.SQLException => () }
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** parquet -> XML (Spark 4 built-in source, one <part> element per
    * row) -> read back with explicit schema (XML carries no types; the
    * schema pass restores int/double instead of leaving everything
    * string). Round-trip fidelity is what the oracle checks. */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.part(spark, dir)
    val out = scratch("xml_rt", dir)
    src.write.mode("overwrite").format("xml")
      .option("rootTag", "parts").option("rowTag", "part").save(out)
    spark.read.format("xml").option("rowTag", "part")
      .schema(src.schema).load(out)
      .orderBy("p_partkey")
  }

  /** document corpus -> line-oriented text files -> read back. The text
    * source yields one `value` column per line (the corpus is
    * newline-free ASCII, so lines == documents). */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("text"))
    val out = scratch("text_rt", dir)
    src.write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(col("value"), length(col("value")).cast("bigint").as("n_chars"))
      .orderBy("value")
  }
}
