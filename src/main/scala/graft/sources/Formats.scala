package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import java.nio.file.Files

/** Non-parquet source/sink formats (SURVEY §2b "Scans/sources/sinks"):
  * CSV and JSON read/write, exercised as round-trips so the DuckDB
  * oracle can verify byte-level fidelity against the original table.
  * The reference's only non-COPY format was CSV ingest
  * (lib/pgcp/postgres.rb:122-135); JSON is the natural Spark addition.
  *
  * Reads always pass an explicit schema (inference is a second scan —
  * wasteful at scale, and type-unstable). */
object Formats {

  /** parquet -> CSV (header) -> read back with explicit schema. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.nation(spark, dir)
    val out = Files.createTempDirectory("graft_csv_").toString
    src.write.mode("overwrite").option("header", "true").csv(out)
    spark.read.schema(src.schema).option("header", "true").csv(out)
      .orderBy("n_nationkey")
  }

  /** parquet -> JSON lines -> read back with explicit schema. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.region(spark, dir)
    val out = Files.createTempDirectory("graft_json_").toString
    src.write.mode("overwrite").json(out)
    spark.read.schema(src.schema).json(out)
      .orderBy("r_regionkey")
  }

  /** parquet -> ORC -> read back (columnar alternative; ORC ships with
    * Spark). Schema carries in the ORC footer — no explicit pass. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.supplier(spark, dir)
    val out = Files.createTempDirectory("graft_orc_").toString
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
    jdbc.write(Tables.nation(spark, dir), "nation")
    jdbc.read(spark, "nation").orderBy("n_nationkey")
    // the in-memory db dies with the JVM; each call uses a fresh name
  }

  /** document corpus -> line-oriented text files -> read back. The text
    * source yields one `value` column per line (the corpus is
    * newline-free ASCII, so lines == documents). */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("text"))
    val out = Files.createTempDirectory("graft_text_").toString
    src.write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(col("value"), length(col("value")).cast("bigint").as("n_chars"))
      .orderBy("value")
  }
}
