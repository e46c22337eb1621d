package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus table accessors (TESTDATA.md layout: `$dir/<name>.parquet`).
  * Plain parquet reads so Catalyst keeps pushdown + pruning. */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")

  /** `events.ts` has shipped in two forms across corpus regens:
    * TIMESTAMP(NANOS) — illegal for Spark's vectorized reader, read as
    * LongType nanos under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (all sessions set it) — and, since the 2026-08-13 regen, native
    * timestamp[us] (surfacing as TimestampNTZ; see CorpusContractSpec).
    * Dispatch on the read-back type: nanos normalize to a timestamp via
    * INTEGER division (`div` — a double-math /1000 would lose precision
    * above 2^53 ns; the corpus is µs-grain so this is lossless), any
    * timestamp flavor just casts. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
