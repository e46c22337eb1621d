package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only probe (SURVEY §6b): the `graft-log` DSv2 streaming source
  * in its PRODUCTION shape — parquet file sink, distributed, no
  * driver-side capture — versus the declared query's oracle-capture
  * harness (memory sink + driver copy), and versus Spark's vectorized
  * batch scan of the same files. Separates what the SOURCE costs from
  * what the capture harness costs at probe scale.
  * Usage: sbt "runMain graft.tools.LogSourceProbe <corpusDir>"
  */
object LogSourceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[logsrc] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val table = timed("demo table build (3 commits)") {
      graft.streaming.EventStreams.logSourceDemoTable(spark, dir)
    }
    val nRows = graft.core.SnapshotLog.read(spark, table).count()
    println(s"[logsrc] table rows: $nRows")

    // production shape: stream -> parquet file sink (distributed)
    val out = java.nio.file.Files.createTempDirectory("logsrc_out_").toString
    val ck = java.nio.file.Files.createTempDirectory("logsrc_ck_").toString
    timed("stream -> parquet sink (production)") {
      val q = spark.readStream.format("graft-log").load(table)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val streamed = spark.read.parquet(out).count()
    require(streamed == nRows, s"streamed $streamed != $nRows")

    // the same aggregate through the capture harness (declared shape)
    timed("declared query (memory-sink capture)") {
      graft.streaming.EventStreams.logSourceCounts(spark, dir).count()
    }

    // vectorized batch scan of the same committed files, for the
    // row-reader overhead comparison
    timed("batch snapshot read + aggregate") {
      graft.core.SnapshotLog.read(spark, table)
        .groupBy("event_type").agg(count(lit(1)).as("n")).count()
    }

    // CDF mode in production shape: the table takes a mid-history
    // merge; the row-level feed streams to a parquet sink (no driver
    // capture) — a merge is an ordinary micro-batch here
    timed("CDF stream -> parquet sink (merge mid-history)") {
      graft.core.SnapshotLog.merge(spark, table,
        graft.core.SnapshotLog.read(spark, table)
          .filter(col("event_id") % 1000 === 0)
          .withColumn("value", col("value") + 1),
        "event_id")
      val out2 = java.nio.file.Files.createTempDirectory("logsrc_cdf_out_").toString
      val ck2 = java.nio.file.Files.createTempDirectory("logsrc_cdf_ck_").toString
      val q = spark.readStream.format("graft-log")
        .option("readChangeFeed", "true").load(table)
        .writeStream.format("parquet")
        .option("path", out2).option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val fed = spark.read.parquet(out2)
      val byType = fed.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[logsrc] CDF rows by type: $byType")
    }
    spark.stop()
  }
}
