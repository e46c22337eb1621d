package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{CopyPipeline, ParquetDir}
import graft.core.CopyPipeline.CopyOptions

/** Minimal user-facing copy command — the analogue of the reference's
  * Thor CLI (bin/pgcp + lib/pgcp_runner.rb:7-54: `cp -s <src> -d
  * <dest> -t <table-or-glob> [-c config] [-f schema] [-l log]`). Here
  * source/dest are parquet directories (the sandbox backend); a
  * production deployment substitutes JdbcSource by URL scheme.
  *
  *   runMain graft.tools.Cli cp <srcDir> <destDir> <tableOrGlob>
  *       [--if-not-exists] [--columns a,b,c] [--skip-indexes]
  *       [--force-schema ns] [--config file.properties] [--log file]
  *
  * Flag parity with the reference:
  *   --force-schema <ns>  overrides the DESTINATION namespace
  *       (pgcp_runner.rb:14,33-35 -> transport.rb:41); the namespace is
  *       created first (CREATE SCHEMA IF NOT EXISTS, transport.rb:46).
  *   --config <file>      java-properties file of named locations
  *       (the analogue of ~/.pgcp.yml, pgcp_runner.rb:12,17-23,46-53):
  *       src/dest arguments matching a key resolve to its value, so
  *       `cp prod scratch 'line*' --config dbs.properties` works like
  *       the reference's named DB configs. Non-matching args stay
  *       literal paths.
  *   --log <file>         appends one result line per table
  *       (pgcp_runner.rb:15,19 -> Pgcp.log_file=).
  *
  * Glob handling mirrors pgcp_runner.rb:27-37: a '*' in the table
  * argument fans out over matching source tables; otherwise one table
  * copies. Unlike the reference (which swallows every exception into a
  * log line, pgcp_runner.rb:38-41), failures PROPAGATE with a nonzero
  * exit — a CI-callable copy must fail loudly.
  */
object Cli {
  def run(spark: SparkSession, args: Array[String]): Seq[CopyPipeline.CopyResult] = {
    require(args.length >= 4 && args(0) == "cp",
      "usage: cp <srcDir> <destDir> <tableOrGlob> [--if-not-exists] " +
        "[--columns a,b,c] [--skip-indexes] [--force-schema ns] " +
        "[--config file] [--log file]")
    val Array(_, srcArg, destArg, tableArg) = args.take(4)
    val flags = args.drop(4)
    def flagValue(name: String): Option[String] = flags.sliding(2).collectFirst {
      case Array(`name`, v) => v
    }
    val config: Map[String, String] = flagValue("--config") match {
      case None => Map.empty
      case Some(f) =>
        val p = new java.util.Properties()
        val in = new java.io.FileInputStream(f)
        try p.load(in) finally in.close()
        val b = Map.newBuilder[String, String]
        p.stringPropertyNames().forEach(k => b += k -> p.getProperty(k))
        b.result()
    }
    val srcDir = config.getOrElse(srcArg, srcArg)
    val destDir = config.getOrElse(destArg, destArg)
    val forceSchema = flagValue("--force-schema")
    val opts = CopyOptions(
      columns = flagValue("--columns").map(_.split(',').toSeq),
      ifNotExists = flags.contains("--if-not-exists"),
      skipIndexes = flags.contains("--skip-indexes"),
      destNamespace = forceSchema)
    val src = new ParquetDir(srcDir)
    val dest = new ParquetDir(destDir)
    forceSchema.foreach(dest.createNamespace) // CREATE SCHEMA IF NOT EXISTS
    val results =
      if (tableArg.contains("*"))
        CopyPipeline.copyTables(spark, src, dest, tableArg, opts)
      else
        Seq(CopyPipeline.copyTable(spark, src, dest, tableArg, None, opts))
    val log = flagValue("--log").map(f =>
      new java.io.PrintWriter(new java.io.FileWriter(f, true)))
    try results.foreach { r =>
      val verb = if (r.skipped) "skipped (exists)" else "copied"
      val line = s"[cli] $verb ${r.table}: ${r.rows} rows, ${r.columns} cols"
      System.err.println(line)
      log.foreach(_.println(line))
    } finally log.foreach(_.close())
    results
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail loudly AND promptly: exit codes for CI, System.exit so a
    // leaked non-daemon thread can't turn a finished copy into a hang
    // (same discipline as Verify/Bench)
    val code =
      try { run(spark, args); 0 }
      catch { case e: Throwable => System.err.println(s"[cli] FAILED: ${e.getMessage}"); 1 }
      finally spark.stop()
    System.exit(code)
  }
}
