package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{CopyPipeline, ParquetDir}
import graft.core.CopyPipeline.CopyOptions

/** Minimal user-facing copy command — the analogue of the reference's
  * Thor CLI (bin/pgcp + lib/pgcp_runner.rb:7-54: `cp -s <src> -d
  * <dest> -t <table-or-glob> [-f schema]`). Here source/dest are
  * parquet directories (the sandbox backend); a production deployment
  * substitutes JdbcSource by URL scheme.
  *
  *   runMain graft.tools.Cli cp <srcDir> <destDir> <tableOrGlob>
  *       [--if-not-exists] [--columns a,b,c]
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
      "usage: cp <srcDir> <destDir> <tableOrGlob> [--if-not-exists] [--columns a,b,c]")
    val Array(_, srcDir, destDir, tableArg) = args.take(4)
    val flags = args.drop(4)
    val ifNotExists = flags.contains("--if-not-exists")
    val columns = flags.sliding(2).collectFirst {
      case Array("--columns", cs) => cs.split(',').toSeq
    }
    val opts = CopyOptions(columns = columns, ifNotExists = ifNotExists)
    val src = new ParquetDir(srcDir)
    val dest = new ParquetDir(destDir)
    val results =
      if (tableArg.contains("*"))
        CopyPipeline.copyTables(spark, src, dest, tableArg, opts)
      else
        Seq(CopyPipeline.copyTable(spark, src, dest, tableArg, None, opts))
    results.foreach { r =>
      val verb = if (r.skipped) "skipped (exists)" else "copied"
      System.err.println(s"[cli] $verb ${r.table}: ${r.rows} rows, ${r.columns} cols")
    }
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
    try run(spark, args)
    finally spark.stop()
  }
}
