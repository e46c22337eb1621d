package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SnapshotLog

/** Dev-only probe (SURVEY §6b shape): does SQL row-level DML cost
  * track the MATCHED rows or the TABLE SIZE? Builds a key-clustered
  * graft-log table at increasing scale factors, registers it, and
  * runs the SAME narrow-band statements at every scale:
  *
  *  - `UPDATE ... WHERE key band` (SupportsDelta: vectors + staged
  *    inserts) — pre-delta this was a full-table rewrite.
  *  - `DELETE ... WHERE key band` (SupportsDelete: metadata-translated
  *    vectors).
  *  - `MERGE INTO` with a fixed 1k-key source.
  *
  * Reports wall time plus files-with-vectors vs files-total. A
  * matched-rows-bound implementation is ~flat across factors; a
  * table-bound one grows linearly. Also probes the STORAGE-PARTITIONED
  * JOIN: the same co-partitioned join with and without
  * `spark.sql.sources.v2.bucketing.enabled` (shuffle vs none).
  * Usage: sbt "runMain graft.tools.DmlProbe <corpusDir> [factors...]"
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 8)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dml] $name: $s%.2f s")
      (r, s)
    }

    def replicated(factor: Int): DataFrame = {
      val o = graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("p"))
      (0 until factor).map(i =>
        o.select((col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
          col("o_orderstatus"), col("p")))
        .reduce(_.unionByName(_))
    }

    factors.foreach { f =>
      val t = java.nio.file.Files.createTempDirectory(s"dml_probe_${f}x_").toString
      val base = replicated(f).repartitionByRange(16 * f, col("o_orderkey"))
      timed(s"${f}x build (${16 * f} key-clustered files)") {
        SnapshotLog.commit(spark, base, t, statsFor = Seq("o_orderkey"))
      }
      val name = s"dml_probe_$f"
      spark.sql(s"CREATE TABLE $name USING `graft-log` OPTIONS (path '$t')")
      timed(s"${f}x UPDATE 1k-key band") {
        spark.sql(s"UPDATE $name SET p = p + 1 WHERE o_orderkey BETWEEN 1 AND 4000")
      }
      timed(s"${f}x DELETE 1k-key band") {
        spark.sql(s"DELETE FROM $name WHERE o_orderkey BETWEEN 8001 AND 12000")
      }
      graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("p"))
        .filter(col("o_orderkey") % 50 === 1).limit(1000)
        .createOrReplaceTempView("dml_probe_src")
      timed(s"${f}x MERGE 1k-key source") {
        spark.sql(
          s"""MERGE INTO $name g USING dml_probe_src s ON g.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET p = s.p + 2
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      val head = SnapshotLog.resolve(t, SnapshotLog.versions(t).last)
      println(s"[dml] ${f}x: ${head.entries.count(_.dv.isDefined)} of " +
        s"${head.entries.size} files carry vectors; " +
        s"versions=${SnapshotLog.versions(t).size}")
      val (n, _) = timed(s"${f}x full read-back count") {
        spark.sql(s"SELECT count(*) FROM $name").collect().head.getLong(0)
      }
      println(s"[dml] ${f}x rows after DML: $n")
      spark.sql(s"DROP TABLE $name")
    }

    // ---- storage-partitioned join: shuffle vs none at the top factor
    val f = factors.max
    val fact = java.nio.file.Files.createTempDirectory(s"spj_probe_fact_").toString
    val dim = java.nio.file.Files.createTempDirectory(s"spj_probe_dim_").toString
    val parts = 32
    timed(s"spj build fact (${f}x, $parts partitions)") {
      SnapshotLog.commit(spark,
        replicated(f).withColumn("b", pmod(col("o_orderkey"), lit(parts))),
        fact, partitionBy = Seq("b"))
    }
    SnapshotLog.commit(spark,
      spark.range(parts).select(col("id").cast("int").as("b"),
        concat(lit("g"), col("id")).as("grp")),
      dim, partitionBy = Seq("b"))
    def join(): Long = spark.read.format("graft-log").load(fact)
      .join(spark.read.format("graft-log").load(dim), Seq("b"))
      .groupBy("grp").agg(sum("p").as("sp")).count()
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed(s"spj ${f}x join WITHOUT bucketing (shuffled)") { join() }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    timed(s"spj ${f}x join WITH bucketing (no shuffle)") { join() }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    spark.stop()
  }
}
