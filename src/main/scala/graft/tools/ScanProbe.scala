package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (SURVEY §6b): the graft-log BATCH relation's read
  * bandwidth — vectorized ColumnarBatch path vs the row-based Group
  * reader vs the plain parquet read of the same files — on a
  * scan-bound aggregate over a replicated fact table. This is the
  * 100 TB default-path question: what does a full-table scan cost per
  * row through each decode shape?
  * Usage: sbt "runMain graft.tools.ScanProbe <sfDir> [facts]"
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val facts = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scanprobe] $name: $s%.2f s ($r)")
      s
    }

    // one log table: orders replicated `facts` times with shifted keys
    val t = java.nio.file.Files.createTempDirectory("graft_scanprobe_").toString
    val orders = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
    val big = (0 until facts).map(i =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * maxKey)))
      .reduce(_ unionAll _)
    timed(s"commit ${facts}x orders") {
      graft.core.SnapshotLog.commit(spark,
        big.repartition(16), t, statsFor = Seq("o_orderkey"))
    }
    val n = graft.core.SnapshotLog.read(spark, t).count()
    println(s"[scanprobe] rows: $n")

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)), sum(col("o_totalprice")),
          avg(length(col("o_orderpriority")))).count()

    // warm-up (JIT/codegen), then 3 measured passes each, min wins
    def bench(name: String, df: => org.apache.spark.sql.DataFrame): Double = {
      agg(df)
      (1 to 3).map(i => timed(s"$name pass$i")(agg(df))).min
    }

    val colSec = bench("columnar (default)",
      spark.read.format("graft-log").load(t))
    val rowSec = bench("row Group reader (vectorizedRead=false)",
      spark.read.format("graft-log").option("vectorizedRead", "false").load(t))
    val plainSec = bench("plain parquet read of the same files",
      graft.core.SnapshotLog.read(spark, t))
    println(f"[scanprobe] RESULT rows=$n columnar=$colSec%.2f row=$rowSec%.2f " +
      f"plain=$plainSec%.2f speedup=${rowSec / colSec}%.1fx")

    // DELETION-VECTORED leg: a ~1% key-band purge lands partial hits in
    // every file (the table is key-shuffled), so each file carries a dv
    // — the merge-on-read shape every 100 TB table lives in between
    // OPTIMIZEs. The columnar path must hold its lead through the
    // remapped live-position vectors.
    val hi = maxKey * facts
    timed("deleteWhere ~1% key band (dv per file)") {
      graft.core.SnapshotLog.deleteWhere(spark, t,
        graft.core.SnapshotLog.Pred.Between("o_orderkey", 0.0, hi.toDouble / 100.0))
    }
    val nDv = spark.read.format("graft-log").load(t).count()
    println(s"[scanprobe] rows after purge: $nDv")
    val colDvSec = bench("columnar + deletion vectors",
      spark.read.format("graft-log").load(t))
    val rowDvSec = bench("row reader + deletion vectors",
      spark.read.format("graft-log").option("vectorizedRead", "false").load(t))
    println(f"[scanprobe] RESULT_DV rows=$nDv columnar=$colDvSec%.2f " +
      f"row=$rowDvSec%.2f speedup=${rowDvSec / colDvSec}%.1fx")
    spark.stop()
  }
}
