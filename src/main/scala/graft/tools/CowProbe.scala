package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe (SURVEY §6b): does the file-pruned copy-on-write
  * merge's cost track the TOUCHED files or the TABLE SIZE? Builds a
  * key-clustered, key-indexed log table at increasing scale factors
  * (orders replicated with shifted keys), applies the SAME fixed-size
  * narrow-key CDC batch at every scale, and reports wall time plus
  * files rewritten vs files total. The pre-r10 merge rewrote the
  * whole table (time grows with scale); the pruned merge rewrites the
  * handful of overlapping files (time ~flat). A bounds-less control
  * table shows the conservative fallback (full rewrite) for contrast.
  * Usage: sbt "runMain graft.tools.CowProbe <corpusDir> [factors...]"
  */
object CowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 8)
    val spark = SparkSession.builder()
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
      println(f"[cow] $name: $s%.2f s")
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

    // the SAME narrow CDC batch at every scale: 1k keys in [1, 4000]
    def cdcBatch(): DataFrame =
      graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("p"))
        .filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("p") + 1).as("p"))

    factors.foreach { f =>
      val t = java.nio.file.Files.createTempDirectory(s"cow_probe_${f}x_").toString
      val base = replicated(f).repartitionByRange(16 * f, col("o_orderkey"))
      timed(s"${f}x build (commit, ${16 * f} key-clustered files)") {
        graft.core.SnapshotLog.commit(spark, base, t, statsFor = Seq("o_orderkey"))
      }
      val nRows = graft.core.SnapshotLog.resolve(t, 1L).entries.map(_.rows).sum
      val (v, secs) = timed(s"${f}x merge (fixed 1k-key batch)") {
        graft.core.SnapshotLog.merge(spark, t, cdcBatch(), "o_orderkey")
      }
      val rec = graft.core.SnapshotLog.readRecord(t, v)
      val total = graft.core.SnapshotLog.resolve(t, v).entries.size
      println(f"[cow] ${f}x: rows=$nRows rewrote=${rec.removes.size} of $total files " +
        f"in $secs%.2f s (record lists ${rec.removes.size + rec.adds.size} entries)")
      graft.core.TempDirs.deleteRecursively(new java.io.File(t))
    }

    // ---- deletes: merge-on-read (deletion vectors) vs copy-on-write.
    // A narrow PRICE band on a KEY-clustered table matches a few rows
    // in EVERY file — the COW worst case (rewrite everything) and the
    // DV best case (tiny sidecar, zero rewrites).
    val fDel = factors.max
    def delTable(): String = {
      val t = java.nio.file.Files.createTempDirectory(s"dv_probe_${fDel}x_").toString
      graft.core.SnapshotLog.commit(spark,
        replicated(fDel).repartitionByRange(16 * fDel, col("o_orderkey")),
        t, statsFor = Seq("o_orderkey"))
      t
    }
    locally {
      val t = delTable()
      val nFiles = graft.core.SnapshotLog.resolve(t, 1L).entries.size
      val (v, secs) = timed(s"${fDel}x deleteWhere (price band, dv sidecar)") {
        graft.core.SnapshotLog.deleteWhere(spark, t,
          graft.core.SnapshotLog.Pred.Between("p", 50000.0, 50500.0))
      }
      val rec = graft.core.SnapshotLog.readRecord(t, v)
      val dead = rec.adds.map(_.dvRows).sum
      val dvBytes = rec.adds.flatMap(_.dv).distinct.map { d =>
        val dir = new java.io.File(t, d)
        Option(dir.listFiles()).map(_.map(_.length()).sum).getOrElse(0L)
      }.sum
      println(f"[cow] dv-delete ${fDel}x: $dead rows across ${rec.adds.size} of $nFiles " +
        f"files marked dead in $secs%.2f s - 0 data files rewritten, " +
        f"${dvBytes / 1024} KiB of sidecar written")
      graft.core.TempDirs.deleteRecursively(new java.io.File(t))
    }
    locally {
      val t = delTable()
      val deletes = graft.core.SnapshotLog.read(spark, t)
        .filter(col("p").between(50000.0, 50500.0))
        .select(col("o_orderkey"), col("o_orderstatus"), col("p"))
        .withColumn("op", lit("D"))
      val (v, secs) = timed(s"${fDel}x COW delete of the same rows (applyChanges)") {
        graft.core.SnapshotLog.applyChanges(spark, t, deletes, "o_orderkey")
      }
      val rec = graft.core.SnapshotLog.readRecord(t, v)
      println(f"[cow] cow-delete ${fDel}x: rewrote ${rec.removes.size} files " +
        f"(${rec.adds.map(_.bytes).sum / 1048576} MiB re-written) in $secs%.2f s")
      graft.core.TempDirs.deleteRecursively(new java.io.File(t))
    }

    // control: the bounds-less table cannot prune — full rewrite
    val fMax = factors.max
    val tc = java.nio.file.Files.createTempDirectory(s"cow_probe_ctl_").toString
    timed(s"${fMax}x control build (NO key index)") {
      graft.core.SnapshotLog.commit(spark,
        replicated(fMax).repartitionByRange(16 * fMax, col("o_orderkey")), tc)
    }
    val (vc, secsC) = timed(s"${fMax}x control merge (bounds-less: full rewrite)") {
      graft.core.SnapshotLog.merge(spark, tc, cdcBatch(), "o_orderkey")
    }
    val recC = graft.core.SnapshotLog.readRecord(tc, vc)
    println(f"[cow] control ${fMax}x: rewrote=${recC.removes.size} files in $secsC%.2f s")
    graft.core.TempDirs.deleteRecursively(new java.io.File(tc))
    spark.stop()
  }
}
