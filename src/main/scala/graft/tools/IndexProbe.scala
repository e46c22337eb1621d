package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{BloomIndex, SnapshotLog}
import graft.sources.LogSourceAudit

/** Dev-only probe (SURVEY §6b): the BLOOM-INDEX point-lookup shape and
  * SHALLOW-CLONE metadata cost at replicated scale.
  *
  * Layout is the worst case for min/max skipping: documents replicated
  * `mult` times with shifted ids, range-clustered by LENGTH — so
  * doc_id (the lookup key) interleaves across every file and bounds
  * alone keep 100% of them. The probe measures a 5-key IN lookup with
  * and without the bloom sidecars (time + files actually opened), and
  * the wall-clock of a shallow clone of the whole table (metadata-only
  * — must not scale with data bytes).
  * Usage: sbt "runMain graft.tools.IndexProbe <sfDir> [mult]"
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
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
      println(f"[indexprobe] $name: $s%.2f s")
      (r, s)
    }

    // text rides along: the lookup projects it, so a file that fails
    // to skip pays REAL decode — the 100 TB shape, not a footer test
    val docs0 = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val maxId = docs0.agg(max("doc_id")).head().getLong(0) + 1L
    val big = (0 until mult).map(i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * maxId)))
      .reduce(_ unionAll _)
      .repartitionByRange(32, col("n_chars"), col("doc_id"))
    val rowsPerFile = math.max(1000L, maxId * mult / 32)

    val tPlain = java.nio.file.Files.createTempDirectory("graft_idxprobe_p_").toString
    val tBloom = java.nio.file.Files.createTempDirectory("graft_idxprobe_b_").toString
    timed(s"commit ${mult}x docs (no index)") {
      SnapshotLog.commit(spark, big, tPlain, statsFor = Seq("doc_id"))
    }
    timed(s"commit ${mult}x docs (bloom on doc_id)") {
      SnapshotLog.commit(spark, big, tBloom, statsFor = Seq("doc_id"),
        props = Some(Map(BloomIndex.ColumnsProp -> "doc_id",
          BloomIndex.ItemsProp -> (rowsPerFile * 2L).toString,
          BloomIndex.FppProp -> "0.01")))
    }
    val rows = SnapshotLog.read(spark, tBloom).count()
    val files = SnapshotLog.resolve(tBloom, 1L).entries.size
    val idxBytes = SnapshotLog.resolve(tBloom, 1L).entries.flatMap(_.idx)
      .map(i => java.nio.file.Files.size(java.nio.file.Paths.get(tBloom, i))).sum
    println(s"[indexprobe] rows=$rows files=$files idxBytes=$idxBytes")

    val keys = Seq(1L, maxId + 7L, 2L * maxId + 13L, 3L * maxId % (mult * maxId), maxId - 1L)
    def lookup(t: String): (Long, Long) = {
      val before = LogSourceAudit.filesOpened.get()
      // project TEXT for the matches: an unskipped file pays its
      // decode, exactly what a fetch-the-document lookup costs
      val n = spark.read.format("graft-log").load(t)
        .filter(col("doc_id").isin(keys: _*))
        .agg(sum(length(col("text")))).head().getLong(0)
      (n, LogSourceAudit.filesOpened.get() - before)
    }
    // warm-up then 3 passes, min wins
    lookup(tPlain); lookup(tBloom)
    val plain = (1 to 3).map(i => timed(s"lookup plain pass$i")(lookup(tPlain))._2).min
    val bloom = (1 to 3).map(i => timed(s"lookup bloom pass$i")(lookup(tBloom))._2).min
    val (pc, pOpened) = lookup(tPlain)
    val (bc, bOpened) = lookup(tBloom)
    require(pc == bc, s"bloom lookup must match plain: $pc vs $bc")
    println(f"[indexprobe] RESULT point-IN(5): plain $plain%.3f s / $pOpened files" +
      f" vs bloom $bloom%.3f s / $bOpened files (sum_len=$pc)")

    // executor-tier probe: force the driver to decline
    SnapshotLog.setProperties(tBloom, Map(BloomIndex.DriverMaxProp -> "0"))
    lookup(tBloom)
    val exec = (1 to 3).map(i => timed(s"lookup bloom-exec pass$i")(lookup(tBloom))._2).min
    val (_, eOpened) = lookup(tBloom)
    println(f"[indexprobe] RESULT executor-tier: $exec%.3f s / $eOpened files")

    // shallow clone: metadata-only, O(files) not O(bytes)
    val dst = java.nio.file.Files.createTempDirectory("graft_idxprobe_c_").toString + "/t"
    val (_, cloneS) = timed("shallow clone")(SnapshotLog.cloneTable(tBloom, dst))
    val cn = SnapshotLog.read(spark, dst).count()
    require(cn == rows, s"clone must read the source's rows: $cn vs $rows")
    println(f"[indexprobe] RESULT clone: $cloneS%.3f s for $rows rows / $files files (zero bytes copied)")

    spark.stop()
  }
}
