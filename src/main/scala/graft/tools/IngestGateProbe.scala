package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe (SURVEY §6b): per-batch cost of the streaming
  * dedup-ingest GATE as the accepted corpus grows. Runs the declared
  * `stream_dedup_ingest` pipeline (graft-log source, one version per
  * trigger) over the given corpus and prints each micro-batch's wall
  * time from the `onBatchMillis` seam. With the r10 bloom gate the
  * per-batch cost is bounded by the BATCH (misses probe the bloom
  * map-side and never touch the destination; only bloom hits ride the
  * exact fp anti-join) — so batch 2's cost over a 64x backlog stays
  * in the same band as batch 0's even though the destination has
  * absorbed two thirds of the corpus by then. The pre-r10 gate
  * anti-joined EVERY batch against a full destination read: cost grew
  * with the accepted corpus.
  * Usage: sbt "runMain graft.tools.IngestGateProbe <corpusDir>"
  *   (<corpusDir> is a testdata dir or a ProbeCorpus output)
  */
object IngestGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.streaming.EventStreams.dedupIngest(spark, dir,
      maxVersionsPerTrigger = Some(1),
      onBatchMillis = (batchId, ms) =>
        println(s"[gate] batch $batchId: $ms ms"))
    val n = out.count()
    println(f"[gate] total: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n lang groups")
    spark.stop()
  }
}
