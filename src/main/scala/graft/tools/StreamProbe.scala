package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.EventStreams

/** Dev-only probe (SURVEY §6b): drive the stateful streaming queries
  * over a time-sliced events backlog one file per trigger and record
  * per-batch state-store metrics, to show state stays BOUNDED across
  * batches — the property that lets each query run forever on an
  * unbounded stream. Usage:
  *   sbt "runMain graft.tools.StreamProbe /root/testdata/sf0.1 8"
  * Prints a markdown table: per query, per batch, input rows / state
  * rows / state bytes.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nSlices = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Time-sliced backlog: nSlices ascending-range part files with
    // ascending mod times, so the file source (oldest first, one file
    // per trigger) replays the stream in event-time order — the
    // StreamMultiBatchSpec recipe at probe scale.
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val mm = raw.agg(min("ts"), max("ts")).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val step = (hi - lo) / nSlices + 1
    val corpus = Files.createTempDirectory("graft_probe_").toString
    val evDir = new java.io.File(corpus, "events.parquet")
    evDir.mkdirs()
    (0 until nSlices).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_probe_part$i").toString
      raw.filter(col("ts") >= lo + i * step && col("ts") < lo + (i + 1) * step)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      // a slice with zero events (sparse corpus / too many slices)
      // writes no part file — skip it rather than die on .get
      new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .foreach { part =>
          val dest = new java.io.File(evDir, f"part-$i%05d.parquet")
          Files.copy(part.toPath, dest.toPath)
          require(dest.setLastModified(3600000L * (i + 1)))
        }
    }

    // One listener for the whole run; queries run sequentially and the
    // label is switched between them (listener bus is async — drain
    // with a short wait after each query).
    final case class BatchRow(label: String, batchId: Long, inputRows: Long,
        stateRows: Long, stateBytes: Long)
    val rows = scala.collection.mutable.ArrayBuffer[BatchRow]()
    @volatile var label = ""
    @volatile var seen = 0
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        rows.synchronized {
          val st = e.progress.stateOperators
          rows += BatchRow(label, e.progress.batchId, e.progress.numInputRows,
            st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum)
          seen += 1
        }
    }
    spark.streams.addListener(listener)

    def run(name: String)(f: => Long): Unit = {
      label = name
      val before = seen
      val t0 = System.nanoTime()
      val n = f
      // drain the async listener bus before switching labels
      val deadline = System.currentTimeMillis() + 15000
      while (seen == before && System.currentTimeMillis() < deadline) Thread.sleep(100)
      Thread.sleep(1500)
      System.err.println(f"[probe] $name done: $n rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    run("tumbling_complete")(EventStreams.tumbling(spark, corpus, Some(1)).count())
    run("tumbling_append_pq")(EventStreams.tumblingToParquet(spark, corpus, Some(1)).count())
    run("flat_sessions")(EventStreams.flatSessions(spark, corpus, maxFilesPerTrigger = Some(1)).count())
    run("sessions_complete")(EventStreams.sessionWindows(spark, corpus, Some(1)).count())
    run("sessions_append_pq")(EventStreams.sessionsToParquet(spark, corpus, Some(1)).count())
    run("dedup")(EventStreams.dedupedCounts(spark, corpus, Some(1)).count())
    run("interval_join")(EventStreams.intervalJoin(spark, corpus, Some(1)).count())
    run("outer_join")(EventStreams.leftOuterJoin(spark, corpus, Some(1)).count())
    run("full_outer_join")(EventStreams.fullOuterJoin(spark, corpus, Some(1)).count())
    spark.streams.removeListener(listener)

    println("| query | batch | input rows | state rows | state MB |")
    println("|---|---|---|---|---|")
    rows.synchronized {
      rows.groupBy(_.label).toSeq
        .sortBy(g => rows.indexWhere(_.label == g._1)).foreach { case (l, rs) =>
          rs.sortBy(_.batchId).foreach { r =>
            println(f"| $l | ${r.batchId} | ${r.inputRows} | ${r.stateRows} | ${r.stateBytes / 1e6}%.2f |")
          }
        }
    }
    spark.stop()
    System.exit(0)
  }
}
