package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** flatSessions across MULTIPLE micro-batches (VERDICT r3 #5): the
  * events backlog split into 3 time-range part files consumed
  * oldest-first one file per trigger, so sessions straddling batch
  * boundaries must merge through the carried OpenSession state. Output
  * must equal the single-batch run bit-for-bit. */
class StreamMultiBatchSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  /** Corpus dir whose events.parquet is a DIRECTORY of 3 part files
    * covering ascending disjoint time ranges, mod-times ascending so
    * the file source (sorted by mod time, oldest first) delivers each
    * key's events in event-time order across batches — the documented
    * cross-batch contract. */
  private def splitCorpus(): String = {
    // `ts` arrives either as LongType nanos (nanosAsLong sessions) or as
    // a native timestamp[us] column (current corpus) — same dual-type
    // dispatch as core/Tables.events. Split on µs since both normalize
    // losslessly to that grain, and write the RAW rows so each part file
    // keeps the original schema the streaming source expects.
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val tsMicros = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val mm = raw.agg(min(tsMicros), max(tsMicros)).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val step = (hi - lo) / 3 + 1
    val corpus = Files.createTempDirectory("graft_mb_").toString
    val evDir = new java.io.File(corpus, "events.parquet")
    evDir.mkdirs()
    (0 until 3).foreach { i =>
      val b0 = lo + i * step
      val b1 = lo + (i + 1) * step
      val tmp = Files.createTempDirectory(s"graft_mb_part$i").toString
      raw.filter(tsMicros >= b0 && tsMicros < b1)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dest = new java.io.File(evDir, f"part-$i%05d.parquet")
      Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(3600000L * (i + 1)), "mod time must be settable")
    }
    corpus
  }

  test("flatSessions over a 3-batch time-split backlog equals the single-batch run") {
    val corpus = splitCorpus()
    // row-count sanity: the split lost nothing
    assert(spark.read.parquet(s"$corpus/events.parquet").count() ==
      spark.read.parquet(s"$sf/events.parquet").count())

    @volatile var dataBatches = 0
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) dataBatches += 1
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val multi =
      try EventStreams.flatSessions(spark, corpus, maxFilesPerTrigger = Some(1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      finally {
        // listener bus is async; give in-flight progress events a beat
        val deadline = System.currentTimeMillis() + 10000
        while (dataBatches < 3 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        spark.streams.removeListener(listener)
      }
    assert(dataBatches >= 3,
      s"expected the 3-file backlog to span >= 3 data micro-batches, saw $dataBatches")

    val single = EventStreams.flatSessions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(multi == single,
      "multi-batch sessions must equal the single-batch result")
    assert(multi.nonEmpty)
  }

  test("asofToParquet over the 3-batch backlog equals the single-batch run") {
    // the enrichment is a pure per-row function of the static click
    // table, so ANY micro-batch split must produce the identical sink —
    // each batch rides the native as-of operator independently
    val corpus = splitCorpus()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq.sortBy(t => (t._1, t._2))
    val multi = rows(EventStreams.asofToParquet(spark, corpus, Some(1)))
    val single = rows(EventStreams.asofToParquet(spark, sf))
    assert(multi == single,
      "micro-batch split must not change the as-of enrichment")
    assert(multi.nonEmpty && multi.exists(_._4 >= 0L),
      "some purchases must carry a prior click")
  }

  test("snapshotIngest lands one append commit per data batch; head equals single-batch") {
    val corpus = splitCorpus()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val multi = rows(EventStreams.snapshotIngest(spark, corpus, Some(1)))
    // one version per non-empty micro-batch: the 3-file backlog must
    // have produced >= 3 committed versions in the log
    val table = graft.core.TempDirs.stable(s"snap_ingest:$corpus")
    val vs = graft.core.SnapshotLog.versions(table)
    assert(vs.size >= 3, s"expected >= 3 append commits, log has $vs")
    // every version's file list is a superset of its predecessor's
    vs.sliding(2).foreach {
      case Seq(a, b) =>
        val fa = graft.core.SnapshotLog.readManifest(table, a).files.toSet
        val fb = graft.core.SnapshotLog.readManifest(table, b).files.toSet
        assert(fa.subsetOf(fb), s"append v$b must carry v$a's files forward")
      case _ => ()
    }
    val single = rows(EventStreams.snapshotIngest(spark, sf))
    assert(multi == single,
      "append-committed micro-batches must union to the single-batch result")
    assert(multi.nonEmpty)
  }

  test("leftOuterJoin over the 3-batch backlog equals the single-batch run") {
    // Null emission happens at DIFFERENT times in the two runs (mid-
    // stream evictions as the watermark advances batch-by-batch vs one
    // end-of-stream flush), but the horizon-filtered result must be
    // identical — emission time is an implementation detail, the
    // emitted SET is the contract.
    val corpus = splitCorpus()
    val multi = EventStreams.leftOuterJoin(spark, corpus, Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val single = EventStreams.leftOuterJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(multi == single,
      "multi-batch outer-join result must equal the single-batch result")
    assert(multi.nonEmpty)
  }

  test("fullOuterJoin over the 3-batch backlog equals the single-batch run") {
    // The purchase-side eviction (p_ts < wm, no inner/left precedent)
    // must also hold across incremental watermark advance: a purchase
    // must never be emitted as unmatched while its matching click can
    // still arrive (time-ordered replay guarantees the click came in an
    // earlier-or-same batch; this pins it).
    val corpus = splitCorpus()
    val multi = EventStreams.fullOuterJoin(spark, corpus, Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val single = EventStreams.fullOuterJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(multi == single,
      "multi-batch full-outer result must equal the single-batch result")
    assert(multi.nonEmpty)
  }
}
