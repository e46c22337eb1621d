package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Scale-shape assertions for the round-6 streaming reworks (VERDICT r5
  * "what's wrong" #1/#2): the interval join's driver capture must be
  * aggregate-sized with the match volume living in the parquet sink,
  * and flatSessions' residual state must be bounded by the watermark
  * (everything older flushed in-stream by the event-time timeout). */
class StreamShapeSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("intervalJoin: match volume lands in the parquet sink, result is aggregate-sized") {
    val resultDf = EventStreams.intervalJoin(spark, sf)
    val result = resultDf.collect()
    // The read-back aggregate scans ONLY p_ts from the match files —
    // column pruning reaches the sink scan (the Scaladoc's claim).
    val plan = resultDf.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<p_ts"),
      s"read-back must prune to p_ts; plan:\n$plan")
    // The sink (re-run overwrites the same stable dir) holds ONE row per
    // match — the batch interval join is the ground truth for how many.
    val matches = EventStreams.intervalJoinMatches(spark, sf)
    val sinkRows = matches.count()
    val e = graft.core.Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batchMatches = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES")).count()
    assert(sinkRows == batchMatches,
      s"sink must hold every match exactly once ($sinkRows vs $batchMatches)")
    // Driver-held result: one row per hour bucket, counts summing to the
    // match volume — the capture is aggregate-sized, not match-sized.
    assert(result.map(_.getLong(1)).sum == batchMatches)
    assert(result.length <= sinkRows)
    val distinctHours = matches
      .select(date_trunc("hour", col("p_ts"))).distinct().count()
    assert(result.length == distinctHours)
  }

  test("flatSessions: residual state is only tails the watermark hasn't passed") {
    val gapMin = 30
    val (inStream, tails) = EventStreams.flatSessionsParts(spark, sf, gapMin)
    val inStreamRows = inStream.collect()
    val tailRows = tails.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Everything adds up to the batch sessionization (the oracle shape).
    val batch = graft.ops.Events.sessionize(spark, sf)
      .select(col("user_id"), col("start_us"), col("end_us")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(inStreamRows.length + tailRows.length == batch.size,
      "in-stream emissions + state-store tails must cover every session exactly once")
    // The timeout flushed old sessions in-stream: residual state holds
    // ONLY sessions still inside the watermark's reach at stream end —
    // last event newer than maxTs - watermark(1h) - gap.
    assert(tailRows.nonEmpty && inStreamRows.nonEmpty)
    val maxUs = graft.core.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val horizonUs = maxUs - 3600L * 1000000L - gapMin * 60L * 1000000L
    tailRows.foreach { case (uid, startUs, _) =>
      val lastUs = batch((uid, startUs))
      assert(lastUs >= horizonUs,
        s"user $uid session at $startUs (last $lastUs) should have been " +
          s"timeout-flushed in-stream (horizon $horizonUs)")
    }
  }

  test("leftOuterJoin: null rows flush on watermark eviction and equal the batch left join") {
    val rows = EventStreams.leftOuterJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // the outer semantics actually fired: some clicks went unmatched
    assert(rows.map(_.getAs[Long]("n_unmatched")).sum > 0,
      "corpus must produce unmatched clicks or the outer join is vacuous")
    // batch replay with the identical min-side watermark horizon
    val e = graft.core.Tables.events(spark, sf)
    val wmMs = e.filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .agg(min(expr("m div 1000"))).head().getLong(0)
    val horizonUs = (wmMs - 3600000L) * 1000 - 1000
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .filter(unix_micros(col("c_ts")) + 1800L * 1000000 < horizonUs)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy(window(col("c_ts"), "1 hour").as("w"))
      .agg(count(col("p_ts")).as("n_pairs"),
           sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
              col("n_pairs"), col("n_unmatched"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.length == batch.size)
    rows.foreach { r =>
      assert(batch(r.getLong(0)) == ((r.getLong(1), r.getLong(2))),
        s"window ${r.getLong(0)} differs from the batch left join")
    }
  }

  test("fullOuterJoin: click side agrees with leftOuterJoin; purchase-only rows exist") {
    val full = EventStreams.fullOuterJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val left = EventStreams.leftOuterJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the unmatched-click count is identical per window (same rows, same
    // bucket); matched can only SHRINK under full's extra p-side horizon
    left.foreach { case (w, (nPairs, nUnmatched)) =>
      val (m, co, _) = full.getOrElse(w, (0L, 0L, 0L))
      assert(co == nUnmatched, s"window $w: click-only $co vs left-outer unmatched $nUnmatched")
      assert(m <= nPairs, s"window $w: full matched $m exceeds left pairs $nPairs")
    }
    // both abandonment directions are exercised by the corpus
    assert(full.values.map(_._3).sum > 0, "no purchase-only rows — full-outer is vacuous")
    assert(full.values.map(_._2).sum > 0, "no click-only rows")
  }
}
