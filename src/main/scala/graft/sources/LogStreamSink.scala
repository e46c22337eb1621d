package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode
import graft.core.SnapshotLog

/** Structured Streaming SINK side of the `graft-log` source —
  * `df.writeStream.format("graft-log").start(tablePath)` — every
  * micro-batch lands as one snapshot-log commit, EXACTLY ONCE.
  *
  * Exactly-once without any sink-side state: the commit carries an
  * idempotent-writer txn `(queryId -> batchId)` (the log's Delta-style
  * txnAppId/txnVersion rule), so a micro-batch replayed after a crash
  * between "log commit" and "checkpoint advance" is recognized at the
  * head — `batchId <= recorded` — and returns without staging a byte.
  * The streaming checkpoint and the table's own log thus never
  * double-apply a trigger, which is the guarantee `foreachBatch +
  * manual commit` users had to hand-assemble (reference analogue: the
  * pgcp copy loop re-run safety, transport.rb:33-62, generalized to a
  * continuous writer).
  *
  * Output-mode mapping (Delta's):
  *  - Append   -> append commits (new rows only; the log carries the
  *                full history, streams downstream tail it natively).
  *  - Complete -> full-replace commits (each trigger re-publishes the
  *                whole result — the aggregate-refresh shape; previous
  *                snapshots stay time-travelable).
  *  - Update   -> rejected: the log has no row-identity contract on a
  *                bare stream; use foreachBatch + applyChanges (CDC
  *                merge) for keyed upserts.
  *
  * Options: `statsFor` (comma-separated) indexes per-file min/max
  * bounds on every commit so the table's data skipping is live from
  * the first trigger; `txnAppId` overrides the writer identity (two
  * logically-distinct queries restarted from the SAME checkpoint
  * directory keep distinct txn lanes; default is the streaming
  * queryId, which is checkpoint-stable across restarts).
  *
  * Why a V1 `Sink` and not a DSv2 `StreamingWrite`: `addBatch` hands
  * the driver a DataFrame whose physical plan IS the trigger's
  * incremental execution; re-wrapped as a batch frame
  * (`Bridge.batchDfOf` — the foreachBatch shape) it flows through
  * `SnapshotLog.commit`'s existing distributed stage-write +
  * stats + atomic-manifest pipeline unchanged. A per-task
  * `DataWriter` implementation would duplicate exactly that engine
  * to gain nothing: the parquet stage write is already executed by
  * the cluster, only the manifest link is driver-side.
  */
final class LogStreamSink(table: String, parameters: Map[String, String],
                          partitionCols: Seq[String], outputMode: OutputMode)
    extends Sink {

  private val stats: Seq[String] = parameters.get("statsFor").toSeq
    .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // StreamExecution publishes the (checkpoint-stable) query id as a
    // local property on the driver thread running this trigger
    val appId = parameters.getOrElse("txnAppId", {
      val q = spark.sparkContext.getLocalProperty("sql.streaming.queryId")
      require(q != null && q.nonEmpty,
        "graft-log sink: no streaming queryId on this thread — set .option(\"txnAppId\", ...)")
      s"graft-log-sink-$q"
    })
    SnapshotLog.commit(spark, org.apache.spark.sql.graft.Bridge.batchDfOf(data),
      table, append = outputMode == OutputMode.Append(),
      partitionBy = partitionCols, statsFor = stats,
      txn = Some((appId, batchId)))
    ()
  }

  override def toString: String = s"LogStreamSink[$table]"
}
