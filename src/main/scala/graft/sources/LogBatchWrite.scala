package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import graft.core.SnapshotLog

/** WRITE side of the `graft-log` DSv2 source —
  * `df.write.format("graft-log").mode("append"|"overwrite").save(t)`
  * — landing every write as a snapshot-log commit: staged immutable
  * parquet plus an atomic manifest record, with per-file stats,
  * hive partitioning, idempotent-writer txns, and maintenance
  * commits all riding the same options surface the library API has.
  *
  * Deliberately a `V1Write` (Spark's InsertableRelation fallback,
  * the shape Delta shipped on for years): `SnapshotLog.commit`
  * already IS a distributed write — executors stage the parquet
  * (`df.write.parquet` under the stage uuid), one driver-side pass
  * derives per-file entries, and the commit is an atomic manifest
  * link. A hand-rolled `BatchWrite` with per-task `DataWriter`s
  * would re-implement exactly that pipeline (minus the tested
  * stats/txn/conflict logic) for zero additional parallelism.
  *
  * Mode mapping: `append` -> log append commit (creates the table at
  * v1 if the log is empty); `overwrite` -> full replace commit (the
  * old snapshot stays time-travelable — this is a log, not an rm).
  * `errorifexists`/`ignore` are rejected by Spark for path-based v2
  * sources before reaching us, as for other DSv2 providers.
  *
  * Options:
  *  - `statsFor` (comma-separated columns): record per-file min/max
  *    bounds so batch reads manifest-prune on these columns.
  *  - `txnAppId` + `txnVersion` (set together): idempotent-writer
  *    transaction — a replayed (appId, version <= applied) write is
  *    a no-op, the foreachBatch exactly-once contract.
  *  - `dataChange` (boolean, default true): false marks the commit
  *    as maintenance (content-identical by contract) — streams and
  *    change feeds skip it.
  *
  * `df.write.partitionBy(...)` arrives through the provider's
  * external-metadata path as identity transforms and stages a hive
  * `col=value` layout; the batch relation restores the columns and
  * prunes the directories.
  */
final class LogWriteBuilder(table: String, partitionBy: Seq[String],
                            info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit = {
          val o = info.options()
          val stats = Option(o.get("statsFor")).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
          val txn = (Option(o.get("txnAppId")), Option(o.get("txnVersion"))) match {
            case (Some(a), Some(v)) => Some((a, v.toLong))
            case (None, None) => None
            case _ => sys.error(
              "graft-log write: txnAppId and txnVersion must be set together")
          }
          SnapshotLog.commit(data.sparkSession, data, table,
            append = !overwrite, partitionBy = partitionBy,
            statsFor = stats, txn = txn,
            dataChange = o.getBoolean("dataChange", true))
          ()
        }
      }
  }
}
