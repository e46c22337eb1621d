package graft.sources

import java.util.{Map => JMap, Set => JSet}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.core.SnapshotLog

/** Structured Streaming SOURCE over the snapshot log's change feed —
  * `spark.readStream.format("graft-log").load(tablePath)` — the DSv2
  * `MicroBatchStream` shape Delta/Iceberg use for native log-backed
  * streams. Offsets ARE log versions: micro-batch (start, end] reads
  * exactly the files the append commits in that version range
  * introduced (the commit records themselves carry the delta — no
  * file diffing, no directory listing, no data rewrite). The
  * streaming checkpoint persists the version watermark, so a restart
  * resumes at the committed offset and each appended row is delivered
  * exactly once — the native twin of `SnapshotLog.pollChanges`.
  *
  * Options:
  *  - `maxVersionsPerTrigger` (long): admission control — cap how
  *    many log versions one micro-batch may cover; the backlog drains
  *    across several batches (bounded per-trigger work, the
  *    maxFilesPerTrigger analogue).
  *  - `startingVersion` (long): begin the CHANGES-ONLY stream at this
  *    log version instead of version 1 (Delta's startingVersion
  *    analogue) — versions before it are never delivered. This is the
  *    escape hatch for a table whose early history was vacuumed (its
  *    snapshot lives only in a checkpoint, so a from-the-beginning
  *    stream is impossible): start at the OLDEST SURVIVING version —
  *    if that version is a full replace commit it is delivered as the
  *    stream's initial snapshot (the same allowance a fresh stream
  *    gets at v1) — and treat the stream as incremental-from-there.
  *  - `skipChangeCommits` (boolean): skip data-changing rewrite
  *    commits (merge / CDC-apply) instead of failing — Delta's
  *    skipChangeCommits. The consumer sees appends only and accepts
  *    that updated/deleted rows it already received stay as-delivered.
  *  - `readChangeFeed` (boolean): stream the ROW-LEVEL change feed
  *    instead of plain appended rows (Delta's CDF streaming mode).
  *    Every row carries `_change_type` ("insert" for append/initial-
  *    snapshot rows; the recorded "upsert"/"update"/"delete" rows for
  *    rewrite commits, read from their `cdc/` change-data files) and
  *    `_commit_version` (the producing version — the ordering key for
  *    applying a mixed feed). In this mode a merge is just another
  *    micro-batch, not a stream-killing wall: the downstream consumer
  *    applies upserts and deletes in version order.
  *
  * Semantics notes:
  *  - The INITIAL batch may start with a replace commit (the common
  *    create-then-append table shape): versions (0, e] then read the
  *    initial snapshot plus subsequent appends, which is exactly
  *    `resolve(e)` because every later version in range is an append.
  *  - MAINTENANCE commits (`dataChange=false`: compaction,
  *    re-clustering) are INVISIBLE: their content is identical by
  *    contract, so the stream skips them — a nightly `Cli optimize`
  *    against a live consumer is a non-event, not a query failure
  *    (Delta marks such commits the same way).
  *  - A data-changing replace or rewrite commit LATER in the stream is
  *    a correctness wall: the rows delivered before it cannot be
  *    un-delivered, so the source fails fast (Delta's default for
  *    updates/deletes under a stream) rather than silently
  *    double-counting — unless `skipChangeCommits` opts out for
  *    rewrites.
  *
  * Reader: each input partition is one immutable parquet data file,
  * read via parquet-hadoop's public example API (`GroupReadSupport`)
  * and converted to Catalyst rows by schema dispatch. Flat schemas
  * only (primitive columns — long/int/double/float/bool/string/
  * binary/date/timestamp/decimal); nested columns and hive-
  * partitioned staged layouts fail fast at scan planning. A file may
  * carry FEWER columns than the evolved table schema — missing
  * columns surface null, matching the batch read's union semantics.
  */
class LogStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  private def tablePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-log needs .load(<table path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val table = tablePath(options)
    val spark = SparkSession.active
    // head snapshot schema (union across evolved stages) — driver-side
    val base = SnapshotLog.read(spark, table).schema
    if (!options.getBoolean("readChangeFeed", false)) base
    else {
      Seq(LogStreamSource.ChangeTypeCol, LogStreamSource.CommitVersionCol)
        .foreach(c => require(!base.fieldNames.contains(c),
          s"table $table already has a column named $c — cannot stream its change feed"))
      base.add(LogStreamSource.ChangeTypeCol, StringType)
        .add(LogStreamSource.CommitVersionCol, LongType)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new LogStreamTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object LogStreamSource {
  /** CDF metadata column names (Delta CDF's). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
}

final class LogStreamTable(table: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-log:$table"
  override def schema(): StructType = schema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LogStreamScan(table, schema,
        Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
        Option(options.get("startingVersion")).map(_.toLong),
        options.getBoolean("skipChangeCommits", false),
        options.getBoolean("readChangeFeed", false))
    }
}

final class LogStreamScan(table: String, schema: StructType,
                          maxVersionsPerTrigger: Option[Long],
                          startingVersion: Option[Long],
                          skipChangeCommits: Boolean = false,
                          readChangeFeed: Boolean = false) extends Scan {
  LogStreamScan.requireFlat(schema)
  override def readSchema(): StructType = schema
  override def description(): String = s"graft-log change feed over $table"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(table, schema, maxVersionsPerTrigger, startingVersion,
      skipChangeCommits, readChangeFeed)
}

object LogStreamScan {
  private[sources] def requireFlat(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => sys.error(
          s"graft-log stream source reads flat schemas only; column ${f.name} is ${f.dataType.simpleString}")
        case _ => ()
      }
    }
}

/** Offset = log version (the change feed's natural watermark). */
final case class LogOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

final class LogMicroBatchStream(table: String, schema: StructType,
                                maxVersionsPerTrigger: Option[Long],
                                startingVersion: Option[Long] = None,
                                skipChangeCommits: Boolean = false,
                                readChangeFeed: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** The version the stream's very first offset rests on — batches
    * starting here may begin with a table-(re)defining replace commit
    * delivered as the initial snapshot. */
  private val initialVersion: Long = startingVersion.map(_ - 1L).getOrElse(0L)

  // AvailableNow pins the head ONCE at query start, so the trigger
  // terminates even while writers keep appending
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(SnapshotLog.latestVersion(table).getOrElse(0L))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = LogOffset(initialVersion)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LogOffset].version
    val head0 = SnapshotLog.latestVersion(table).getOrElse(0L)
    val head = availableNowCap.fold(head0)(math.min(head0, _))
    val end = maxVersionsPerTrigger.fold(head)(m => math.min(head, s + m))
    LogOffset(math.max(s, end))
  }

  override def reportLatestOffset(): Offset =
    LogOffset(SnapshotLog.latestVersion(table).getOrElse(0L))

  override def deserializeOffset(json: String): Offset = {
    val m = "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"malformed graft-log offset: $json"))
    LogOffset(m.group(1).toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].version
    val e = end.asInstanceOf[LogOffset].version
    if (e <= s) return Array.empty
    val range = SnapshotLog.versions(table).filter(v => v > s && v <= e)
    // the batch is EXACTLY the commits (s, e] — if any were vacuumed,
    // their rows can never be delivered, so fail loudly (the Delta
    // versions-no-longer-exist rule) instead of silently dropping
    // them. This also rejects a fresh stream over a table whose
    // initial history was vacuumed (its head lives only in a
    // checkpoint; the records alone cannot reproduce the snapshot).
    val expected = (s + 1) to e
    if (!range.sameElements(expected)) sys.error(
      s"versions ${(expected.toSet -- range.toSet).toSeq.sorted.mkString(",")} of $table " +
        "no longer exist (vacuumed) — the stream cannot deliver their rows. " +
        "To stream the changes still in the log, restart with a fresh " +
        "checkpoint and .option(\"startingVersion\", <oldest surviving version>)")
    val recs = range.map(SnapshotLog.readRecord(table, _))
      // maintenance commits (dataChange=false: compaction/clustering)
      // are content-identical by contract — invisible to the stream,
      // so `Cli optimize` mid-stream is a non-event, not a failure
      .filter(_.dataChange)
    // CDF mode: every data commit has a deliverable row delta — adds
    // tagged insert for appends (and the initial snapshot), the
    // recorded change-data files for rewrites. A merge is an ordinary
    // micro-batch here, not a wall.
    val parts: Seq[LogInputPartition] =
      if (readChangeFeed) recs.flatMap { r =>
        val initialSnapshot =
          s == initialVersion && r.version == range.head && r.removes.isEmpty
        if (r.cdc.nonEmpty)
          r.cdc.filter(_.rows != 0L).map(e => LogInputPartition(
            s"$table/${e.path}", changeType = None, version = r.version))
        else if (r.append || initialSnapshot) {
          requireNoDv(Seq(r))
          r.adds.filter(_.rows > 0).map(e => LogInputPartition(
            s"$table/${e.path}", changeType = Some("insert"), version = r.version))
        }
        else sys.error(
          s"version ${r.version} of $table is a full ${r.kind} commit with no " +
            "recorded change data — its row delta is not derivable; restart " +
            "the stream from a fresh checkpoint")
      }
      else {
        val deliverable = recs.filter { r =>
          if (r.append) true
          // the stream's FIRST batch may begin with a table-(re)defining
          // full replace (its adds ARE the snapshot at that version) — the
          // create-then-append shape, and the vacuum-restart path where
          // the oldest surviving version is a replace
          else if (s == initialVersion && r.version == range.head && r.removes.isEmpty) true
          else if (skipChangeCommits) false // Delta's skipChangeCommits opt-out
          else sys.error(
            s"version ${r.version} of $table is a ${r.kind} commit — a stream " +
              "cannot un-deliver earlier rows; restart the stream from a fresh " +
              "checkpoint, set .option(\"skipChangeCommits\", \"true\") to " +
              "ignore update/delete commits, or stream the row-level feed " +
              "with .option(\"readChangeFeed\", \"true\")")
        }
        requireNoDv(deliverable)
        deliverable.flatMap(r => r.adds.filter(_.rows > 0)
          .map(e => LogInputPartition(s"$table/${e.path}", version = r.version)))
      }
    parts.map(_.absPath).find(_.split("/").exists(_.contains("="))).foreach(f => sys.error(
      s"graft-log stream source does not read hive-partitioned staged layouts: $f"))
    parts.map(p => p: InputPartition).toArray
  }

  /** The per-file reader cannot apply DELETION VECTORS — delivering a
    * dv-carrying entry's raw rows would resurrect deleted data (the
    * shape: a RESTORE re-listing vectored entries lands as a stream's
    * initial snapshot). Fail loudly; the batch read applies vectors. */
  private def requireNoDv(rs: Seq[graft.core.SnapshotLog.CommitRecord]): Unit =
    rs.flatMap(_.adds).find(_.dv.isDefined).foreach(e => sys.error(
      s"entry ${e.path} carries a deletion vector — the stream source " +
        "cannot apply it and raw rows would include deleted data; read the " +
        "snapshot in batch, or OPTIMIZE the table to materialize the " +
        "vectors before streaming from this version"))

  override def createReaderFactory(): PartitionReaderFactory =
    new LogPartitionReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One immutable data file plus the CDF constants its rows carry:
  * `changeType` is Some(tag) when the file itself has no
  * `_change_type` column (append adds tagged "insert"), None when it
  * does (cdc change-data files); `version` fills `_commit_version`. */
final case class LogInputPartition(absPath: String,
                                   changeType: Option[String] = None,
                                   version: Long = 0L) extends InputPartition

final class LogPartitionReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogInputPartition]
    new LogPartitionReader(p.absPath, schema, p.changeType, p.version)
  }
}

/** Row-by-row parquet reader for ONE immutable data file, via the
  * public parquet-hadoop example API. The conversion dispatches on
  * the SPARK type and the file's parquet primitive/logical type, so
  * INT64-micros and INT96 timestamps, all three decimal encodings,
  * and dictionary/plain strings all land correctly in Catalyst
  * representation (micros-since-epoch longs, UTF8String, Decimal). */
final class LogPartitionReader(absPath: String, schema: StructType,
                               changeType: Option[String] = None,
                               version: Long = 0L)
    extends PartitionReader[InternalRow] {

  private val changeTypeUtf8: UTF8String =
    changeType.map(UTF8String.fromString).orNull

  private val reader: ParquetReader[Group] =
    ParquetReader.builder[Group](new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(absPath)).withConf(new Configuration()).build()

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      vals(i) =
        // CDF metadata columns: constants from the commit record when
        // the file itself does not carry them (cdc files DO carry
        // _change_type — their recorded value wins)
        if (f.name == LogStreamSource.CommitVersionCol && !gt.containsField(f.name))
          version
        else if (f.name == LogStreamSource.ChangeTypeCol && !gt.containsField(f.name))
          changeTypeUtf8
        else if (!gt.containsField(f.name)) null // schema evolution: older file
        else {
          val fi = gt.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(fi) == 0) null // null cell
          else convert(g, gt, fi, f.dataType)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def convert(g: Group, gt: GroupType, fi: Int, dt: DataType): Any = {
    val pt = gt.getType(fi).asPrimitiveType()
    dt match {
      case LongType => g.getLong(fi, 0)
      case IntegerType => g.getInteger(fi, 0)
      case ShortType => g.getInteger(fi, 0).toShort
      case ByteType => g.getInteger(fi, 0).toByte
      case DoubleType => g.getDouble(fi, 0)
      case FloatType => g.getFloat(fi, 0)
      case BooleanType => g.getBoolean(fi, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
      case BinaryType => g.getBinary(fi, 0).getBytes
      case DateType => g.getInteger(fi, 0) // days since epoch, both sides
      case TimestampType | TimestampNTZType =>
        pt.getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.INT96 =>
            // legacy 12-byte julian-day + nanos-of-day encoding
            val b = g.getInt96(fi, 0).getBytes
            val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanosOfDay = buf.getLong
            val julianDay = buf.getInt
            (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
          case _ =>
            val raw = g.getLong(fi, 0)
            pt.getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit match {
                  case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
                  case LogicalTypeAnnotation.TimeUnit.NANOS => raw / 1000L
                  case _ => raw // MICROS: Catalyst's native representation
                }
              case _ => raw
            }
        }
      case d: DecimalType =>
        pt.getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.INT32 =>
            Decimal(g.getInteger(fi, 0).toLong, d.precision, d.scale)
          case PrimitiveType.PrimitiveTypeName.INT64 =>
            Decimal(g.getLong(fi, 0), d.precision, d.scale)
          case _ => // FIXED_LEN_BYTE_ARRAY / BINARY: big-endian unscaled
            val unscaled = new java.math.BigInteger(g.getBinary(fi, 0).getBytes)
            Decimal(new java.math.BigDecimal(unscaled, d.scale), d.precision, d.scale)
        }
      case other => sys.error(s"graft-log stream source: unsupported type $other")
    }
  }

  override def close(): Unit = reader.close()
}
