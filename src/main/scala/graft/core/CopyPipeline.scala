package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The reference's entire data path, Spark-first.
  *
  * Reference lifecycle (transport.rb:33-62): create schema -> create
  * dest table -> copy via temp + hotswap -> replay indexes; the single
  * data-bearing query is `COPY (SELECT * FROM t) TO STDOUT`
  * (transport.rb:83-87). Here: `source.read` -> optional
  * project/filter (pushed to the scan by Catalyst) -> staged write ->
  * atomic publish. Deviations from the reference are deliberate bug
  * fixes (SURVEY §2a #11-13): source-side glob listing, real error
  * propagation, no composite-PK truncation.
  *
  * Scale story: each table copy is one Spark job whose parallelism
  * comes from the source partitioning (parquet splits / JDBC range
  * partitions), and the glob fan-out runs table copies CONCURRENTLY
  * (the reference is strictly sequential, one pipe at a time,
  * transport.rb:26-30). At 100 TB the copy is shuffle-free: scan ->
  * (narrow project/filter) -> write, no exchange in the plan.
  */
object CopyPipeline {

  final case class CopyOptions(
      columns: Option[Seq[String]] = None,   // projection copy
      filter: Option[Column] = None,         // predicate copy (pushed down)
      sortWithinPartitions: Option[Seq[String]] = None, // layout for downstream scans
      // Conditional create (reference create_table_if_not_exists,
      // postgres.rb:52-78): when true, a copy whose destination already
      // exists is SKIPPED instead of hotswapped.
      ifNotExists: Boolean = false,
      // Reference copy_table replays source indexes onto the dest AFTER
      // data load unless skip_indexes (transport.rb:49,51-56 — whose
      // `skipe_indexes` typo made the option work only by accident).
      // Applies when source and sink are both JDBC; parquet has no
      // indexes (SURVEY §2a #11).
      skipIndexes: Boolean = false,
      // Reference force_schema (transport.rb:41): override the
      // destination namespace for every copy. ParquetDir namespaces are
      // subdirectories, so the dest table becomes `<ns>/<table>`;
      // callers create the namespace first (CREATE SCHEMA IF NOT
      // EXISTS, transport.rb:46).
      destNamespace: Option[String] = None,
      // Re-read the published destination and cross-check its row count
      // against the write-side observation. OFF by default: at 100 TB
      // the recount re-scans the whole destination, doubling the copy's
      // read volume; the observed count + Spark's atomic commit protocol
      // already say what landed. Turn on for paranoid migrations.
      verifyCount: Boolean = false)

  final case class CopyResult(table: String, rows: Long, columns: Int,
      skipped: Boolean = false)

  /** Attach a row-count observation to `df`: the count rides whatever
    * action executes the frame (CollectMetrics in its plan) — one pass,
    * no separate count job. Returns the observed frame and a thunk that
    * blocks until the action completes and yields the count. */
  private def observedCount(df: DataFrame): (DataFrame, () => Long) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    (observed, () => obs.get("rows").asInstanceOf[Long])
  }

  /** Single-table copy: the flagship operator (reference direct_copy,
    * transport.rb:66-75). Identity projection unless options narrow it. */
  def copyTable(
      spark: SparkSession,
      source: TableSource,
      sink: TableSink,
      table: String,
      destTable: Option[String] = None,
      options: CopyOptions = CopyOptions()): CopyResult = {
    val destBase = destTable.getOrElse(table)
    // namespace qualification is SINK syntax: parquet dirs nest by '/',
    // JDBC schemas qualify by '.'.
    val destName = options.destNamespace match {
      case Some(ns) => sink match {
        case _: JdbcSource => s"$ns.$destBase"
        case _             => s"$ns/$destBase"
      }
      case None => destBase
    }
    if (options.ifNotExists) sink match {
      case s: TableSource if s.tableExists(destName) =>
        // skip-if-exists: report the EXISTING table's shape, untouched
        val existing = s.read(spark, destName)
        return CopyResult(destName, existing.count(), existing.schema.size, skipped = true)
      case _ => ()
    }
    var df = source.read(spark, table)
    options.columns.foreach(cs => df = df.select(cs.map(df.col): _*))
    options.filter.foreach(p => df = df.filter(p))
    options.sortWithinPartitions.foreach { keys =>
      df = df.sortWithinPartitions(keys.map(df.col): _*)
    }
    // Row count rides the WRITE job: one pass over the data, no
    // post-publish re-scan. The reference never verified its copies at
    // all (its exit check was broken, transport.rb:71-74); verifyCount
    // below adds an explicit sink-side recount for copies that want a
    // second, independent pass.
    val (observed, rowsOf) = observedCount(df)
    df = observed
    val dest = destName
    // JDBC->JDBC: pre-create the destination from the SOURCE's column
    // definitions (reference create_dest_table, transport.rb:112-126) —
    // Spark's JDBC auto-create would mark every column nullable, which
    // breaks the PK replay below. Same-engine type names replay
    // verbatim, exactly the reference's format_type passthrough.
    (source, sink) match {
      case (s: JdbcSource, d: JdbcSource) if !d.tableExists(dest) =>
        // A projected copy creates only the projected columns — a full
        // source DDL here would leave unfilled (possibly NOT NULL)
        // columns the insert below can't satisfy.
        val defs = s.columnDefinitions(table)
        val wanted = options.columns match {
          case Some(cs) =>
            val keep = cs.map(_.toLowerCase).toSet
            defs.filter(c => keep.contains(c._1.toLowerCase))
          case None => defs
        }
        d.createTable(dest, wanted)
      case _ => ()
    }
    // A JDBC hotswap (existing dest) drops the dest's indexes with the
    // table — capture them first so a non-JDBC source (which has no
    // indexes of its own to replay) doesn't silently strip the dest.
    val preIndexes: Seq[IndexSpec] = sink match {
      case d: JdbcSource if !options.skipIndexes && d.tableExists(dest) =>
        d.indexesOf(dest)
      case _ => Seq.empty
    }
    sink.write(df, dest)
    // Index replay AFTER data load — the classic bulk-load ordering the
    // reference preserves (transport.rb:49 then :51-56): no per-row
    // index maintenance during the copy. Only indexes the destination
    // lacks are replayed, so re-copying into an existing table doesn't
    // die on duplicate-constraint DDL.
    sink match {
      case d: JdbcSource if !options.skipIndexes =>
        val specs = source match {
          case s: JdbcSource =>
            // source wins (reference flow) — but an index-less JDBC
            // source must not strip the dest's pre-existing indexes
            // either (ADVICE r5): fall back like the non-JDBC branch.
            val si = s.indexesOf(table)
            if (si.nonEmpty) si else preIndexes
          case _ => preIndexes // preserve dest's own
        }
        if (specs.nonEmpty) {
          val have = d.indexesOf(dest).map(x => (x.columns, x.unique, x.primary)).toSet
          val missing = specs.filter(x => !have((x.columns, x.unique, x.primary)))
          if (missing.nonEmpty) d.replayIndexes(missing, dest)
        }
      case _ => ()
    }
    val rows = rowsOf()
    if (options.verifyCount) sink match {
      case s: TableSource =>
        val landed = s.read(spark, dest).count()
        require(landed == rows,
          s"copy verification failed for $dest: wrote $rows rows, sink holds $landed")
      case _ => ()
    }
    CopyResult(dest, rows, df.schema.size)
  }

  /** Glob fan-out (reference copy_tables, transport.rb:20-31) with the
    * dest-vs-src listing bug fixed: matches are found on the SOURCE.
    * Copies run concurrently — independent Spark jobs share the
    * cluster; the scheduler interleaves their stages. */
  def copyTables(
      spark: SparkSession,
      source: TableSource,
      sink: TableSink,
      glob: String,
      options: CopyOptions = CopyOptions(),
      parallelism: Int = 4): Seq[CopyResult] = {
    val re = globToRegex(glob)
    val matches = source.listTables().filter(t => re.matches(t))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = matches.map { t =>
        Future(copyTable(spark, source, sink, t, None, options))
      }
      // Real error propagation: any failed copy fails the fan-out.
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown() // non-daemon threads would pin the JVM at exit
  }

  /** Incremental copy — the production follow-up to a full copy that
    * the reference lacks entirely (it re-copies whole tables every run,
    * transport.rb:66-75): append only the source rows whose
    * monotonically increasing key exceeds the destination's current
    * maximum. The watermark probe is one max() aggregate (parquet
    * serves it from footer statistics — no full scan); the filtered
    * source scan pushes `key > wm` down to the reader; the append adds
    * part files WITHOUT touching existing data. At 100 TB this is the
    * difference between moving a day's delta and re-moving the table.
    * Returns the appended row count. */
  def copyIncremental(
      spark: SparkSession,
      source: TableSource,
      sink: ParquetDir,
      table: String,
      keyCol: String): Long = {
    import org.apache.spark.sql.functions.{col, lit, max}
    // First load: a NONEXISTENT destination has no watermark to probe
    // (sink.read would throw, ADVICE r5) — full copy, then deltas.
    if (!sink.tableExists(table)) {
      val (observed, rowsOf) = observedCount(source.read(spark, table))
      sink.write(observed, table)
      return rowsOf()
    }
    val wm = sink.read(spark, table).agg(max(col(keyCol))).head().get(0)
    val src = source.read(spark, table)
    // EMPTY destination -> NULL watermark; `key > NULL` would filter
    // out EVERYTHING and silently skip the backlog — copy it all.
    // The appended count rides the append job itself (CollectMetrics):
    // ONE pass over the delta — the earlier persist+count+append shape
    // cached the whole delta (TB-scale spill on a real day's backlog)
    // just to learn n before writing, and an unpersisted variant could
    // even disagree with a LIVE source between its two scans. A
    // zero-row delta commits an empty append (no data files), which is
    // harmless and keeps the path single-pass.
    val (fresh, rowsOf) = observedCount(
      if (wm == null) src else src.filter(col(keyCol) > lit(wm)))
    sink.append(fresh, table)
    rowsOf()
  }

  /** fnmatch-style glob (the reference used File.fnmatch,
    * transport.rb:27) -> anchored regex. */
  private[core] def globToRegex(glob: String): scala.util.matching.Regex = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append("[^/]*")
      case '?' => sb.append("[^/]")
      case c if "\\.[]{}()+-^$|".contains(c) => sb.append("\\").append(c)
      case c => sb.append(c)
    }
    sb.append("$").toString().r
  }
}
