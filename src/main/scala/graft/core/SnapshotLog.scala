package graft.core

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal transaction log for published parquet artifacts — the
  * publicly documented lakehouse pattern (Delta Lake, Armbrust et al.
  * VLDB 2020; Apache Iceberg): data files are immutable and
  * write-once; version N of a table is a manifest
  * `_graft_log/v{N}.json` listing EXACTLY the data files that make up
  * the table at N. Two properties carry the 100 TB story:
  *
  *  - **Readers list the LOG, never the data directory.** A snapshot
  *    read is one tiny manifest fetch + direct opens of the listed
  *    files. A directory listing at scale is a million-entry walk
  *    that also SEES half-written files of in-flight jobs; the
  *    manifest read sees only committed state (readers are isolated
  *    from writers without locks).
  *  - **Commits are atomic and conditional.** A writer stages its
  *    files under `data/<uuid>/` (invisible — nothing references
  *    them), serializes the manifest to a temp name, then publishes
  *    with CREATE-NEW semantics (hard-link, which fails atomically if
  *    v{N} already exists). Losing a race means re-reading the new
  *    head and retrying at N+1 — optimistic concurrency, no
  *    coordinator. Readers see v{N-1} or v{N}, never a torn state.
  *
  * A commit either REPLACES the table (snapshot publish — the
  * transactional form of `hotswap_table`) or APPENDS (the daily
  * incremental: the new manifest lists the previous version's files
  * plus the staged ones; no data file is ever rewritten). `vacuum`
  * deletes data files unreferenced by any version >= a cutoff —
  * time-travel older than the cutoff dies, the live head never does.
  *
  * Manifest format: one JSON object (version, append flag, rowCount,
  * files array of table-relative paths). Staged paths are
  * uuid/part-file names — no quotes/backslashes — so the strict
  * regex parse below is exact, with a fail-fast guard at write time.
  */
object SnapshotLog {

  /** `stats`: per indexed column, (lo, hi) per-file min/max bounds
    * aligned index-for-index with `files` (None = no bounds for that
    * file — it is always read). The Iceberg/Delta data-skipping
    * pattern: file-level pruning from manifest metadata alone, on any
    * column the writer chose to index. */
  final case class Manifest(version: Long, append: Boolean,
                            rowCount: Long, files: Seq[String],
                            stats: Map[String, (Seq[Option[Double]], Seq[Option[Double]])] = Map.empty,
                            strStats: Map[String, (Seq[Option[String]], Seq[Option[String]])] = Map.empty)

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")
  private def vPath(table: String, v: Long): Path = logDir(table).resolve(s"v$v.json")

  /** Committed versions, ascending (a contiguous range by
    * construction — commit retries fill every slot). */
  def versions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val re = "v(\\d+)\\.json".r
      val st = Files.list(d)
      try st.iterator().asScala.flatMap(p => p.getFileName.toString match {
          case re(n) => Some(n.toLong); case _ => None
        }).toSeq.sorted
      finally st.close()
    }
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  def readManifest(table: String, v: Long): Manifest = {
    val s = new String(Files.readAllBytes(vPath(table, v)), "UTF-8")
    def long(k: String): Long =
      s"""\"$k\":(\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"manifest v$v: missing $k")).group(1).toLong
    val append = """"append":(true|false)""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"manifest v$v: missing append")).group(1).toBoolean
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"manifest v$v: missing files")).group(1)
    val fs = if (files.isEmpty) Seq.empty[String]
      else files.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    def bounds(k: String): Seq[Option[Double]] =
      ("\"" + java.util.regex.Pattern.quote(k) + "\":\\[([^\\]]*)\\]").r
        .findFirstMatchIn(s).map(_.group(1)) match {
        case None | Some("") => Seq.empty
        case Some(body) => body.split(",").toSeq.map(_.trim).map {
          case "null" => None
          case x => Some(x.toDouble)
        }
      }
    def strBounds(k: String): Seq[Option[String]] =
      ("\"" + java.util.regex.Pattern.quote(k) + "\":\\[([^\\]]*)\\]").r
        .findFirstMatchIn(s).map(_.group(1)) match {
        case None | Some("") => Seq.empty
        case Some(body) => body.split(",").toSeq.map(_.trim).map {
          case "null" => None
          case x => Some(x.stripPrefix("\"").stripSuffix("\""))
        }
      }
    def colList(key: String): Seq[String] =
      (s"""\"$key\":\\[([^\\]]*)\\]""").r.findFirstMatchIn(s)
        .map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    val stats = colList("statsCols")
      .map(c => c -> (bounds(s"lo:$c"), bounds(s"hi:$c"))).toMap
    val strStats = colList("statsStrCols")
      .map(c => c -> (strBounds(s"slo:$c"), strBounds(s"shi:$c"))).toMap
    Manifest(long("version"), append, long("rowCount"), fs, stats, strStats)
  }

  /** Stage `df` as immutable data files and commit them as the next
    * version. `append=false` replaces the table's content; `append=true`
    * extends the previous version's file list. `partitionBy` stages a
    * hive layout under the commit's own directory (manifest paths keep
    * the `col=value/` segments; `read` restores the partition columns
    * per stage via basePath, so directory pruning survives
    * manifest-based listing). Returns the committed version number.
    * Concurrency-safe via create-new manifest publish + retry
    * (bounded; each retry re-reads the head, so an append never drops
    * a racer's files). */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             append: Boolean = false, partitionBy: Seq[String] = Seq.empty,
             statsFor: Seq[String] = Seq.empty,
             expectedHead: Option[Long] = None,
             maxRetries: Int = 20): Long = {
    Files.createDirectories(logDir(table))
    val stage = java.util.UUID.randomUUID().toString
    val stageDir = Paths.get(table, "data", stage)
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(stageDir.toString)
    val staged = {
      val st = Files.walk(stageDir)
      try st.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("part-") && n.endsWith(".parquet")
        }
        .map(p => s"data/$stage/${stageDir.relativize(p)}").toSeq.sorted
      finally st.close()
    }
    require(staged.forall(p => !p.contains("\"") && !p.contains("\\")),
      s"staged path would break the manifest encoding: $staged")
    val rows =
      if (staged.isEmpty) 0L
      else spark.read.parquet(staged.map(p => s"$table/$p"): _*).count()
    // per-file min/max of every indexed column: ONE aggregate over the
    // staged files grouped by physical file — manifest-resident data
    // skipping (Iceberg/Delta pattern), computed once at write time.
    // String columns get lexicographic bounds (categorical skipping);
    // everything else goes through double.
    val stagedSchema =
      if (statsFor.isEmpty || staged.isEmpty) None
      else Some(spark.read.parquet(stageDir.toString).schema)
    val (numCols, strCols) = stagedSchema match {
      case None => (Seq.empty[String], Seq.empty[String])
      case Some(sch) => statsFor.partition(c =>
        sch(c).dataType != org.apache.spark.sql.types.StringType)
    }
    def stageNum(c: String): org.apache.spark.sql.Column =
      numericView(col(c), stagedSchema.get(c).dataType)
    val (stagedStats, stagedStrStats):
        (Map[String, Map[String, (Double, Double)]],
         Map[String, Map[String, (String, String)]]) =
      if (statsFor.isEmpty || staged.isEmpty) (Map.empty, Map.empty)
      else {
        val aggs = numCols.flatMap(c => Seq(
          min(stageNum(c)).as(s"lo:$c"),
          max(stageNum(c)).as(s"hi:$c"))) ++
          strCols.flatMap(c => Seq(
            min(col(c)).as(s"slo:$c"), max(col(c)).as(s"shi:$c")))
        val rows = spark.read.parquet(stageDir.toString)
          .groupBy(input_file_name().as("_f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        def relOf(f: String): String = {
          val marker = s"/data/$stage/"
          s"data/$stage/" + f.substring(f.indexOf(marker) + marker.length)
        }
        // an all-null file yields null min/max and a NaN-carrying file
        // yields NaN bounds — both would make interval tests silently
        // FALSE and skip files that hold matching rows, so either case
        // records NO bounds (the file is always read)
        (numCols.map { c =>
          c -> rows.flatMap { r =>
            val (il, ih) = (r.fieldIndex(s"lo:$c"), r.fieldIndex(s"hi:$c"))
            if (r.isNullAt(il) || r.isNullAt(ih) ||
                r.getDouble(il).isNaN || r.getDouble(ih).isNaN) None
            else Some(relOf(r.getString(0)) -> (r.getDouble(il), r.getDouble(ih)))
          }.toMap
        }.toMap,
          strCols.map { c =>
            c -> rows.flatMap { r =>
              val (il, ih) = (r.fieldIndex(s"slo:$c"), r.fieldIndex(s"shi:$c"))
              if (r.isNullAt(il) || r.isNullAt(ih)) None
              else Some(relOf(r.getString(0)) -> (r.getString(il), r.getString(ih)))
            }.toMap
          }.toMap)
      }
    require(statsFor.forall(_.matches("[A-Za-z0-9_.]+")),
      s"stats column names must be identifier-like (manifest JSON keys): $statsFor")
    require(staged.forall(p => !p.contains(",") && !p.contains("]")),
      // hive partition-path escaping does NOT escape commas/brackets,
      // and the manifest's files array is comma-split — fail fast
      // instead of writing a manifest that parses into garbage paths
      s"staged path would break the manifest files array: $staged")
    require(stagedStrStats.values.flatMap(_.values)
        .forall { case (l, h) =>
          !(l + h).exists(ch => ch == '"' || ch == '\\' || ch == ',' || ch == ']') },
      "string bounds containing quote/backslash/comma/bracket would break the manifest encoding")
    var attempt = 0
    while (true) {
      val cur = latestVersion(table).getOrElse(0L)
      // read-modify-write commits (merge, compact) pass the head they
      // DERIVED FROM: if another writer landed in between, publishing
      // the stale result would silently erase that writer's rows — the
      // lost update the blind-retry loop is safe against only for
      // self-contained commits. Fail loudly instead (the caller
      // re-reads and re-derives), the Delta conflict-detection rule.
      expectedHead.foreach(e => if (cur != e) sys.error(
        s"concurrent modification on $table: head moved v$e -> v$cur " +
          "under a read-modify-write commit; re-derive and retry"))
      val v = cur + 1
      val prev = if (!append || v == 1) None else Some(readManifest(table, v - 1))
      val files = prev.map(_.files ++ staged).getOrElse(staged)
      // stats alignment: carry the previous manifest's per-file bounds
      // forward per column; a file without bounds is null (always
      // read — skipping is never allowed to lose rows)
      def prevBounds(c: String): Map[String, (Option[Double], Option[Double])] =
        prev.flatMap(_.stats.get(c)) match {
          case Some((lo, hi)) if prev.exists(_.files.size == lo.size) =>
            prev.get.files.zip(lo.zip(hi)).toMap
          case _ => Map.empty
        }
      def prevStrBounds(c: String): Map[String, (Option[String], Option[String])] =
        prev.flatMap(_.strStats.get(c)) match {
          case Some((lo, hi)) if prev.exists(_.files.size == lo.size) =>
            prev.get.files.zip(lo.zip(hi)).toMap
          case _ => Map.empty
        }
      def colsJson(key: String, cols: Seq[String], perCol: Seq[String]): String =
        if (cols.isEmpty) ""
        else s""""$key":[${cols.map(c => "\"" + c + "\"").mkString(",")}],""" +
          perCol.mkString(",") + ","
      val numJson = colsJson("statsCols", numCols, numCols.map { c =>
        def arr(xs: Seq[Option[Double]]): String =
          xs.map(_.map(_.toString).getOrElse("null")).mkString(",")
        val pb = prevBounds(c)
        val lo = files.map(f => stagedStats.get(c).flatMap(_.get(f)).map(_._1)
          .orElse(pb.get(f).flatMap(_._1)))
        val hi = files.map(f => stagedStats.get(c).flatMap(_.get(f)).map(_._2)
          .orElse(pb.get(f).flatMap(_._2)))
        s""""lo:$c":[${arr(lo)}],"hi:$c":[${arr(hi)}]"""
      })
      val strJson = colsJson("statsStrCols", strCols, strCols.map { c =>
        def arr(xs: Seq[Option[String]]): String =
          xs.map(_.map(v => "\"" + v + "\"").getOrElse("null")).mkString(",")
        val pb = prevStrBounds(c)
        val lo = files.map(f => stagedStrStats.get(c).flatMap(_.get(f)).map(_._1)
          .orElse(pb.get(f).flatMap(_._1)))
        val hi = files.map(f => stagedStrStats.get(c).flatMap(_.get(f)).map(_._2)
          .orElse(pb.get(f).flatMap(_._2)))
        s""""slo:$c":[${arr(lo)}],"shi:$c":[${arr(hi)}]"""
      })
      val statsJson = numJson + strJson
      val body =
        s"""{"version":$v,"append":$append,"rowCount":$rows,$statsJson""" +
          s""""files":[${files.map(f => "\"" + f + "\"").mkString(",")}]}"""
      val tmp = logDir(table).resolve(s".tmp-$stage-$attempt")
      Files.write(tmp, body.getBytes("UTF-8"))
      try {
        Files.createLink(vPath(table, v), tmp) // atomic create-new
        Files.delete(tmp)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp) // lost the race: re-read head, retry at v+1
          attempt += 1
          if (attempt > maxRetries) sys.error(s"commit contention on $table")
      }
    }
    -1L // unreachable
  }

  /** Snapshot read: the manifest's exact file list, no directory
    * listing of `data/`. `asOf=None` reads the head. Files are grouped
    * by their commit's stage directory and each group reads with that
    * stage as `basePath`, so hive `col=value/` segments in staged
    * layouts come back as partition COLUMNS and partition filters
    * still prune at the directory level — manifest listing costs none
    * of the pruning a plain partitioned read gets. */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(table))
      .getOrElse(sys.error(s"no committed version in $table"))
    val m = readManifest(table, v)
    readFiles(spark, table, m.files)
  }

  private def readFiles(spark: SparkSession, table: String,
                        files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.emptyDataFrame
    else {
      val byStage = files.groupBy(f => f.split("/").take(2).mkString("/")).toSeq.sortBy(_._1)
      byStage.map { case (stage, fs) =>
        spark.read.option("basePath", s"$table/$stage")
          .parquet(fs.map(f => s"$table/$f"): _*)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      // allowMissingColumns: an append commit may carry MORE columns
      // than the base (schema evolution) — older stages surface null
      // for the new column instead of failing the union or silently
      // dropping it (the plain multi-path parquet read without
      // mergeSchema picks ONE file's schema — exactly the silent-loss
      // trap the per-stage union avoids)
    }

  /** Manifest-side file pruning for a range predicate on an indexed
    * column: (kept, skipped). A file keeps when its [lo, hi] overlaps
    * [qLo, qHi] or it has no bounds — skipping can drop files, never
    * rows. An un-indexed column prunes nothing (everything kept). */
  def prunedFiles(table: String, c: String, qLo: Double, qHi: Double,
                  asOf: Option[Long] = None): (Seq[String], Seq[String]) = {
    val v = asOf.orElse(latestVersion(table))
      .getOrElse(sys.error(s"no committed version in $table"))
    val m = readManifest(table, v)
    m.stats.get(c) match {
      case Some((lo, hi)) if lo.size == m.files.size =>
        m.files.zipWithIndex.partition { case (_, i) =>
          (lo(i), hi(i)) match {
            case (Some(l), Some(h)) => h >= qLo && l <= qHi
            case _ => true
          }
        } match { case (k, s) => (k.map(_._1), s.map(_._1)) }
      case _ => (m.files, Seq.empty)
    }
  }

  /** Range read with DATA SKIPPING: open only the manifest-pruned
    * files for column `c`, then apply the residual row filter. At
    * 100 TB this is the second pruning tier after partition
    * directories — a range query on a range-clustered table touches
    * the few files whose footer bounds overlap, decided from the
    * MANIFEST alone (zero file opens for the skipped ones). */
  def readPruned(spark: SparkSession, table: String, c: String,
                 qLo: Double, qHi: Double,
                 asOf: Option[Long] = None): DataFrame = {
    val (kept, _) = prunedFiles(table, c, qLo, qHi, asOf)
    val out = readFiles(spark, table, kept)
    out.filter(predColumn(out, Pred.Between(c, qLo, qHi)))
  }

  /** Predicate AST for manifest-level skipping: the boolean shapes a
    * WHERE clause reduces to. `mightMatch` is the standard three-valued
    * conservative evaluation over [lo, hi] interval bounds — a file is
    * skipped only when the predicate PROVABLY matches no row in it;
    * missing bounds or un-indexed columns always keep. */
  sealed trait Pred
  object Pred {
    final case class Between(c: String, lo: Double, hi: Double) extends Pred
    final case class Eq(c: String, v: Double) extends Pred
    final case class In(c: String, vs: Seq[Double]) extends Pred
    final case class StrEq(c: String, v: String) extends Pred
    final case class StrIn(c: String, vs: Seq[String]) extends Pred
    final case class And(ps: Pred*) extends Pred
    final case class Or(ps: Pred*) extends Pred
  }

  private def mightMatch(m: Manifest, i: Int, p: Pred): Boolean = {
    def bounds(c: String): Option[(Double, Double)] =
      m.stats.get(c).filter(_._1.size == m.files.size)
        .flatMap { case (lo, hi) => lo(i).zip(hi(i)) }
    def strBounds(c: String): Option[(String, String)] =
      m.strStats.get(c).filter(_._1.size == m.files.size)
        .flatMap { case (lo, hi) => lo(i).zip(hi(i)) }
    // Spark computed the string min/max in UTF-8 BINARY order; Java's
    // String <= is UTF-16 code-unit order, which disagrees above the
    // BMP — compare bounds the way they were produced or supplementary
    // characters mis-skip files
    def u8Lte(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var k = 0
      while (k < x.length && k < y.length) {
        val c = (x(k) & 0xff) - (y(k) & 0xff)
        if (c != 0) return c < 0
        k += 1
      }
      x.length <= y.length
    }
    p match {
      case Pred.Between(c, qLo, qHi) =>
        bounds(c).forall { case (l, h) => h >= qLo && l <= qHi }
      case Pred.Eq(c, v) =>
        bounds(c).forall { case (l, h) => l <= v && v <= h }
      case Pred.In(c, vs) =>
        bounds(c).forall { case (l, h) => vs.exists(v => l <= v && v <= h) }
      case Pred.StrEq(c, v) =>
        strBounds(c).forall { case (l, h) => u8Lte(l, v) && u8Lte(v, h) }
      case Pred.StrIn(c, vs) =>
        strBounds(c).forall { case (l, h) => vs.exists(v => u8Lte(l, v) && u8Lte(v, h)) }
      case Pred.And(ps @ _*) => ps.forall(mightMatch(m, i, _))
      case Pred.Or(ps @ _*) => ps.exists(mightMatch(m, i, _))
    }
  }

  /** Numeric view of a column for stats and residual filters: doubles
    * directly, timestamps (incl. NTZ — not double-castable) as epoch
    * SECONDS through unix_micros. Session TZ is pinned UTC, so the
    * NTZ interpretation is deterministic. Predicate values for
    * timestamp columns are epoch seconds. */
  private def numericView(c: org.apache.spark.sql.Column,
                          dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    dt match {
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast("timestamp")).cast("double") / lit(1e6)
      case _ => c.cast("double")
    }
  }

  /** The row-level Column a predicate tree denotes — applied as the
    * residual filter after file pruning (schema-aware, so timestamp
    * columns compare in the same epoch-second view the stats use),
    * which makes pruned and unpruned reads agree by construction. */
  private def predColumn(df: DataFrame, p: Pred): org.apache.spark.sql.Column = {
    def num(c: String): org.apache.spark.sql.Column =
      numericView(col(c), df.schema(c).dataType)
    p match {
      case Pred.Between(c, lo, hi) => num(c) >= lo && num(c) <= hi
      case Pred.Eq(c, v) => num(c) === v
      case Pred.In(c, vs) => num(c).isin(vs.map(Double.box): _*)
      case Pred.StrEq(c, v) => col(c) === v
      case Pred.StrIn(c, vs) => col(c).isin(vs: _*)
      case Pred.And(ps @ _*) => ps.map(predColumn(df, _)).reduce(_ && _)
      case Pred.Or(ps @ _*) => ps.map(predColumn(df, _)).reduce(_ || _)
    }
  }

  /** Predicate-shaped skipping: (kept, skipped) under a boolean tree —
    * an OR of ranges skips the gap between them, an AND across two
    * indexed columns prunes with both sets of bounds. */
  def prunedFilesWhere(table: String, p: Pred,
                       asOf: Option[Long] = None): (Seq[String], Seq[String]) = {
    val v = asOf.orElse(latestVersion(table))
      .getOrElse(sys.error(s"no committed version in $table"))
    val m = readManifest(table, v)
    m.files.zipWithIndex.partition { case (_, i) => mightMatch(m, i, p) } match {
      case (k, s) => (k.map(_._1), s.map(_._1))
    }
  }

  /** Read under a predicate tree with manifest skipping + the exact
    * residual filter. */
  def readWhere(spark: SparkSession, table: String, p: Pred,
                asOf: Option[Long] = None): DataFrame = {
    val (kept, _) = prunedFilesWhere(table, p, asOf)
    val out = readFiles(spark, table, kept)
    out.filter(predColumn(out, p))
  }

  /** OPTIMIZE: rewrite the head's content into `targetFiles` files and
    * commit the compacted layout as a new REPLACE version. Content is
    * identical (spec-checked); prior versions keep reading their own
    * files until `vacuum` retires them — compaction never blocks or
    * breaks a concurrent reader. The small-files answer for a table
    * fed by many append commits (e.g. streaming ingest). */
  def compact(spark: SparkSession, table: String, targetFiles: Int): Long = {
    val headV = latestVersion(table).getOrElse(sys.error(s"no committed version in $table"))
    commit(spark, read(spark, table, Some(headV)).repartition(targetFiles), table,
      expectedHead = Some(headV))
  }

  /** Copy-on-write MERGE (upsert): rows of the head whose `key` appears
    * in `updates` are replaced, new keys are inserted, everything else
    * is carried — committed as one new REPLACE version, so the upsert
    * is atomic, time-travelable, and never rewrites history. Shape:
    * one anti-join (head vs the broadcast-sized update set) + union —
    * at 100 TB the anti-join is the standard CDC-apply plan, and the
    * runtime bloom on the update keys prunes the head scan. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            key: String): Long = {
    val headV = latestVersion(table).getOrElse(sys.error(s"no committed version in $table"))
    val head = read(spark, table, Some(headV))
    val merged = head.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)
    commit(spark, merged, table, expectedHead = Some(headV))
  }

  /** DESCRIBE HISTORY: one row per committed version — version id,
    * commit kind, row count, file count. Driver-built (the log is
    * metadata, bounded by version count, never by data size). */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versions(table).map { v =>
      val m = readManifest(table, v)
      (m.version, if (m.append) "append" else "replace",
        m.rowCount, m.files.size.toLong)
    }.toDF("version", "kind", "row_count", "n_files")
  }

  /** CHANGE FEED between two versions: the rows added by append
    * commits in (sinceV, untilV] — exactly the files those manifests
    * introduced, read directly (no diffing of row sets). Incremental
    * consumers (downstream training jobs, index maintainers) use this
    * to process only what's new since the version they last pinned.
    * Only APPEND commits have a well-defined row-level delta from
    * metadata alone; a replace commit in the range fails fast rather
    * than silently returning a wrong delta. */
  def readChanges(spark: SparkSession, table: String,
                  sinceV: Long, untilV: Long): DataFrame = {
    val range = versions(table).filter(v => v > sinceV && v <= untilV)
    require(range.nonEmpty, s"no versions in ($sinceV, $untilV]")
    val manifests = range.map(readManifest(table, _))
    manifests.find(!_.append).foreach(m => sys.error(
      s"version ${m.version} is a replace commit — its delta is not " +
        "derivable from the log; re-read the snapshot instead"))
    val prevFiles =
      if (sinceV == 0L) Set.empty[String]
      else readManifest(table, sinceV).files.toSet
    val newFiles = manifests.flatMap(_.files).distinct.filterNot(prevFiles)
    if (newFiles.isEmpty) spark.emptyDataFrame
    else readFiles(spark, table, newFiles) // shares the per-stage basePath
    // union (incl. allowMissingColumns), so the change feed tolerates
    // the same schema evolution the snapshot read does
  }

  /** Polling incremental consumer — the micro-batch pull pattern over
    * the change feed: returns (new checkpoint version, isResync,
    * rows). A downstream job persists the returned version as its
    * checkpoint and calls again later; two consumers at different
    * versions read independently (the log is immutable). When every
    * in-range commit is an append, the rows are exactly the delta
    * (each row delivered once across polls). When a REPLACE commit
    * lies in range, the delta is undefined — the poll returns the
    * FULL head snapshot with isResync=true and the consumer must
    * treat it as a refresh, not an increment (the standard change-feed
    * restart-point convention). Empty when nothing new. */
  def pollChanges(spark: SparkSession, table: String,
                  lastSeen: Long): (Long, Boolean, DataFrame) = {
    val head = latestVersion(table).getOrElse(lastSeen)
    if (head <= lastSeen) (lastSeen, false, spark.emptyDataFrame)
    else {
      val range = versions(table).filter(v => v > lastSeen && v <= head)
      if (range.exists(v => !readManifest(table, v).append))
        (head, true, read(spark, table, Some(head)))
      else (head, false, readChanges(spark, table, lastSeen, head))
    }
  }

  /** Delete data files referenced ONLY by versions < `keepFrom` (and
    * their manifests). Time travel to vacuumed versions dies; every
    * version >= keepFrom still reads. Returns deleted relative paths. */
  def vacuum(table: String, keepFrom: Long): Seq[String] = {
    val all = versions(table)
    val (dead, live) = all.partition(_ < keepFrom)
    val liveFiles = live.flatMap(readManifest(table, _).files).toSet
    val doomed = dead.flatMap(readManifest(table, _).files).distinct
      .filterNot(liveFiles)
    doomed.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
    dead.foreach(v => Files.deleteIfExists(vPath(table, v)))
    doomed
  }

  /** Sweep ORPHANED stage directories — data files no surviving
    * manifest references, left behind by writers that crashed between
    * staging and publishing. Only stages older than `olderThanMs` go
    * (the grace period protects an IN-FLIGHT writer that has staged
    * but not yet committed — the same rule as Delta's VACUUM
    * retention). Returns deleted stage dirs (relative). */
  def vacuumOrphans(table: String, olderThanMs: Long = 3600000L): Seq[String] = {
    val dataDir = Paths.get(table, "data")
    if (!Files.isDirectory(dataDir)) return Seq.empty
    val referenced = versions(table)
      .flatMap(readManifest(table, _).files)
      .map(_.split("/").take(2).mkString("/")).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val st = Files.list(dataDir)
    val stages = try st.iterator().asScala.toSeq finally st.close()
    stages.filter { p =>
      !referenced.contains(s"data/${p.getFileName}") &&
        Files.getLastModifiedTime(p).toMillis < cutoff
    }.map { p =>
      TempDirs.deleteRecursively(p.toFile)
      s"data/${p.getFileName}"
    }
  }

  // ------------------------------------------------------- declared queries

  /** Declared surface for the log's ISOLATION guarantee: commit v1 =
    * the full (doc_id, lang) projection, commit v2 = a filtered
    * replacement, then read AS OF v1 and aggregate. The oracle is the
    * plain per-lang count over `documents` — it only matches if the
    * v2 commit bled nothing into the v1 snapshot. */
  def snapshotAsof(spark: SparkSession, dir: String): DataFrame = {
    val table = demoTable(spark, dir)
    read(spark, table, asOf = Some(1L))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  /** Declared surface for the HEAD read + append commit: v3 appends
    * the short-doc remainder back, so the head must equal the full
    * corpus again — per-source counts against the plain oracle. */
  def snapshotLatest(spark: SparkSession, dir: String): DataFrame = {
    val table = demoTable(spark, dir)
    read(spark, table)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** Declared surface for copy-on-write MERGE: v1 = the orders
    * projection; one merge applies a deterministic CDC batch (keys
    * % 10 == 0 updated to status 'U' with price+1; keys % 50 == 0
    * re-inserted under shifted NEW keys with status 'N'); the head
    * aggregate only matches the oracle's anti-join + union replay if
    * updates replaced, inserts landed, and untouched rows survived. */
  def snapshotMerge(spark: SparkSession, dir: String): DataFrame = {
    val table = freshScratchTable(s"snapmerge:$dir")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    commit(spark, base, table)
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("p") + 1).cast("decimal(18,2)").as("p"))
      .unionByName(base.filter(col("o_orderkey") % 50 === 0)
        .select((col("o_orderkey") + 500000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), col("p")))
    merge(spark, table, updates, "o_orderkey")
    read(spark, table)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("p")), 2).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** Declared surface for PARTITIONED commits: docs committed
    * hive-partitioned by lang; the filtered read-back must restore
    * `lang` as a partition column from the manifest's staged layout
    * (basePath per stage) — the per-source counts only match if no
    * partition's rows leaked or doubled. Pruning is plan-audited in
    * SnapshotLogSpec. */
  def snapshotPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val table = partitionedDemoTable(spark, dir)
    read(spark, table).filter(col("lang") === "en")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** Declared surface for the CHANGE FEED: three deterministic append
    * commits (orders thirds by key mod), then `readChanges(1, 3)` —
    * the incremental consumer's read. The aggregate only matches the
    * oracle's `mod <> 0` replay if the feed returns exactly the rows
    * versions 2-3 introduced: nothing from v1, nothing double-counted
    * across the two appends. */
  def snapshotChanges(spark: SparkSession, dir: String): DataFrame = {
    val table = freshScratchTable(s"snapchg:$dir")
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    commit(spark, o.filter(col("o_orderkey") % 3 === 0), table)
    commit(spark, o.filter(col("o_orderkey") % 3 === 1), table, append = true)
    commit(spark, o.filter(col("o_orderkey") % 3 === 2), table, append = true)
    readChanges(spark, table, 1L, 3L)
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("total"))
  }

  /** Declared surface for DATA SKIPPING: orders range-clustered on
    * o_totalprice and committed with per-file price bounds; the range
    * read must equal the plain BETWEEN oracle while opening only the
    * overlapping files (SnapshotLogSpec asserts real skips on this
    * exact layout). */
  def snapshotSkipping(spark: SparkSession, dir: String): DataFrame = {
    val table = skippingDemoTable(spark, dir)
    readPruned(spark, table, "o_totalprice", 50000.0, 100000.0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  private[core] def skippingDemoTable(spark: SparkSession, dir: String): String = {
    val table = freshScratchTable(s"snapskip:$dir")
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .repartitionByRange(8, col("o_totalprice"))
    commit(spark, orders, table, statsFor = Seq("o_totalprice", "o_orderkey"))
    table
  }

  private[core] def partitionedDemoTable(spark: SparkSession, dir: String): String = {
    val table = freshScratchTable(s"snappart:$dir")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
    commit(spark, docs, table, partitionBy = Seq("lang"))
    table
  }

  private def freshScratchTable(tag: String): String = {
    val table = TempDirs.stable(tag)
    TempDirs.deleteRecursively(new java.io.File(table))
    Files.createDirectories(Paths.get(table))
    table
  }

  /** Build the demo log once per (query-run, corpus): v1 = full
    * projection (replace), v2 = long docs only (replace), v3 = the
    * short-doc remainder (APPEND — v3 = v2 files + staged, no
    * rewrite). Fresh scratch per run: version numbers must be
    * deterministic for the declared queries. */
  private def demoTable(spark: SparkSession, dir: String): String = {
    val table = TempDirs.stable(s"snaplog:$dir")
    TempDirs.deleteRecursively(new java.io.File(table))
    Files.createDirectories(Paths.get(table))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    commit(spark, docs, table)
    commit(spark, docs.filter(col("n_chars") >= 500), table)
    commit(spark, docs.filter(col("n_chars") < 500), table, append = true)
    table
  }
}
