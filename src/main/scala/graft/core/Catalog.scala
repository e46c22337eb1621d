package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Qualified name parsing — reference parity with QualifiedName
  * (lib/pgcp/qualified_name.rb:1-21): "schema.table" <-> parts. */
final case class QualifiedName(schema: String, table: String) {
  def fullName: String = s"$schema.$table"
}
object QualifiedName {
  def parse(s: String): QualifiedName = s.split('.') match {
    case Array(sch, tbl) => QualifiedName(sch, tbl)
    case Array(tbl)      => QualifiedName("public", tbl)
    case _ => throw new IllegalArgumentException(
      s"expected <schema>.<table> with exactly one '.', got: $s")
  }
}

/** A source/destination of tables. Two backends: a parquet directory
  * (one `<table>.parquet` per table — the sandbox corpus layout,
  * TESTDATA.md) and JDBC (live-Postgres parity; same API, untestable
  * here — zero egress).
  *
  * Reference semantics covered: list_tables (postgres.rb:20-36),
  * schema_names (:108-120), table_exist? (:280-284,327-346),
  * column_definitions (:137-167). The reference's glob fan-out listed
  * tables on the DESTINATION by mistake (transport.rb:25, SURVEY §2a
  * #12) — listing here is always on the receiver, so callers list the
  * source explicitly.
  */
trait TableSource {
  def listTables(): Seq[String]
  def tableExists(name: String): Boolean
  def read(spark: SparkSession, name: String): DataFrame
  def schemaOf(spark: SparkSession, name: String): Seq[TypeMap.ColumnDef] =
    TypeMap.fromStructType(read(spark, name).schema)
}

trait TableSink {
  /** Staged write + atomic publish (reference hotswap_table semantics,
    * postgres.rb:93-106 / transport.rb:128-143: readers never observe a
    * half-copied table). */
  def write(df: DataFrame, name: String): Unit
}

/** Parquet-directory backend: `$dir/<table>.parquet`. Namespaces
  * (reference schema_names, postgres.rb:108-120) map to SUBDIRECTORIES:
  * the flat root is the implicit "public" namespace and
  * `$dir/<ns>/<table>.parquet` holds namespace-qualified tables.
  * `createNamespace` is idempotent — the analogue of the reference's
  * `CREATE SCHEMA IF NOT EXISTS` (transport.rb:46). */
final class ParquetDir(dir: String) extends TableSource with TableSink {
  private def pathOf(name: String) = s"$dir/$name.parquet"

  /** "public" plus every subdirectory that holds at least one table.
    * Hidden/staging dirs (dot-prefixed) are never namespaces. */
  def listNamespaces(): Seq[String] = {
    val subs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith(".") && !f.getName.endsWith(".parquet"))
      .filter(f => Option(f.list()).exists(_.exists(_.endsWith(".parquet"))))
      .map(_.getName).toSeq
    ("public" +: subs).distinct.sorted
  }

  def createNamespace(name: String): Unit =
    if (name != "public") { new java.io.File(dir, name).mkdirs(); () }

  def namespaceExists(name: String): Boolean =
    name == "public" || new java.io.File(dir, name).isDirectory

  private def fs(spark: SparkSession): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Listing needs an FS handle; parquet-dir listing is driver-side and
  // cheap (directory metadata only), matching the reference's
  // information_schema scan in spirit.
  def listTablesWith(spark: SparkSession): Seq[String] = {
    val f = fs(spark)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  override def listTables(): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }

  override def tableExists(name: String): Boolean =
    new java.io.File(pathOf(name)).exists()

  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(pathOf(name))

  /** Append rows to an existing table WITHOUT rewriting it — the
    * incremental-load primitive (new part files land beside the old;
    * readers see the union). Hotswap (`write`) replaces; this extends. */
  def append(df: DataFrame, name: String): Unit =
    df.write.mode("append").parquet(pathOf(name))

  /** Write to `.staging/<uuid>` then atomically rename into place —
    * the Spark analogue of temp-table + hotswap (transport.rb:128-143).
    * Unlike the reference, failures PROPAGATE (the reference's pipe
    * exit-check is broken, transport.rb:71-74 — SURVEY §2a #13). */
  override def write(df: DataFrame, name: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark)
    val staging = new Path(s"$dir/.staging_${java.util.UUID.randomUUID().toString.take(8)}_$name")
    val target = new Path(pathOf(name))
    try {
      df.write.mode("overwrite").parquet(staging.toString)
      if (f.exists(target)) f.delete(target, true) // hotswap: drop then rename
      if (!f.rename(staging, target))
        throw new java.io.IOException(s"atomic publish failed: $staging -> $target")
    } finally {
      if (f.exists(staging)) f.delete(staging, true) // ensure-drop temp (transport.rb:141-142)
    }
  }
}

/** JDBC backend — live-Postgres parity path. Thin by design (SURVEY
  * §7.3: no live PG in the sandbox); mirrors the parquet path's
  * operator semantics so oracle-checked logic is shared. At cluster
  * scale, reads partition on `partitionColumn` so a 100 TB table scans
  * across executors instead of one connection (the reference is a
  * single psql pipe, transport.rb:66-75). */
final class JdbcSource(
    url: String,
    props: java.util.Properties,
    partitionColumn: Option[String] = None,
    numPartitions: Int = 32,
    schema: Option[String] = None) extends TableSource with TableSink {

  /** Fresh connection per CATALOG op — the reference's connection model
    * (postgres.rb:288-298) is fine at catalog frequency; the data path
    * never goes through here (Spark's JDBC partitions own it). */
  private def withConnection[T](f: java.sql.Connection => T): T = {
    Option(props.getProperty("driver")).foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Namespace for unqualified names: the configured schema, else the
    * connection's current schema (Derby: APP; PG: search_path head). */
  private def resolveSchema(conn: java.sql.Connection): String =
    schema.orElse(Option(conn.getSchema)).getOrElse("%")

  private def qualify(conn: java.sql.Connection, name: String): QualifiedName =
    if (name.contains(".")) QualifiedName.parse(name)
    else QualifiedName(resolveSchema(conn), name)

  /** Identifier -> metadata PATTERN: the JDBC spec treats '_' and '%'
    * in getTables/getColumns name arguments as LIKE wildcards, so a
    * table called ORDERS_V1 would also match ORDERSXV1. Escape with the
    * driver's escape string before any metadata lookup. */
  private def escapePattern(conn: java.sql.Connection, s: String): String = {
    val esc = conn.getMetaData.getSearchStringEscape
    // "%" is resolveSchema's any-schema FALLBACK (no current schema,
    // none configured — catalog-based engines): it must stay a wildcard.
    if (esc == null || esc.isEmpty || s == "%") s
    else s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  /** DDL dialect switch: the one place the portable JDBC surface can't
    * express an operation (table rename) in one spelling. URL-sniffed,
    * like Spark's own JdbcDialects registry. */
  private def isPostgres: Boolean = url.startsWith("jdbc:postgresql:")

  private def quoteId(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
  private def quoted(qn: QualifiedName): String =
    s"${quoteId(qn.schema)}.${quoteId(qn.table)}"

  /** The STORED exact-case name of a table from metadata. Swap/drop DDL
    * must address identifiers AS STORED (quoted), or engines whose
    * stored case differs from their fold direction — e.g. any
    * lower/mixed-case-named table on Derby, any quoted-created table on
    * PG — case-fold the DDL away from the real table (ADVICE r5). */
  private def storedNameOpt(conn: java.sql.Connection, name: String): Option[QualifiedName] = {
    val qn = qualify(conn, name)
    def probe(s: String, t: String): Option[QualifiedName] = {
      val rs = conn.getMetaData.getTables(
        null, escapePattern(conn, s), escapePattern(conn, t), Array("TABLE"))
      try {
        if (rs.next())
          Some(QualifiedName(Option(rs.getString("TABLE_SCHEM")).getOrElse(s),
            rs.getString("TABLE_NAME")))
        else None
      } finally rs.close()
    }
    firstFold(qn.schema, qn.table)(probe)(_.nonEmpty)
  }

  private def storedName(conn: java.sql.Connection, name: String): QualifiedName =
    storedNameOpt(conn, name).getOrElse(qualify(conn, name))

  /** Unquoted identifiers case-fold differently per engine (Derby/HSQL
    * store UPPER, Postgres lower): try the name as given, then both
    * folds, returning the first non-empty probe. */
  private def firstFold[T](schema: String, table: String)(probe: (String, String) => T)(
      nonEmpty: T => Boolean): T = {
    val exact = probe(schema, table)
    if (nonEmpty(exact)) exact
    else {
      val upper = probe(schema.toUpperCase, table.toUpperCase)
      if (nonEmpty(upper)) upper
      else probe(schema.toLowerCase, table.toLowerCase)
    }
  }

  /** list_tables (postgres.rb:20-36): BASE TABLEs of one schema,
    * ordered. `DatabaseMetaData.getTables` with type TABLE is the
    * engine-portable form of the reference's information_schema query
    * (its system-schema exclusions fall out of the TABLE type filter). */
  override def listTables(): Seq[String] = withConnection { conn =>
    val rs = conn.getMetaData.getTables(
      null, escapePattern(conn, resolveSchema(conn)), "%", Array("TABLE"))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    try { while (rs.next()) out += rs.getString("TABLE_NAME") } finally rs.close()
    out.toSeq.sorted
  }

  /** table_exist? (postgres.rb:280-284,327-346). */
  override def tableExists(name: String): Boolean = withConnection { conn =>
    val qn = qualify(conn, name)
    def hit(s: String, t: String): Boolean = {
      val rs = conn.getMetaData.getTables(
        null, escapePattern(conn, s), escapePattern(conn, t), Array("TABLE"))
      try rs.next() finally rs.close()
    }
    firstFold(qn.schema, qn.table)(hit)(identity)
  }

  /** Reference column_definitions (postgres.rb:137-167): ordered
    * {name, rendered type, nullable} triples from JDBC metadata. Types
    * come back as the ENGINE'S OWN names (the reference's
    * format_type passthrough): same-engine copies replay them verbatim. */
  def columnDefinitions(table: String): Seq[(String, String, Boolean)] =
    withConnection { conn =>
      val qn = qualify(conn, table)
      def cols(s: String, t: String): Seq[(String, String, Boolean)] = {
        val rs = conn.getMetaData.getColumns(
          null, escapePattern(conn, s), escapePattern(conn, t), "%")
        val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Boolean)]()
        try {
          while (rs.next()) {
            val tn = rs.getString("TYPE_NAME")
            val rendered = tn.toUpperCase match {
              case "VARCHAR" | "CHAR" | "CHARACTER" | "CHARACTER VARYING" =>
                s"$tn(${rs.getInt("COLUMN_SIZE")})"
              case "DECIMAL" | "NUMERIC" =>
                s"$tn(${rs.getInt("COLUMN_SIZE")},${rs.getInt("DECIMAL_DIGITS")})"
              case _ => tn
            }
            out += ((rs.getInt("ORDINAL_POSITION"), rs.getString("COLUMN_NAME"),
              rendered,
              rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls))
          }
        } finally rs.close()
        out.sortBy(_._1).map(r => (r._2, r._3, r._4)).toSeq
      }
      firstFold(qn.schema, qn.table)(cols)(_.nonEmpty)
    }

  /** DDL-synthesized create (reference get_create_table_statement,
    * postgres.rb:263-278 / create_dest_table, transport.rb:112-126).
    * Needed on the copy path because Spark's JDBC auto-create marks
    * EVERY column nullable — which would make downstream PK replay
    * impossible. */
  def createTable(table: String, columns: Seq[(String, String, Boolean)]): Unit =
    withConnection { conn =>
      val qn = qualify(conn, table)
      // Column names come from metadata in their STORED exact case and
      // Spark's JDBC writer quotes its INSERT column list — quote here
      // too, or a lowercase-named (Spark-written) table's clone would
      // case-fold away from the insert's names.
      val colLines = columns.map { case (n, t, nullable) =>
        s""""$n" $t${if (nullable) "" else " NOT NULL"}"""
      }
      val st = conn.createStatement()
      try { st.executeUpdate(s"CREATE TABLE ${qn.fullName} (${colLines.mkString(", ")})"); () }
      finally st.close()
    }

  /** Source-side index introspection for replay-after-load
    * (transport.rb:51-56), with the same case-fold fallback.
    * Dialect-dispatched: PostgreSQL URLs read pg_catalog directly
    * (partial-index predicates + expression columns, reference
    * postgres.rb:212,233-241 — JDBC metadata can express neither);
    * every other engine uses the portable DatabaseMetaData path. */
  def indexesOf(table: String): Seq[IndexSpec] = withConnection { conn =>
    // getPrimaryKeys/getIndexInfo take EXACT names (not patterns), so
    // no wildcard escaping here — only the case-fold probes.
    val qn = qualify(conn, table)
    val probe: (String, String) => Seq[IndexSpec] =
      if (isPostgres) Indexes.fromPgCatalog(conn, _, _)
      else Indexes.fromJdbc(conn, _, _)
    firstFold(qn.schema, qn.table)(probe)(_.nonEmpty)
  }

  /** Replay introspected indexes onto a destination table here —
    * create_indexes (postgres.rb:243-261) with the composite-PK fix. */
  def replayIndexes(specs: Seq[IndexSpec], destTable: String): Unit =
    withConnection { conn => Indexes.replay(conn, specs, qualify(conn, destTable)) }

  /** Spark's JDBC range partitioning needs explicit bounds; discover
    * them with a 1-row min/max pushdown query (the JDBC source runs
    * the subquery server-side), then issue numPartitions parallel
    * range scans. One tiny query + N streaming scans — the Spark
    * answer to the reference's single psql pipe (transport.rb:66-75). */
  private def bounds(spark: SparkSession, dbtable: String, col: String): (Long, Long) = {
    // quote the identifier: Spark's JDBC writer creates quoted (exact-
    // case) columns, and unquoted names case-fold in most engines
    // (Derby/PG uppercase/lowercase them away from the exact name)
    val q = "\"" + col + "\""
    val b = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"""(SELECT min($q) AS "lo", max($q) AS "hi" FROM $dbtable) t""")
      .options(propMap)
      .load().collect()(0)
    (b.getAs[Number]("lo").longValue(), b.getAs[Number]("hi").longValue())
  }

  private def propMap: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    props.stringPropertyNames().forEach(k => b += k -> props.getProperty(k))
    b.result()
  }

  // stored-name resolutions are stable for a source's lifetime; cache
  // them so repeated reads of one table (data scan + post-publish count
  // verification, glob fan-outs) pay ONE metadata probe, not one per read
  private val storedNameCache =
    new java.util.concurrent.ConcurrentHashMap[String, QualifiedName]()

  override def read(spark: SparkSession, name: String): DataFrame = {
    // Address the table AS STORED, quoted: a lowercase/mixed-case-stored
    // table (quoted at creation) is unreachable through the unquoted
    // name once the engine case-folds it the other way (ADVICE r5).
    // Unknown tables keep the given spelling and fail with the engine's
    // own error downstream (and are NOT cached — the table may be
    // created later under a different fold).
    val stored = Option(storedNameCache.get(name)).getOrElse {
      val (resolved, fallback) = withConnection { conn =>
        (storedNameOpt(conn, name), qualify(conn, name))
      }
      resolved.foreach(qn => storedNameCache.put(name, qn))
      resolved.getOrElse(fallback)
    }
    val dbtable = quoted(stored)
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .options(propMap)
    partitionColumn match {
      case Some(col) =>
        val (lo, hi) = bounds(spark, dbtable, col)
        r.option("partitionColumn", col)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", numPartitions)
          .load()
      case None => r.load()
    }
  }

  private def appendInto(df: DataFrame, dbtable: String): Unit =
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("batchsize", 10000)       // COPY-ish bulk batches
      .option("isolationLevel", "NONE") // bulk load: no per-batch txn cost
      .options(propMap)
      .save()

  /** Staged write with hotswap publish — the JDBC twin of
    * ParquetDir.write and the reference's copy_table_data
    * (transport.rb:128-143): when the destination EXISTS, data lands in
    * a `temp_<hex>` table IN THE DESTINATION'S SCHEMA (rename cannot
    * move schemas), then one transaction drops the dest and renames
    * temp into place. Readers never observe a half-copied table, and
    * re-copies REPLACE instead of PK-violating on append. The temp
    * clones the dest's column definitions RESTRICTED to the incoming
    * frame's columns (a projected re-copy must not inherit unfillable
    * NOT NULL columns); dest indexes die with the DROP, so the copy
    * pipeline replays them after the publish. A failed stage or swap
    * ensure-drops the temp (the parquet path's finally-delete,
    * transport.rb:141-142). The rename DDL is dialect-dispatched —
    * Derby spells it RENAME TABLE, Postgres ALTER TABLE ... RENAME TO
    * (postgres.rb:93-106 does the same swap) — and addresses both
    * tables by their STORED-case names, quoted, so lower/mixed-case
    * destinations survive a re-copy (ADVICE r5). */
  override def write(df: DataFrame, name: String): Unit = {
    if (!tableExists(name)) appendInto(df, name)
    else {
      val destSchema = withConnection(conn => qualify(conn, name).schema)
      val tmp =
        s"$destSchema.temp_${java.util.UUID.randomUUID().toString.replace("-", "").take(10)}"
      try {
        val incoming = df.columns.map(_.toLowerCase).toSet
        val allDefs = columnDefinitions(name)
        val defs = allDefs.filter(c => incoming.contains(c._1.toLowerCase))
        // Schema evolution on re-copy: a frame carrying columns the dest
        // LACKS can't land in a dest-shaped temp (the append would fail
        // on the unknown columns). Fall back to writer auto-create so
        // the evolved shape wins — nullability fidelity yields to
        // evolution, matching the parquet path's overwrite semantics
        // (ADVICE r5).
        val covered = df.columns.forall(c => defs.exists(_._1.equalsIgnoreCase(c)))
        if (defs.nonEmpty && covered) createTable(tmp, defs) // else: writer auto-creates
        appendInto(df, tmp)
        withConnection { conn =>
          val destQn = storedName(conn, name)
          val tmpQn = storedName(conn, tmp)
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try {
            st.executeUpdate(s"DROP TABLE ${quoted(destQn)}")
            // rename keeps the schema; target name is unqualified
            val renameSql =
              if (isPostgres)
                s"ALTER TABLE ${quoted(tmpQn)} RENAME TO ${quoteId(destQn.table)}"
              else
                s"RENAME TABLE ${quoted(tmpQn)} TO ${quoteId(destQn.table)}"
            st.executeUpdate(renameSql)
            conn.commit()
          } catch {
            case t: Throwable => conn.rollback(); throw t
          } finally st.close()
        }
      } catch {
        case t: Throwable =>
          // ensure-drop the staged temp; the original failure wins
          try withConnection { conn =>
            val st = conn.createStatement()
            try { st.executeUpdate(s"DROP TABLE ${qualify(conn, tmp).fullName}"); () }
            finally st.close()
          } catch { case _: Throwable => () }
          throw t
      }
    }
  }
}

/** Catalog report queries (DataFrame-shaped so they are oracle-checkable). */
object Catalog {
  /** Table listing as a one-column DataFrame. */
  def tablesDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    new ParquetDir(dir).listTables().toDF("table_name")
  }

  /** Namespace listing as a one-column DataFrame (reference
    * schema_names, postgres.rb:108-120). The sandbox corpus is flat,
    * so this reports the implicit "public" namespace plus any
    * subdirectory namespaces a copy created. */
  def namespacesDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    new ParquetDir(dir).listNamespaces().toDF("namespace").orderBy("namespace")
  }

  /** ANALYZE-style stats report: (table_name, n_rows, n_cols) per
    * corpus table. Column counts come from parquet footers (no scan);
    * row counts are one lazy union of count aggregates — a single job,
    * and parquet count(*) is metadata-served per row group. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = new ParquetDir(dir)
    src.listTables().map { t =>
      val df = src.read(spark, t)
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"),
          lit(df.schema.size).cast("int").as("n_cols"))
    }.reduce(_.unionByName(_)).orderBy("table_name")
  }

  /** Schema report: (col_name, pg_type, nullable) per column — the
    * reference's column_definitions (postgres.rb:137-167) re-expressed
    * through TypeMap over the parquet footer schema. */
  def schemaReport(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    new ParquetDir(dir).schemaOf(spark, table)
      .map(c => (c.name, c.pgType, c.nullable))
      .toDF("col_name", "pg_type", "is_nullable")
  }

  /** End-to-end JDBC catalog report: copy two small tables into a fresh
    * embedded Derby through the copy pipeline, then read the LIVE
    * catalog back through `JdbcSource`'s DatabaseMetaData introspection
    * (list_tables + column_definitions, postgres.rb:20-36,137-167) —
    * the same calls a live-Postgres deployment makes, exercised against
    * a genuine JDBC engine and shaped for the oracle gate. Types are
    * Derby's own names (BIGINT/CLOB via Spark's Derby dialect);
    * everything is nullable because Spark's JDBC writer creates it so. */
  def jdbcCatalogReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    val db = s"memory:graft_cat_${java.util.UUID.randomUUID().toString.take(8)}"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val jdbc = new JdbcSource(s"jdbc:derby:$db;create=true", props)
    val pd = new ParquetDir(dir)
    val rows =
      try {
        CopyPipeline.copyTable(spark, pd, jdbc, "nation")
        CopyPipeline.copyTable(spark, pd, jdbc, "region")
        jdbc.listTables().flatMap { t =>
          jdbc.columnDefinitions(t).map { case (c, ty, n) => (t.toLowerCase, c, ty, n) }
        }
      } finally {
        // in-memory Derby DBs outlive their connections until dropped —
        // without this, repeated runs (bench sweeps) leak one loaded DB
        // per call. The drop "succeeds" by throwing 08006.
        try { java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"); () }
        catch { case _: java.sql.SQLException => () }
      }
    rows.toDF("table_name", "col_name", "jdbc_type", "is_nullable")
      .orderBy("table_name", "col_name")
  }
}
