package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Index metadata model — reference parity with the pgcp index
  * subsystem (lib/pgcp/postgres.rb:169-261: `index_names`,
  * `get_indexes`, `index_info` incl. the partial-index predicate via
  * `pg_get_expr(indpred)` at :212, replay in `create_indexes`
  * :243-261).
  *
  * Parquet has no indexes, so on the Spark side this is (a) a
  * metadata REPORT surface (DataFrame-shaped, oracle-checkable) and
  * (b) real JDBC-sink DDL replay — exercised against embedded Derby.
  *
  * The reference's replay truncates composite primary keys:
  * postgres.rb:248 emits `ADD PRIMARY KEY (#{index['columns'][0]})` —
  * only the FIRST column survives the copy. Fixed here (SURVEY §7.3):
  * `ddl` always emits the full column list.
  */
/** One index. `columns` entries are OPAQUE SQL passthrough — a plain
  * column name OR an expression like `lower(email)` (the reference
  * carries expressions verbatim via pg_get_indexdef, postgres.rb:233-241
  * -> replay :252, so a function index survives a copy). */
final case class IndexSpec(
    name: String,
    table: QualifiedName,
    columns: Seq[String],
    unique: Boolean,
    primary: Boolean,
    where: Option[String]) {
  require(columns.nonEmpty, s"index $name has no columns")
}

/** One (index, column-position) row as returned by an engine-dialect
  * catalog query — the shape `Indexes.fromCatalogRows` assembles into
  * IndexSpecs. `columnExpr` is the rendered column OR expression. */
final case class IndexCatalogRow(
    indexName: String,
    position: Int,
    columnExpr: String,
    unique: Boolean,
    primary: Boolean,
    where: Option[String])

object Indexes {

  /** DDL replay statement for one index against a destination table.
    * Mirrors postgres.rb:243-261 with two deliberate divergences,
    * both documented in SURVEY §7.3:
    *   - composite PKs keep ALL columns (reference keeps columns[0]);
    *   - the PK constraint keeps its name (reference drops it).
    * Identifiers are left unquoted to match the reference's output
    * shape; callers with case-sensitive names quote before calling. */
  def ddl(spec: IndexSpec, dest: QualifiedName): String = {
    val cols = spec.columns.mkString(", ")
    if (spec.primary)
      s"ALTER TABLE ${dest.fullName} ADD CONSTRAINT ${spec.name} PRIMARY KEY ($cols)"
    else {
      val uniq = if (spec.unique) "UNIQUE " else ""
      val pred = spec.where.map(w => s" WHERE $w").getOrElse("")
      s"CREATE ${uniq}INDEX ${spec.name} ON ${dest.fullName} ($cols)$pred"
    }
  }

  def ddl(spec: IndexSpec): String = ddl(spec, spec.table)

  /** Introspect a JDBC table's indexes through standard
    * `DatabaseMetaData` (`getPrimaryKeys` + `getIndexInfo`) — the
    * portable analogue of the reference's pg_catalog queries
    * (postgres.rb:169-241). Partial-index predicates are not exposed
    * by JDBC metadata, so `where` is always None on this path (the
    * pg_catalog `pg_get_expr(indpred)` trick at postgres.rb:212 is
    * PG-specific; a live-PG deployment would layer it on top). */
  def fromJdbc(conn: java.sql.Connection, schema: String, table: String): Seq[IndexSpec] = {
    val md = conn.getMetaData
    // PK columns in KEY_SEQ order, plus the constraint's name.
    var pkName: Option[String] = None
    val pkCols = scala.collection.mutable.ArrayBuffer[(Short, String)]()
    val prs = md.getPrimaryKeys(null, schema, table)
    try {
      while (prs.next()) {
        pkCols += ((prs.getShort("KEY_SEQ"), prs.getString("COLUMN_NAME")))
        Option(prs.getString("PK_NAME")).foreach(n => pkName = Some(n))
      }
    } finally prs.close()
    val pkColumns = pkCols.sortBy(_._1).map(_._2).toSeq

    // Secondary indexes: group getIndexInfo rows by index name,
    // columns in ORDINAL_POSITION order.
    val rows = scala.collection.mutable.ArrayBuffer[(String, Short, String, Boolean)]()
    val irs = md.getIndexInfo(null, schema, table, false, false)
    try {
      while (irs.next()) {
        val name = irs.getString("INDEX_NAME")
        val col = irs.getString("COLUMN_NAME")
        if (name != null && col != null)
          rows += ((name, irs.getShort("ORDINAL_POSITION"), col, !irs.getBoolean("NON_UNIQUE")))
      }
    } finally irs.close()

    val qn = QualifiedName(schema, table)
    val secondary = rows.groupBy(_._1).toSeq.map { case (name, rs) =>
      val cols = rs.sortBy(_._2).map(_._3).toSeq
      IndexSpec(name, qn, cols, unique = rs.head._4,
        primary = cols == pkColumns && pkColumns.nonEmpty, where = None)
    }
    // The PK's backing index usually appears in getIndexInfo under a
    // system-generated name; surface it ONCE under the constraint name.
    val (pks, plain) = secondary.partition(_.primary)
    val pkSpec =
      if (pkColumns.isEmpty) Seq.empty
      else Seq(IndexSpec(pkName.getOrElse(pks.headOption.map(_.name).getOrElse("pk_" + table)),
        qn, pkColumns, unique = true, primary = true, where = None))
    (pkSpec ++ plain).sortBy(_.name)
  }

  /** The PostgreSQL catalog query behind `JdbcSource.indexesOf` on
    * pg URLs: one row per (index, key-column position) with the
    * PARTIAL-INDEX PREDICATE via pg_get_expr(indpred, indrelid) and the
    * column rendered by pg_get_indexdef(indexrelid, n, true) — which
    * yields the plain name for a column index and the expression text
    * for an expression index, exactly the reference's passthrough
    * (postgres.rb:212, :233-241). DatabaseMetaData cannot express
    * either, which is why the portable path (`fromJdbc`) always reports
    * where=None and name-only columns. Only VALID, LIVE, non-exclusion
    * indexes qualify: a half-built index from an aborted CREATE INDEX
    * CONCURRENTLY must not be replayed, and an exclusion constraint's
    * backing index replayed as a plain index would silently lose its
    * semantics. Parameters: (schema, table). */
  val pgIndexSql: String =
    """SELECT i.relname AS index_name,
      |       k.pos AS position,
      |       pg_get_indexdef(x.indexrelid, k.pos, true) AS column_expr,
      |       x.indisunique AS is_unique,
      |       x.indisprimary AS is_primary,
      |       pg_get_expr(x.indpred, x.indrelid) AS where_pred
      |FROM pg_index x
      |JOIN pg_class i ON i.oid = x.indexrelid
      |JOIN pg_class t ON t.oid = x.indrelid
      |JOIN pg_namespace n ON n.oid = t.relnamespace
      |CROSS JOIN LATERAL generate_series(1, x.indnkeyatts) AS k(pos)
      |WHERE n.nspname = ? AND t.relname = ?
      |  AND x.indisvalid AND x.indislive AND NOT x.indisexclusion
      |ORDER BY index_name, position""".stripMargin

  /** Run `pgIndexSql` over a live connection and assemble the specs.
    * Untestable against real PG in this sandbox (zero egress) — the
    * row-assembly half (`fromCatalogRows`) is specced on fixture rows
    * shaped exactly like the query's result set. */
  def fromPgCatalog(conn: java.sql.Connection, schema: String, table: String): Seq[IndexSpec] = {
    val ps = conn.prepareStatement(pgIndexSql)
    val rows = scala.collection.mutable.ArrayBuffer[IndexCatalogRow]()
    try {
      ps.setString(1, schema)
      ps.setString(2, table)
      val rs = ps.executeQuery()
      try {
        while (rs.next())
          rows += IndexCatalogRow(
            rs.getString("index_name"), rs.getInt("position"),
            rs.getString("column_expr"), rs.getBoolean("is_unique"),
            rs.getBoolean("is_primary"), Option(rs.getString("where_pred")))
      } finally rs.close()
    } finally ps.close()
    fromCatalogRows(rows.toSeq, QualifiedName(schema, table))
  }

  /** Assemble per-position catalog rows into IndexSpecs: group by index
    * name, columns/expressions in position order, unique/primary/where
    * from any row of the group (constant per index). */
  def fromCatalogRows(rows: Seq[IndexCatalogRow], qn: QualifiedName): Seq[IndexSpec] =
    rows.groupBy(_.indexName).toSeq.map { case (name, rs) =>
      IndexSpec(name, qn, rs.sortBy(_.position).map(_.columnExpr),
        unique = rs.head.unique, primary = rs.head.primary, where = rs.head.where)
    }.sortBy(_.name)

  /** Replay introspected indexes onto a destination JDBC table —
    * `create_indexes` (postgres.rb:243-261) with the composite-PK fix.
    * Partial indexes (where != None) are engine-specific DDL; callers
    * targeting engines without them generate via `ddl` and filter. */
  def replay(conn: java.sql.Connection, specs: Seq[IndexSpec], dest: QualifiedName): Unit = {
    val st = conn.createStatement()
    try specs.foreach(s => st.executeUpdate(ddl(s, dest)))
    finally st.close()
  }

  /** Report surface: one row per index with its replay DDL — the
    * DataFrame analogue of get_indexes (postgres.rb:191-203), shaped
    * for the oracle gate (deterministic, orderBy index_name). `where`
    * surfaces as '' when absent: the driver hash treats NULL vs ''
    * consistently only if both engines agree, and VALUES literals
    * with '' are unambiguous. */
  def report(spark: SparkSession, specs: Seq[IndexSpec]): DataFrame = {
    import spark.implicits._
    specs.map { s =>
      (s.name, s.table.fullName, s.columns.mkString(", "),
        s.unique, s.primary, s.where.getOrElse(""), ddl(s))
    }.toDF("index_name", "table_name", "index_columns",
        "is_unique", "is_primary", "where_pred", "ddl")
      .orderBy("index_name")
  }

  /** The canonical index set a PG-hosted TPC-H schema carries — the
    * fixture `index_report` runs over. Exercises every replay shape:
    * single-column PK, COMPOSITE PK (the reference-bug case), unique
    * secondary, plain secondary, a partial index, and an EXPRESSION
    * index (pg_get_indexdef passthrough, postgres.rb:233-241). */
  def tpchIndexes: Seq[IndexSpec] = {
    def qn(t: String) = QualifiedName("public", t)
    Seq(
      IndexSpec("pk_nation", qn("nation"), Seq("n_nationkey"),
        unique = true, primary = true, where = None),
      IndexSpec("pk_lineitem", qn("lineitem"), Seq("l_orderkey", "l_linenumber"),
        unique = true, primary = true, where = None),
      IndexSpec("uq_part_partkey", qn("part"), Seq("p_partkey"),
        unique = true, primary = false, where = None),
      IndexSpec("idx_orders_custkey", qn("orders"), Seq("o_custkey"),
        unique = false, primary = false, where = None),
      IndexSpec("idx_orders_open", qn("orders"), Seq("o_orderdate"),
        unique = false, primary = false, where = Some("o_orderstatus = 'O'")),
      IndexSpec("idx_customer_name_lower", qn("customer"), Seq("lower(c_name)"),
        unique = false, primary = false, where = None))
  }
}
