package graft.core

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite

/** Index subsystem: DDL synthesis (composite-PK fix, SURVEY §7.3),
  * real JDBC introspection + replay against embedded Derby. */
class IndexesSpec extends AnyFunSuite {

  private def qn(t: String) = QualifiedName("APP", t)

  test("ddl: composite PK keeps ALL columns (reference truncates to columns[0])") {
    val pk = IndexSpec("pk_li", QualifiedName("public", "lineitem"),
      Seq("l_orderkey", "l_linenumber"), unique = true, primary = true, where = None)
    assert(Indexes.ddl(pk) ==
      "ALTER TABLE public.lineitem ADD CONSTRAINT pk_li PRIMARY KEY (l_orderkey, l_linenumber)")
  }

  test("ddl: partial index carries its WHERE predicate") {
    val part = IndexSpec("idx_open", QualifiedName("public", "orders"),
      Seq("o_orderdate"), unique = false, primary = false,
      where = Some("o_orderstatus = 'O'"))
    assert(Indexes.ddl(part) ==
      "CREATE INDEX idx_open ON public.orders (o_orderdate) WHERE o_orderstatus = 'O'")
    val uq = IndexSpec("uq_p", QualifiedName("public", "part"),
      Seq("p_partkey"), unique = true, primary = false, where = None)
    assert(Indexes.ddl(uq) == "CREATE UNIQUE INDEX uq_p ON public.part (p_partkey)")
  }

  test("derby: introspect composite PK + secondary indexes, replay onto a new table") {
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    val db = s"memory:graft_idx_${java.util.UUID.randomUUID().toString.take(8)}"
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      val st = conn.createStatement()
      // Unquoted identifiers: Derby upper-cases them, and Indexes.ddl
      // emits unquoted names, so replay round-trips cleanly.
      st.executeUpdate(
        """CREATE TABLE APP.SRC (
          |  OK BIGINT NOT NULL, LN INT NOT NULL, QTY INT, SUPP INT,
          |  CONSTRAINT PK_SRC PRIMARY KEY (OK, LN))""".stripMargin)
      st.executeUpdate("CREATE UNIQUE INDEX UQ_SRC_SUPP ON APP.SRC (SUPP)")
      st.executeUpdate("CREATE INDEX IDX_SRC_QTY ON APP.SRC (QTY, SUPP)")

      val specs = Indexes.fromJdbc(conn, "APP", "SRC")
      val byName = specs.map(s => s.name -> s).toMap

      val pk = specs.find(_.primary).get
      assert(pk.columns == Seq("OK", "LN"),
        "composite PK must surface BOTH columns in key order")
      assert(pk.name == "PK_SRC" && pk.unique)
      assert(byName("UQ_SRC_SUPP").unique && !byName("UQ_SRC_SUPP").primary)
      assert(byName("UQ_SRC_SUPP").columns == Seq("SUPP"))
      assert(byName("IDX_SRC_QTY").columns == Seq("QTY", "SUPP"))
      assert(!byName("IDX_SRC_QTY").unique)
      // PK backing index surfaces once, under the constraint name
      assert(specs.count(_.primary) == 1)

      // Replay onto an index-less clone; re-introspect and compare.
      st.executeUpdate(
        "CREATE TABLE APP.DST (OK BIGINT NOT NULL, LN INT NOT NULL, QTY INT, SUPP INT)")
      // Replayed index names collide db-wide in Derby, so rename.
      val renamed = specs.map(s => s.copy(name = "R_" + s.name))
      Indexes.replay(conn, renamed, qn("DST"))
      val replayed = Indexes.fromJdbc(conn, "APP", "DST")
      val rpk = replayed.find(_.primary).get
      assert(rpk.columns == Seq("OK", "LN"),
        "replayed PK must keep BOTH columns — the reference bug drops LN")
      assert(replayed.map(s => (s.columns, s.unique, s.primary)).toSet ==
        specs.map(s => (s.columns, s.unique, s.primary)).toSet)
      st.close()
    } finally conn.close()
  }

  test("report: fixture rows are deterministic and carry replay DDL") {
    val df = Indexes.report(graft.SparkFixture.session, Indexes.tpchIndexes)
    val rows = df.collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    val li = rows.find(_.getString(0) == "pk_lineitem").get
    assert(li.getString(6).endsWith("PRIMARY KEY (l_orderkey, l_linenumber)"))
    val open = rows.find(_.getString(0) == "idx_orders_open").get
    assert(open.getString(6).contains("WHERE o_orderstatus = 'O'"))
    val expr = rows.find(_.getString(0) == "idx_customer_name_lower").get
    assert(expr.getString(6) ==
      "CREATE INDEX idx_customer_name_lower ON public.customer (lower(c_name))")
  }

  test("pg dialect: catalog rows with partial predicate + expression column round-trip to DDL") {
    // Fixture rows shaped exactly like Indexes.pgIndexSql's result set
    // for a table carrying a composite PK, a partial index, and an
    // expression index — what a live-PG introspection would return
    // (pg_get_expr/pg_get_indexdef are PG-server-rendered; zero-egress
    // sandbox, so the SQL execution half stays untestable here).
    val rows = Seq(
      IndexCatalogRow("pk_t", 1, "id", unique = true, primary = true, where = None),
      IndexCatalogRow("pk_t", 2, "ver", unique = true, primary = true, where = None),
      IndexCatalogRow("idx_open", 1, "created_at", unique = false, primary = false,
        where = Some("status = 'O'")),
      IndexCatalogRow("idx_email_lower", 1, "lower(email)", unique = true, primary = false,
        where = None))
    val specs = Indexes.fromCatalogRows(rows, QualifiedName("public", "t"))
    assert(specs.map(_.name) == Seq("idx_email_lower", "idx_open", "pk_t"))
    val byName = specs.map(s => s.name -> s).toMap
    assert(byName("pk_t").columns == Seq("id", "ver") && byName("pk_t").primary)
    assert(byName("idx_open").where.contains("status = 'O'"))
    assert(byName("idx_email_lower").columns == Seq("lower(email)"))
    // Replay DDL onto a copy destination carries BOTH the predicate and
    // the expression verbatim — the reference's passthrough semantics.
    val dest = QualifiedName("analytics", "t")
    assert(Indexes.ddl(byName("idx_open"), dest) ==
      "CREATE INDEX idx_open ON analytics.t (created_at) WHERE status = 'O'")
    assert(Indexes.ddl(byName("idx_email_lower"), dest) ==
      "CREATE UNIQUE INDEX idx_email_lower ON analytics.t (lower(email))")
    assert(Indexes.ddl(byName("pk_t"), dest) ==
      "ALTER TABLE analytics.t ADD CONSTRAINT pk_t PRIMARY KEY (id, ver)")
    // The dialect SQL itself pins the two PG-only capabilities.
    assert(Indexes.pgIndexSql.contains("pg_get_expr(x.indpred"))
    assert(Indexes.pgIndexSql.contains("pg_get_indexdef(x.indexrelid"))
  }
}
