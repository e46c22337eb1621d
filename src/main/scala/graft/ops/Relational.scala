package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator surface (SURVEY §2b): joins, aggregation,
  * windows, sort/limit, set ops, scalar functions — all Spark
  * built-ins so Catalyst keeps pushdown/pruning/codegen.
  *
  * Determinism discipline (SURVEY §5.2): money aggregates go through
  * DecimalType (exact, order-independent) and surface as
  * round(...,2)::double; every limit has a total order with
  * tie-breakers.
  */
object Relational {

  private def money(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary: hash aggregate with map-side
    * partial agg; one shuffle on the (tiny) group key. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(money("l_quantity")), 2).cast("double").as("sum_qty"),
        round(sum(money("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(money("l_extendedprice") * (lit(1).cast("decimal(18,2)") - money("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + projection: both reach the parquet scan (PushedFilters +
    * ReadSchema in the physical plan) — zero-shuffle. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp_ntz") &&
              col("l_discount") >= 0.08 && col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))

  /** Star join: fact->dims with explicit broadcast of the small sides.
    * At 100 TB the fact never shuffles for these joins — every dim
    * ships to the executors. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(money("o_totalprice")), 2).cast("double").as("total_revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Fact-fact join: lineitem x orders on orderkey. Sort-merge at
    * scale (both sides shuffle on the join key); AQE may elect
    * broadcast at small SF. */
  def factJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           round(sum(money("l_extendedprice")), 2).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q3-shaped composite (shipping priority): the full analytic
    * pipeline in one query — selective filters pushed to all three
    * scans, the segment-pruned customer dim BROADCAST against orders,
    * the surviving orders joined to lineitem on the shuffle key,
    * decimal-exact revenue aggregation, then a global top-10 via
    * TakeOrderedAndProject (no full sort materializes). At 100 TB the
    * only shuffle is lineitem x orders on orderkey; the customer probe
    * ships to executors. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp_ntz")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
      .agg(round(sum(money("l_extendedprice") *
             (lit(1).cast("decimal(18,2)") - money("l_discount"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Left-semi: customers that have orders — no payload from the right
    * side crosses the shuffle. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti: customers with no URGENT order (every customer has
    * SOME order in the corpus, so the unfiltered variant is empty). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Range (theta) join against a tiny in-line band table — broadcast
    * nested loop on a 6-row build side, so the probe side streams. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // part.p_retailprice spans [900, 1000) in the corpus — 4 bands of
    // 25 plus a catch-all, so every band carries real weight.
    val bands = Seq(
      ("p900_925", 900.0, 925.0), ("p925_950", 925.0, 950.0),
      ("p950_975", 950.0, 975.0), ("p975_1000", 975.0, 1000.0),
      ("p1000_inf", 1000.0, 1e18))
      .toDF("band", "lo", "hi")
    val p = Tables.part(spark, dir)
    p.join(broadcast(bands),
        p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
           round(sum(money("p_retailprice")), 2).cast("double").as("sum_price"))
      .orderBy("band")
  }

  /** Ranking window: top-3 orders per priority (row_number with full
    * tie-break). One shuffle on the partition key. */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Frame window: per-customer running order total (exact decimal
    * accumulation, surfaced as rounded double). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_total",
        round(sum(money("o_totalprice")).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame window: per-customer trailing-30-day revenue — the
    * frame is value-based (epoch days), not row-based, so same-day
    * orders are all included regardless of intra-day order
    * (deterministic without an intra-day tie-break). */
  def trailing30d(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("d"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("d", datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")))
      .withColumn("trailing_30d",
        round(sum(money("o_totalprice")).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** first_value / last_value / nth_value over an unbounded frame:
    * each order annotated with its customer's first, latest, and
    * second order total. */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val wFull = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wFull).as("first_total"),
        last(col("o_totalprice")).over(wFull).as("last_total"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global sort + limit: planner collapses to TakeOrderedAndProject —
    * no full sort materializes, each partition keeps only k rows. */
  def topKGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** Set ops over aligned schemas. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val both = hi.intersect(urgent).withColumn("tag", lit("both"))
    val hiOnly = hi.except(urgent).withColumn("tag", lit("hi_only"))
    both.union(hiOnly)
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .orderBy("tag")
  }

  /** Grouping sets via rollup. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
           round(sum(money("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Grouping sets via cube. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(col("l_partkey")).as("n_part"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HLL sketch distinct — the scale path (one pass, fixed memory, no
    * expand). Not oracle-checkable (approximate); rows-only check. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_part"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Scalar string functions (codegen'd built-ins, no UDFs). */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).cast("bigint").as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Scalar date functions. */
  def dateFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        quarter(col("o_orderdate")).cast("bigint").as("o_quarter"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(money("o_totalprice")), 2).cast("double").as("revenue"))
      .orderBy("o_year", "o_quarter")

  /** Salted equi-join for skewed keys: the probe side gets a random-
    * free deterministic salt (hash of a tie-breaker column mod
    * `salts`), the build side is exploded `salts` ways, and the join
    * key becomes (key, salt) — a hot key's rows spread over `salts`
    * reducers instead of one. AQE's skew-join handles this adaptively
    * at runtime; this operator is the explicit form for engines/plans
    * where AQE can't see the skew (e.g. first run, no stats).
    *
    * Result is IDENTICAL to the plain join (the salt is internal), so
    * the oracle is the unsalted SQL join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTieBreak: String, salts: Int = 8): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(leftTieBreak)), lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe fact join: lineitem x orders via saltedJoin — the same
    * aggregate as `fact_join`, oracle-identical output. */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey")
    saltedJoin(l, o, "l_orderkey", "l_linenumber")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           round(sum(money("l_extendedprice")), 2).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** CTAS + raw-SQL passthrough (reference create_table_from_query,
    * postgres.rb:80-91, and exec, postgres.rb:13-18): register the
    * scan as a view, run ANSI SQL through spark.sql, materialize via
    * saveAsTable (overwrite = the reference's drop-and-recreate txn),
    * read the TABLE back. */
  /** Drop a managed table AND its warehouse location — a stale dir
    * from a previous JVM (fresh in-memory catalog) blocks saveAsTable. */
  private def dropManaged(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
  }

  /** Bucketed co-located join: both sides written bucketed+sorted on
    * the join key (8 buckets), then joined — the plan has NO Exchange
    * before the join (bucketing pre-shuffles at write time, the layout
    * every repeated big-big join should buy at 100 TB). */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    dropManaged(spark, "graft_li_bucketed"); dropManaged(spark, "graft_ord_bucketed")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_ord_bucketed")
    val l = spark.table("graft_li_bucketed")
    val o = spark.table("graft_ord_bucketed")
    // merge hint: at corpus scale AQE would (rightly) broadcast; the
    // hint forces the sort-merge path this operator demonstrates —
    // bucketed scans feed the SMJ with NO Exchange on either side.
    l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
           round(sum(money("l_extendedprice")), 2).cast("double").as("sum_price"))
      .orderBy("l_returnflag", "o_orderpriority")
  }

  def ctas(spark: SparkSession, dir: String): DataFrame = {
    dropManaged(spark, "graft_ctas_orders")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    val q = spark.sql(
      """SELECT o_orderstatus,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE)
        |         AS revenue
        |FROM orders_v GROUP BY o_orderstatus""".stripMargin)
    q.write.mode("overwrite").saveAsTable("graft_ctas_orders")
    spark.table("graft_ctas_orders").orderBy("o_orderstatus")
  }

  /** Pivot: order counts per year x priority, priorities as columns.
    * Explicit pivot values — no extra distinct-discovery job. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_year"), col("1-URGENT").as("urgent"), col("2-HIGH").as("high"),
        col("3-MEDIUM").as("medium"), col("4-NOT SPECIFIED").as("unspecified"),
        col("5-LOW").as("low"))
      .orderBy("o_year")

  /** Exact percentiles (Spark `percentile`, interpolated — matches
    * DuckDB quantile_cont) of order totals per status. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy("o_orderstatus")

  /** Error-safe arithmetic (`try_*`): Spark 4 runs ANSI mode by
    * default, where division by zero and overflow THROW mid-job — on a
    * 100 TB scan one poisoned row kills hours of work. The `try_`
    * family turns those rows into NULLs the pipeline can quarantine
    * instead: the production posture for data you didn't author.
    * Here: unit price guarded against zero quantity, a deliberately
    * overflowing bigint product, and a lossy string->int cast. */
  def tryFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        // floor-scaled, not round(): both engines compute the identical
        // IEEE double quotient, but their round() tie-breaks differ on
        // half-ulp boundaries; floor of the same double is unambiguous
        expr("CAST(floor(try_divide(l_extendedprice, l_quantity - 1.0) * 10000) AS BIGINT)")
          .as("unit_price_m1_e4"),
        expr("try_multiply(l_orderkey * 1000000000L, l_partkey * 1000000000L)")
          .as("overflow_prod"),
        expr("try_cast(l_returnflag AS INT)").as("flag_int"),
        expr("try_add(l_linenumber, 1)").as("ln_next"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Correlated scalar subquery: each BUILDING customer's max order
    * price, written the way an analyst writes it (a scalar subquery in
    * the SELECT list). Catalyst DECORRELATES it into a left outer
    * aggregate join — no per-row re-execution, one shuffle on custkey —
    * which is exactly why the declarative form survives 100 TB where a
    * nested-loop interpretation wouldn't. Orderless customers surface
    * NULL (left-outer semantics of decorrelation). */
  def corrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_cs_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_cs_orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM graft_cs_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM graft_cs_customer c
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders
    * per MACHINERY customer — the SQL-standard spelling of per-group
    * top-k. Catalyst decorrelates the limited sort into a window-rank
    * filter over one join, the same plan `topk_per_group` builds by
    * hand with row_number; declared separately because LATERAL is its
    * own surface (the reference's users write it; engines that only
    * nested-loop it die at scale). */
  def lateralTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_lt_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_lt_orders")
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_lt_customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lt_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
        |WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): per-row ancestor chains
    * over the synthetic binary-tree hierarchy node -> node DIV 2 —
    * depth and path sum per starting order key. The declarative twin of
    * the hand-rolled iteration `dup_classes` uses: Catalyst drives the
    * fixpoint (each recursion step is one self-join + filter, UNION ALL
    * accumulates), which is the right tool when the recursion is
    * acyclic and depth-bounded (log2(maxKey) ~ 11 here). For cyclic
    * reachability at 100 TB the iterative min-label loop with its
    * parquet barriers stays the scale path — a recursive CTE has no
    * mid-recursion materialization barrier. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).filter(col("o_orderkey") < 2048)
      .select("o_orderkey").createOrReplaceTempView("graft_rc_orders")
    spark.sql(
      """WITH RECURSIVE anc(okey, node) AS (
        |  SELECT o_orderkey, o_orderkey FROM graft_rc_orders
        |  UNION ALL
        |  SELECT okey, node DIV 2 FROM anc WHERE node > 1)
        |SELECT okey AS o_orderkey, count(*) AS depth, sum(node) AS path_sum
        |FROM anc GROUP BY okey ORDER BY o_orderkey""".stripMargin)
  }

  /** Approximate percentiles via Spark's mergeable quantile sketch
    * (`approx_percentile`, Greenwald-Khanna) — the single-pass,
    * fixed-memory answer the exact `percentiles` query (full sort per
    * group) can't give at 100 TB: partial sketches merge across
    * partitions, so cost is one scan + sketch-sized shuffle no matter
    * the data volume. Accuracy 1000 bounds rank error at n/1000 per
    * group. Rows-only like `approx_distinct` (the sketch is
    * engine-specific, no DuckDB twin); ApproxSpec pins the rank-error
    * bound against the exact order statistics. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      // ONE sketch queried at three percentiles (array form) — three
      // scalar approx_percentile calls would each maintain and merge
      // their own sketch over every row, 3x the work for no accuracy.
      .agg(
        expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 1000)").as("aps"),
        count(lit(1)).as("n_rows"))
      .select(col("o_orderstatus"),
        element_at(col("aps"), 1).as("ap50"),
        element_at(col("aps"), 2).as("ap90"),
        element_at(col("aps"), 3).as("ap99"),
        col("n_rows"))
      .orderBy("o_orderstatus")

  /** Statistical aggregates: stddev / variance / correlation /
    * covariance per group, rounded to absorb partial-agg float-order
    * noise (both engines compute in double; ~1e-12 relative error). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    // Moments from EXACT decimal sums (data is <=4dp), then the
    // stddev/var/corr/covar formulas in double — partition-order
    // independent, so the result is bit-stable and oracle-checkable
    // (built-in stddev_samp/corr merge partial double moments in
    // partition order and drift in the last rounded digit).
    val q = col("l_quantity").cast("decimal(18,2)")
    val p = col("l_extendedprice").cast("decimal(18,2)")
    val d = col("l_discount").cast("decimal(18,4)")
    val t = col("l_tax").cast("decimal(18,4)")
    val n = col("n").cast("double")
    def dbl(c: Column) = c.cast("double")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(p).as("sp"), sum(q * q).as("sqq"),
        sum(p * p).as("spp"), sum(q * p).as("sqp"),
        sum(d).as("sd"), sum(t).as("st"), sum(d * t).as("sdt"))
      .select(col("l_returnflag"),
        // `+ 0.0` after every round: IEEE addition maps -0.0 to +0.0
        // (exact no-op for all other values), so a covariance that
        // rounds to negative zero hashes identically in both engines
        // (the r1/r2 hash mismatch was Spark +0.0 vs DuckDB -0.0).
        (round(sqrt((dbl(col("spp")) - dbl(col("sp")) * dbl(col("sp")) / n) / (n - 1)), 2) + 0.0)
          .as("price_sd"),
        (round((dbl(col("sqq")) - dbl(col("sq")) * dbl(col("sq")) / n) / (n - 1), 4) + 0.0)
          .as("qty_var"),
        (round((dbl(col("sqp")) - dbl(col("sq")) * dbl(col("sp")) / n) /
          (sqrt(dbl(col("sqq")) - dbl(col("sq")) * dbl(col("sq")) / n) *
           sqrt(dbl(col("spp")) - dbl(col("sp")) * dbl(col("sp")) / n)), 4) + 0.0)
          .as("qty_price_corr"),
        (round((dbl(col("sdt")) - dbl(col("sd")) * dbl(col("st")) / n) / (n - 1), 6) + 0.0)
          .as("disc_tax_cov"))
      .orderBy("l_returnflag")
  }

  /** Histogram: fixed-width binning with integer floor arithmetic
    * (deterministic in any engine, unlike engine-specific histogram
    * aggregates). Width-200 bins — ~520 over the corpus price range
    * [900, ~105000). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("bin", floor((col("l_extendedprice") - 900.0) / 200.0).cast("bigint"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
           round(min(col("l_extendedprice")), 2).as("lo"),
           round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy("bin")

  /** Cross join (cartesian) of the two tiny dims — the one join shape
    * that must never see a big input at scale. */
  def crossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).crossJoin(Tables.nation(spark, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** Null-handling scalar functions: nullif / coalesce / nvl-style
    * defaults, plus null-sensitive counting. */
  def nullFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("flag_n", nullif(col("l_returnflag"), lit("N")))
      .groupBy(coalesce(col("flag_n"), lit("none")).as("flag_or_none"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("flag_n")).as("n_nonnull"),
           round(sum(when(col("flag_n").isNull, money("l_extendedprice"))), 2)
             .cast("double").as("null_flag_price"))
      .orderBy("flag_or_none")

  /** Union by name with missing columns: schema-mergeful append — the
    * shape of incremental ingest where late batches add columns. */
  def unionByName(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    val b = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderstatus"), lit("?")).as("status"))
      .agg(count(lit(1)).as("n"),
           round(sum(money("o_totalprice")), 2).cast("double").as("total"))
      .orderBy("status")
  }

  /** Scalar math functions — per-row (no float reordering risk). */
  def mathFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("net_price"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
        ceil(col("l_tax") * 100).cast("bigint").as("tax_pct_ceil"),
        abs(col("l_discount") - 0.05).cast("double").as("disc_dev"))
      .orderBy("l_orderkey", "l_linenumber")

  // ------------------------------------------------ round-2 breadth ops

  /** Unpivot / melt: wide numeric columns -> long (metric, val) rows —
    * Spark's Dataset.unpivot (map-only, no shuffle). */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "val")
      .orderBy("p_partkey", "metric")

  /** Deterministic hash sampling: keep rows whose md5-derived bucket is
    * < rate% — reproducible in any engine (unlike TABLESAMPLE), stable
    * under re-runs/retries at any scale, and pushes down as a plain
    * filter over the scan. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DetHash
    Tables.orders(spark, dir)
      .filter(DetHash.hex60(concat(lit("s:"), col("o_orderkey"))) % 100 < 10)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(money("o_totalprice")), 2).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Distribution windows: ntile / percent_rank / cume_dist over a
    * global total order — WITHOUT the single-partition Exchange that
    * `Window.orderBy(...)` (no partitionBy) plans. Instead:
    * range-partitioned global sort (Spark's orderBy) + per-partition
    * offsets via zipWithIndex (which runs one count job over the
    * sorted partitions, then a narrow map — every partition ranks in
    * parallel). The ordering key is UNIQUE (tie-break on o_orderkey),
    * so rank == row_number and the window functions reduce to closed
    * forms over (rank, n):
    *   percent_rank = (r-1)/(n-1),  cume_dist = r/n,
    *   ntile(k): first n%k buckets get n/k+1 rows, the rest n/k.
    * Both engines evaluate the same integer-exact double divisions, so
    * the result is bit-stable vs the oracle's true window form —
    * equivalence is also locked by a unit spec against Spark's own
    * window implementation. */
  def ntileDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val src = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val n = src.count() // parquet footer-stats count, no data scan
    val sorted = src.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L)) },
      sorted.schema.add("rk", LongType, nullable = false))
    val base = n / 10; val rem = n % 10; val cut = rem * (base + 1)
    ranked.select(col("o_orderkey"),
        expr(s"CAST(CASE WHEN rk <= $cut THEN (rk - 1) DIV ${base + 1} + 1" +
             s" ELSE $rem + (rk - $cut - 1) DIV ${math.max(base, 1)} + 1 END AS INT)")
          .as("decile"),
        // n==1 guard: percent_rank of a single row is 0, not 0/0
        (if (n > 1)
          round((col("rk") - 1).cast("double") / lit(n - 1).cast("double"), 6)
        else lit(0.0)).as("pct_rank"),
        round(col("rk").cast("double") / lit(n).cast("double"), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** Ordered string aggregation (listagg): names per region, sorted
    * inside the group so the result is deterministic. */
  def stringAggGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
      .orderBy("n_regionkey")

  /** Date spine + zero-fill: generate a month calendar, left-join
    * actuals, fill gaps — the standard reporting/gap-fill shape.
    * The spine is sequence()+explode (no driver loop). */
  def dateSpine(spark: SparkSession, dir: String): DataFrame = {
    val spine = spark.range(1)
      .select(explode(sequence(
        to_date(lit("1996-01-01")), to_date(lit("1996-12-01")),
        expr("interval 1 month"))).as("m"))
      .select(date_format(col("m"), "yyyy-MM").as("month"))
    val actual = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1996)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(money("o_totalprice")), 2).cast("double").as("revenue"))
    spine.join(actual, Seq("month"), "left")
      .select(col("month"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("month")
  }

  /** Bitmap aggregates: bit_or / bit_and / bit_xor over int columns. */
  def bitmapAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("bit_or(l_linenumber)").cast("bigint").as("ln_or"),
        expr("bit_and(l_linenumber)").cast("bigint").as("ln_and"),
        expr("bit_xor(l_linenumber)").cast("bigint").as("ln_xor"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Conditional aggregates: count_if / bool_or / bool_and / max_by /
    * min_by (arg-max keyed by the UNIQUE o_orderkey — deterministic). */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(expr("count_if(o_totalprice > 150000)").as("n_big"),
        expr("bool_or(o_orderstatus = 'F')").as("any_f"),
        expr("bool_and(o_totalprice > 0)").as("all_pos"),
        expr("max_by(o_custkey, o_orderkey)").as("last_cust"),
        expr("min_by(o_custkey, o_orderkey)").as("first_cust"))
      .orderBy("o_orderpriority")

  /** Explicit GROUPING SETS with grouping_id — beyond rollup/cube:
    * an arbitrary set list, with the grouping bitmask surfaced. */
  def groupingSetsId(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_qty
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** CDC latest-per-key dedup: keep each customer's most recent order
    * (row_number = 1 over a per-key DESC order with unique tie-break) —
    * one shuffle on the dedup key, the canonical mutable-table compact. */
  def windowDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"))
      .orderBy("o_custkey")
  }

  /** Regexp surface: extract_all + extract + rlike over part names. */
  def regexpFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)))
          .cast("bigint").as("n_words"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        col("p_name").rlike("an").as("has_an"))
      .orderBy("p_partkey")

  /** Full outer join: customers-per-nation (one segment) against
    * suppliers-per-nation — either side may be absent, coalesce fills.
    * Both inputs are pre-aggregated (tiny), so the join broadcasts. */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey").cast("bigint").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").cast("bigint").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** CDC merge/upsert (MERGE INTO semantics on plain parquet): a
    * derived update batch (status -> 'X', +100 price for every 10th
    * order) plus an insert batch (re-keyed clones of every 1000th
    * order) merged onto the base via full outer join + coalesce —
    * matched rows take the update, unmatched keep base, inserts
    * append. One shuffle on the merge key; at 100 TB the same shape
    * rides a bucketed/partitioned layout so only touched partitions
    * rewrite. Output is the per-status summary of the merged table. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("X").as("u_status"),
        (col("o_totalprice") + 100.0).as("u_totalprice"))
    // Insert clones re-key past the ACTUAL max key (a fixed constant
    // collides with real keys once the corpus scales past it, silently
    // double-matching the outer join).
    val shift = base.agg(max(col("o_orderkey"))).head().getAs[Number](0).longValue() + 1L
    val inserts = base.filter(col("o_orderkey") % 1000 === 0)
      .select((col("o_orderkey") + shift).as("o_orderkey"),
        lit("I").as("u_status"), col("o_totalprice").as("u_totalprice"))
    val delta = updates.unionByName(inserts)
    base.join(delta, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("u_status"), col("o_orderstatus")).as("status"),
        coalesce(col("u_totalprice"), col("o_totalprice")).as("totalprice"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        round(sum(money("totalprice")), 2).cast("double").as("revenue"))
      .orderBy("status")
  }

  /** mode() + median() aggregates (Spark 3.4+ built-ins). The group
    * column is chosen so the mode is UNIQUE per group at the verified
    * scale (probed: top-flag margins are clear at sf0.01) — mode ties
    * are engine-arbitrary and would flap the oracle hash. median on an
    * even count interpolates in double; round(4) quantizes the ulp. */
  def modeMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_linenumber")
      .agg(mode(col("l_returnflag")).as("mode_flag"),
        round(median(col("l_quantity")), 4).cast("double").as("median_qty"),
        round(median(col("l_extendedprice")), 4).cast("double").as("median_price"),
        count(lit(1)).as("n"))
      .orderBy("l_linenumber")

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other instead of vanishing — the semantics every
    * nullable-dimension-key join actually wants. Nation 3 is folded to
    * NULL on BOTH pre-aggregated sides, so the output carries a genuine
    * NULL<=>NULL matched row; full-outer keeps supplier-less nations.
    * Both sides are aggregate-sized -> broadcastable at any corpus SF. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(expr("nullif(c_nationkey, 3)").cast("bigint").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(expr("nullif(s_nationkey, 3)").cast("bigint").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, c("k") <=> s("sk"), "full_outer")
      .select(coalesce(col("k"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      // coalesce of the matched NULL<=>NULL pair stays NULL — order it
      // deterministically on a non-null proxy so both engines agree
      .orderBy(coalesce(col("nationkey"), lit(-1L)))
  }

  /** TPC-H Q18 shape: IN-subquery over an aggregated HAVING ("orders
    * whose total quantity exceeds 250"). The subquery collapses
    * lineitem to order grain FIRST (map-side partial agg), and the
    * HAVING leaves a tiny key set -> Catalyst plans the IN as a
    * broadcast semi/equi join against the fact; customer is a
    * broadcast dim. At 100 TB the only full-data shuffle is the
    * order-grain aggregation itself. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(money("l_quantity")).as("qty"))
      .filter(col("qty") > 250)
    val orders = Tables.orders(spark, dir)
    orders
      .join(hi, orders("o_orderkey") === hi("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        orders("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
        round(col("qty"), 2).cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Runtime-filter join pruning with a Bloom sketch (the 4th sketch
    * beside HLL / GK / CMS): build a Bloom filter over the SMALL
    * filtered dim's keys (two dim-sized jobs), broadcast it, and
    * prefilter the fact BEFORE the join — ~75% of fact rows drop at
    * the scan, never reaching the shuffle/build. False positives are
    * harmless: the exact join behind the prefilter removes them, so
    * the result is exactly the plain join (what the oracle checks).
    * This is the manual form of Spark's own
    * spark.sql.optimizer.runtime.bloomFilter InjectRuntimeFilter rule
    * (which needs stats thresholds to fire); at 100 TB you'd feed the
    * sketch the same way and keep the fact scan-side. */
  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(spark, dir)
      .filter(col("p_size") <= 9)
      .select(col("p_partkey"), col("p_brand"))
    val nKeys = math.max(dim.count(), 1L) // dim-sized job; at scale: stats
    val bf = dim.stat.bloomFilter("p_partkey", nKeys, 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    // Catalyst BloomFilterMightContain (codegen'd, same expression
    // InjectRuntimeFilter plants) instead of a per-row Scala UDF: the
    // probe stays inside whole-stage codegen on the fact scan.
    val li = Tables.lineitem(spark, dir)
    li.filter(org.apache.spark.sql.graft.Bridge
        .bloomMightContain(bytes.toByteArray, col("l_partkey"))) // sketch prefilter, fact side
      .join(broadcast(dim), col("l_partkey") === col("p_partkey")) // exact
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(money("l_extendedprice")), 2).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  /** Collation-aware aggregation (Spark 4 collations): grouping under
    * UTF8_LCASE folds case variants into one group while count(DISTINCT
    * <binary>) still sees the variants. The projected group key is
    * lower()ed — the collated representative is whichever variant a
    * partition saw first, which is not deterministic; its lcase image
    * is. Case mix is derived deterministically from the row key. */
  def collationAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("seg_mixed",
        when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
          .otherwise(lower(col("c_mktsegment"))))
      .groupBy(collate(col("seg_mixed"), "UTF8_LCASE").as("seg_key"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("seg_mixed")).as("n_case_variants"))
      .select(lower(col("seg_key")).as("segment"), col("n"), col("n_case_variants"))
      .orderBy("segment")

  /** SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    * unlike a JVM closure UDF, the body INLINES into the plan — the
    * aggregate below stays whole-stage-codegen with no serialization
    * boundary. The UDF computes in DECIMAL (the corpus prices/rates
    * are exact 2dp values, so the product is exact and round(.,2) is
    * engine-independent — round(double,2) per row drifted the sf0.01
    * sum by 0.03 across engines); the sum is decimal-exact. */
  def sqlUdfQuery(spark: SparkSession, dir: String): DataFrame = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_price(
        |  ep DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
        |RETURN CAST(round(CAST(ep AS DECIMAL(18,2))
        |  * (1 - CAST(disc AS DECIMAL(4,2)))
        |  * (1 + CAST(tax AS DECIMAL(4,2))), 2) AS DOUBLE)""".stripMargin)
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_sqludf")
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(round(sum(CAST(graft_net_price(l_extendedprice, l_discount, l_tax)
        |       AS DECIMAL(18,2))), 2) AS DOUBLE) AS net_revenue,
        |  count(*) AS n
        |FROM lineitem_sqludf GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Typed-Aggregator UDAF (functions/GeoMean.scala): geometric mean of
    * part retail price per brand — registered via functions.udaf, the
    * partial/final two-phase plan of any built-in agg with an exact
    * decimal sum buffer (partition-order independent). */
  def geoMeanAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("geo_mean",
      udaf(graft.functions.GeoMean, org.apache.spark.sql.Encoders.scalaDouble))
    Tables.part(spark, dir)
      .groupBy("p_brand")
      .agg(round(expr("geo_mean(p_retailprice)"), 4).cast("double").as("geo_price"),
        count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  /** Generator functions: posexplode keeps the ORDINAL the bare
    * explode loses (token position matters for any sequence feature).
    * Map-side generate -> one shuffle on the (tiny) position key. */
  def generatorFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .groupBy(col("pos").cast("bigint").as("pos"))
      .agg(count(lit(1)).as("n_words"),
        countDistinct(col("word")).as("n_distinct"))
      .orderBy("pos")

  /** Interval arithmetic on timestamps/dates. */
  def intervalArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp") + expr("interval 30 day"))
          .as("deadline_us"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("bigint").as("days_since_92"),
        month(col("o_orderdate")).cast("int").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("int").as("o_day"))
      .orderBy("o_orderkey")

  /** Revenue share with a global-total scalar subquery (TPC-H Q11's
    * HAVING-against-a-fraction-of-the-whole shape): nations whose
    * order revenue exceeds 4% of total. Per-nation revenue and the
    * grand total are both exact decimal sums (order-independent,
    * map-side combined); the total is a 1-row broadcast crossJoin, so
    * the "subquery" costs one extra reduce of the already-aggregated
    * 25 rows — the fact table is scanned once. The share division is
    * rounded, so the >0.04 boundary replays identically. */
  def revenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(sum(money("o_totalprice")).as("rev"))
    val total = rev.agg(sum(col("rev")).as("tot"))
    rev.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("rev").cast("double") / col("tot").cast("double"), 6))
      .filter(col("share") > 0.04)
      .select(col("n_name"),
        round(col("rev"), 2).cast("double").as("total_revenue"), col("share"))
      .orderBy("n_name")
  }

  /** TPC-H Q7 volume-shipping shape: discounted revenue between two
    * trading nations by ship year, in both directions. The fact-fact
    * edge (lineitem↔orders) is the only shuffle; supplier/customer/
    * nation are broadcast, and the nation-pair filter applies BEFORE
    * the fact-fact join so only the two nations' lineitems reach the
    * exchange. Revenue is the exact decimal product-sum
    * (pricing_summary discipline). */
  def q7Volume(spark: SparkSession, dir: String,
               // the default pair has suppliers at every corpus SF
               // (sf0.001 staffs only 10 of the 25 nations)
               n1: String = "NATION_12", n2: String = "NATION_13"): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation").isin(n1, n2))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
              (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(round(sum(money("l_extendedprice")
          * (lit(1).cast("decimal(18,2)") - money("l_discount"))), 2)
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Join-key skew diagnostics — the report you read BEFORE choosing
    * salting / AQE skew-join thresholds: per candidate key, cardinality,
    * per-key row-count distribution (max/avg/p50/p99) and the
    * max-over-avg skew ratio. Each key costs one hash aggregate of
    * (key)->count (map-side combined) plus a percentile reduce over the
    * per-key counts — the heavy fact table is never re-shuffled per
    * statistic. At 100 TB this runs on a sample or the counts sketch;
    * the report shape is identical. */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def stats(key: String): DataFrame =
      li.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(lit(key).as("join_key"),
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_rows"),
          round(avg(col("c")), 4).as("avg_rows"),
          // exact percentile (interpolating — DuckDB quantile_cont twin);
          // the 100 TB swap is approx_percentile, noted above
          expr("round(percentile(c, 0.5), 4)").as("p50_rows"),
          expr("round(percentile(c, 0.99), 4)").as("p99_rows"),
          round(max(col("c")).cast("double")
            / avg(col("c")), 4).as("skew_ratio"))
    stats("l_orderkey").unionAll(stats("l_partkey")).unionAll(stats("l_suppkey"))
      .orderBy("join_key")
  }

  /** PageRank over the nation→nation trade graph (edges weighted by
    * lineitem volume between supplier and customer nations) — the
    * iterative-graph-algorithm-as-DataFrame-ops pattern: each of the 5
    * unrolled iterations is one join of the (tiny, broadcast) rank
    * vector against the edge list plus a per-destination fold. Float
    * determinism: incoming contributions fold in ASCENDING SOURCE
    * order on both engines (sort_array here, list(... ORDER BY) in
    * the oracle), so every IEEE add replays in sequence. At real graph
    * scale the same loop runs with the rank vector as a shuffled (not
    * broadcast) side and checkpoint barriers per iteration — the plan
    * per iteration is unchanged. */
  def pagerankNations(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("src"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("dst"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("dst"))
    // Parquet barrier: without it every unrolled iteration's lineage
    // re-runs the full lineitem edge-build join (observed: the fact
    // scan appeared 5x in the plan). The edge list is built ONCE;
    // the loop only ever re-joins the tiny materialized edge table.
    val edgePath = s"${graft.core.TempDirs.stable(s"pagerank:$dir")}/edges"
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .withColumn("wnorm", col("c").cast("double")
        / sum(col("c")).over(Window.partitionBy("src")).cast("double"))
      .select("src", "dst", "wnorm")
      .write.mode("overwrite").parquet(edgePath)
    val edges = spark.read.parquet(edgePath)
    val n = nation.count().toDouble // 25 — node count for the teleport term
    val nodes = nation.select(col("n_name").as("nation")).localCheckpoint()
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val in = edges.join(broadcast(pr), col("src") === col("nation"))
        .select(col("dst"), col("src"), (col("pr") * col("wnorm")).as("contrib"))
        .groupBy("dst")
        .agg(sort_array(collect_list(struct(col("src"), col("contrib")))).as("l"))
        .select(col("dst").as("nation"),
          expr("aggregate(l, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)").as("s"))
      // Superstep barrier (the Pregel pattern): materialize each
      // iteration's rank vector, or iteration k's lineage replays
      // iterations 1..k-1 and the plan grows quadratically. On a
      // billion-node graph this same line is a reliable checkpoint to
      // the shared filesystem; the loop body is unchanged.
      pr = nodes.join(in, Seq("nation"), "left")
        .select(col("nation"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("nation"), round(col("pr"), 8).as("pr")).orderBy("nation")
  }

  /** Schema-driven column profiler (the data-quality step a copy
    * pipeline runs before/after a load): per column, NULL count and
    * exact distinct count, built programmatically from df.schema — the
    * plan adapts to any table without code changes. All 2·N aggregates
    * run in ONE pass (Catalyst expands multi-distinct into a single
    * Expand + aggregate); `stack` pivots the 1-row result into rows.
    * At 100 TB you'd swap exact distinct for approx_count_distinct
    * (documented tradeoff) — the profiler shape is identical. */
  def profileTable(spark: SparkSession, dir: String, table: String = "orders"): DataFrame = {
    val df = Tables.table(spark, dir, table)
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"null_$c"),
      countDistinct(col(c)).as(s"dist_$c")))
    val stackArgs = cols.map(c => s"'$c', `null_$c`, `dist_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct)")
      .orderBy("col_name")
  }

  // ---- TPC-H-shaped composites (adapted to the corpus schema: no
  // partsupp/shipmode/receiptdate columns — see FIXTURES.md). Each one
  // exercises a distinct optimizer shape the simpler queries don't.

  private def discPrice: Column =
    money("l_extendedprice") * (lit(1).cast("decimal(18,2)") - money("l_discount"))

  /** TPC-H Q5 shape (local supplier volume): the 6-way join whose
    * distinguishing feature is the EXTRA equality between two dims
    * (customer.nation = supplier.nation) on top of the fact keys. All
    * dims broadcast; the only shuffle is lineitem x orders on
    * orderkey, exactly as at 100 TB. */
  def q5LocalVolume(spark: SparkSession, dir: String): DataFrame = {
    val euroNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
                          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q8 shape (national market share): two-level aggregation —
    * revenue per year first, then the conditional share of one
    * supplier nation inside it. The share is a conditional-sum /
    * total-sum ratio computed in ONE aggregate pass (no self-join). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val euroCust = Tables.customer(spark, dir)
      .join(broadcast(nation
          .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, dir)
      .join(broadcast(euroCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(round(
          sum(when(col("supp_nation") === "NATION_8", discPrice)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(discPrice).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit): profit is an EXPRESSION of
    * columns from two joined tables (revenue minus a retail-price cost
    * proxy — the corpus has no partsupp.ps_supplycost), aggregated by
    * supplier nation and order year. Part and supplier broadcast; the
    * fact shuffles once for the orders join. */
  def q9ProfitProxy(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
      .select("p_partkey", "p_retailprice")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year"))
    // revenue minus retail-cost-of-goods — both terms exact decimal
    // products of two (18,2) operands, so the DuckDB twin reproduces
    // them bit-for-bit (no mixed-scale precision-cap divergence)
    val profit = discPrice - money("p_retailprice") * money("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(round(sum(profit), 2).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q14 shape (promo revenue): a single-row conditional ratio —
    * the whole join aggregates to ONE number, so the final exchange
    * carries two decimals. Part broadcasts; the date filter pushes to
    * the fact scan. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1997-07-01").cast("timestamp_ntz"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(discPrice).cast("double"), 4).as("promo_share"))
  }

  /** TPC-H Q17 shape (small-quantity revenue): the correlated
    * aggregate subquery (qty < 0.5 * per-part average) written in its
    * decorrelated form — a per-part aggregate joined back to the fact.
    * The per-part avg table is fact-derived but part-cardinality, so
    * it broadcasts; the fact itself never shuffles. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val halfAvg = l.groupBy(col("l_partkey").as("hp_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    val brands = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#3", "Brand#13", "Brand#21"))
      .select("p_partkey", "p_brand")
    l.join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .join(broadcast(halfAvg), col("l_partkey") === col("hp_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .groupBy("p_brand")
      .agg(round(sum(money("l_extendedprice")), 2).cast("double").as("small_qty_revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  /** TPC-H Q19 shape (disjunctive pushdown): an OR-of-ANDs predicate
    * mixing columns from BOTH join sides. Catalyst extracts the
    * common p_partkey equi-condition and pushes the per-side
    * conjuncts below the join (l_quantity bounds reach the fact scan
    * as PushedFilters); the residual disjunction evaluates post-join
    * inside whole-stage codegen. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val cond = col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 40)))
    l.filter(col("l_quantity").between(1, 40))
      .join(broadcast(p), cond)
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape (suppliers who kept waiting, adapted to
    * returnflags): for finished orders, suppliers with a RETURNED line
    * in a multi-supplier order where NO OTHER supplier's line was
    * returned — the double-correlated EXISTS + NOT EXISTS against the
    * same fact. Both correlations become self-joins of lineitem on
    * orderkey: a left-semi (another supplier exists) and a left-anti
    * (no other supplier returned). The non-equi suppkey<> conjunct
    * rides the orderkey equi-join, so both stay shuffle-hash/SMJ on
    * orderkey — no cartesian anywhere. */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val l1 = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"))
    val others = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"),
              col("l_returnflag").as("rf2"))
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    l1.join(f, col("lo") === col("o_orderkey"), "left_semi")
      .join(others, col("lo") === col("o2") && col("ls") =!= col("s2"), "left_semi")
      .join(others.filter(col("rf2") === "R"),
        col("lo") === col("o2") && col("ls") =!= col("s2"), "left_anti")
      .join(broadcast(s), col("ls") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** TPC-H Q22 shape (cold customers): a scalar aggregate subquery
    * (global average of positive balances — broadcast as a 1-row
    * cross join) filtering customers, then a left-anti against their
    * URGENT orders (every corpus customer has SOME order, so the
    * classic "no orders at all" variant would be empty). */
  def q22ColdCall(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
           round(sum(money("c_acctbal")), 2).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q6 shape (forecast revenue): THE pushdown microbenchmark —
    * a single-row aggregate whose three conjuncts (date window,
    * discount band, quantity bound) must ALL reach the parquet scan as
    * PushedFilters; no join, no shuffle beyond the 1-row final agg.
    * The plan IS the benchmark: scan → filter → partial agg → exchange
    * of one row → final agg. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(money("l_extendedprice") * money("l_discount")), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))

  /** TPC-H Q13 shape (customer distribution): the LEFT-OUTER join +
    * TWO-LEVEL aggregation histogram — count orders per customer
    * (customers with none keep a 0 via the outer join), then count
    * customers per order-count. The first agg shuffles on c_custkey,
    * the histogram agg is histogram-cardinality — the canonical
    * "aggregate of an aggregate" plan. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("c_count")) // count skips outer nulls
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q20 shape (excess suppliers): the NESTED SEMI-JOIN chain —
    * suppliers qualify through a derived fact aggregate (per
    * (supplier, part) shipped quantity in 1997 exceeding half the
    * part's average over all suppliers), restricted to ECONOMY parts.
    * Both derived tables are fact aggregates that join back broadcast;
    * the supplier dim attaches last via left-semi, so the full
    * supplier list is never scanned into the join. */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val econ = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val li97 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp_ntz"))
      .join(broadcast(econ), col("l_partkey") === col("p_partkey"))
    val perSupp = li97.groupBy("l_partkey", "l_suppkey")
      .agg(sum(money("l_quantity")).as("sq"))
    // threshold sq > 0.5 * (total / n) rewritten as 2*sq*n > total:
    // pure decimal/integer arithmetic, so the boundary is engine-exact
    // (a double avg would round differently in Spark vs the oracle)
    val perPart = perSupp.groupBy(col("l_partkey").as("hp"))
      .agg(sum(col("sq")).as("total"), count(lit(1)).as("n"))
    val qualified = perSupp
      .join(broadcast(perPart), col("l_partkey") === col("hp"))
      .filter(col("sq") * 2 * col("n") > col("total"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q2 shape (min-cost supplier): the CORRELATED min-cost
    * subquery over a 4-relation chain (supplier → nation → region),
    * written as the analyst writes it — `cost = (SELECT min ...)` in
    * the WHERE clause — so Catalyst's decorrelation is what's under
    * test: the subquery must become a per-part aggregate joined back
    * on partkey, never a per-row re-execution. The corpus has no
    * partsupp, so the supply-cost relation derives from the fact:
    * per-(part, supplier) min extended price — an exact decimal MIN,
    * so the min-of-min equality is engine-exact. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q2_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_q2_part")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q2_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_q2_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_q2_region")
    spark.sql(
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM graft_q2_lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  CAST(cost AS DOUBLE) AS cost
        |FROM graft_q2_part, ps, graft_q2_supplier, graft_q2_nation, graft_q2_region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size <= 15 AND p_type = 'LARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND cost = (SELECT min(ps2.cost)
        |    FROM ps ps2, graft_q2_supplier s2, graft_q2_nation n2, graft_q2_region r2
        |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
  }

  /** TPC-H Q4 shape (order priority checking): the date-bounded EXISTS
    * semi — orders in one quarter having at least one RETURNED line
    * (the corpus has no l_commitdate/l_receiptdate; the returnflag
    * predicate keeps the same selective-EXISTS shape). Catalyst must
    * plan the EXISTS as a left-semi on orderkey with the date window
    * pushed to the orders scan. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q4_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q4_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM graft_q4_orders
        |WHERE o_orderdate >= TIMESTAMP_NTZ '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP_NTZ '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM graft_q4_lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q10 shape (returned-item reporting): the top-k AGGREGATE
    * join — revenue lost to returns per customer in one quarter,
    * ranked. Returnflag + date filters push to their scans, nation
    * broadcasts, and the final ORDER BY + LIMIT must plan as
    * TakeOrderedAndProject over the aggregate (per-partition top-k,
    * never a global sort of all customers). */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") <  lit("1997-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape (shipmode priority): the conditional TWO-CLASS
    * aggregate — per line status (the corpus's shipmode analogue), how
    * many lines belong to critical-priority orders vs the rest, inside
    * a one-year ship window. One fact-orders equi-join; the CASE pair
    * folds into a single aggregate pass (no two-scan union). */
  def q12Shipmode(spark: SparkSession, dir: String): DataFrame = {
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_linestatus")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q15 shape (top supplier): max over a DERIVED VIEW — the
    * quarterly per-supplier revenue view, filtered to its own maximum
    * via an uncorrelated scalar subquery. Exact decimal sums make the
    * `revenue = max(revenue)` equality engine-exact (a double sum
    * would tie-break differently per fold order). The view appears
    * twice (rows + max); the scalar subquery costs ONE extra 1-row
    * aggregate, not a self-join of the fact. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q15_lineitem")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q15_supplier")
    spark.sql(
      """WITH revenue AS (SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS total_revenue
        |  FROM graft_q15_lineitem
        |  WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP_NTZ '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
        |FROM graft_q15_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** TPC-H Q16 shape (supplier-count per part class): NOT-IN anti +
    * COUNT DISTINCT — distinct (part, supplier) pairs from the fact
    * (the corpus's partsupp analogue), excluding suppliers from a
    * subquery via NOT IN (negative balance stands in for the
    * complaints predicate), counted distinct per (brand, type, size)
    * bucket. NOT IN is the null-aware anti join — single-key, so it
    * must plan as a broadcast hash anti, not a nested loop. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q16_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_q16_part")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q16_supplier")
    spark.sql(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM graft_q16_lineitem)
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN graft_q16_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM graft_q16_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }
}
