package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Event-time operators over the `events` table (FIXTURES.md §2):
  * tumbling/sliding windows, gap-based sessionization, as-of join,
  * JSON extraction. Batch-first formulations with oracle twins; the
  * Structured Streaming variants live in graft.streaming and share the
  * same windowing semantics (SURVEY §2b "Streaming-shaped").
  *
  * Timestamps: parquet `ts` is ns; Spark reads µs (sub-µs is zero in
  * the corpus, verified). All outputs surface timestamps as epoch
  * microseconds (bigint) so the DuckDB oracle (which reads ns)
  * compares exactly.
  */
object Events {

  /** Tumbling 1-hour windows per event_type. Uses Spark's `window()`
    * (the Structured-Streaming-compatible form); surfaces the window
    * start as epoch micros. One shuffle on (window, type). */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy("w_start_us", "event_type")

  /** Sliding windows: 1-hour width, 30-minute slide — each event lands
    * in two windows. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n"))
      .orderBy("w_start_us")

  /** Events with a per-user `session_id` assigned by the classic
    * lag + cumulative-sum-of-boundaries formulation (30-min inactivity
    * gap) — two window functions over ONE shuffle on user_id. The
    * single source of the session definition: sessionize, sessionStats
    * and funnel all build on this. */
  private def sessionAssigned(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 30L * 60 * 1000000 // 30 min in µs
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap-based sessionization: one row per (user, session). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionAssigned(spark, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(unix_micros(col("ts"))).as("start_us"),
           max(unix_micros(col("ts"))).as("end_us"))
      .orderBy("user_id", "session_id")

  /** Session funnel: per 30-min-gap session, did a click PRECEDE a
    * purchase (strictly earlier event time)? One corpus-level report
    * row — the classic conversion-funnel aggregate, still one shuffle
    * on user_id (sessions) + one tiny final aggregate. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val sessions = sessionAssigned(spark, dir)
      .groupBy("user_id", "session_id")
      .agg(
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("first_click_us"),
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("last_purchase_us"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      count(col("first_click_us")).as("n_with_click"),
      count(col("last_purchase_us")).as("n_with_purchase"),
      count(when(col("first_click_us") < col("last_purchase_us"), lit(1))).as("n_converted"))
  }

  /** Busiest hours: tumbling-hour counts -> global top-5 (planner turns
    * sort+limit into TakeOrderedAndProject over the tiny agg result). */
  def busiestHours(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("n"))
      .orderBy(col("n").desc, col("hour_us").asc)
      .limit(k)

  /** Session summary per user (built on sessionize). */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionize(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_events")).as("n_events"),
           max(col("end_us") - col("start_us")).as("max_session_us"))
      .orderBy("user_id")

  /** As-of join: for each purchase, the most recent click at or before
    * it by the same user (same-timestamp clicks count when they sort
    * before the purchase by event_id — a ROWS frame, not a strict
    * time inequality) — union-and-window formulation: one shuffle
    * on user_id, no join at all. (The naive formulation is a range
    * join purchase x click which explodes at scale.) */
  def asofPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "purchase", lit(null))
          .otherwise(unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("last_click_us"))
      .orderBy("event_id")
  }

  /** Two-table backward as-of join through the NATIVE operator
    * (graft.plans.AsofJoinPlan/-Exec): purchases pick up the latest
    * same-user click at-or-before their timestamp, plus its value.
    * Unlike the union-window formulation (asofPurchaseClick), the
    * sides stay separate relations co-partitioned on user_id and the
    * merge is a forward-only cursor — the shape that holds when the
    * right side is a different (and much larger) table. The click
    * side pre-dedups per (user, ts) so the attached payload is
    * deterministic under timestamp ties. */
  def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = asofSides(spark, dir)
    graft.plans.AsofJoin(purchases, clicks,
        by = ("user_id", "c_user"), ts = ("ts_us", "click_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_us").as("last_click_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Shared sides for the native as-of family: purchases (left) and
    * per-(user, ts) deduplicated clicks (right — deterministic payload
    * under timestamp ties). */
  private[graft] def asofSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    // Pre-partition the click side on the JOIN key alone: the dedup
    // groupBy's (c_user, click_us) clustering requirement is satisfied
    // by hashpartitioning(c_user) (subset rule), and so is the as-of
    // exec's ClusteredDistribution(c_user) — one exchange serves both
    // instead of groupBy-hash(c_user, click_us) + re-shuffle(c_user).
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("click_us"),
        col("value"))
      .repartition(col("c_user"))
      .groupBy("c_user", "click_us")
      .agg(max(col("value").cast("decimal(18,2)")).cast("double").as("click_value"))
    (purchases, clicks)
  }

  /** Forward as-of through the native operator: each purchase picks up
    * the EARLIEST same-user click at-or-after its timestamp — the
    * "next event" direction (DuckDB oracles it as ASOF with <=). */
  def asofForwardNative(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = asofSides(spark, dir)
    graft.plans.AsofJoin(purchases, clicks,
        by = ("user_id", "c_user"), ts = ("ts_us", "click_us"),
        direction = graft.plans.AsofDirection.Forward)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_us").as("next_click_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Nearest as-of: the click closest in time on EITHER side of the
    * purchase; equal distances resolve to the earlier (backward) click.
    * Oracled as the composition of DuckDB's two ASOF directions. */
  def asofNearestNative(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = asofSides(spark, dir)
    graft.plans.AsofJoin(purchases, clicks,
        by = ("user_id", "c_user"), ts = ("ts_us", "click_us"),
        direction = graft.plans.AsofDirection.Nearest)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_us").as("near_click_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Backward as-of with a tolerance bound: the latest prior click
    * counts only within 1 hour of the purchase — matches beyond the
    * bound come back as nulls (a backward match farther than the bound
    * implies no in-bound prior click exists at all, which is what makes
    * the post-filtered oracle twin exact). */
  def asofToleranceNative(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = asofSides(spark, dir)
    graft.plans.AsofJoin(purchases, clicks,
        by = ("user_id", "c_user"), ts = ("ts_us", "click_us"),
        tolerance = Some(3600L * 1000 * 1000)) // 1 hour in µs
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_us").as("last_click_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Composite-key as-of through the native operator: purchases match
    * clicks on (user, venue) — venue derived as props.k % 5, the
    * (entity, venue)-style key real time-series joins use. Exercises
    * AsofJoinPlan's Seq-key path: lexicographic key compare, composite
    * ClusteredDistribution (the click dedup's (c_user, c_venue,
    * click_us) grouping rides the same two-column exchange). */
  def asofMultiKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val venue = get_json_object(col("props"), "$.k").cast("long") % 5
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), venue.as("venue"),
        unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), venue.as("c_venue"),
        unix_micros(col("ts")).as("click_us"), col("value"))
      .repartition(col("c_user"), col("c_venue"))
      .groupBy("c_user", "c_venue", "click_us")
      .agg(max(col("value").cast("decimal(18,2)")).cast("double").as("click_value"))
    graft.plans.AsofJoin.multi(purchases, clicks,
        by = Seq(("user_id", "c_user"), ("venue", "c_venue")),
        ts = ("ts_us", "click_us"))
      .select(col("event_id"), col("user_id"), col("venue"), col("ts_us"),
        col("click_us").as("last_click_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Analytic window: per-user value delta between consecutive events. */
  def valueDelta(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .filter(col("prev_value").isNotNull)
      .select(col("event_id"), col("user_id"),
              round(col("value") - col("prev_value"), 6).as("value_delta"))
      .orderBy("event_id")
  }

  /** Map functions: parse `props` JSON into a MapType column, then
    * map_keys/element access/map_concat — the map-column surface. */
  def mapFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
      // map_filter first: map_concat THROWS on duplicate keys under the
      // default dedup policy, so a props payload that happens to carry
      // a "type" key must not collide with the one added here.
      .withColumn("m2", map_concat(
        map_filter(col("m"), (k, _) => k =!= "type"),
        map(lit("type"), col("event_type"))))
      .select(col("event_id"),
        size(map_keys(col("m2"))).cast("bigint").as("n_keys"),
        element_at(col("m"), "k").cast("int").as("k_val"),
        element_at(col("m2"), "type").as("type_val"))
      .orderBy("event_id")

  /** JSON extraction from `props` ({"k": <int>}) + aggregation. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", floor(col("k") / 10).cast("int"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy("k_bucket")

  /** VARIANT-typed semi-structured access (Spark 4): `parse_json` once
    * into a VARIANT column, then typed `variant_get` path extraction —
    * the open-schema ingestion shape (one binary-encoded column, typed
    * access at query time, no up-front schema). Missing paths surface
    * as NULL, not errors. has_k uses the STRING-typed extraction so its
    * semantics match the oracle's json_extract_string regardless of
    * the value's runtime type (int-typed extraction of a non-numeric
    * value would null out where the string form doesn't). */
  def variantFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'int')").as("k_val"),
        expr("variant_get(v, '$.missing', 'int')").as("absent_val"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("variant_get(v, '$.k', 'string') IS NOT NULL").as("has_k"))
      .orderBy("event_id")

  /** Hourly resample + LOCF gap fill (last observation carried
    * forward): aggregate per-user hourly value sums, generate each
    * user's hourly spine between their first and last active hour
    * (`sequence` + explode — spine size tracks the user's OWN active
    * range, never the global calendar, so a 100 TB corpus with sparse
    * users doesn't cross-join users x all-time), left-join the
    * observations in, and fill gaps with `last(_, ignoreNulls)` over
    * the per-user time order — one shuffle on user_id for the window,
    * gap hours flagged. Decimal sums carry exactly through the fill;
    * rounding happens once at the edge. */
  def fillForward(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val spine = hourly.groupBy("user_id")
      .agg(min("h").as("lo"), max("h").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), unix_micros(col("h")).as("h_us"),
        round(last(col("v"), ignoreNulls = true).over(w), 2)
          .cast("double").as("value_filled"),
        col("v").isNull.as("is_gap"))
      .orderBy("user_id", "h_us")
  }

  /** Weekly cohort retention: cohort = week of the user's first
    * `signup` event, then for each (cohort week, weeks-since-cohort)
    * offset, how many distinct cohort users were active (any event).
    * Two aggregate passes (first-signup per user, distinct
    * user-weeks) then a join on user_id — the classic product-
    * analytics query, with the activity side pre-collapsed to
    * user × week BEFORE the join so the join input is bounded by
    * users × calendar weeks, not raw event volume. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cw"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw")).distinct()
    cohort.join(active, Seq("user_id"))
      .filter(col("aw") >= col("cw"))
      .groupBy(unix_micros(col("cw")).as("cohort_week_us"),
        expr("datediff(aw, cw) div 7").cast("int").as("offset_weeks"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week_us", "offset_weeks")
  }

  /** SCD type-2 history compression: collapse each user's event_type
    * stream into change intervals [valid_from, valid_to) — the
    * dimension-history build step of a warehouse load. Lag marks
    * change rows; lead over the SURVIVING change rows closes each
    * interval (NULL = current). Both windows share the (user_id)
    * partitioning and sort, and the filter between them preserves
    * order, so the whole op is ONE exchange + one sort. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("pt", lag(col("event_type"), 1).over(byUser))
      .filter(col("pt").isNull || col("pt") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(byUser))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("valid_to_us"))
      .orderBy("user_id", "valid_from_us")
  }

  /** Gaps-and-islands tail: the k largest per-user inactivity gaps
    * corpus-wide (data-freshness / outage forensics). The per-user lag
    * is one exchange; the global top-k compiles to
    * TakeOrderedAndProject (per-partition heads, driver merges k
    * rows) — no single-partition sort at any scale. */
  def topGaps(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .orderBy(col("gap_us").desc, col("user_id").asc, col("event_id").asc)
      .limit(k)
      .select(col("user_id"), col("event_id"), col("us"), col("gap_us"))
  }

  /** Recency-weighted moving average (weights 4,3,2,1 over the last
    * up-to-4 events per user) — time-series smoothing with exact
    * arithmetic: values are DECIMAL(18,2), weights integers, so the
    * numerator is engine-exact; the single double division + round
    * happens once at the edge (IEEE division is correctly rounded, so
    * the oracle replays it bit-for-bit). Explicit lag terms instead of
    * a collect_list-over-window: 3 lags in ONE window pass, no
    * per-row array materialization. */
  def wma4(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("value").cast("decimal(18,2)").as("v"), unix_micros(col("ts")).as("us"))
      .withColumn("v1", lag(col("v"), 1).over(byUser))
      .withColumn("v2", lag(col("v"), 2).over(byUser))
      .withColumn("v3", lag(col("v"), 3).over(byUser))
      .select(col("event_id"), col("user_id"),
        round((lit(4) * col("v") + lit(3) * coalesce(col("v1"), lit(0))
             + lit(2) * coalesce(col("v2"), lit(0)) + coalesce(col("v3"), lit(0)))
            .cast("double")
          / (lit(4) + when(col("v1").isNull, 0).otherwise(3)
                    + when(col("v2").isNull, 0).otherwise(2)
                    + when(col("v3").isNull, 0).otherwise(1)),
          6).as("wma4"))
      .orderBy("event_id")
  }

  /** Linear interpolation on the hourly spine — the resampling step
    * between LOCF (fillForward) and model-ready time series: interior
    * gaps take prev + (next−prev)·frac over the observed neighbors.
    * Two IGNORE-NULLS window passes (backward carry + forward carry)
    * over the same user-partitioned sort — one exchange total; spine
    * endpoints are observed hours, so every gap has both neighbors.
    * The interpolation arithmetic is one shared expression shape in
    * both engines (exact decimal neighbors, double frac) and is NOT
    * rounded at the edge: +,-,*,/ are correctly-rounded IEEE ops on
    * identical operands, so the raw doubles are bit-equal — whereas
    * fixed-decimal rounding is the one op whose tie handling differs
    * between engines (2-decimal deltas x rational fracs land on exact
    * decimal halves constantly; observed 65.4046875 flipping at the
    * 6th decimal). */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val spine = hourly.groupBy("user_id")
      .agg(min("h").as("lo"), max("h").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val back = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val hUs = unix_micros(col("h"))
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), hUs.as("h_us"), col("v"),
        last(col("v"), ignoreNulls = true).over(back).as("pv"),
        last(when(col("v").isNotNull, hUs), ignoreNulls = true).over(back).as("ph"),
        first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
        first(when(col("v").isNotNull, hUs), ignoreNulls = true).over(fwd).as("nh"))
      .select(col("user_id"), col("h_us"),
        when(col("v").isNotNull, col("v").cast("double"))
          .otherwise(col("pv").cast("double")
            + (col("nv").cast("double") - col("pv").cast("double"))
              * ((col("h_us") - col("ph")).cast("double")
                 / (col("nh") - col("ph")).cast("double")))
          .as("value_interp"),
        col("v").isNull.as("is_gap"))
      .orderBy("user_id", "h_us")
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: counts and row-normalized probabilities for every
    * (src, dst) adjacent pair — the behavioral model behind next-event
    * prediction and anomaly scoring. One window pass (shuffle on
    * user_id) produces the pairs; the (src, dst) hash aggregate is
    * map-side combined down to |types|^2 rows, and the normalizing
    * row-sum runs as a window over THAT tiny aggregate, so the
    * second exchange moves ~25 rows regardless of corpus size.
    * Counts are exact longs; the probability is one correctly-rounded
    * IEEE division at the edge, so the oracle replays it exactly. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("src", lag(col("event_type"), 1).over(byUser))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("src")).cast("double"), 6))
      .orderBy("src", "dst")
  }

  /** Per-type z-score outliers (|z| > 3 after rounding — the filter
    * applies to the ROUNDED z on both engines so the boundary is
    * identical). Moments are exact decimal sums (order-independent,
    * map-side combined); mean/std/z are derived in doubles with the
    * oracle's exact expression shape, so every IEEE op is bit-equal.
    * The 5-row stats side broadcasts; the corpus never reshuffles. */
  def zscoreOutliers(spark: SparkSession, dir: String, thresh: Double = 3.0): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("event_type"),
      col("value").cast("decimal(18,2)").as("v"))
    val s = e.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("v")).cast("double").as("sv"),
      sum(col("v") * col("v")).cast("double").as("sv2"))
    val m = s.select(col("event_type"), (col("sv") / col("n")).as("mean"),
      sqrt(col("sv2") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n"))).as("std"))
    e.join(broadcast(m), Seq("event_type"))
      .withColumn("z", round((col("v").cast("double") - col("mean")) / col("std"), 6))
      .filter(abs(col("z")) > thresh)
      .select(col("event_id"), col("event_type"), col("z"))
      .orderBy("event_id")
  }
}
