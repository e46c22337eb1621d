package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan).
  * Covers: the physical operator actually plans, results match an
  * independent window-based derivation, left-outer null semantics,
  * and correctness across partition boundaries (keys split over many
  * partitions must not bleed matches between keys). */
class AsofJoinSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("the custom exec appears in the physical plan") {
    val df = graft.ops.Events.asofNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
  }

  test("matches the IGNORE-NULLS window derivation row for row") {
    val ev = graft.core.Tables.events(spark, sf)
    val native = graft.ops.Events.asofNative(spark, sf)
    // independent derivation: union trick + last_value ignoreNulls
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("is_p").asc) // clicks sort before purchases at ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        (col("event_type") === "purchase").as("is_p"))
    val expect = u
      .withColumn("e_last",
        last(when(!col("is_p"), col("us")), ignoreNulls = true).over(w))
      .filter(col("is_p"))
      .select(col("event_id"), col("us").as("e_ts"), col("e_last"))
    val mism = native.select(col("event_id"), col("ts_us"), col("last_click_us"))
      .join(expect, Seq("event_id"), "full")
      .filter(!(col("ts_us") <=> col("e_ts")) ||
              !(col("last_click_us") <=> col("e_last")))
    assert(mism.isEmpty)
  }

  test("left-outer semantics: purchases with no prior click carry nulls") {
    val native = graft.ops.Events.asofNative(spark, sf).cache()
    try {
      val n = native.filter(col("last_click_us").isNull).count()
      // nulls exist exactly where no click precedes the purchase
      val ev = graft.core.Tables.events(spark, sf)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
      val withPrior = p.join(c, col("user_id") === col("cu") && col("cus") <= col("us"))
        .select("event_id").distinct()
      val expectNull = p.select("event_id").except(withPrior).count()
      assert(n == expectNull, s"null count $n != $expectNull")
      // and every non-null match is a real prior click of that user
      val bad = native.filter(col("last_click_us").isNotNull)
        .join(c, col("user_id") === col("cu") && col("last_click_us") === col("cus"),
          "left_anti")
      assert(bad.isEmpty)
    } finally native.unpersist()
  }

  test("keys never bleed across partitions at high shuffle parallelism") {
    // tiny synthetic frame, 64 partitions >> rows: most partitions hold
    // a single key; adjacent keys land anywhere
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      import spark.implicits._
      val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 5L))
        .toDF("k", "ts")
      val right = Seq((1L, 9L, "a"), (1L, 15L, "b"), (2L, 16L, "c"), (9L, 1L, "z"))
        .toDF("rk", "rts", "v")
      val out = AsofJoin(left, right, by = ("k", "rk"), ts = ("ts", "rts"))
        .select(col("k"), col("ts"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(out == Set(
        (1L, 10L, Some("a")),  // 9 <= 10
        (1L, 20L, Some("b")),  // 15 <= 20
        (2L, 15L, None),       // right's key-2 row is at 16 > 15
        (3L, 5L, None)))       // no key-3 rows at all
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
