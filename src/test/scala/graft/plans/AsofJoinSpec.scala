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

  test("forward / nearest / tolerance directions at high shuffle parallelism") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      import spark.implicits._
      import graft.plans.AsofDirection._
      val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 5L)).toDF("k", "ts")
      val right = Seq((1L, 9L, "a"), (1L, 15L, "b"), (2L, 16L, "c"), (9L, 1L, "z"))
        .toDF("rk", "rts", "v")
      def run(dir: String, tol: Option[Long] = None) =
        AsofJoin(left, right, by = ("k", "rk"), ts = ("ts", "rts"),
            direction = dir, tolerance = tol)
          .select(col("k"), col("ts"), col("v")).collect()
          .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet

      assert(run(Forward) == Set(
        (1L, 10L, Some("b")),  // first at-or-after 10 is 15
        (1L, 20L, None),       // nothing after 20 for key 1
        (2L, 15L, Some("c")),  // 16 >= 15
        (3L, 5L, None)))
      assert(run(Nearest) == Set(
        (1L, 10L, Some("a")),  // |10-9|=1 beats |15-10|=5
        (1L, 20L, Some("b")),  // only a backward candidate
        (2L, 15L, Some("c")),  // only a forward candidate
        (3L, 5L, None)))
      // backward bounded at 2: the 15<=20 match (distance 5) nulls out
      assert(run(Backward, tol = Some(2L)) == Set(
        (1L, 10L, Some("a")),  // distance 1 <= 2
        (1L, 20L, None),       // distance 5 > 2
        (2L, 15L, None),
        (3L, 5L, None)))
      // forward bounded at 1: 16 is within 1 of 15; 15 is 5 from 10
      assert(run(Forward, tol = Some(1L)) == Set(
        (1L, 10L, None),
        (1L, 20L, None),
        (2L, 15L, Some("c")),
        (3L, 5L, None)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("null keys/timestamps: left nulls get null matches, right nulls are skipped, all directions") {
    import spark.implicits._
    import graft.plans.AsofDirection._
    val left = Seq(
      (Option(1L), Option(10L), "a"),
      (Option.empty[Long], Option(10L), "nullkey"),
      (Option(1L), Option.empty[Long], "nullts")
    ).toDF("k", "ts", "tag")
    // right side interleaves null-key and null-ts rows around the match
    val right = Seq(
      (Option(1L), Option(9L), "m"),
      (Option.empty[Long], Option(8L), "nk"),
      (Option(1L), Option.empty[Long], "nt"),
      (Option(1L), Option(11L), "f")
    ).toDF("rk", "rts", "v")
    for (dir <- Seq(Backward, Forward, Nearest)) {
      val out = AsofJoin(left, right, by = ("k", "rk"), ts = ("ts", "rts"),
          direction = dir)
        .select(col("tag"), col("v")).collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toMap
      assert(out("nullkey").isEmpty, s"$dir: null left key must match nothing")
      assert(out("nullts").isEmpty, s"$dir: null left ts must match nothing")
      val want = dir match {
        case Forward => Some("f") // first at-or-after 10 is 11
        case _ => Some("m")       // backward 9; nearest: dist 1 == 1 ties backward
      }
      assert(out("a") == want,
        s"$dir: expected $want for the real row, got ${out("a")}")
    }
  }

  test("empty right side yields all-null matches; empty left yields nothing") {
    import spark.implicits._
    import graft.plans.AsofDirection._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq.empty[(Long, Long, String)].toDF("rk", "rts", "v")
    for (dir <- Seq(Backward, Forward, Nearest)) {
      val out = AsofJoin(left, right, by = ("k", "rk"), ts = ("ts", "rts"),
          direction = dir).select(col("v")).collect()
      assert(out.length == 1 && out(0).isNullAt(0), s"$dir: expected one null match")
    }
    val none = AsofJoin(right.select(col("rk").as("k"), col("rts").as("ts")),
        left.select(col("k").as("rk"), col("ts").as("rts")),
        by = ("k", "rk"), ts = ("ts", "rts"))
      .collect()
    assert(none.isEmpty)
  }

  test("composite keys: two-column key partitions and compares lexicographically") {
    // 64 partitions >> rows so composite keys scatter; a (1, A) left row
    // must never see a (1, B) right row even when both hash anywhere
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      import spark.implicits._
      val left = Seq((1L, "A", 10L), (1L, "B", 10L), (2L, "A", 15L), (1L, "C", 9L))
        .toDF("k", "g", "ts")
      val right = Seq(
        (1L, "A", 9L, "a1"), (1L, "B", 8L, "b1"), (1L, "B", 10L, "b2"),
        (2L, "A", 16L, "x"), (2L, "B", 1L, "y"))
        .toDF("rk", "rg", "rts", "v")
      val out = AsofJoin.multi(left, right,
          by = Seq(("k", "rk"), ("g", "rg")), ts = ("ts", "rts"))
        .select(col("k"), col("g"), col("v")).collect()
        .map(r => ((r.getLong(0), r.getString(1)), Option(r.getString(2)))).toMap
      assert(out == Map(
        (1L, "A") -> Some("a1"),  // same (1,A) subkey, 9 <= 10
        (1L, "B") -> Some("b2"),  // at-ts row beats the earlier b1
        (2L, "A") -> None,        // (2,A) right row is at 16 > 15
        (1L, "C") -> None))       // no (1,C) rows; (1,B)/(2,B) must not bleed
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("construction guards: mismatched by/ts types fail fast, not inside a task") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val rightIntKey = Seq((1, 9L)).toDF("rk", "rts")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin(left, rightIntKey, by = ("k", "rk"), ts = ("ts", "rts"))
    }
    assert(e1.getMessage.contains("by-key type mismatch"))
    val rightIntTs = Seq((1L, 9)).toDF("rk", "rts")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin(left, rightIntTs, by = ("k", "rk"), ts = ("ts", "rts"))
    }
    assert(e2.getMessage.contains("ts type mismatch"))
  }

  test("nearest resolves equal distances backward and honors per-direction tie order") {
    import spark.implicits._
    import graft.plans.AsofDirection._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    // candidates exactly 3 away on each side; plus an at-ts row for a
    // second scenario
    val right = Seq((1L, 7L, "early"), (1L, 13L, "late")).toDF("rk", "rts", "v")
    val near = AsofJoin(left, right, by = ("k", "rk"), ts = ("ts", "rts"),
        direction = Nearest)
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(near == Seq("early"), "equal distance must resolve backward (earlier row)")
    // an exact-timestamp row is distance 0 and wins outright
    val right2 = Seq((1L, 10L, "at"), (1L, 11L, "after")).toDF("rk", "rts", "v")
    val near2 = AsofJoin(left, right2, by = ("k", "rk"), ts = ("ts", "rts"),
        direction = Nearest)
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(near2 == Seq("at"))
    // forward includes the at-timestamp row too
    val fwd = AsofJoin(left, right2, by = ("k", "rk"), ts = ("ts", "rts"),
        direction = Forward)
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(fwd == Seq("at"))
  }
}
