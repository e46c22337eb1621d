package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 session-5 additions: edit-distance near-dups, bigram LM
  * counts, cohort retention, SCD2 history, gaps-and-islands tail,
  * recency-weighted moving average, z-score outliers. */
class Round6dOpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("fuzzyNearDups: pairs respect the block key and the distance bound") {
    val pairs = Text.fuzzyNearDups(spark, sf).cache()
    try {
      assert(pairs.filter(col("dist") < 0 || col("dist") > 20).isEmpty)
      // every pair shares (lang, n_chars div 10) — re-derive from the corpus
      val d = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), expr("n_chars div 10").as("b"))
      val joined = pairs
        .join(d.select(col("doc_id").as("doc_a"), col("lang").as("la"), col("b").as("ba")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"), col("lang").as("lb"), col("b").as("bb")), "doc_b")
      assert(joined.filter(col("la") =!= col("lb") || col("ba") =!= col("bb")).isEmpty)
      // exact duplicates in the same block MUST surface with dist 0
      val docs = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text")).as("fp"), expr("n_chars div 10").as("b"))
      val exactPairs = docs.as("x").join(docs.as("y"),
          col("x.fp") === col("y.fp") && col("x.b") === col("y.b") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val missed = exactPairs.join(pairs.filter(col("dist") === 0),
        Seq("doc_a", "doc_b"), "left_anti")
      assert(missed.isEmpty, "same-text same-block pairs must appear at dist 0")
    } finally pairs.unpersist()
  }

  test("bigramCounts: top row recomputes from a raw adjacent-pair expansion") {
    val top = Text.bigramCounts(spark, sf, k = 5).collect()
    assert(top.length == 5 && top.head.getLong(2) >= top.last.getLong(2))
    val (w1, w2, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
    // independent recount: posexplode tokens, self-join on position+1
    val toks = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val recount = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.i") === col("a.i") + 1)
      .filter(col("a.w") === w1 && col("b.w") === w2).count()
    assert(recount == c, s"top bigram ($w1,$w2) recount $recount != $c")
  }

  test("cohortRetention: offset-0 totals equal the distinct signup-user count") {
    val df = Events.cohortRetention(spark, sf).cache()
    try {
      val ev = graft.core.Tables.events(spark, sf)
      val signups = ev.filter(col("event_type") === "signup")
        .select("user_id").distinct().count()
      // the signup event itself is activity in the cohort week, so every
      // cohort user is retained at offset 0
      val offset0 = df.filter(col("offset_weeks") === 0)
        .agg(sum("n_users")).head().getLong(0)
      assert(offset0 == signups, s"offset-0 sum $offset0 != $signups signup users")
      // retention never exceeds an earlier offset's cohort membership bound
      assert(df.filter(col("n_users") <= 0).isEmpty)
    } finally df.unpersist()
  }

  test("scd2History: intervals chain per user with one open current row") {
    val df = Events.scd2History(spark, sf).cache()
    try {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("valid_from_us")
      val chained = df.withColumn("next_from", lead("valid_from_us", 1).over(byUser))
      // valid_to closes exactly at the next interval's start; last is open
      assert(chained.filter(
        (col("next_from").isNotNull && col("valid_to_us") =!= col("next_from")) ||
        (col("next_from").isNull && col("valid_to_us").isNotNull)).isEmpty)
      // consecutive states always differ (that's what a change row is)
      val adj = df.withColumn("prev_state", lag("state", 1).over(byUser))
      assert(adj.filter(col("prev_state") === col("state")).isEmpty)
      // one open interval per user
      val open = df.filter(col("valid_to_us").isNull)
        .groupBy("user_id").count().filter(col("count") =!= 1)
      assert(open.isEmpty)
    } finally df.unpersist()
  }

  test("topGaps: descending, positive, and each gap re-derives from raw events") {
    val gaps = Events.topGaps(spark, sf, k = 10).collect()
    assert(gaps.length == 10)
    val vals = gaps.map(_.getLong(3))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b }, "descending")
    assert(vals.forall(_ > 0))
    // re-derive the top row: no same-user event falls inside (us-gap, us)
    val r = gaps.head
    val inside = graft.core.Tables.events(spark, sf)
      .filter(col("user_id") === r.getLong(0) &&
        unix_micros(col("ts")) > r.getLong(2) - r.getLong(3) &&
        unix_micros(col("ts")) < r.getLong(2)).count()
    assert(inside == 0, "a larger event inside the gap would shrink it")
  }

  test("wma4: first event per user equals its own value; window is 4-bounded") {
    val df = Events.wma4(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
    val firstIds = ev.groupBy("user_id")
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("event_id"))
      .select("event_id")
    val firsts = df.join(firstIds, "event_id")
      .join(ev.select(col("event_id"), col("value")), "event_id")
      .filter(abs(col("wma4") - round(col("value").cast("decimal(18,2)")
        .cast("double"), 6)) > 1e-9)
    assert(firsts.isEmpty, "first event has no lags: wma4 == value")
  }

  test("zscoreOutliers: reported z agrees with Spark's own stddev_pop to 1e-6") {
    val out = Events.zscoreOutliers(spark, sf).cache()
    try {
      assert(out.filter(abs(col("z")) <= 3.0).isEmpty)
      val ev = graft.core.Tables.events(spark, sf)
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(18,2)").cast("double").as("v"))
      val stats = ev.groupBy("event_type")
        .agg(avg("v").as("m"), stddev_pop("v").as("s"))
        .withColumnRenamed("event_type", "et")
      val mism = out.join(ev.drop("event_type"), Seq("event_id"))
        .join(stats, col("event_type") === col("et"))
        .filter(abs(col("z") - (col("v") - col("m")) / col("s")) > 1e-6)
      assert(mism.isEmpty)
    } finally out.unpersist()
  }
}
