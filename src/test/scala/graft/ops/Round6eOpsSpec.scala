package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 session-5 batch 2: Markov transitions, token entropy,
  * smoothed bigram LM, quality-weighted sampling, revenue share,
  * Q7 volume shape, schema-driven profiler. */
class Round6eOpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("markovTransitions: rows normalize to 1 and pair counts recount from raw lags") {
    val m = Events.markovTransitions(spark, sf).cache()
    try {
      // per-src probability mass = 1 within rounding slack (<=5 dsts x 1e-6)
      val bad = m.groupBy("src").agg(sum("p").as("mass"))
        .filter(abs(col("mass") - 1.0) > 1e-5)
      assert(bad.isEmpty)
      // total transitions = events - one first-event per user
      val ev = graft.core.Tables.events(spark, sf)
      val expected = ev.count() - ev.select("user_id").distinct().count()
      val total = m.agg(sum("n")).head().getLong(0)
      assert(total == expected, s"transition total $total != $expected")
    } finally m.unpersist()
  }

  test("tokenEntropy: bounds hold and a repeated-token doc hits 0") {
    val e = Text.tokenEntropy(spark, sf).cache()
    try {
      // 0 <= H <= log2(n), with slack for the 6-decimal edge rounding
      // (an all-distinct doc scores exactly log2(n), which rounds UP by
      // as much as 5e-7)
      assert(e.filter(col("entropy") < -1e-6 ||
        col("entropy") > log2(col("n_tokens").cast("double")) + 1e-6).isEmpty)
      // docs whose tokens are all identical must score exactly 0
      val uniform = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(array_distinct(col("t"))) === 1)
        .select("doc_id")
      assert(e.join(uniform, "doc_id").filter(col("entropy") =!= 0.0).isEmpty)
    } finally e.unpersist()
  }

  test("ngramLm: top-row probability recomputes from independent counts") {
    val top = Text.ngramLm(spark, sf, k = 3).collect()
    assert(top.nonEmpty)
    val r = top.head
    val (w1, w2, c12) = (r.getString(0), r.getString(1), r.getLong(2))
    val toks = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.i") === col("a.i") + 1)
      .select(col("a.w").as("w1"), col("b.w").as("w2")).cache()
    try {
      val c12r = pairs.filter(col("w1") === w1 && col("w2") === w2).count()
      val c1r = pairs.filter(col("w1") === w1).count()
      val vr = pairs.select(countDistinct(col("w2"))).head().getLong(0)
      assert(c12r == c12)
      val expect = BigDecimal((c12r + 1).toDouble / (c1r + vr).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"p_smooth ${r.getDouble(3)} != $expect")
    } finally pairs.unpersist()
  }

  test("weightedSample: membership is exactly the hash-below-quality rule") {
    val kept = Text.weightedSample(spark, sf).collect().map(r =>
      r.getLong(0) -> r.getDouble(1)).toMap
    val all = Text.qualityScore(spark, sf).collect().map(r =>
      r.getLong(0) -> r.getDouble(1))
    assert(all.nonEmpty && kept.nonEmpty && kept.size < all.length)
    all.foreach { case (id, q) =>
      val draw = graft.functions.DetHash.hex60(s"wq:$id") % 1000000
      val expectKeep = draw < math.round(q * 1000000)
      assert(kept.contains(id) == expectKeep, s"doc $id keep mismatch")
      if (kept.contains(id)) assert(kept(id) == q)
    }
    // importance property: the kept set is quality-biased upward
    val avgAll = all.map(_._2).sum / all.length
    val avgKept = kept.values.sum / kept.size
    assert(avgKept > avgAll, s"kept avg $avgKept should exceed corpus avg $avgAll")
  }

  test("revenueShare: shares exceed the cut and totals agree with revenue_by_nation") {
    val rs = Relational.revenueShare(spark, sf).cache()
    try {
      assert(rs.filter(col("share") <= 0.04).isEmpty)
      assert(rs.agg(sum("share")).head().getDouble(0) <= 1.0 + 1e-6)
      // per-nation totals must match the independent star-join rollup
      val byNation = Relational.revenueByNation(spark, sf)
        .groupBy("n_name").agg(sum("total_revenue").as("ref"))
      val mism = rs.join(byNation, "n_name")
        .filter(abs(col("total_revenue") - col("ref")) > 1e-6)
      assert(mism.isEmpty)
    } finally rs.unpersist()
  }

  test("q7Volume: only the two directed pairs appear, revenue positive") {
    val v = Relational.q7Volume(spark, sf).cache()
    try {
      assert(v.count() > 0)
      assert(v.filter(!(col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_13") &&
                      !(col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_12")).isEmpty)
      assert(v.filter(col("revenue") <= 0.0).isEmpty)
      // both directions exist in the corpus
      assert(v.select("supp_nation").distinct().count() == 2)
    } finally v.unpersist()
  }

  test("profileTable: profiles every column; key column has zero nulls, full distinct") {
    val p = Relational.profileTable(spark, sf).cache()
    try {
      val orders = graft.core.Tables.orders(spark, sf)
      assert(p.select("col_name").collect().map(_.getString(0)).sorted.toSeq
        == orders.columns.sorted.toSeq)
      val key = p.filter(col("col_name") === "o_orderkey").head()
      assert(key.getLong(1) == 0L)
      assert(key.getLong(2) == orders.count())
    } finally p.unpersist()
  }
}
