package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 session-5 batch 3: linear interpolation, skew diagnostics,
  * nation-graph PageRank, deterministic train/val/test split. */
class Round6fOpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("interpolate: observed rows keep their value; gaps sit strictly between neighbors") {
    val df = Events.interpolate(spark, sf).cache()
    try {
      // observed hours reproduce the hourly decimal sum exactly
      val hourly = graft.core.Tables.events(spark, sf)
        .groupBy(col("user_id"), unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("expect"))
      val obs = df.filter(!col("is_gap")).join(hourly, Seq("user_id", "h_us"))
      assert(obs.filter(col("value_interp") =!= col("expect")).isEmpty)
      // every gap value lies within [min(prev,next), max(prev,next)] —
      // re-derive the neighbors independently via IGNORE NULLS windows
      import org.apache.spark.sql.expressions.Window
      val bw = Window.partitionBy("user_id").orderBy("h_us")
        .rowsBetween(Window.unboundedPreceding, -1)
      val fw = Window.partitionBy("user_id").orderBy("h_us")
        .rowsBetween(1, Window.unboundedFollowing)
      val v = when(!col("is_gap"), col("value_interp"))
      val g = df
        .withColumn("pv", last(v, ignoreNulls = true).over(bw))
        .withColumn("nv", first(v, ignoreNulls = true).over(fw))
        .filter(col("is_gap"))
      assert(g.filter(col("value_interp") < least(col("pv"), col("nv")) - 1e-9 ||
                      col("value_interp") > greatest(col("pv"), col("nv")) + 1e-9).isEmpty)
      // spine endpoints are observed, so no gap row lacks a neighbor
      assert(g.filter(col("pv").isNull || col("nv").isNull).isEmpty)
    } finally df.unpersist()
  }

  test("skewReport: cardinalities and orderings are internally consistent") {
    val r = Relational.skewReport(spark, sf).collect()
    assert(r.map(_.getString(0)).sorted.toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey"))
    r.foreach { row =>
      val (nKeys, maxR, avgR) = (row.getLong(1), row.getLong(2), row.getDouble(3))
      val (p50, p99, skew) = (row.getDouble(4), row.getDouble(5), row.getDouble(6))
      assert(maxR >= p99 - 1e-9 && p99 >= p50 - 1e-9 && p50 >= 1.0)
      assert(skew >= 1.0 && math.abs(skew - maxR / avgR) < 1e-3)
      assert(nKeys > 0)
    }
    // n_keys matches the true distinct count for one key
    val li = graft.core.Tables.lineitem(spark, sf)
    val ok = r.find(_.getString(0) == "l_orderkey").get.getLong(1)
    assert(ok == li.select("l_orderkey").distinct().count())
  }

  test("pagerankNations: mass bounded, teleport floor holds, ranks are stable across runs") {
    val p1 = Relational.pagerankNations(spark, sf).collect()
    assert(p1.length == 25)
    val mass = p1.map(_.getDouble(1)).sum
    // dangling nations leak mass, so sum <= 1 + rounding slack
    assert(mass > 0.15 && mass <= 1.0 + 1e-6, s"mass $mass")
    // every node keeps at least the teleport share
    assert(p1.forall(_.getDouble(1) >= 0.15 / 25 - 1e-9))
    // determinism: a second evaluation is bit-identical
    val p2 = Relational.pagerankNations(spark, sf).collect()
    assert(p1.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
           p2.map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("splitDrift: shares normalize per split and counts tie back to splitAssign") {
    val d = Text.splitDrift(spark, sf).collect()
    assert(d.nonEmpty)
    val sumTrain = d.map(_.getDouble(3)).sum
    val sumTest = d.map(_.getDouble(4)).sum
    assert(math.abs(sumTrain - 1.0) < 1e-5 && math.abs(sumTest - 1.0) < 1e-5)
    d.foreach { r =>
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) - r.getDouble(4))) < 1e-6)
    }
    // lang-summed counts equal the split totals from splitAssign
    val totals = Text.splitAssign(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.map(_.getLong(1)).sum == totals("train"))
    assert(d.map(_.getLong(2)).sum == totals("test"))
  }

  test("lmScore: probabilities bound the score; verbatim duplicates score identically") {
    val s = Text.lmScore(spark, sf).cache()
    try {
      // every bigram prob is < 1, so the mean log2-prob is negative
      assert(s.filter(col("avg_logp") >= 0.0).isEmpty)
      // n_bigrams = token count - 1 for every scored doc
      val toks = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("bigint").as("expect"))
      assert(s.join(toks, "doc_id").filter(col("n_bigrams") =!= col("expect")).isEmpty)
      // identical texts (the planted duplicate classes) score identically
      val fp = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val perFp = s.join(fp, "doc_id").groupBy("fp")
        .agg(countDistinct(col("avg_logp")).as("k"), count(lit(1)).as("n"))
      assert(perFp.filter(col("n") > 1 && col("k") =!= 1).isEmpty)
    } finally s.unpersist()
  }

  test("splitAssign: splits are complete, disjoint, and near 90/5/5") {
    val s = Text.splitAssign(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = s.values.sum
    assert(total == graft.core.Tables.documents(spark, sf).count())
    assert(s.keySet == Set("train", "val", "test"))
    val trainFrac = s("train").toDouble / total
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    // membership is a pure function of doc_id: recompute one bucket
    val ids = graft.core.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val expectTest = ids.count(id =>
      graft.functions.DetHash.hex60(s"split:$id") % 100 >= 95)
    assert(s("test") == expectTest)
  }
}
