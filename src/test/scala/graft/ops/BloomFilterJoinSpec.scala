package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Runtime Bloom-filter join pruning: when a shuffle join's build side
  * is selectively filtered, Catalyst injects a bloom filter on the
  * probe side's scan (might_contain), cutting the fact-side shuffle —
  * a first-class 100 TB technique that comes free with declarative
  * plans. This spec pins the thresholds low enough to trigger it on
  * the test corpus and asserts the filter lands in the final plan. */
class BloomFilterJoinSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact scan of an SMJ") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val orders = graft.core.Tables.orders(spark, sf)
      val lineitem = graft.core.Tables.lineitem(spark, sf)
      val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = lineitem.join(dim, lineitem("l_orderkey") === dim("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("dedup_incremental_bloom: codegen probe gates the anti-join; output equals the plain anti-join") {
    val df = Text.dedupIncrementalBloom(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==") // AQE prints both; count final only
    val p = if (cut >= 0) s.substring(0, cut) else s
    assert(p.contains("might_contain"), s"expected the explicit bloom probe:\n$p")
    assert(!p.contains("ScalaUDF"), s"probe must stay codegen'd, not a UDF:\n$p")
    // exactly one anti-join — only the bloom-HIT branch rides it; the
    // definite-new branch short-circuits map-side
    val antis = "LeftAnti".r.findAllIn(p).length
    assert(antis == 1, s"expected 1 anti-join (hit branch only), got $antis:\n$p")
    // no false negatives: bit-identical to the exact variant
    val bloom = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val exact = Text.dedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(bloom == exact, "bloom gating must never drop a genuinely new row")
    assert(bloom.nonEmpty)
  }
}
