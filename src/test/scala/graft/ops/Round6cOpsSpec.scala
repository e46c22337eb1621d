package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 session-4 additions: dedup representative selection,
  * C4/Gopher-style quality filters, uniform-mix sampling weights. */
class Round6cOpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("dedupKeepBest: exactly one survivor per duplicate class") {
    val df = Text.dedupKeepBest(spark, sf).cache()
    try {
      val perClass = df.groupBy("class_id")
        .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
      assert(perClass.filter(col("n_keep") =!= 1).isEmpty,
        "every class keeps exactly one doc")
      // the survivor carries the class max quality (doc_id breaks ties)
      val maxQ = df.groupBy("class_id").agg(max("quality").as("max_q"))
      val bad = df.filter(col("keep")).join(maxQ, "class_id")
        .filter(col("quality") =!= col("max_q"))
      assert(bad.isEmpty, "the kept doc must be the class quality max")
      // same doc universe as the class labeling it extends
      assert(df.count() == Text.dupClasses(spark, sf).count())
    } finally df.unpersist()
  }

  test("c4Filters: keep equals the conjunction of its own reported signals") {
    val df = Text.c4Filters(spark, sf).cache()
    try {
      val recomputed = col("word_count").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        !col("has_lorem") && !col("has_brace") && col("symbol_ratio") <= 0.1
      assert(df.filter(col("keep") =!= recomputed).isEmpty)
      // non-degenerate on the synthetic corpus: both outcomes occur
      val kept = df.filter(col("keep")).count()
      assert(kept > 0 && kept < df.count(), s"degenerate filter: $kept kept")
    } finally df.unpersist()
  }

  test("c4Filters: map-only — no exchange before the final order") {
    val plan = Text.c4Filters(spark, sf).queryExecution.executedPlan.toString
    // exactly the ordering's range-partition exchange, nothing upstream
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected one (sort) exchange only:\n$plan")
  }

  test("mixWeights: thresholds downsample-only and the cut is deterministic") {
    val df = Text.mixWeights(spark, sf).cache()
    try {
      // downsample-only: never keep more than exists, never exceed 1e6 ppm,
      // and a full-keep threshold keeps the full language
      assert(df.filter(col("n_sampled") > col("n_docs")).isEmpty)
      assert(df.filter(col("thr_ppm") > 1000000L).isEmpty)
      assert(df.filter(col("thr_ppm") === 1000000L &&
        col("n_sampled") =!= col("n_docs")).isEmpty,
        "thr=1e6 must keep every doc of that language")
      // the hash cut is deterministic: a rerun lands on identical counts
      val again = Text.mixWeights(spark, sf)
      assert(df.except(again).isEmpty && again.except(df).isEmpty)
    } finally df.unpersist()
  }
}
