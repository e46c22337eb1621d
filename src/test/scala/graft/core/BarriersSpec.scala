package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pins the in-JVM barrier's two contracts (OPTIMIZATION r13):
  *
  * 1. WITHIN one call, N consumers of a barriered frame compute the
  *    subtree once (that is the point of the barrier).
  * 2. ACROSS calls there is NO reuse — the bench's "every invocation
  *    recomputes from the parquet inputs" rule: a second call building
  *    the IDENTICAL plan must not pick up the first call's cached data
  *    (Spark's CacheManager matches by canonicalized plan, so without
  *    the unique observe tag it silently would). */
class BarriersSpec extends AnyFunSuite with SparkFixture {

  test("within-call: a barriered frame computes its subtree once for N consumers") {
    import spark.implicits._
    val evals = spark.sparkContext.longAccumulator("barrier_evals")
    val costly = udf { (x: Long) => evals.add(1L); x * 2 }
    val df = (1L to 100L).toDF("x").repartition(2).select(costly(col("x")).as("y"))
    val b = Barriers.cached("spec:within", df)
    // two consumers in one action: a self-join over the barrier
    val n = b.as("a").join(b.as("b"), "y").count()
    assert(n == 100L)
    assert(evals.value == 100L, "subtree must evaluate once, not per consumer")
    Barriers.drop("spec:within")
  }

  test("across calls: an identical plan never reuses the previous call's cache") {
    import spark.implicits._
    val evals = spark.sparkContext.longAccumulator("barrier_evals2")
    val costly = udf { (x: Long) => evals.add(1L); x + 1 }
    def build() = (1L to 50L).toDF("x").select(costly(col("x")).as("y"))
    val c1 = Barriers.cached("spec:across", build())
    assert(c1.count() == 50L)
    assert(evals.value == 50L)
    // same tag, same plan — the previous entry must be dropped AND the
    // new one must not alias it: the subtree re-evaluates in full
    val c2 = Barriers.cached("spec:across", build())
    assert(c2.count() == 50L)
    assert(evals.value == 100L, "second call must recompute, never reuse")
    // and under a DIFFERENT tag while the first is still live: a
    // sibling operator sharing a stage must also stay cold
    val c3 = Barriers.cached("spec:across2", build())
    assert(c3.count() == 50L)
    assert(evals.value == 150L, "sibling tags must not share cached data")
    Barriers.drop("spec:across")
    Barriers.drop("spec:across2")
  }
}
