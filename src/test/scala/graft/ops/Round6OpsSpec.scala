package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 batch additions: the Q3-shaped composite, hourly LOCF gap
  * fill, and the cross-document duplicated-shingle diagnostic. */
class Round6OpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("shippingPriority: top-10, revenue descending, matches an independent recompute") {
    val rows = Relational.shippingPriority(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)), "revenue must be descending")
    // independent recompute of the winner via plain SQL joins
    val c = graft.core.Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val o = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
    val top = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .first()
    assert(rows.head.getAs[Long]("l_orderkey") == top.getAs[Long]("l_orderkey"))
    assert(rows.head.getAs[Double]("revenue") == top.getAs[Double]("revenue"))
  }

  test("fillForward: contiguous hourly spine per user, gaps carry the previous value") {
    val df = Events.fillForward(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // no row escapes the fill: the first spine hour is an observation
    assert(rows.forall(!_.isNullAt(2)), "value_filled must never be null")
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val hs = rs.map(_.getLong(1)).sorted
      // contiguous hourly steps between the user's lo and hi
      assert(hs.zip(hs.tail).forall { case (a, b) => b - a == 3600000000L })
      assert(!rs.minBy(_.getLong(1)).getBoolean(3), "first hour must be observed")
      // every gap hour repeats the previous hour's filled value
      val ordered = rs.sortBy(_.getLong(1))
      ordered.zip(ordered.tail).foreach { case (prev, cur) =>
        if (cur.getBoolean(3))
          assert(cur.getDouble(2) == prev.getDouble(2),
            s"gap hour must carry forward (${cur.getLong(0)} @ ${cur.getLong(1)})")
      }
    }
    // the corpus is sparse enough that gaps actually exist
    assert(rows.exists(_.getBoolean(3)), "spec needs at least one gap hour to be meaningful")
  }

  test("dupNgramCoverage: bounded fractions; exact-duplicate docs score dup_frac 1.0") {
    val df = Text.dupNgramCoverage(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, shared, frac) = (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("dup_frac"))
      assert(shared >= 0 && shared <= n)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // docs whose FULL text occurs elsewhere share every shingle
    val dupDocs = graft.core.Tables.documents(spark, sf)
      .groupBy(md5(col("text")).as("fp")).agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(explode(col("ids")).as("doc_id"))
    val offending = df.join(dupDocs, "doc_id").filter(col("dup_frac") < 1.0).count()
    assert(offending == 0, "an exact-duplicate doc must have dup_frac = 1.0")
    df.unpersist()
  }
}
