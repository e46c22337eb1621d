package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-6 session-3 additions: typed-Aggregator UDAF, manual Bloom
  * join pruning, collations, SQL UDF inlining, null-safe join, XML
  * round-trip fidelity. */
class Round6bOpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"
  import org.apache.spark.sql.Encoders

  test("GeoMean: closed form on a known input") {
    import spark.implicits._
    spark.udf.register("geo_mean_t",
      udaf(graft.functions.GeoMean, Encoders.scalaDouble))
    val got = Seq(1.0, 8.0).toDF("x").agg(expr("geo_mean_t(x)")).head().getDouble(0)
    assert(math.abs(got - math.sqrt(8.0)) < 1e-12, s"geomean(1,8)=$got")
  }

  test("GeoMean: decimal-sum buffer makes the result partition-order invariant") {
    import spark.implicits._
    spark.udf.register("geo_mean_t",
      udaf(graft.functions.GeoMean, Encoders.scalaDouble))
    val xs = (1 to 500).map(i => 0.1 + i * 3.7)
    def run(parts: Int): Double =
      xs.toDF("x").repartition(parts).agg(expr("geo_mean_t(x)")).head().getDouble(0)
    // bit-equal, not approx-equal: the exact decimal sum admits no
    // merge-order wiggle, which is the property the double sum lacks
    assert(java.lang.Double.doubleToLongBits(run(1)) ==
           java.lang.Double.doubleToLongBits(run(7)))
  }

  test("bloomPruneJoin: the sketch prunes the fact scan and the exact join removes FPs") {
    val part = graft.core.Tables.part(spark, sf)
    val dim = part.filter(col("p_size") <= 9).select("p_partkey", "p_brand")
    val li = graft.core.Tables.lineitem(spark, sf)
    val bf = dim.stat.bloomFilter("p_partkey", math.max(dim.count(), 1L), 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    val total = li.count()
    val pruned = li.filter(mightContain(col("l_partkey"))).count()
    val exact = li.join(dim, col("l_partkey") === col("p_partkey")).count()
    // the prefilter must genuinely drop rows, and can only over-approximate
    assert(pruned < total, s"bloom dropped nothing ($pruned of $total)")
    assert(pruned >= exact, "bloom may never drop a true match")
    // declared query == plain join (false positives removed by the join)
    val a = Relational.bloomPruneJoin(spark, sf).collect().map(_.toSeq)
    val b = li.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("revenue"))
      .orderBy("p_brand").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("collation: UTF8_LCASE folds case variants that binary grouping keeps apart") {
    val df = spark.sql(
      "SELECT c FROM VALUES ('Apple'),('APPLE'),('pear') AS t(c)")
    assert(df.agg(countDistinct(col("c"))).head().getLong(0) == 3)
    assert(df.agg(countDistinct(collate(col("c"), "UTF8_LCASE"))).head().getLong(0) == 2)
  }

  test("sqlUdf: the SQL-defined function inlines (no closure-UDF boundary in the plan)") {
    val df = Relational.sqlUdfQuery(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"SQL UDF failed to inline:\n$plan")
  }

  test("nullSafeJoin: the NULL<=>NULL pair survives as a single matched row") {
    val rows = Relational.nullSafeJoin(spark, sf).collect()
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length == 1, "exactly one NULL-key row (matched, not duplicated)")
    // nation 3 has customers at every SF; the folded NULL group must carry them
    assert(nullRows.head.getAs[Long]("n_cust") > 0)
  }

  test("xmlRoundtrip: schema and cardinality survive the XML round-trip") {
    val src = graft.core.Tables.part(spark, sf)
    val back = graft.sources.Formats.xmlRoundtrip(spark, sf)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
  }
}
