package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.functions.DetHash

/** Round-2 operator surface, exercised against the sf0.001 corpus
  * (read-only driver testdata — the same tables the oracle checks). */
class Round2OpsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("DetHash: column hex60 equals driver-side hex60 (the portability invariant)") {
    import spark.implicits._
    val words = Seq("hello", "a:0", "b:63", "p:3:17", "the quick fox", "")
    val got = words.toDF("s").select(DetHash.hex60(col("s"))).as[Long].collect().toSeq
    assert(got == words.map(DetHash.hex60))
  }

  test("sampleHash: deterministic across runs, ~10% of rows") {
    val a = Relational.sampleHash(spark, sf).collect().toSeq
    val b = Relational.sampleHash(spark, sf).collect().toSeq
    assert(a == b)
    val n = a.map(_.getAs[Long]("n")).sum
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(n > total / 20 && n < total / 5) // 5%..20% band around 10%
  }

  test("unpivotMelt: two rows per part, both metrics present") {
    val df = Relational.unpivotMelt(spark, sf)
    val nParts = graft.core.Tables.part(spark, sf).count()
    assert(df.count() == 2 * nParts)
    val metrics = df.select("metric").distinct().collect().map(_.getString(0)).toSet
    assert(metrics == Set("p_size", "p_retailprice"))
  }

  test("windowDedup: exactly one row per customer, and it is the latest") {
    val df = Relational.windowDedup(spark, sf).cache()
    val perKey = df.groupBy("o_custkey").count().filter(col("count") > 1).count()
    assert(perKey == 0)
    // spot-check one customer against a direct max()
    val orders = graft.core.Tables.orders(spark, sf)
    val c = orders.select("o_custkey").first().getLong(0)
    val expected = orders.filter(col("o_custkey") === c)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .select("o_orderkey").first().getLong(0)
    val got = df.filter(col("o_custkey") === c).select("latest_order").first().getLong(0)
    assert(got == expected)
    df.unpersist()
  }

  test("dateSpine: all 12 months present (gaps zero-filled)") {
    val rows = Relational.dateSpine(spark, sf).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getString(0)).toSeq == (1 to 12).map(m => f"1996-$m%02d"))
    assert(rows.forall(_.getAs[Long]("n_orders") >= 0))
  }

  test("ivfCosine: a restriction of brute force — per-query top sim never exceeds brute's") {
    val ivf = Vector.ivfCosine(spark, sf, nQueries = 4, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val brute = Vector.knnBrute(spark, sf, nQueries = 4, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(ivf.nonEmpty && brute.nonEmpty)
    // IVF searches a subset of the corpus (2 of 8 probed lists), so its
    // best hit can never beat the exhaustive scan; when the sims are
    // equal, the tie-break (neighbor_id asc) must agree too.
    ivf.foreach { case (q, (ivfN, ivfSim)) =>
      val (bruteN, bruteSim) = brute(q)
      assert(ivfSim <= bruteSim, s"query $q: ivf $ivfSim beat brute $bruteSim")
      if (ivfSim == bruteSim) assert(ivfN == bruteN, s"query $q tie-break mismatch")
    }
    val again = Vector.ivfCosine(spark, sf, nQueries = 4, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(ivf == again) // deterministic
  }

  test("ntileDist: deciles span 1..10 with balanced sizes") {
    val df = Relational.ntileDist(spark, sf)
    val sizes = df.groupBy("decile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (1 to 10).toSet)
    assert(sizes.values.max - sizes.values.min <= 1) // ntile balance property
  }
}
