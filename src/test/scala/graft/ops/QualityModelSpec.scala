package graft.ops

import scala.util.Random
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The closed-form distributed regression: solver correctness on
  * random SPD systems, exact planted-coefficient recovery through the
  * distributed sufficient-statistics path, bit-stability across
  * partitionings, and a sequential whole-pipeline reference on the
  * real corpus. */
class QualityModelSpec extends AnyFunSuite with SparkFixture {

  test("solver: random SPD systems round-trip (A x = b with known x)") {
    val rnd = new Random(7)
    (1 to 20).foreach { _ =>
      val n = 2 + rnd.nextInt(5)
      // SPD via M'M + I
      val m = Array.fill(n, n)(rnd.nextDouble() * 2 - 1)
      val a = Array.tabulate(n, n)((i, j) =>
        (0 until n).map(k => m(k)(i) * m(k)(j)).sum + (if (i == j) 1.0 else 0.0))
      val x = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val b = Array.tabulate(n)(i => (0 until n).map(j => a(i)(j) * x(j)).sum)
      val got = QualityModel.solve(a, b)
      got.zip(x).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-8, s"solver off: $g vs $e") }
    }
  }

  test("fit recovers planted coefficients through the distributed path") {
    import spark.implicits._
    val rnd = new Random(11)
    // y = 1.5 + 2*x1 - 3*x2, exactly (features pre-rounded so no
    // quantization noise enters the plant)
    val rows = (1 to 500).map { _ =>
      val x1 = math.rint(rnd.nextDouble() * 100) / 100
      val x2 = math.rint(rnd.nextDouble() * 100) / 100
      (x1, x2, 1.5 + 2 * x1 - 3 * x2)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(7)
    val feats = Seq[(String, org.apache.spark.sql.Column)](
      "intercept" -> lit(1.0), "x1" -> col("x1"), "x2" -> col("x2"))
    val (betas, n, r2) = QualityModel.fit(df, feats, col("y"))
    assert(n == 500L)
    assert(math.abs(betas(0) - 1.5) < 1e-4 && math.abs(betas(1) - 2.0) < 1e-4 &&
      math.abs(betas(2) + 3.0) < 1e-4, s"betas off: $betas")
    assert(r2 > 0.999999, s"exact plant must fit perfectly, r2=$r2")
  }

  test("sufficient statistics are bit-stable across partitionings") {
    import spark.implicits._
    val rnd = new Random(13)
    val rows = (1 to 300).map { _ =>
      (rnd.nextDouble(), rnd.nextDouble(), rnd.nextGaussian()) }
    val feats = Seq[(String, org.apache.spark.sql.Column)](
      "intercept" -> lit(1.0), "x1" -> col("x1"), "x2" -> col("x2"))
    val fits = Seq(1, 3, 17).map { p =>
      QualityModel.fit(rows.toDF("x1", "x2", "y").repartition(p), feats, col("y"))
    }
    assert(fits.distinct.size == 1,
      s"decimal sums must make the fit partition-invariant: $fits")
  }

  test("holdout: the model fitted on half the corpus generalizes to the unseen half") {
    val sf = "/root/testdata/sf0.001"
    val rows = QualityModel.qualityDistillHoldout(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, rmse, r2) =>
      assert(n > 0 && rmse >= 0, s"$lang: degenerate holdout stats")
      assert(r2 > 0.3, s"$lang: held-out r2 collapsed to $r2 — the fit memorized, not learned")
    }
    // partition-invariance of the report (decimal sums)
    val again = QualityModel.qualityDistillHoldout(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("corpus fit agrees with a sequential reference and explains real variance") {
    val sf = "/root/testdata/sf0.001"
    val q = QualityModel.qualityRegression(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(q("_n") > 400, s"most docs must carry an entropy score: ${q("_n")}")
    assert(q("_r2") > 0.5 && q("_r2") <= 1.0,
      s"surface features must explain most entropy variance, r2=${q("_r2")}")
    // sequential reference: collect the SAME feature/target rows and
    // redo normal equations + solve in plain Scala
    val feats = graft.core.Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), " "))
      .join(Text.tokenEntropy(spark, sf).select(col("doc_id"), col("entropy")), "doc_id")
      .select((QualityModel.surfaceFeatures.map(_._2) :+ col("entropy"))
        .zipWithIndex.map { case (c, i) => c.cast("double").as(s"c$i") }: _*)
      .collect().map(r => (0 to 5).map(r.getDouble).toArray)
    val d = 5
    val a = Array.tabulate(d, d)((i, j) =>
      feats.map(r => r(i) * r(j)).sum + (if (i == j) 1e-6 else 0.0))
    val b = Array.tabulate(d)(i => feats.map(r => r(i) * r(d)).sum)
    val ref = QualityModel.solve(a, b)
    QualityModel.surfaceFeatures.map(_._1).zip(ref).foreach { case (name, rv) =>
      assert(math.abs(q(name) - rv) < 1e-4,
        s"$name: distributed ${q(name)} vs sequential $rv")
    }
  }
}
