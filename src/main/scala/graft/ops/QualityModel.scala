package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Distributed closed-form RIDGE REGRESSION: fit an expensive
  * aggregation-shaped quality signal (`Text.tokenEntropy` — the
  * Gopher-style diversity filter, an explode + two hash-agg passes
  * per doc) from five CHEAP map-only surface features — the standard
  * curation distillation (train a cheap student on an expensive
  * teacher signal, then score fresh corpora map-only, reserving the
  * teacher for a sample). On this corpus the student explains most of
  * the teacher's variance (r2 bound specced); the same harness fits
  * any teacher column — `lmScore`'s avg_logp plugs in unchanged (on
  * THIS synthetic corpus surface features explain only ~3% of LM
  * variance, measured, which is itself the honest signal that
  * LM-based filtering is not replaceable by surface stats).
  *
  * Scale shape: the whole fit is ONE hash aggregate producing the
  * normal-equation sufficient statistics — the d(d+1)/2 upper
  * triangle of X'X, the d-vector X'y, sum(y²) and n — so rows never
  * shuffle and the reduce payload is O(d²) regardless of corpus size
  * (exactly how MLlib's closed-form path scales). The d×d solve runs
  * on the driver (Gaussian elimination with partial pivoting).
  * Determinism: features are rounded to 6dp doubles, every product is
  * cast to DECIMAL(38,12) BEFORE summing (exact, order-independent —
  * bit-stable across partitionings, same discipline as the k-means
  * trainer), and the sequential driver solve is deterministic by
  * construction. Declared rows-only: a matrix solve has no SQL twin;
  * QualityModelSpec pins the solver, planted-coefficient recovery,
  * bit-stability, and a sequential whole-pipeline reference. */
object QualityModel {

  /** Solve A x = b (A symmetric positive definite here) by Gaussian
    * elimination with partial pivoting — sequential, deterministic. */
  private[ops] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      require(math.abs(a(col)(col)) > 1e-12, s"singular system at column $col")
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until n) a(r)(c) -= f * a(col)(c)
        b(r) -= f * b(col)
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until n) s -= a(r)(c) * x(c)
      x(r) = s / a(r)(r)
    }
    x
  }

  /** One-pass sufficient statistics + driver solve + one scoring pass
    * for fit quality. Returns (betas, n, r2). */
  private[ops] def fit(df: DataFrame, features: Seq[(String, Column)],
                       target: Column, ridge: Double = 1e-6): (Seq[Double], Long, Double) = {
    val d = features.size
    val dec = "decimal(38,12)"
    val proj = df.select(
      (features.map(_._2) :+ target).zipWithIndex.map { case (c, i) =>
        c.cast("double").as(s"_c$i") }: _*)
    val xx = for (i <- 0 until d; j <- i until d)
      yield sum((col(s"_c$i") * col(s"_c$j")).cast(dec)).as(s"xx_${i}_$j")
    val xy = (0 until d).map(i =>
      sum((col(s"_c$i") * col(s"_c$d")).cast(dec)).as(s"xy_$i"))
    val yy = sum((col(s"_c$d") * col(s"_c$d")).cast(dec)).as("yy")
    val sy = sum(col(s"_c$d").cast(dec)).as("sy")
    val aggs = xx ++ xy :+ yy :+ sy :+ count(lit(1)).as("n")
    val row = proj.agg(aggs.head, aggs.tail: _*).head()
    def dbl(name: String): Double =
      row.getDecimal(row.fieldIndex(name)).doubleValue()
    val a = Array.tabulate(d, d)((i, j) =>
      (if (i <= j) dbl(s"xx_${i}_$j") else dbl(s"xx_${j}_$i")) +
        (if (i == j) ridge else 0.0))
    val b = Array.tabulate(d)(i => dbl(s"xy_$i"))
    val n = row.getLong(row.fieldIndex("n"))
    val betas = solve(a, b).map(v => math.rint(v * 1e6) / 1e6).toSeq
    // fit quality: one more pass with the broadcast betas (literals)
    val pred = features.map(_._2).zip(betas)
      .map { case (c, w) => c.cast("double") * lit(w) }.reduce(_ + _)
    val sse = df.select(sum(((target - pred) * (target - pred)).cast(dec)).as("sse"))
      .head().getDecimal(0).doubleValue()
    // sum(y) is its own aggregate — no reliance on features.head being
    // an all-ones intercept column
    val sst = dbl("yy") - dbl("sy") * dbl("sy") / n
    val r2 = if (sst == 0.0) 0.0 else 1.0 - sse / sst
    (betas, n, math.rint(r2 * 1e6) / 1e6)
  }

  /** The five cheap surface features (each rounded to 6dp so the
    * sufficient statistics are engine-stable), over tokenized docs. */
  private[ops] def surfaceFeatures: Seq[(String, Column)] = {
    val nTok = size(col("t")).cast("double")
    def r6(c: Column): Column = round(c, 6)
    Seq(
      "intercept" -> lit(1.0),
      "log2_tokens" -> r6(log2(nTok + 1)),
      "ttr" -> r6(size(array_distinct(col("t"))).cast("double") / greatest(nTok, lit(1.0))),
      "stop_frac" -> r6(size(filter(col("t"), x =>
        x.isin("the", "a", "of", "and", "is", "to"))).cast("double") / greatest(nTok, lit(1.0))),
      "mean_tok_len" -> r6((col("n_chars").cast("double") - (nTok - 1))
        / greatest(nTok, lit(1.0))))
  }

  private def featsWithTarget(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .join(Text.tokenEntropy(spark, dir).select(col("doc_id"), col("entropy")), "doc_id")

  /** Declared query: coefficient table + fit stats of the distilled
    * quality model. Rows: one per feature (term, value = beta), plus
    * `_n` (docs fitted) and `_r2` (variance explained). */
  def qualityRegression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (betas, n, r2) = fit(featsWithTarget(spark, dir), surfaceFeatures, col("entropy"))
    (surfaceFeatures.map(_._1).zip(betas) :+
      ("_n" -> n.toDouble) :+ ("_r2" -> r2))
      .toDF("term", "value")
      .orderBy("term")
  }

  /** HELD-OUT evaluation of the distilled model — the honest
    * generalization check a production distillation ships with: fit on
    * the even-doc_id half, score the UNSEEN odd half map-only
    * (broadcast betas as plan literals), and report per-lang holdout
    * error. Per-lang SSE/SST accumulate in DECIMAL like the training
    * sums, so the report is partition-invariant. Declared rows-only
    * (the solve). */
  def qualityDistillHoldout(spark: SparkSession, dir: String): DataFrame = {
    val all = featsWithTarget(spark, dir)
    val (betas, _, _) = fit(all.filter(col("doc_id") % 2 === 0),
      surfaceFeatures, col("entropy"))
    val pred = surfaceFeatures.map(_._2).zip(betas)
      .map { case (c, w) => c.cast("double") * lit(w) }.reduce(_ + _)
    val dec = "decimal(38,12)"
    val holdout = all.filter(col("doc_id") % 2 === 1)
      .select(col("lang"), col("entropy").as("y"), pred.as("yhat"))
    holdout.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(((col("y") - col("yhat")) * (col("y") - col("yhat"))).cast(dec)).as("sse"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      .select(col("lang"), col("n_docs"),
        round(sqrt(col("sse").cast("double") / col("n_docs")), 6).as("rmse"),
        // nullif guards a degenerate group (constant/singleton holdout:
        // sst = 0) — report 0.0 like fit() does, never a null row
        coalesce(round(lit(1.0) - col("sse").cast("double")
          / nullif(col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double") / col("n_docs"),
            lit(0.0)), 6), lit(0.0))
          .as("r2"))
      .orderBy("lang")
  }
}
