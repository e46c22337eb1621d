package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Semantic decontamination (LSH-banded corpus-vs-bench screen +
  * exact cosine verify): planted verbatim/paraphrase leakage, the
  * identical-vector recall guarantee, and value agreement with the
  * unblocked brute force on the corpus. */
class SemanticDecontaminateSpec extends AnyFunSuite with SparkFixture {

  /** bench = ids < 100 (the operator's pseudo-holdout convention). */
  private def plantedDir(): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_semdecon_").toString
    def block(b: Int, s: Float) = Array.tabulate(64)(i => if (i / 16 == b) s else 0f)
    val rows = Seq(
      (1L, block(0, 1f), 0),    // bench: direction A
      (2L, block(1, 1f), 1),    // bench: direction B
      (100L, block(0, 3f), 0),  // corpus: parallel to bench A -> cos 1.0
      (101L, block(2, 1f), 2),  // corpus: disjoint support -> cos 0 to both
      (102L, block(1, 1f), 1))  // corpus: verbatim copy of bench B
    rows.toDF("vec_id", "embedding", "label")
      .repartition(2).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted leakage: parallel and verbatim corpus vectors flag, disjoint ones don't") {
    val out = Vector.semanticDecontaminate(spark, plantedDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((100L, 1L, 1.0), (102L, 1L, 1.0)),
      s"exactly the two leaked vectors, one bench hit each at cos 1.0; got ${out.toSeq}")
  }

  test("corpus agreement: flagged values match brute force; verbatim (cos 1.0) recall is total") {
    val dir = "/root/testdata/sf0.001"
    val out = Vector.semanticDecontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // unblocked brute force corpus x bench (test-only; the operator's
    // point is the banded prefilter)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val bench = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("bid"), col("v").as("vb"))
    val corpus = e.filter(col("vec_id") >= 100)
      .select(col("vec_id").as("cid"), col("v").as("vc"))
    val brute = corpus.crossJoin(bench)
      .withColumn("cos", round(
        Vector.dot(col("vc"), col("vb")) /
          (sqrt(Vector.dot(col("vc"), col("vc"))) * sqrt(Vector.dot(col("vb"), col("vb")))), 4))
      .filter(col("cos") >= 0.4)
      .groupBy("cid").agg(count(lit(1)).as("n"), max(col("cos")).as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty, "the corpus calibration threshold must flag something")
    // precision: every flagged doc's hit count is <= brute (banding may
    // miss sub-1.0 pairs) and max_sim matches a true bench similarity
    out.foreach { case (cid, (n, mx)) =>
      val (bn, bmx) = brute.getOrElse(cid,
        fail(s"$cid flagged but brute force sees no >= 0.4 bench hit"))
      assert(n <= bn, s"$cid: $n hits > brute's $bn")
      assert(mx <= bmx + 1e-9, s"$cid: max_sim $mx exceeds brute's $bmx")
    }
    // identical vectors share every band: any brute max at 1.0 MUST flag
    brute.collect { case (cid, (_, 1.0)) => cid }.foreach(cid =>
      assert(out.contains(cid), s"verbatim-leaked $cid missed"))
  }

  test("banded variant is contained in the exact baseline; values agree where both flag") {
    val dir = "/root/testdata/sf0.001"
    val exact = Vector.semanticDecontaminateExact(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val banded = Vector.semanticDecontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(banded.keySet.subsetOf(exact.keySet),
      s"LSH flagged a doc the exact pass didn't: ${banded.keySet -- exact.keySet}")
    banded.foreach { case (cid, (n, mx)) =>
      val (en, emx) = exact(cid)
      assert(n <= en && mx <= emx + 1e-9,
        s"$cid: banded ($n, $mx) exceeds exact ($en, $emx)")
    }
    // the recall-1.0 guarantee on verbatim leakage, against the EXACT run
    exact.collect { case (cid, (_, 1.0)) => cid }.foreach(cid =>
      assert(banded.contains(cid), s"verbatim-leaked $cid missed by banding"))
    assert(exact.size >= banded.size && exact.nonEmpty)
  }
}
