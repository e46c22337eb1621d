package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Round-8 session additions: the cross-source overlap matrix (and
  * friends added later this round). */
class Round8OpsSpec extends AnyFunSuite with SparkFixture {

  private def corpus(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_").toString
    docs.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("corpus_overlap counts distinct shared shingles per source pair") {
    val dir = corpus(Seq(
      (1L, "a0 a1 a2 a3", "s1"),           // vocab: {a0a1a2, a1a2a3}
      (2L, "a0 a1 a2 b3 b4", "s2"),        // {a0a1a2, a1a2b3, a2b3b4}
      (3L, "a0 a1 a2 x0", "s2"),           // adds a1a2x0; a0a1a2 counted ONCE
      (4L, "z0 z1 z2", "s3")))             // disjoint
    val rows = Text.corpusOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // only (s1, s2) shares anything: the single shingle a0a1a2;
    // containment = 1 / min(|s1|=2, |s2|=4) = 0.5.
    assert(rows.toSeq == Seq(("s1", "s2", 1L, 0.5)),
      s"got ${rows.toSeq}")
  }

  test("corpus_overlap: a within-source duplicate shingle never inflates the pair count") {
    val dir = corpus(Seq(
      (1L, "c0 c1 c2", "s1"),
      (2L, "c0 c1 c2", "s1"),              // same shingle, same source
      (3L, "c0 c1 c2 d3", "s2")))
    val rows = Text.corpusOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("s1", "s2", 1L, 1.0)), s"got ${rows.toSeq}")
  }

  test("vocab_coverage: a tiny vocab makes planted rare tokens OOV, common ones covered") {
    val dir = corpus(Seq(
      (1L, "hot hot hot hot cold", "s1"),
      (2L, "hot hot rare1 rare2", "s1"),
      (3L, "hot cold cold", "s2")))
    val rows = Text.vocabCoverage(spark, dir, vocabSize = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vocab = {hot (7), cold (3)}; OOV = rare1, rare2 (2 of 12 tokens)
    assert(rows.toSeq == Seq(("en", 12L, 2L, 0.1667)), s"got ${rows.toSeq}")
  }

  private val sf = "/root/testdata/sf0.001"

  test("ivf_append: incremental artifact serves identically to the full index") {
    val appended = Vector.ivfAppend(spark, sf).collect().map(_.toSeq).toSeq
    val full = Vector.ivfCosine(spark, sf).collect().map(_.toSeq).toSeq
    assert(appended == full,
      "base+delta append must serve bit-identically to the one-shot index")
  }

  test("ivf_append: appended artifact holds the same assignments as a rebuild") {
    Vector.ivfAppend(spark, sf).collect()   // materialize the appended artifact
    Vector.ivfPublish(spark, sf).collect()  // materialize the rebuilt artifact
    def assignments(tag: String): Set[(Long, Int)] =
      spark.read.parquet(graft.core.TempDirs.stable(s"$tag:$sf"))
        .select("vec_id", "list_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val app = assignments("ivfappend")
    val reb = assignments("ivfpub")
    assert(app == reb, s"appended vs rebuilt assignment sets differ: " +
      s"only-appended=${(app -- reb).take(5)} only-rebuilt=${(reb -- app).take(5)}")
  }
}
