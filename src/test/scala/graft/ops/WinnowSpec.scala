package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Winnowing fingerprints (Schleimer et al. 2003, k=4 grams / w=4
  * windows): pins the scheme's defining guarantee — any shared token
  * run of length >= k+w-1 yields at least one shared SELECTED
  * fingerprint — plus the density bound and the df cap that keeps the
  * pair join from exploding on boilerplate. */
class WinnowSpec extends AnyFunSuite with SparkFixture {

  private def corpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_").toString
    docs.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a shared run of k+w-1 tokens guarantees a shared fingerprint (copy detection)") {
    val shared = words("common", 12) // >= k+w-1 = 7
    val dir = corpus(Seq(
      (1L, s"${words("alpha", 20)} $shared ${words("omega", 20)}"),
      (2L, s"${words("left", 9)} $shared ${words("right", 14)}"),
      (3L, words("unrelated", 40))))
    val pairs = Text.winnowPairs(spark, dir, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "docs sharing a 12-token run must share a winnowed fingerprint")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must pair with nothing")
  }

  test("identical docs share their full fingerprint set; density obeys the window bound") {
    val text = words("tok", 60)
    val dir = corpus(Seq((1L, text), (2L, text)))
    val fps = Text.winnowFingerprint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fps.length == 2)
    val Seq((_, kg1, n1), (_, kg2, n2)) = fps.toSeq.map(t => (t._1, t._2, t._3))
    assert(kg1 == 57 && kg2 == 57, "60 tokens -> 57 4-grams")
    assert(n1 == n2, "identical text -> identical fingerprint count")
    // winnowing selects at most one fp per window start, usually far fewer
    assert(n1 >= 1 && n1 <= 54, s"density out of range: $n1 of 54 windows")
    val shared = Text.winnowPairs(spark, dir, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shared.toSeq == Seq((1L, 2L, n1)),
      "identical docs share EVERY selected fingerprint")
  }

  private def spans(dir: String): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
    Text.winnowSpans(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("winnowSpans: a planted shared run surfaces with exact 1-based offsets") {
    val shared = words("common", 12)
    val dir = corpus(Seq(
      (1L, s"${words("alpha", 20)} $shared ${words("omega", 20)}"),
      (2L, s"${words("left", 9)} $shared ${words("right", 14)}"),
      (3L, words("unrelated", 40))))
    // doc1 tokens: alpha 1-20, common 21-32, omega 33-52
    // doc2 tokens: left 1-9, common 10-21, right 22-35
    assert(spans(dir) == Seq((1L, 2L, 21L, 32L, 10L, 21L, 12L)),
      "the one shared 12-token run, nothing else")
  }

  test("winnowSpans: disjoint shared runs split into separate maximal spans") {
    val s1 = words("one", 8)
    val s2 = words("two", 9)
    val dir = corpus(Seq(
      (1L, s"${words("a", 10)} $s1 ${words("b", 10)} $s2 ${words("c", 5)}"),
      (2L, s"${words("d", 6)} $s1 ${words("e", 12)} $s2 ${words("f", 3)}")))
    // doc1: a 1-10, one 11-18, b 19-28, two 29-37, c 38-42
    // doc2: d 1-6, one 7-14, e 15-26, two 27-35, f 36-38
    assert(spans(dir) == Seq(
      (1L, 2L, 11L, 18L, 7L, 14L, 8L),
      (1L, 2L, 29L, 37L, 27L, 35L, 9L)),
      "two disjoint runs must become two maximal spans, never merge")
  }

  test("winnowSpans: a run repeated in ONE doc emits one span per occurrence; short runs emit none") {
    val s = words("rep", 7) // exactly k+w-1
    val dir = corpus(Seq(
      (1L, s"${words("x", 8)} $s ${words("y", 8)}"),
      (2L, s"$s ${words("z", 10)} $s"),
      // 6 < k+w-1 shared tokens: below the guarantee, must NOT span
      (4L, s"${words("p", 10)} ${words("short", 6)}"),
      (5L, s"${words("q", 10)} ${words("short", 6)}")))
    // doc1: x 1-8, rep 9-15, y 16-23; doc2: rep 1-7, z 8-17, rep 18-24
    assert(spans(dir) == Seq(
      (1L, 2L, 9L, 15L, 1L, 7L, 7L),
      (1L, 2L, 9L, 15L, 18L, 24L, 7L)),
      "both occurrences in doc2 must surface; the 6-token overlap must not")
  }

  test("rep expansion swaps span offsets when member order flips the pair's orientation") {
    // class {1, 30} (identical content A), doc 20 (content B sharing a
    // run): the rep pair is (1, 20) with A's offsets on the a-side, but
    // the expanded pair (20, 30) puts content B first — the a/b offset
    // columns must swap, and the within pair (1, 30) is the full-doc
    // self-span with no swap
    val shared = words("common", 12)
    val a = s"${words("alpha", 20)} $shared ${words("omega", 20)}" // 52 tokens
    val b = s"${words("left", 9)} $shared ${words("right", 14)}"
    val dir = corpus(Seq((1L, a), (20L, b), (30L, a)))
    // content A: common at 21-32; content B: common at 10-21
    assert(spans(dir) == Seq(
      (1L, 20L, 21L, 32L, 10L, 21L, 12L),
      (1L, 30L, 1L, 52L, 1L, 52L, 52L),
      (20L, 30L, 10L, 21L, 21L, 32L, 12L)),
      "expanded pairs must carry orientation-correct offsets")
  }

  test("the df cap counts COPIES, not distinct contents (dirty-corpus semantics pinned)") {
    // 51 identical-pair classes (102 docs) all sharing one boilerplate
    // run: rep-level df is 51, but member-level df is 102 > 100, so the
    // boilerplate must still be capped away exactly as in the
    // uncomposed form — cross-class pairs vanish; each class's two
    // copies still pair through their OWN unique-prefix fingerprints
    val boiler = words("boiler", 12)
    val docs = (1L to 51L).flatMap(i =>
      Seq((i * 2L, s"${words(s"u$i", 10)} $boiler"),
          (i * 2L + 1L, s"${words(s"u$i", 10)} $boiler")))
    val dir = corpus(docs)
    val pairs = Text.winnowPairs(spark, dir, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L to 51L).map(i => (i * 2L, i * 2L + 1L)).toSet,
      "exactly the 51 within-class pairs; boilerplate cross pairs capped away")
  }

  test("the df cap drops boilerplate fingerprints instead of joining them") {
    // 150 docs all carrying the same boilerplate run (> maxDf=100):
    // with only the boilerplate in common, the capped join yields NO
    // pairs — C(150,2) = 11k pairs would otherwise flood the output
    val boiler = words("boiler", 12)
    val docs = (1L to 150L).map(i => (i, s"${words(s"u$i", 10)} $boiler"))
    val dir = corpus(docs)
    val pairs = Text.winnowPairs(spark, dir, minShared = 1)
      .collect()
    assert(pairs.isEmpty,
      s"boilerplate-only overlap must be df-capped away, got ${pairs.length} pairs")
  }
}
