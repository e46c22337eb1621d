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
