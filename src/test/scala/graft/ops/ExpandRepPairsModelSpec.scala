package graft.ops

import scala.util.Random
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized model check for the salted class-map expansion — the
  * combinatorial core every composed sketch pipeline (minhash, fuzzy,
  * winnow, semantic) funnels through. The sqrt-group salting must
  * produce EVERY unordered pair EXACTLY once (cross pairs through
  * orientation-normalized member products, within pairs through the
  * (rep, ga, gb) subkeys), for random class structures nobody wrote
  * by hand — skewed class sizes, singletons, interleaved member ids,
  * multiple payload rows. */
class ExpandRepPairsModelSpec extends AnyFunSuite with SparkFixture {

  test("expandRepPairs emits every expected pair exactly once (8 seeds)") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new Random(seed)
      // random classes over a shuffled id space: sizes 1..7, some large
      val ids = rnd.shuffle((1L to (20L + rnd.nextInt(40))).toList)
      var rest = ids
      val classes = Seq.newBuilder[Seq[Long]]
      while (rest.nonEmpty) {
        val take = math.min(1 + rnd.nextInt(7), rest.size)
        classes += rest.take(take)
        rest = rest.drop(take)
      }
      val cls = classes.result().map(ms => ms.min -> ms.sorted)
      val classMap = cls.flatMap { case (rep, ms) => ms.map(m => (m, rep)) }
        .toDF("doc_id", "rep").repartition(5)
      // random rep-level cross pairs with a payload
      val reps = cls.map(_._1).sorted
      val repPairs = (for {
        i <- reps.indices; j <- (i + 1) until reps.size
        if rnd.nextDouble() < 0.3
      } yield (reps(i), reps(j), rnd.nextInt(1000).toDouble))
      val repPairsDf = repPairs.toDF("d1", "d2", "pay").repartition(3)

      val got = Text.expandRepPairs(repPairsDf, classMap,
          Seq("pay"), Seq(lit(-1.0)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted

      val byRep = cls.toMap
      val cross = repPairs.flatMap { case (r1, r2, pay) =>
        for (a <- byRep(r1); b <- byRep(r2))
          yield (math.min(a, b), math.max(a, b), pay)
      }
      val within = cls.flatMap { case (_, ms) =>
        for (i <- ms.indices; j <- (i + 1) until ms.size)
          yield (ms(i), ms(j), -1.0)
      }
      val expected = (cross ++ within).sorted
      assert(got == expected,
        s"seed=$seed: got ${got.size} pairs, expected ${expected.size}\n" +
          s"only-got=${got.diff(expected).take(5)}\nonly-exp=${expected.diff(got).take(5)}")
      assert(expected.nonEmpty, s"seed=$seed: vacuous round")
    }
  }
}
