package graft.ops

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.functions.DetHash
import scala.collection.immutable.{Vector => SVec}

/** Randomized model check of `winnow_spans` (the hardest algorithm in
  * the tree) against a sequential pure-Scala reference implementing
  * the same declared semantics: exact-dedup classes, k=4 gram hashes,
  * w=4 window-min winnowing, the copy-counting df cap, >=1-shared-fp
  * candidacy, maximal consecutive gram runs per diagonal (ng >= w),
  * within-class self spans for eligible classes, and orientation-aware
  * class-map expansion with 1-based token offsets. The reference
  * shares ONLY the hash primitive (DetHash.hex60) with the engine —
  * every pipeline step is re-derived independently, so agreement on
  * random corpora with planted copies and shared runs pins the whole
  * chain, not just the planted-offset cases WinnowSpec covers. */
class WinnowSpansModelSpec extends AnyFunSuite with SparkFixture {

  private val K = 4
  private val W = 4

  // ------------------------------------------------------------ the model

  private type SpanRow = (Long, Long, Long, Long, Long, Long, Long)

  private def modelSpans(docs: Seq[(Long, String)], maxDf: Int): Seq[SpanRow] = {
    val toks: Map[Long, SVec[String]] =
      docs.map { case (id, t) => id -> t.split(" ").to(SVec) }.toMap
    // exact-content classes; representative = min doc_id
    val classes: Seq[Seq[Long]] =
      docs.groupBy(_._2).values.map(_.map(_._1).sorted).toSeq
    val members: Map[Long, Seq[Long]] = classes.map(c => c.min -> c).toMap
    val reps = members.keySet

    def grams(id: Long): SVec[Long] = {
      val t = toks(id)
      if (t.length < K) SVec.empty
      else (0 to t.length - K).map(i =>
        DetHash.hex60(t.slice(i, i + K).mkString(" "))).to(SVec)
    }
    val repGrams: Map[Long, SVec[Long]] = reps.map(r => r -> grams(r)).toMap
    def fpsOf(g: SVec[Long]): Set[Long] =
      if (g.length < W) Set.empty
      else (0 to g.length - W).map(i => g.slice(i, i + W).min).toSet
    val repFps: Map[Long, Set[Long]] = repGrams.map { case (r, g) => r -> fpsOf(g) }

    // df cap counts COPIES: each class contributes its size to every fp
    val nd: Map[Long, Long] = repFps.toSeq
      .flatMap { case (r, fs) => fs.map(f => f -> members(r).size.toLong) }
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    val kept: Map[Long, Set[Long]] =
      repFps.map { case (r, fs) => r -> fs.filter(f => nd(f) <= maxDf) }

    // candidate rep pairs: >= 1 shared surviving fp
    val repSeq = reps.toSeq.sorted
    val cand = for {
      i <- repSeq.indices; j <- (i + 1) until repSeq.length
      r1 = repSeq(i); r2 = repSeq(j)
      if (kept(r1) & kept(r2)).nonEmpty
    } yield (r1, r2)

    // maximal consecutive gram runs per diagonal; ng >= W
    def runs(g1: SVec[Long], g2: SVec[Long]): Seq[(Int, Int, Int, Int, Int)] = {
      val matches = for {
        p1 <- g1.indices; p2 <- g2.indices; if g1(p1) == g2(p2)
      } yield (p1, p2)
      matches.groupBy { case (p1, p2) => p1 - p2 }.toSeq.flatMap { case (_, ms) =>
        val ps = ms.map(_._1).sorted
        // islands of consecutive p1
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        islands.filter(_.size >= W).map { isl =>
          val sp1 = isl.min; val ep1 = isl.max
          val diag = ms.head._1 - ms.head._2
          (sp1, ep1, sp1 - diag, ep1 - diag, isl.size)
        }
      }
    }

    val cross: Seq[SpanRow] = cand.flatMap { case (r1, r2) =>
      runs(repGrams(r1), repGrams(r2)).flatMap { case (sp1, ep1, sp2, ep2, ng) =>
        for (m1 <- members(r1); m2 <- members(r2)) yield {
          val aFirst = m1 < m2
          val (a, b) = (math.min(m1, m2), math.max(m1, m2))
          val (spA, epA, spB, epB) =
            if (aFirst) (sp1, ep1, sp2, ep2) else (sp2, ep2, sp1, ep1)
          (a, b, spA + 1L, epA + K.toLong, spB + 1L, epB + K.toLong,
            ng + K - 1L)
        }
      }
    }

    // within-class self spans (incl. the trivial diag-0 full match):
    // classes of >= 2 members whose rep holds >= 1 surviving fp
    val within: Seq[SpanRow] = reps.toSeq
      .filter(r => members(r).size >= 2 && kept(r).nonEmpty)
      .flatMap { r =>
        val selfRuns = runs(repGrams(r), repGrams(r))
        val ms = members(r)
        for {
          i <- ms.indices; j <- (i + 1) until ms.length
          (sp1, ep1, sp2, ep2, ng) <- selfRuns
        } yield (ms(i), ms(j), sp1 + 1L, ep1 + K.toLong,
          sp2 + 1L, ep2 + K.toLong, ng + K - 1L)
      }

    (cross ++ within).sorted
  }

  // ------------------------------------------------------- the generator

  private def randomCorpus(rnd: Random): Seq[(Long, String)] = {
    val vocab = (0 until 20).map(i => s"t$i")
    def fresh(n: Int): SVec[String] =
      SVec.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val n = 5 + rnd.nextInt(4)
    val base = (0 until n).map(_ => fresh(rnd.nextInt(45)).to(SVec)).toArray
    // plant shared runs: splice a slice of doc i into doc j
    (0 until 3).foreach { _ =>
      val i = rnd.nextInt(n); val j = rnd.nextInt(n)
      if (i != j && base(i).length >= K + W) {
        val len = K + W - 1 + rnd.nextInt(10)
        val from = rnd.nextInt(math.max(1, base(i).length - len))
        val run = base(i).slice(from, math.min(base(i).length, from + len))
        val at = rnd.nextInt(base(j).length + 1)
        base(j) = base(j).take(at) ++ run ++ base(j).drop(at)
      }
    }
    // plant exact copies (classes of 2-3)
    (0 until 2).foreach { _ =>
      val i = rnd.nextInt(n); val j = rnd.nextInt(n)
      if (i != j) base(j) = base(i)
    }
    base.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }.toSeq
  }

  private def sparkSpans(docs: Seq[(Long, String)], maxDf: Int): Seq[SpanRow] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wsm_").toString
    docs.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Text.winnowSpans(spark, dir, maxDf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sorted
  }

  test("winnow_spans matches the sequential reference on random corpora (10 seeds)") {
    var total = 0
    var cappedTotal = 0
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val docs = randomCorpus(rnd)
      val maxDf = if (seed % 3 == 0) 3 else 100 // exercise the cap too
      val expected = modelSpans(docs, maxDf)
      val got = sparkSpans(docs, maxDf)
      assert(got == expected,
        s"seed=$seed maxDf=$maxDf: spark=${got.size} rows model=${expected.size} rows\n" +
          s"only-spark=${(got.diff(expected)).take(5)}\n" +
          s"only-model=${(expected.diff(got)).take(5)}")
      total += expected.size
      if (maxDf == 3) cappedTotal += expected.size
    }
    // the agreement must not be vacuous: the generator's planted runs and
    // copies have to produce real spans, in capped rounds too
    assert(total >= 20, s"generator produced too few spans to mean anything: $total")
    assert(cappedTotal >= 1, "no capped-round spans — the df cap went unexercised")
  }
}
