package graft.ops

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Operator semantics on small crafted corpora written to a temp dir in
  * the driver's parquet layout, so the ops run exactly as in prod. */
class OpsSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_ops_test_").toString
    import spark.implicits._
    // documents: 0 and 1 are near-dups (one word changed), 2 is unrelated,
    // 3 is an exact copy of 0.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, base.replace("lazy", "sleepy"), "en", "s0", base.length.toLong),
      (2L, "completely different words without any overlap at all here now", "de", "s1", 62L),
      (3L, base, "en", "s1", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    // events: one user with a >30min gap (2 sessions), purchases after clicks
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    Seq(
      (1L, ts(0), 7L, "click", 1.0, """{"k": 1}"""),
      (2L, ts(5), 7L, "purchase", 2.0, """{"k": 12}"""),
      (3L, ts(50), 7L, "click", 3.0, """{"k": 23}"""),
      (4L, ts(55), 7L, "purchase", 4.0, """{"k": 34}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    // embeddings: vec 0/1 parallel (cos=1), 2 orthogonal
    val e0 = Array(1f, 0f, 0f, 0f)
    val e1 = Array(2f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    Seq((0L, e0, 0), (1L, e1, 0), (2L, e2, 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("dedupExact groups identical texts under min doc_id") {
    val rows = Text.dedupExact(spark, dir).collect()
    assert(rows.length == 3) // 4 docs, one exact pair
    val dup = rows.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("doc_id") == 0L) // representative is min(0,3)
  }

  test("jaccardPairs finds the near-dup and exact pair, not the unrelated doc") {
    val pairs = Text.jaccardPairs(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact: jaccard 1.0
    assert(pairs.contains((0L, 1L))) // near-dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhashNearDups recovers the exact-dup pair (jaccard 1.0 survives any banding)") {
    val pairs = Text.minhashNearDups(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("sessionize splits on the 30-minute gap") {
    val rows = Events.sessionize(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 2L))
  }

  test("asof picks the most recent strictly-earlier click per purchase") {
    val rows = Events.asofPurchaseClick(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("last_click_us")).toMap
    def us(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00").getTime * 1000
    assert(byId(2L) == us(0))  // purchase@10:05 -> click@10:00
    assert(byId(4L) == us(50)) // purchase@10:55 -> click@10:50 (not 10:00)
  }

  test("knnBrute ranks the parallel vector first with sim 1.0") {
    val rows = Vector.knnBrute(spark, dir, nQueries = 1, k = 2).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("neighbor_id") == 1L)
    assert(rows(0).getAs[Double]("sim") == 1.0)
    assert(rows(1).getAs[Double]("sim") == 0.0) // orthogonal
  }

  test("embNearDups finds the planted parallel pair (cos = 1.0)") {
    val pairs = Vector.embNearDups(spark, dir, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("multimodal features: byte stats of the synthesized payload") {
    val rows = Multimodal.features(spark, dir).collect()
    assert(rows.length == 4)
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(r0.getAs[String]("kind") == "image") // doc_id 0 % 3
    assert(r0.getAs[Long]("n_bytes") == 59L)    // len(base text)
  }

  test("multimodal frame sampling: one frame per 1000ms inclusive") {
    val rows = Multimodal.frameSample(spark, dir).collect()
    // only doc_id 2 is video (2 % 3 == 2); duration = n_chars*10 = 620ms
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.toSeq == Seq(2L))
    assert(rows.map(_.getAs[Long]("offset_ms")).toSeq == Seq(0L))
  }

  test("streaming tumbling equals batch tumbling") {
    val batch = Events.tumbling(spark, dir).collect().map(_.toSeq)
    val stream = graft.streaming.EventStreams.tumbling(spark, dir).collect().map(_.toSeq)
    assert(stream.toSeq == batch.toSeq)
  }

  test("streaming parquet sink emits exactly the watermark-finalized windows") {
    // real corpus (the crafted one spans < 2h -> zero finalized windows)
    val sf = "/root/testdata/sf0.001"
    val full = graft.streaming.EventStreams.tumbling(spark, sf).collect().map(_.toSeq)
    val pq = graft.streaming.EventStreams.tumblingToParquet(spark, sf).collect().map(_.toSeq)
    val maxUs = graft.core.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val finalized = full.filter(r =>
      r.head.asInstanceOf[Long] + 3600000000L <= maxUs - 3600000000L)
    assert(pq.toSeq == finalized.toSeq)
    assert(pq.length < full.length, "expected trailing windows to be withheld")
  }

  test("streaming session_window splits on the 30-minute gap") {
    val rows = graft.streaming.EventStreams.sessionWindows(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 2L))
  }

  test("simhash candidates include exact hamming distance") {
    val rows = Text.simhashCandidates(spark, dir).collect()
    // exact dup pair (0,3) must collide with hamming 0
    val exact = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(exact.isDefined && exact.get.getAs[Int]("hamming") == 0)
  }

  test("streaming user counts equal batch groupBy") {
    val rows = graft.streaming.EventStreams.userCounts(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_events") == 4L)
    assert(rows(0).getAs[Double]("max_value") == 4.0)
  }

  test("native graft_dot equals the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions.{col, transform => arrTransform}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), arrTransform(col("embedding"), x => x.cast("double")).as("emb"))
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val both = e.select(
      graft.functions.GraftFunctions.dot(spark, col("emb"), col("emb")).as("native"),
      Vector.dot(col("emb"), col("emb")).as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dot rejects non-double-array inputs") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$dir/embeddings.parquet") // float arrays
    graft.functions.GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      e.select(graft.functions.GraftFunctions.dot(spark, col("embedding"), col("embedding"))).collect()
    }
  }

  test("SparkEntry.entry (t1 smoke contract) returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("langStats aggregates per language") {
    val rows = Text.langStats(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"))).toSet ==
      Set(("en", 3L), ("de", 1L)))
  }

  test("jsonExtract buckets parsed props.k") {
    val rows = Events.jsonExtract(spark, dir).collect()
    val buckets = rows.map(r => r.getAs[Int]("k_bucket") -> r.getAs[Long]("n")).toMap
    assert(buckets == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("decontaminate flags docs overlapping the benchmark shard") {
    // benchBound=1: doc 0 is the benchmark. Doc 3 (exact copy) shares
    // every shingle; doc 1 (one word changed) shares 7 of 10; doc 2
    // (unrelated) shares none and must NOT be flagged.
    val rows = Text.decontaminate(spark, dir, minShared = 5, benchBound = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set(1L, 3L), s"flagged: ${rows.keySet}")
    assert(rows(3L) > rows(1L),
      "the exact copy must share strictly more shingles than the near-dup")
  }

  test("approx_distinct: HLL stays within 2% of exact distinct at sf0.01") {
    // The one declared query with no DuckDB oracle (HLL sketches are
    // engine-specific) — this bounds its error instead (VERDICT r3 #7).
    // rsd=0.01 targets ~1% standard error; 2% is two sigmas.
    val sf01 = "/root/testdata/sf0.01"
    val approx = Relational.approxDistinct(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a - e).toDouble / e <= 0.02,
        s"l_returnflag=$flag: approx $a vs exact $e exceeds 2%")
    }
  }

  test("approx_percentiles: GK sketch rank error stays within n/accuracy of exact") {
    // The second no-oracle sketch query (beside approx_distinct): the
    // returned value's RANK among the group's values must sit within
    // accuracy bound n/1000 (+1 for ties/rounding) of the target rank —
    // the Greenwald-Khanna guarantee, checked per group and percentile.
    val sf01 = "/root/testdata/sf0.01"
    val orders = graft.core.Tables.orders(spark, sf01)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted }
    val rows = Relational.approxPercentiles(spark, sf01).collect()
    assert(rows.map(_.getString(0)).toSet == orders.keySet)
    rows.foreach { r =>
      val vals = orders(r.getString(0))
      val n = vals.length
      assert(r.getAs[Long]("n_rows") == n)
      Seq(("ap50", 0.5), ("ap90", 0.9), ("ap99", 0.99)).foreach { case (c, p) =>
        val a = r.getAs[Double](c)
        // rank band of the approx value among the sorted group
        val lo = vals.count(_ < a)
        val hi = vals.count(_ <= a)
        val target = p * (n - 1)
        val err = n.toDouble / 1000 + 1
        assert(target >= lo - err && target <= hi + err,
          s"${r.getString(0)}/$c: value $a has rank [$lo,$hi], target $target ± $err")
      }
    }
  }

  test("heavy_hitters: CMS estimates are one-sided and within eps * N of exact") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Text.heavyHitters(spark, sf01).collect()
    assert(rows.length == 20)
    val totalTokens = graft.core.Tables.documents(spark, sf01)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_tf"), r.getAs[Long]("cms_tf"))
      assert(est >= exact, s"${r.getString(0)}: CMS must never under-count ($est < $exact)")
      assert(est - exact <= 0.001 * totalTokens,
        s"${r.getString(0)}: overshoot ${est - exact} exceeds eps*N ${0.001 * totalTokens}")
    }
    // the top tokens genuinely dominate: exact counts are descending
    val tfs = rows.map(_.getAs[Long]("exact_tf"))
    assert(tfs.sameElements(tfs.sortBy(-_)))
  }
}
