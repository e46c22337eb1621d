package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Physical-plan audits: the scale-engineering claims in SURVEY.md
  * (broadcast star joins, zero-exchange bucketed joins, pushdown and
  * pruning at the scan, partial top-k) are asserted here so a future
  * refactor can't silently regress them.
  *
  * Assertions are deliberately structural ("contains BroadcastHashJoin")
  * rather than exact-plan snapshots — Spark upgrades reshape plan text,
  * but these operators' presence/absence IS the performance contract. */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  /** Execute df's OWN QueryExecution (collect, not count — count builds
    * a separate QE and leaves this one un-finalized), then return the
    * FINAL adaptive plan text. AQE's toString prints the final plan
    * first and the initial plan after a marker — keep only the final
    * section so node counts aren't doubled. */
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("isFinalPlan=false"), s"plan did not finalize:\n$s")
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("revenue_by_nation: dims broadcast — the fact side never shuffles for the join") {
    val p = planOf(Relational.revenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"star join fell back to SMJ:\n$p")
  }

  test("copy pipeline: projection + predicate reach the parquet scan") {
    import org.apache.spark.sql.functions.col
    val src = new graft.core.ParquetDir(sf)
    val df = src.read(spark, "orders")
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("o_orderdate"),
      s"column pruning failed (o_orderdate read for a 3-col projection):\n$scan")
  }

  test("topk_per_group: rank filter becomes a partial WindowGroupLimit before the shuffle") {
    val p = planOf(Relational.topKPerGroup(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"expected partial top-k pushdown:\n$p")
  }

  test("sessionize: window + per-session aggregate reuse ONE exchange on user_id") {
    // the lag window, cumulative sum, per-session agg and per-user agg
    // all partition by user_id: a single hashpartitioning exchange on
    // the events scan side (plus the final tiny sort for orderBy)
    val p = planOf(Events.sessionStats(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
  }

  test("knn_brute: query set broadcasts and the corpus side never shuffles") {
    val p = planOf(graft.ops.Vector.knnBrute(spark, sf, nQueries = 2, k = 2))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    // the only hash exchange allowed is the (tiny) post-join window rank
    val belowJoin = p.substring(p.indexOf("Broadcast"))
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"corpus side shuffled below the broadcast join:\n$p")
  }

  test("chunk_docs: map-only — no exchange except the final presentation sort") {
    val p = planOf(Text.chunkDocs(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle payloads:\n$p")
  }

  test("ivf_publish: the probe prunes the published index at the DIRECTORY level") {
    val df = Vector.ivfPublish(spark, sf)
    // not planOf: the static IN prune triggers a (redundant) dynamic-
    // pruning subquery whose RENDERED inner plan can print
    // isFinalPlan=false even after execution — planOf's finalization
    // assert would trip on that cosmetic string, not a real stall
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) s.substring(0, cut) else s
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(p).isDefined,
      s"probed lists must prune partitions on the artifact scan, not post-filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny probe set must broadcast against the pruned index:\n$p")
    // published-index semantics == the in-memory ivf_cosine operator
    val pub = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val mem = Vector.ivfCosine(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(pub == mem, "the on-disk index must answer exactly like the operator")
    assert(pub.nonEmpty)
  }

  test("ivf_append: the appended artifact probes with the same directory pruning") {
    val df = Vector.ivfAppend(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) s.substring(0, cut) else s
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(p).isDefined,
      s"append must not cost the probe its partition pruning:\n$p")
  }

  test("corpus_overlap: the self-join runs over hashes, never text, and after the distinct") {
    val df = Text.corpusOverlap(spark, sf)
    val p = planOf(df)
    // the pair join's inputs are (sh, source) — document text must not
    // survive past the explode into any exchange
    assert(!df.schema.fieldNames.contains("text"))
    val joinIdx = p.indexOf("SortMergeJoin")
    val hashJoinIdx = p.indexOf("ShuffledHashJoin")
    assert(joinIdx >= 0 || hashJoinIdx >= 0 || p.contains("BroadcastHashJoin"),
      s"expected an equi-join on sh:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the source-pair expansion must meet on shingle equality only:\n$p")
    // the DISTINCT (partial aggregate before the exchange) is what caps
    // each shingle's postings at #sources
    assert(p.contains("HashAggregate"), s"expected the distinct's aggregates:\n$p")
  }

  test("quality_regression sufficient statistics reduce O(d^2) values, not rows") {
    import org.apache.spark.sql.functions._
    val feats = graft.core.Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), " "))
      .withColumn("y", col("n_chars").cast("double"))
    val d = QualityModel.surfaceFeatures
    val proj = feats.select((d.map(_._2) :+ col("y")).zipWithIndex
      .map { case (c, i) => c.cast("double").as(s"_c$i") }: _*)
    val agg = proj.agg(
      sum((col("_c0") * col("_c1")).cast("decimal(38,12)")).as("s01"),
      sum((col("_c1") * col("_c2")).cast("decimal(38,12)")).as("s12"))
    val p = planOf(agg)
    // partial + final HashAggregate around ONE exchange: rows combine
    // map-side; only the O(d^2) sums cross the wire
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregates:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"sufficient statistics must shuffle exactly once:\n$p")
  }

  test("emb_neardups: banded LSH shape — every join an equi-join, corpus never nested-loops") {
    val p = planOf(Vector.embNearDups(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"corpus-wide nested-loop broadcast crept back:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the candidate path:\n$p")
  }

  test("semantic_decontaminate: bench broadcasts; the corpus's only exchange is the final per-doc agg") {
    val p = planOf(Vector.semanticDecontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny bench bucket set must broadcast, not shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffled join anywhere — the corpus is scanned once map-side:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidates must come from the band equi-join, never corpus x bench:\n$p")
    // exchanges: count(DISTINCT bid) plans two agg phases (dedup on
    // (vec_id, bid), then the count) plus the output sort — three
    // shuffles of (vec_id, bid, sim) rows; embeddings never ride one
    val nEx = "Exchange".r.findAllIn(p).length
    assert(nEx <= 4, s"expected distinct-agg + sort exchanges only, found $nEx:\n$p")
    assert(!"Exchange[^\\n]*emb".r.findFirstIn(p).isDefined,
      s"an embedding column crossed a shuffle:\n$p")
  }

  test("emb_neardups: banded candidates are a subset of exact all-pairs, with planted-dup recall") {
    import org.apache.spark.sql.functions._
    val banded = Vector.embNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // labeled exact baseline (the pre-round-3 all-pairs form), test-only
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      .withColumn("nrm", sqrt(Vector.dot(col("emb"), col("emb"))))
    val l = e.select(col("vec_id").as("d1"), col("emb").as("e1"), col("nrm").as("n1"))
    val r = e.select(col("vec_id").as("d2"), col("emb").as("e2"), col("nrm").as("n2"))
    val exact = l.join(r, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(Vector.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 4).as("sim"))
      .filter(col("sim") >= 0.4)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(banded.subsetOf(exact), "banded verify produced a pair exact all-pairs lacks")
    // deterministic given fixed data + md5 planes; ~75% expected at cos 0.4
    assert(exact.nonEmpty && banded.size >= exact.size / 2,
      s"banded recall collapsed: ${banded.size} of ${exact.size} exact pairs")
  }

  test("decontaminate: benchmark shingles broadcast — the corpus side semi-probes, no cartesian") {
    val p = planOf(Text.decontaminate(spark, sf, minShared = 1, benchBound = 10))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast for the semi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination check must stay an equi-semi-join:\n$p")
  }

  test("pack_chunks: per-shard window — no single-partition exchange") {
    val p = planOf(Text.packChunks(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"packing must parallelize across shards, not serialize globally:\n$p")
  }

  test("emb_neardups: a duplicate-vector class expands to all within pairs at sim 1.0") {
    // round-5 rep composition: 16 identical vectors must yield all
    // C(16,2)=120 pairs (from the class expansion, NOT from a 16-wide
    // band bucket) and the orthogonal vector must pair with none.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_vec_dup_").toString
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1f else 0.25f)
    val o = Array.tabulate(64)(i => if (i % 3 == 0) 0f else (if (i % 3 == 1) 1f else -1f))
    val rows = (0 until 16).map(i => (i.toLong, a, 0)) :+ ((99L, o, 1))
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4).write.parquet(s"$d/embeddings.parquet")
    val out = Vector.embNearDups(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val within = (for (i <- 0 until 16; j <- i + 1 until 16) yield (i.toLong, j.toLong)).toSet
    assert(out.map(_._1).toSet == within, s"expected exactly the 120 within pairs")
    assert(out.forall(_._2 == 1.0), "identical vectors must score sim 1.0")
  }

  test("ntile_dist: no single-partition exchange, and closed forms match Spark's window impl") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Relational.ntileDist(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Exchange SinglePartition"),
      s"global-window single-partition exchange crept back:\n$p")
    assert(!p.contains("Window"), s"expected the rank-closed-form path, not a Window:\n$p")
    // semantic lock: closed forms == Spark's own unpartitioned window
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val windowed = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        ntile(10).over(w).cast("int").as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
    assert(df.collect().toSeq == windowed.collect().toSeq)
  }

  test("shipping_priority: dim broadcasts, filters reach all scans, top-10 is partial") {
    val df = Relational.shippingPriority(spark, sf)
    val p = planOf(df)
    assert(p.contains("BroadcastHashJoin"), s"customer probe must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrderedAndProject, not a global sort:\n$p")
    // all three scans carry their pushed predicate
    assert("PushedFilters: \\[[^\\]]*c_mktsegment".r.findFirstIn(p).isDefined, s"customer filter not pushed:\n$p")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined, s"orders filter not pushed:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined, s"lineitem filter not pushed:\n$p")
  }

  test("ev_fill_forward: spine join is an equi-join on (user_id, h) — no nested loop") {
    val p = planOf(Events.fillForward(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"spine must equi-join the hourly observations:\n$p")
  }

  test("q19_disjunctive: quantity bound pushes to the fact scan; part broadcasts") {
    val p = planOf(Relational.q19Disjunctive(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"part side must broadcast on the extracted p_partkey equi-key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"OR-of-ANDs must not defeat the equi-join extraction:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p).isDefined,
      s"the common l_quantity bound must reach the lineitem scan:\n$p")
  }

  test("q21_waiting: both self-correlations ride the orderkey equi-join — no cartesian") {
    val p = planOf(Relational.q21Waiting(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"suppkey<> must stay a residual on the orderkey join:\n$p")
  }

  test("q5_local_volume: every dim broadcasts — the only shuffle join is lineitem x orders") {
    val p = planOf(Relational.q5LocalVolume(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    // customer.nation = supplier.nation is an extra conjunct on the
    // broadcast probe, never a separate shuffle
    val smj = "SortMergeJoin".r.findAllIn(p).length
    val shj = "ShuffledHashJoin".r.findAllIn(p).length
    assert(smj + shj <= 1, s"expected at most the fact-fact orderkey shuffle join:\n$p")
  }

  test("q17_small_qty: the per-part average joins back broadcast — fact never shuffles") {
    val p = planOf(Relational.q17SmallQty(spark, sf))
    assert(!p.contains("SortMergeJoin"),
      s"part-cardinality aggregate must broadcast back onto the fact:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q7_volume: all dims broadcast — at most the lineitem x orders shuffle join") {
    val p = planOf(Relational.q7Volume(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"supp/cust dims must broadcast:\n$p")
    val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1,
      s"expected at most the fact-fact orderkey shuffle join, got $shuffleJoins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q8_market_share: region-pruned customer set and supplier broadcast — one fact shuffle") {
    val p = planOf(Relational.q8MarketShare(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1,
      s"expected at most the lineitem x orders shuffle join, got $shuffleJoins:\n$p")
    // the EUROPE region filter prunes at the region scan
    assert("PushedFilters: \\[[^\\]]*r_name".r.findFirstIn(p).isDefined,
      s"region filter not pushed:\n$p")
  }

  test("q9_profit_proxy: part + supplier broadcast; profit expression stays in codegen") {
    val p = planOf(Relational.q9ProfitProxy(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"part/supplier must broadcast:\n$p")
    val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1,
      s"only the orders join may shuffle, got $shuffleJoins:\n$p")
    assert("PushedFilters: \\[[^\\]]*p_type".r.findFirstIn(p).isDefined,
      s"ECONOMY part filter not pushed:\n$p")
  }

  test("q14_promo_share: date window pushes to the fact scan; part broadcasts; no shuffle join") {
    val p = planOf(Relational.q14PromoShare(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"single-row ratio must not shuffle-join:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"shipdate window not pushed to the lineitem scan:\n$p")
  }

  test("q22_cold_call: scalar avg rides a 1-row broadcast; anti-join stays equi — no cartesian") {
    val p = planOf(Relational.q22ColdCall(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"the 1-row scalar must broadcast, never cartesian:\n$p")
    assert(p.contains("LeftAnti"), s"expected the URGENT-orders anti-join:\n$p")
    assert("PushedFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(p).isDefined,
      s"URGENT filter not pushed to the orders scan:\n$p")
  }

  test("bloom_prune_join: probe is Catalyst might_contain (codegen), not a ScalaUDF, fact-scan side") {
    val df = Relational.bloomPruneJoin(spark, sf)
    val p = planOf(df)
    assert(p.contains("might_contain"),
      s"expected the Catalyst BloomFilterMightContain probe:\n$p")
    assert(!p.contains("UDF") && !p.contains("ScalaUDF"),
      s"bloom probe regressed to an opaque Scala UDF (no codegen):\n$p")
    // the prefilter must sit on the fact side BELOW the join: in plan
    // text the probe appears before (above) the BroadcastHashJoin's
    // build side would print it — assert it's attached to a Filter
    // that feeds the join, i.e. might_contain occurs after the join
    // node in the tree printout (children print below parents)
    val joinAt = p.indexOf("BroadcastHashJoin")
    val probeAt = p.indexOf("might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom prefilter must be below the join, on the fact scan side:\n$p")
  }

  test("q6_forecast: all three conjuncts reach the scan — no join, no wide shuffle") {
    val p = planOf(Relational.q6Forecast(spark, sf))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(s"PushedFilters: \\[[^\\]]*$c".r.findFirstIn(p).isDefined,
        s"$c bound not pushed to the lineitem scan:\n$p")
    assert(!p.contains("Join"), s"Q6 must be join-free:\n$p")
    assert(p.contains("Exchange SinglePartition"),
      s"only the 1-row final-agg exchange expected:\n$p")
  }

  test("q13_custdist: urgent filter pushes to orders; outer join stays equi") {
    val p = planOf(Relational.q13CustDist(spark, sf))
    assert("PushedFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(p).isDefined,
      s"priority filter not pushed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftOuter"), s"expected the left-outer count join:\n$p")
  }

  test("q20_excess: derived aggregates broadcast back; supplier attaches left-semi") {
    val p = planOf(Relational.q20Excess(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"econ part ids + per-part totals must broadcast:\n$p")
    assert(p.contains("LeftSemi"), s"supplier must attach via left-semi:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"1997 window not pushed to the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("asof_nearest: one exchange per side — the click dedup reuses the join-key partitioning") {
    val p = planOf(graft.ops.Events.asofNearestNative(spark, sf))
    assert(p.contains("AsofJoin"), s"expected the native exec:\n$p")
    // sides co-partition like SMJ: purchases hash once on user_id; the
    // click-side groupBy(c_user, click_us) rides the SAME c_user
    // exchange the as-of needs (subset-satisfaction), so no re-shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected exactly 2 hash exchanges (one per side), got $exchanges:\n$p")
  }

  test("training_cut_publish: the train read-back is directory-pruned via PartitionFilters") {
    val df = Text.trainingCutPublish(spark, sf)
    val p = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*split".r.findFirstIn(p).isDefined,
      s"split=train must prune at the directory level, not post-scan:\n$p")
    // the manifest artifact is slim — the read-back must not resurrect
    // any document payload (assert on the schema, not a plan-text
    // substring: a scratch-path segment containing 'text' must not trip)
    val cols = df.schema.fieldNames.toSet
    assert(!cols.contains("text"), s"published manifest must not carry text: $cols")
  }

  test("winnow_fp: leads, counts, window-min and the distinct agg reuse ONE doc_id exchange") {
    val p = planOf(Text.winnowFingerprint(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected 1 hash exchange (everything partitions on doc_id), got $exchanges:\n$p")
  }

  test("winnow_pairs + winnow_spans: heavy stages stay behind barriers — the declared plan replays no tokenize") {
    // the composed forms materialize classes/fps/grams through in-JVM
    // barriers (Barriers.cached: persist + LogicalRDD leaf) at build
    // time; the RETURNED plan must scan those barrier leaves, never
    // re-derive fingerprints from text (a posexplode or a split() in
    // the plan means a barrier reference regressed to lineage replay —
    // the multi-reference recompute the round-8 fix removed)
    for ((name, df) <- Seq(
        ("winnow_pairs", Text.winnowPairs(spark, sf)),
        ("winnow_spans", Text.winnowSpans(spark, sf)))) {
      val p = planOf(df)
      assert(p.contains("Scan ExistingRDD"),
        s"$name must read its barrier leaves:\n$p")
      assert(!p.toLowerCase.contains("posexplode") && !p.contains("split(text"),
        s"$name replays gram derivation inside the declared plan:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name pair stage must stay an equi-join:\n$p")
    }
  }

  test("training_cut: composition stays barriered — dedup stage reads its barrier, no cartesian") {
    val p = planOf(Text.trainingCut(spark, sf))
    // the dup-classes upstream (shingles -> minhash -> label propagation)
    // must come in through dupClasses' in-JVM barrier leaf, not be
    // replayed inline in the manifest plan
    assert(p.contains("Scan ExistingRDD"),
      s"dedup stage must read the materialization barrier:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row stats broadcast may be non-equi:\n$p")
    // the per-lang threshold joins back broadcast onto the doc stream
    assert(p.contains("BroadcastHashJoin"), s"thr must broadcast:\n$p")
  }

  test("q2_min_cost: correlated min-cost subquery decorrelates to an aggregate join") {
    val p = planOf(Relational.q2MinCost(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the correlated min must decorrelate, never re-execute per row:\n$p")
    // the decorrelated form is a per-part min aggregate joined back
    assert(p.contains("HashAggregate"), s"expected the decorrelated min aggregate:\n$p")
  }

  test("q4_order_priority: EXISTS plans as a left-semi; date window pushes to orders") {
    val p = planOf(Relational.q4OrderPriority(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi join:\n$p")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined,
      s"quarter window not pushed to the orders scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q10_returned: top-k is TakeOrderedAndProject; dims broadcast; returnflag pushed") {
    val p = planOf(Relational.q10Returned(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT over the aggregate must plan per-partition top-k:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer/nation must broadcast:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(p).isDefined,
      s"returnflag not pushed to the fact scan:\n$p")
  }

  test("q12_shipmode: one aggregate pass for both CASE classes; ship window pushed") {
    val p = planOf(Relational.q12Shipmode(spark, sf))
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"ship-year window not pushed to the fact scan:\n$p")
    assert(!p.contains("Union"),
      s"the two conditional counts must fold into ONE aggregate, not a union of scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q15_top_supplier: the view max is one extra 1-row aggregate, no fact self-join blowup") {
    val p = planOf(Relational.q15TopSupplier(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the scalar max subquery must not nested-loop:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"quarter window not pushed to the fact scan:\n$p")
  }

  test("q16_supplier_cnt: NOT IN plans as a hash anti join, not a nested loop") {
    val df = Relational.q16SupplierCnt(spark, sf)
    // the anti join only shows pre-runtime: sf0.001 has ZERO excluded
    // suppliers, so AQE's empty-relation propagation eliminates the
    // whole join at execution — itself the right scale behavior. The
    // contract to pin is the COMPILED shape: a single-key null-aware
    // hash anti, never a nested loop.
    val initial = df.queryExecution.sparkPlan.toString
    assert(initial.contains("LeftAnti"), s"NOT IN must become an anti join:\n$initial")
    assert(!initial.contains("BroadcastNestedLoopJoin") && !initial.contains("CartesianProduct"),
      s"single-key null-aware anti must stay a hash join:\n$initial")
    val p = planOf(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("corr_subquery + lateral_topk decorrelate — no per-row nested-loop re-execution") {
    val ps = planOf(Relational.corrSubquery(spark, sf))
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      s"scalar subquery must decorrelate to an aggregate join:\n$ps")
    assert(ps.contains("HashAggregate"), s"expected the decorrelated max() aggregate:\n$ps")
    val pl = planOf(Relational.lateralTopK(spark, sf))
    assert(!pl.contains("CartesianProduct") && !pl.contains("BroadcastNestedLoopJoin"),
      s"lateral limit must decorrelate, not nested-loop:\n$pl")
    assert(pl.contains("Window"), s"expected the rank-based decorrelated limit:\n$pl")
  }
}
