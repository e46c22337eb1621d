package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Physical-plan audits: the scale-engineering claims in SURVEY.md
  * (broadcast star joins, zero-exchange bucketed joins, pushdown and
  * pruning at the scan, partial top-k) are asserted here so a future
  * refactor can't silently regress them. Plans are inspected via the
  * explain string of the final (AQE-resolved where applicable) plan.
  *
  * Assertions are deliberately structural ("contains BroadcastHashJoin")
  * rather than exact-plan snapshots — Spark upgrades reshape plan text,
  * but these operators' presence/absence IS the performance contract. */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    // materialize so AQE finalizes its decisions, then read the plan
    df.count()
    df.queryExecution.executedPlan.toString
  }

  test("revenue_by_nation: dims broadcast — the fact side never shuffles for the join") {
    val p = planOf(Relational.revenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"star join fell back to SMJ:\n$p")
  }

  test("copy pipeline: projection + predicate reach the parquet scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_audit_").toString
    val sink = new graft.core.ParquetDir(out)
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
    val df = Events.sessionStats(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // the lag window, cumulative sum, per-session agg and per-user agg
    // all partition by user_id: a single hashpartitioning exchange on
    // the events scan side (plus the final tiny sort for orderBy)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
  }

  test("knn_brute: corpus side streams — no exchange below the broadcast join") {
    val df = graft.ops.Vector.knnBrute(spark, sf, nQueries = 2, k = 2)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
  }

  test("chunk_docs: map-only — no exchange except the final presentation sort") {
    val df = Text.chunkDocs(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle payloads:\n$p")
  }
}
