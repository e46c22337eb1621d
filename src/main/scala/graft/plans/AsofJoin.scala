package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator Catalyst extension
  * (SURVEY §4.2 tier (c)): for each left row, attach the LAST right
  * row of the same key whose timestamp is <= the left timestamp, or
  * nulls (left-outer semantics).
  *
  * Spark has no as-of join; the composable workaround (union both
  * sides + IGNORE NULLS window, `ops/Events.scala:110`) works but
  * forces the two sides through one union-wide shuffle and a window
  * pass whose state is the union. This operator keeps the sides
  * separate: EnsureRequirements clusters each side by its own key
  * (co-partitioned like a sort-merge join) and sorts by (key, ts);
  * the exec is then a single forward-only zipPartitions merge — no
  * buffering beyond ONE retained right row, no range-join explosion,
  * streaming-friendly memory profile at any scale.
  *
  * Tie semantics: equal right timestamps within a key are taken in
  * sort order, so callers wanting a deterministic payload pre-dedup
  * the right side per (key, ts) — the declared query does. */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftBy: Expression, rightBy: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate, children planned lazily. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lb, rb, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requiredChildDistribution co-partitions the
  * sides on their keys (same contract sort-merge join uses, so AQE
  * and coalesced shuffle reads apply unchanged); requiredChildOrdering
  * sorts each partition by (key, ts). doExecute is a forward-only
  * merge: the right cursor never rewinds and at most one right row is
  * retained per key — O(1) state, no spill surface. Not codegen'd:
  * like Spark's own full-outer SMJ, the two-cursor merge isn't a
  * produce/consume loop; the per-row work is one comparison chain. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftBy: Expression, rightBy: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftBy, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightBy, Ascending), SortOrder(rightTs, Ascending)))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lByB = BindReferences.bindReference(leftBy, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rByB = BindReferences.bindReference(rightBy, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftBy.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var matchKey: Any = null
      var lastMatch: InternalRow = null
      lIter.map { lRow =>
        val lKey = lByB.eval(lRow)
        val lTs = lTsB.eval(lRow)
        if (lKey == null || lTs == null) proj(joined(lRow, nullRight))
        else {
          // advance the right cursor past everything at-or-before
          // (lKey, lTs); remember the newest same-key row seen
          var scan = rCur != null
          while (scan) {
            val rKey = rByB.eval(rCur)
            val rTs = rTsB.eval(rCur)
            if (rKey == null || rTs == null) {
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0 || (kc == 0 && tsOrd.compare(rTs, lTs) <= 0)) {
                if (kc == 0) { lastMatch = rCur.copy(); matchKey = rKey }
                rCur = if (rIter.hasNext) rIter.next() else null
              } else scan = false
            }
            if (rCur == null) scan = false
          }
          val m =
            if (lastMatch != null && keyOrd.compare(matchKey, lKey) == 0) lastMatch
            else nullRight
          proj(joined(lRow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry: resolves the key/ts columns by name on the
  * ANALYZED child plans and materializes the custom node through the
  * sql-package bridge. Registers the strategy on the session at first
  * use (extensions-built sessions already carry it). */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
            by: (String, String), ts: (String, String)): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.graft.Bridge.ensureStrategy(spark, AsofJoinStrategy)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asof: no column '$name' on $side side"))
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsofJoinPlan(lp, rp,
        attr(lp, by._1, "left"), attr(rp, by._2, "right"),
        attr(lp, ts._1, "left"), attr(rp, ts._2, "right")))
  }
}
