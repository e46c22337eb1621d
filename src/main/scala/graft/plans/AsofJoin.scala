package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join direction. `Backward` attaches the LAST right row at or
  * before the left timestamp (the classic as-of), `Forward` the FIRST
  * right row at or after it, `Nearest` whichever of the two is closer
  * in time (ties resolve backward — the earlier row). */
object AsofDirection {
  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  val all: Set[String] = Set(Backward, Forward, Nearest)
}

/** Native as-of join — the whole-operator Catalyst extension
  * (SURVEY §4.2 tier (c)): for each left row, attach one right row of
  * the same key chosen by `direction` relative to the left timestamp,
  * or nulls (left-outer semantics). The key is COMPOSITE: `leftBy` /
  * `rightBy` are position-aligned key columns (real time-series joins
  * key on (entity, venue)-style pairs, not one column). `tolerance`
  * (same units as the ts columns' internal representation — µs for
  * timestamps) bounds the match distance: a candidate farther than the
  * bound yields nulls.
  *
  * Spark has no as-of join; the composable workaround (union both
  * sides + IGNORE NULLS window, `ops/Events.scala:110`) works but
  * forces the two sides through one union-wide shuffle and a window
  * pass whose state is the union. This operator keeps the sides
  * separate: EnsureRequirements clusters each side by its own key
  * (co-partitioned like a sort-merge join) and sorts by (key..., ts);
  * the exec is then a single forward-only zipPartitions merge — no
  * buffering beyond ONE retained right row, no range-join explosion,
  * streaming-friendly memory profile at any scale. All three
  * directions keep that bound: `Nearest` retains the one
  * backward candidate while peeking the (not-yet-consumed) forward
  * cursor row.
  *
  * Tie semantics: equal right timestamps within a key are taken in
  * sort order, so callers wanting a deterministic payload pre-dedup
  * the right side per (key, ts) — the declared queries do. */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftBy: Seq[Expression], rightBy: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    direction: String = AsofDirection.Backward,
    tolerance: Option[Long] = None) extends BinaryNode {
  require(AsofDirection.all(direction), s"asof: unknown direction '$direction'")
  require(tolerance.forall(_ >= 0), "asof: tolerance must be >= 0")
  require(leftBy.nonEmpty && leftBy.size == rightBy.size,
    s"asof: leftBy/rightBy must be non-empty and position-aligned (${leftBy.size} vs ${rightBy.size})")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate, children planned lazily. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lb, rb, lt, rt, dir, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requiredChildDistribution co-partitions the
  * sides on their (composite) keys (same contract sort-merge join
  * uses, so AQE and coalesced shuffle reads apply unchanged);
  * requiredChildOrdering sorts each partition by (key..., ts).
  * doExecute is a forward-only merge: the right cursor never rewinds
  * and at most one right row is retained per key — O(1) state, no
  * spill surface. Not codegen'd: like Spark's own full-outer SMJ, the
  * two-cursor merge isn't a produce/consume loop; the per-row work is
  * one comparison chain. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftBy: Seq[Expression], rightBy: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    direction: String, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftBy.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
        rightBy.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lByB = leftBy.map(BindReferences.bindReference(_, left.output)).toArray
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rByB = rightBy.map(BindReferences.bindReference(_, right.output)).toArray
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    // per-column key orderings; left/right types are equal by the
    // AsofJoin.apply construction guard, so left's orderings serve both
    val keyOrds = leftBy.map(e => TypeUtils.getInterpretedOrdering(e.dataType)).toArray
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nKeys = keyOrds.length
    val rightWidth = right.output.size
    val outAttrs = output
    val dir = direction
    val tol = tolerance
    // distance math needs the numeric internal value (Long/Int-backed
    // types only — validated at construction in AsofJoin.apply)
    def tsLong(v: Any): Long = v.asInstanceOf[Number].longValue
    // forward consumes strictly-before rows; backward/nearest also
    // consume the at-timestamp row into the backward candidate
    val consumeEq = dir != AsofDirection.Forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // a composite key evaluates to an Array[Any]; any null component
      // makes the whole key null (as-of keys are equi-join keys — SQL
      // null never matches)
      def evalKeys(binds: Array[Expression], row: InternalRow): Array[Any] = {
        val ks = new Array[Any](nKeys)
        var i = 0
        while (i < nKeys) {
          val v = binds(i).eval(row)
          if (v == null) return null
          ks(i) = v; i += 1
        }
        ks
      }
      def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < nKeys) {
          val c = keyOrds(i).compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var backKey: Array[Any] = null
      var backTs: Any = null
      var backRow: InternalRow = null
      lIter.map { lRow =>
        val lKey = evalKeys(lByB, lRow)
        val lTs = lTsB.eval(lRow)
        if (lKey == null || lTs == null) proj(joined(lRow, nullRight))
        else {
          // advance the right cursor up to the left position; remember
          // the newest same-key at-or-before row as the backward candidate
          var scan = rCur != null
          while (scan) {
            val rKey = evalKeys(rByB, rCur)
            val rTs = rTsB.eval(rCur)
            if (rKey == null || rTs == null) {
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              val kc = cmpKeys(rKey, lKey)
              val tc = if (kc == 0) tsOrd.compare(rTs, lTs) else 0
              if (kc < 0 || (kc == 0 && (tc < 0 || (tc == 0 && consumeEq)))) {
                if (kc == 0) { backRow = rCur.copy(); backKey = rKey; backTs = rTs }
                rCur = if (rIter.hasNext) rIter.next() else null
              } else scan = false
            }
            if (rCur == null) scan = false
          }
          // candidate validity (key match + tolerance bound)
          val backOk = backRow != null && cmpKeys(backKey, lKey) == 0 &&
            tol.forall(t => tsLong(lTs) - tsLong(backTs) <= t)
          // the forward candidate is the UNCONSUMED cursor row (first
          // same-key row after — or at, for direction=forward — lTs)
          lazy val fKey = if (rCur == null) null else evalKeys(rByB, rCur)
          lazy val fTs = if (rCur == null) null else rTsB.eval(rCur)
          val fwdOk = dir != AsofDirection.Backward && rCur != null &&
            fKey != null && fTs != null && cmpKeys(fKey, lKey) == 0 &&
            tol.forall(t => tsLong(fTs) - tsLong(lTs) <= t)
          val m = dir match {
            case AsofDirection.Backward => if (backOk) backRow else nullRight
            case AsofDirection.Forward => if (fwdOk) rCur else nullRight
            case _ => // nearest: closer wins; tie -> backward (earlier)
              if (backOk && fwdOk) {
                if (tsLong(lTs) - tsLong(backTs) <= tsLong(fTs) - tsLong(lTs)) backRow
                else rCur
              } else if (backOk) backRow
              else if (fwdOk) rCur
              else nullRight
          }
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
  * use (extensions-built sessions already carry it).
  *
  * Construction-time type guards (fail fast, not at runtime inside a
  * task): every position-aligned by-pair and the ts pair must have
  * EQUAL data types (the merge compares them with one ordering), and
  * nearest/tolerance require an integral/timestamp ts on BOTH sides. */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
            by: (String, String), ts: (String, String),
            direction: String = AsofDirection.Backward,
            tolerance: Option[Long] = None): DataFrame =
    multi(left, right, Seq(by), ts, direction, tolerance)

  /** Composite-key form: `by` pairs are (leftCol, rightCol), compared
    * lexicographically in the given order. */
  def multi(left: DataFrame, right: DataFrame,
            by: Seq[(String, String)], ts: (String, String),
            direction: String = AsofDirection.Backward,
            tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.graft.Bridge.ensureStrategy(spark, AsofJoinStrategy)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asof: no column '$name' on $side side"))
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val lBy = by.map(p => attr(lp, p._1, "left"))
    val rBy = by.map(p => attr(rp, p._2, "right"))
    lBy.zip(rBy).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof: by-key type mismatch '${l.name}' ${l.dataType} vs '${r.name}' ${r.dataType}")
    }
    val lt = attr(lp, ts._1, "left")
    val rt = attr(rp, ts._2, "right")
    require(lt.dataType == rt.dataType,
      s"asof: ts type mismatch '${lt.name}' ${lt.dataType} vs '${rt.name}' ${rt.dataType}")
    if (direction == AsofDirection.Nearest || tolerance.nonEmpty) {
      // distance arithmetic requires a Long/Int-backed internal type
      import org.apache.spark.sql.types._
      val ok = Set[DataType](LongType, IntegerType, ShortType, ByteType,
        TimestampType, TimestampNTZType, DateType)
      require(ok(lt.dataType),
        s"asof: direction=$direction/tolerance needs an integral or timestamp ts column, got ${lt.dataType}")
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsofJoinPlan(lp, rp, lBy, rBy, lt, rt, direction, tolerance))
  }
}
