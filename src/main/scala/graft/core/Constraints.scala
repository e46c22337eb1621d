package graft.core

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK CONSTRAINTS — Delta's `delta.constraints.<name>` shape
  * (reference scope: pgcp replays table DDL faithfully,
  * postgres.rb:263-278; the production analogue of "the copy must
  * still satisfy the table's invariants").
  *
  * A constraint is a table property `graft.constraints.<name>` whose
  * value is a SQL boolean expression over LOGICAL column names.
  * Enforcement is WRITE-TIME, exactly once per row, riding the
  * commit's single stats pass (`groupBy(input_file_name)` gains one
  * `sum(violations)` per constraint — no extra job, no input
  * recompute): a staged write with any row where the expression IS
  * FALSE aborts loudly BEFORE the record publish, so a violating
  * commit never becomes visible (the staged files are crash litter the
  * orphan sweep retires). NULL results PASS — SQL CHECK semantics —
  * and a constrained column absent from an evolving write evaluates
  * as null (the reader surfaces null for it, so the stored data
  * genuinely satisfies the constraint).
  *
  * `addConstraint` validates EXISTING data first (one aggregate scan),
  * then publishes the property — Delta's ADD CONSTRAINT contract: a
  * constraint you successfully added holds for every live row.
  * Row-level DML inserts (SQL MERGE/UPDATE staged by executor tasks)
  * validate in `commitDelta` against the staged insert files — same
  * guarantee, same pre-publish abort. Deletes only remove rows and
  * need no check. */
object Constraints {
  val Prefix = "graft.constraints."

  /** (name, sql-expr) pairs of the property map, name-sorted. */
  def of(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect {
      case (k, v) if k.startsWith(Prefix) && k.length > Prefix.length =>
        (k.substring(Prefix.length), v)
    }.sortBy(_._1)

  /** Violation-count aggregate for one constraint: rows where the
    * expression is provably FALSE (null passes). `resolve` maps a
    * logical column reference to the frame's physical name, or None
    * when this write lacks the column (evaluates as null). */
  def violationsCol(spark: SparkSession, expr: String,
                    resolve: String => Option[String]): Column =
    coalesce(
      sum(when(not(coalesce(
        org.apache.spark.sql.graft.Bridge.parsedExpr(spark, expr, resolve),
        lit(true))), 1L).otherwise(0L)),
      lit(0L))

  /** Pre-publish abort: total violations per constraint must be zero
    * or the staged write dies with the constraint named. */
  def enforce(table: String, totals: Seq[(String, String, Long)]): Unit = {
    val bad = totals.filter(_._3 > 0L)
    if (bad.nonEmpty) {
      val (name, expr, n) = bad.head
      sys.error(
        s"CHECK constraint '$name' violated by $n staged row(s) of $table: " +
          s"($expr) is false — the commit was aborted before publish " +
          "(staged files are unreferenced; the orphan sweep retires them)")
    }
  }
}
