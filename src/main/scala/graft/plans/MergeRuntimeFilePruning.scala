package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** RUNTIME SOURCE-KEY FILE PRUNING for delta-based SQL row-level
  * commands (`MERGE INTO`, and any rewritten DML whose plan joins the
  * target with a source) — the merge-on-read twin of Spark's built-in
  * `RowLevelOperationRuntimeGroupFiltering`, which covers ONLY
  * group-based (copy-on-write, `ReplaceData`) operations and never
  * fires for `WriteDelta` plans. Iceberg injects the same shape for
  * its merge-on-read DML.
  *
  * Without this, a 1k-key CDC merge against a 100 TB table SCANS THE
  * TABLE: the row-level scan pins the head and reads every candidate
  * file, because nothing derives a file filter from the merge source.
  * With it, the target side of the rewritten join gains a
  * `DynamicPruningSubquery` over the source's join keys; at execution
  * time the collected distinct keys reach the graft-log scan's
  * `SupportsRuntimeFiltering.filter(...)` as an IN, the manifest
  * re-prunes the file list against per-file key bounds, and the scan
  * opens only the files the source keys can touch (the scan-side
  * version of the commit-side `pruneByTouchedKeys` bound; oversized
  * INs past 100k keys are ignored by the scan — the join still
  * applies them exactly).
  *
  * Soundness: the pruning key filter only ever REMOVES target rows
  * with no matching source row, so it is injected exactly when such
  * rows cannot produce delta actions — the target side is on the
  * DROPPED side of the rewritten join (Inner both ways, RightOuter
  * with the target left, LeftOuter with the target right, LeftSemi).
  * A FULL OUTER rewrite (`WHEN NOT MATCHED BY SOURCE` clauses) keeps
  * every target row live and is left untouched. File pruning itself
  * is conservative by construction — bounds may only KEEP extra
  * files, never drop a matching one.
  */
object MergeRuntimeFilePruning extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.dynamicPartitionPruningEnabled) return plan
    plan transformDown {
      case wd: WriteDelta => wd.copy(query = pruneQuery(wd.query))
    }
  }

  /** The row-level target relation (graft-log, reading the row-identity
    * metadata columns — only the DML rewrite plans that shape), plus
    * the columns the scan can file-skip on. Matched in BOTH shapes:
    * post-pushdown `DataSourceV2ScanRelation` (the scan reports its
    * own filter attributes) and pre-pushdown `DataSourceV2Relation`
    * (the preCBO batch runs before early scan pushdown, so the rule
    * derives prunable columns from the manifest directly). */
  private def findTarget(side: LogicalPlan): Option[(LogicalPlan, AttributeSet, Set[String])] = {
    def isRowLevelLogTarget(output: Seq[Attribute], name: String): Boolean =
      name.startsWith("graft-log:") &&
        output.exists(_.name == graft.sources.LogStreamSource.RelPathCol)
    side.collectFirst {
      case r: DataSourceV2ScanRelation
          if r.scan.isInstanceOf[SupportsRuntimeFiltering] &&
            isRowLevelLogTarget(r.output, r.relation.table.name()) =>
        val prunable = r.scan.asInstanceOf[SupportsRuntimeFiltering]
          .filterAttributes().flatMap(a =>
            if (a.fieldNames.length == 1) Some(a.fieldNames.head) else None).toSet
        (r, r.outputSet, prunable)
      case r: DataSourceV2Relation if isRowLevelLogTarget(r.output, r.table.name()) =>
        val tablePath = r.table.name().stripPrefix("graft-log:").takeWhile(_ != '@')
        val prunable = graft.sources.LogBatchScan
          .prunableColumns(tablePath, r.schema).toSet
        (r, r.outputSet, prunable)
    }
  }

  private def pruneQuery(query: LogicalPlan): LogicalPlan = query transformUp {
    case j @ Join(left, right, joinType, Some(cond), _)
        if !cond.exists(_.isInstanceOf[DynamicPruningSubquery]) =>
      val byTarget = (findTarget(left), findTarget(right)) match {
        case (Some(t), None)
            if joinType == Inner || joinType == RightOuter || joinType == LeftSemi =>
          Some((t, left, right))
        case (None, Some(t)) if joinType == Inner || joinType == LeftOuter =>
          Some((t, right, left))
        case _ => None
      }
      byTarget match {
        case None => j
        case Some(((target, targetOut, prunable), targetSide, sourceSide)) =>
          // equi-keys of the join whose target side is a bare prunable
          // column OF THE RELATION (the filter sits directly above it)
          val pairs = splitConjunctivePredicates(cond).flatMap {
            case EqualTo(l: AttributeReference, r)
                if targetOut.contains(l) && prunable.contains(l.name) &&
                  r.references.nonEmpty && r.references.subsetOf(sourceSide.outputSet) =>
              Some((l, r))
            case EqualTo(l, r: AttributeReference)
                if targetOut.contains(r) && prunable.contains(r.name) &&
                  l.references.nonEmpty && l.references.subsetOf(sourceSide.outputSet) =>
              Some((r, l))
            case _ => None
          }
          if (pairs.isEmpty) j
          else {
            val buildKeys = pairs.map(_._2)
            val pruningCond = pairs.zipWithIndex.map { case ((tKey, _), i) =>
              DynamicPruningSubquery(tKey, sourceSide, buildKeys, Seq(i),
                onlyInBroadcast = false): Expression
            }.reduce(And)
            val newTargetSide = targetSide transformUp {
              case r if r eq target => Filter(pruningCond, r)
            }
            if (targetSide eq left) j.copy(left = newTargetSide)
            else j.copy(right = newTargetSide)
          }
      }
  }
}
