package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-scoped bridge into Spark's `private[sql]` Dataset factory —
  * the standard way a library materializes a custom LogicalPlan
  * (graft.plans.AsofJoinPlan) as a DataFrame. This file is the ONLY
  * one in the repo compiled inside the org.apache.spark.sql package,
  * and it contains no logic beyond the two delegations. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Runtime planner-strategy registration for sessions built without
    * `.withExtensions(new GraftExtensions)` (Verify/Bench build plain
    * sessions): `experimental.extraStrategies` is the public hook. */
  def ensureStrategy(spark: SparkSession,
                     strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
