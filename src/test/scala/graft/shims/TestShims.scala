// Package-injected TEST shim: private[sql] access to build a DataFrame
// from a resolved logical subplan — the window-scale guard executes each
// declared plan's Window CHILD to measure its row growth across scale
// factors (WindowScaleGuardSpec), which the public API cannot express.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object TestShims {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
