package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the engine needs: materialize a
  * DataFrame from a custom [[LogicalPlan]] (graft's AsofJoinNode).
  * Spark exposes custom-plan INJECTION (`SparkSessionExtensions`
  * planner strategies) but no public constructor from a logical plan —
  * every extension library bridges through `Dataset.ofRows` this way.
  * Kept to this single call, in its own package, so the engine's
  * public-API surface stays auditable.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column from a raw Catalyst expression — the session-free
    * counterpart of `call_function` for expressions that must work
    * before any extension registration (Tables.fence's
    * [[graft.functions.PushdownBarrier]]). Same auditable-single-call
    * rationale as [[ofRows]].
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
