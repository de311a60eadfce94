package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftDatasetBridge

/** User-facing wrapper for the native as-of join ([[AsofJoinNode]] /
  * [[AsofJoinExec]]): attaches the latest right row with
  * right.ts <= left.ts per key, left-outer. `key` and `ts` must be
  * LongType columns present on BOTH inputs (ids + epoch-µs); attach
  * columns surface as `asof_<name>`. The right side is re-aliased
  * (fresh exprIds), so self-as-of over one source is safe.
  *
  * Requires `AsofJoinStrategy` in the session planner —
  * `GraftSparkExtensions` injects it (config path) and `register` adds
  * it to `spark.experimental.extraStrategies` (runtime path).
  */
object NativeAsof {
  /** `toleranceUs` bounds staleness (pandas `merge_asof(tolerance=)`
    * semantics): a candidate only matches while
    * left.ts − right.ts <= toleranceUs; older candidates null-fill.
    * Default unbounded (plain backward as-of).
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      attachCols: Seq[String],
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val rSel = right.select(
      (Seq(col(key).as("__rkey"), col(ts).as("__rts")) ++
        attachCols.map(c => col(c).as(s"asof_$c"))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rSel.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      sys.error(s"as-of input is missing column $n"))
    GraftDatasetBridge.ofRows(left.sparkSession,
      AsofJoinNode(lPlan, rPlan,
        a(lPlan, key), a(rPlan, "__rkey"),
        a(lPlan, ts), a(rPlan, "__rts"),
        rPlan.output.filter(_.name.startsWith("asof_")),
        toleranceUs))
  }
}
