package graft.plans

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType}

/** Catalyst optimizer rule (injected via `GraftSparkExtensions`):
  * rewrite `size(array_intersect(sort_array(array_distinct(a)),
  * sort_array(array_distinct(b))))` over int arrays into the native
  * zero-allocation [[SortedIntersectCount]] two-pointer merge.
  *
  * The pattern PROVES the expression contract (ascending-sorted,
  * distinct, int elements) from the plan itself — `sort_array(asc)`
  * of `array_distinct` of an `array<int>` with non-null elements is
  * exactly what the merge requires — so the rewrite is semantics-
  * preserving by construction, not by caller discipline. This is the
  * R4.0/R4.4 candidate-verify optimization lifted from a hand-applied
  * convention into the optimizer: a user can write the naive Spark
  * form and still get the native loop (q185 asserts the rewrite fires
  * AND hash-matches the naive oracle).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def sortedDistinctInts(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(_), Literal(true, BooleanType)) =>
      e.dataType match {
        case ArrayType(IntegerType, containsNull) => !containsNull
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), _)
          if sortedDistinctInts(a) && sortedDistinctInts(b) =>
        SortedIntersectCount(a, b)
    }
}
