package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| for two SORTED int arrays with
  * distinct elements — a two-pointer merge that allocates nothing.
  *
  * This is the hot loop of every candidate-pair verification (Jaccard /
  * containment over token-id sets): `size(array_intersect(a, b))` builds
  * a hash set AND the materialized intersection array per pair, i.e. two
  * allocations × millions of pairs, only to take the size and throw both
  * away. On a degenerate corpus where LSH candidates grow quadratic
  * (q95), the difference is the whole query.
  *
  * Contract: both arrays ascending-sorted, distinct, non-null elements
  * (what `sort_array(array_position-encoded token set)` produces). The
  * count then equals `size(array_intersect(a, b))` exactly.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - intersection size of two sorted distinct int arrays.")
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<int>, got " +
          s"${a.catalogString} and ${b.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectUtil.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectUtil.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectUtil {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
