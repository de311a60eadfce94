package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Integer dot product of two int8-quantized vectors (as produced by
  * [[QuantizeInt8]]) — the ANN RERANK primitive: after candidate
  * generation, similarity is re-scored on the 4×-smaller quantized
  * representation with pure integer multiply-adds (SIMD-friendly, no
  * FP rounding), and because the accumulation is EXACT (|x|≤127,
  * d≤2²⁰ fits a long with room to spare) the ranking is bit-identical
  * on every engine and under any partition order — unlike an fp32
  * cosine whose sum order can flip near-ties.
  *
  * Single fused loop in WholeStageCodegen via a static helper (the
  * `aggregate(zip_with(...))` HOF spelling is CodegenFallback and
  * allocates a zipped array per row — PERF_NOTES §5). Null elements
  * on either side contribute 0; lengths may differ (shorter wins),
  * matching the tolerant semantics of the HOF form.
  */
object DotInt8Util {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    s
  }
}

/** dot_int8(a, b) → long exact integer dot product. */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - exact integer dot product of two int arrays.")
case class DotInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_int8 requires two array<int>, got ${l.catalogString}, " +
          r.catalogString)
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotInt8Util.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotInt8Util.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotInt8 = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_int8"
}
