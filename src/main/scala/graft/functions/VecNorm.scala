package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: L2 norm of a float/double array column,
  * inside whole-stage codegen.
  *
  * The HOF spelling — `sqrt(aggregate(zip_with(v, v, _*_), 0.0, _+_))`
  * (`graft.ops.VectorOps.norm`) — is CodegenFallback twice over: it
  * allocates the squared intermediate array and dispatches a lambda per
  * element, interpreted. Norms sit under every percentile/outlier pass
  * over embeddings (q102/q119), where the multi-pass selection re-reads
  * the column — a fused primitive loop is the difference between the
  * scan stage being codegen-resident or not.
  *
  * Accumulation is the same left-to-right `acc += x*x` order as both the
  * HOF form and DuckDB's `list_dot_product`, so all three produce
  * identical doubles (oracle parity). Null array → null; element nulls
  * are not expected (embedding corpora are dense — same contract as
  * `cosine_sim`).
  */
@ExpressionDescription(
  usage = "_FUNC_(v) - L2 norm of a numeric array.")
case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_norm requires array<float>/array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = elemIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $v.$get($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)

  override def prettyName: String = "vec_norm"
}
