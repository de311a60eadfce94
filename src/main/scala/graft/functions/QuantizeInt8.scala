package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization of an embedding vector — the
  * standard 4× storage/bandwidth shrink applied to embedding corpora
  * before ANN serving (each float32 becomes one signed byte scaled by
  * the vector's max |x|).
  *
  * Fused single loop per row (max-abs pass + quantize pass) inside
  * WholeStageCodegen via a static helper, like HashSigUtil: the HOF
  * spelling (`transform(v, x -> floor(x/scale*127 + 0.5))` over an
  * `array_max(transform(v, abs))` scale) is CodegenFallback twice over
  * and re-evaluates the scale subtree per element (no CSE across HOFs,
  * PERF_NOTES §5).
  *
  * Quantized value = floor(x / maxAbs * 127 + 0.5) — floor(+0.5), not
  * round(): identical halfway behavior in every engine, so the DuckDB
  * oracle reproduces it exactly. All-zero (or empty) vectors quantize
  * to zeros. Null elements pass through as nulls and don't vote on the
  * scale. Output is array<int> (int8 range by construction; INT keeps
  * parquet/oracle comparisons simple).
  */
object QuantUtil {

  def quantize(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val a = math.abs(x)
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) out(i) = null
      else if (maxAbs == 0.0) out(i) = 0
      else {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        out(i) = math.floor(x / maxAbs * 127.0 + 0.5).toInt
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** quantize_int8(vec) → array<int> of values in [-127, 127]. */
@ExpressionDescription(
  usage = "_FUNC_(vec) - symmetric int8 quantization of a numeric array.")
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires array<float>/array<double>, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    QuantUtil.quantize(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantUtil.quantize($c, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)

  override def prettyName: String = "quantize_int8"
}
