package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucketing as a single codegen'd pass.
  *
  * The HOF formulation (VectorOps.srpBucketHof: one
  * `aggregate(zip_with(...))` per plane) is CodegenFallback — `bits`
  * interpreted lambda-walks over the vector per row. Here all `bits`
  * dot products run in one fused primitive loop per row, called
  * statically from generated code (same pattern as HashSigUtil /
  * CosineSimilarity).
  *
  * Plane values are the same deterministic md5-derived pseudo-uniforms
  * in [-1, 1) — plane_j[i] = u32(md5("plane{j}:{i}")) / 2^31 - 1 — so
  * results are bit-identical to the HOF form AND the DuckDB oracle
  * (q78). Planes are derived once per (dim, bits) and cached; any
  * executor regenerates them, no RNG state ships.
  */
object SrpUtil {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  def planes(dim: Int, bits: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, bits), { case (d, b) =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(b) { p =>
        Array.tabulate(d) { i =>
          val digest = md.digest(s"plane$p:$i".getBytes("UTF-8"))
          val h = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
            ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
          h.toDouble / (1L << 31).toDouble - 1.0
        }
      }
    })

  /** HOF-parity semantics: a vector whose length differs from `dim` or
    * that carries a null element yields bucket 0 (the zip_with null
    * padding / null product propagates to a null dot, and
    * `when(d > 0, ...)` resolves null to the 0 branch for every bit).
    */
  def bucket(vec: ArrayData, dim: Int, bits: Int, isFloat: Boolean): Long = {
    if (vec.numElements() != dim) return 0L
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return 0L; i += 1 }
    val vs = new Array[Double](dim)
    i = 0
    while (i < dim) {
      vs(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val ps = planes(dim, bits)
    var out = 0L
    var j = 0
    while (j < bits) {
      val p = ps(j)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += vs(i) * p(i); i += 1 } // left-fold order
      if (acc > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** srp_bucket(vec, dim, bits) → long LSH bucket id. */
@ExpressionDescription(
  usage = "_FUNC_(vec, dim, bits) - sign-random-projection LSH bucket of a vector.")
case class SrpBucketExpr(child: Expression, dim: Int, bits: Int)
  extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if dim > 0 && bits > 0 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "srp_bucket needs dim > 0 and bits in [1, 63]")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SrpUtil.bucket(input.asInstanceOf[ArrayData], dim, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpUtil.bucket($c, $dim, $bits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "srp_bucket"
}
