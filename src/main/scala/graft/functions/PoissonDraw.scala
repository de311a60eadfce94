package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: inverse-CDF Poisson draw from a uniform —
  * `N = #{k in 1..cap : u > CDF(k-1)}` — the per-row copy count behind
  * Poisson resampling-with-replacement (`BalanceOps.resampleToTarget`).
  *
  * The pure-Column spelling unrolls the CDF walk as a fold of
  * when/otherwise steps, and because each step's term/cum embeds the
  * previous step's whole subtree (and the per-class λ when-chain embeds
  * again at every multiplication), the expression tree grows
  * quadratically in `cap` — analysis + codegen of that tree dominated
  * the resample's runtime at ANY data size (it recompiles per job).
  * This loop is the same arithmetic in the same order — exp(−λ), then
  * term = term·λ/k, cum += term, compare u > cum-before-update — so the
  * draws are bit-identical to the unrolled form for the same uniform.
  *
  * cap must be a literal; draws above cap truncate to cap (the caller
  * sizes cap so that probability is < 1e-18, see BalanceOps).
  */
@ExpressionDescription(
  usage = "_FUNC_(u, lambda, cap) - Poisson(lambda) draw from uniform u.")
case class PoissonDraw(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, IntegerType) =>
        if (third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("poisson_draw cap must be a literal")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"poisson_draw requires (double, double, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = IntegerType

  private lazy val cap: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(u: Any, lam: Any, capAny: Any): Any =
    PoissonDrawUtil.draw(u.asInstanceOf[Double], lam.asInstanceOf[Double],
      capAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, lam, c) =>
      s"graft.functions.PoissonDrawUtil.draw($u, $lam, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PoissonDraw =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "poisson_draw"
}

object PoissonDrawUtil {
  /** Same op sequence as the unrolled fold: state starts at
    * (n=0, term=e^−λ, cum=e^−λ); step k compares u against the
    * PRE-update cum (= CDF(k−1)), then advances term and cum.
    */
  def draw(u: Double, lam: Double, cap: Int): Int = {
    var cum = math.exp(-lam)
    var term = cum
    var n = 0
    var k = 1
    while (k <= cap) {
      if (u > cum) n = k
      term = term * lam / k
      cum += term
      k += 1
    }
    n
  }
}
