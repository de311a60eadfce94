package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PoissonDrawSpec extends SparkSpec {
  import spark.implicits._

  /** The unrolled Column fold poisson_draw replaced (kept here as the
    * reference implementation — BalanceOps used exactly this).
    */
  private def unrolled(u: org.apache.spark.sql.Column,
                       lam: org.apache.spark.sql.Column,
                       cap: Int): org.apache.spark.sql.Column = {
    val cdf0 = exp(-lam)
    (1 to cap).foldLeft((lit(0), cdf0, cdf0)) {
      case ((n, term, cum), k) =>
        val nextN = when(u > cum, lit(k)).otherwise(n)
        val nextTerm = term * lam / k
        (nextN, nextTerm, cum + nextTerm)
    }._1
  }

  test("native draw is bit-identical to the unrolled Column fold") {
    val df = spark.range(2000)
      .select((col("id") / 2000.0).as("u"),
        (col("id") % 7 / 2.0 + 0.05).as("lam"))
    val both = df.select(
      call_function("poisson_draw", col("u"), col("lam"), lit(12)).as("nat"),
      unrolled(col("u"), col("lam"), 12).as("ref"))
    assert(both.filter(col("nat") =!= col("ref")).count() == 0)
  }

  test("draw distribution: mean ≈ λ over many uniforms") {
    val lam = 0.5
    val n = 20000
    val mean = spark.range(n)
      .select(((col("id") + 0.5) / n).as("u")) // uniform grid
      .select(call_function("poisson_draw", col("u"), lit(lam), lit(20))
        .as("d"))
      .agg(avg(col("d"))).head().getDouble(0)
    assert(math.abs(mean - lam) < 0.02, s"mean=$mean")
  }

  test("cap must be literal; u=0 draws 0") {
    val one = Seq((0.0, 1.0)).toDF("u", "lam")
    assert(one.select(call_function("poisson_draw", col("u"), col("lam"),
      lit(10))).head().getInt(0) == 0)
    intercept[Exception] {
      one.select(call_function("poisson_draw", col("u"), col("lam"),
        col("u").cast("int"))).collect()
    }
  }
}
