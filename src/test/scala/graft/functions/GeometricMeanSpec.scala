package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeometricMeanSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  import spark.implicits._

  test("matches exp(mean(log)) and ignores non-positive values") {
    val df = Seq(("a", 2.0), ("a", 8.0), ("a", -1.0), ("b", 5.0))
      .toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(GeometricMean.geometricMean($"v").as("g"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 4.0) < 1e-12) // sqrt(2*8), -1 ignored
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }

  test("empty / all-non-positive group yields NaN") {
    val got = Seq(("a", 0.0)).toDF("k", "v").groupBy($"k")
      .agg(GeometricMean.geometricMean($"v").as("g"))
      .as[(String, Double)].collect().head._2
    assert(got.isNaN)
  }

  test("partial aggregation: two-phase plan with the UDAF") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val plan = df.groupBy($"k")
      .agg(GeometricMean.geometricMean($"v").as("g"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate/SortAggregate appears twice: partial + final
    val aggs = "(ObjectHashAggregate|SortAggregate|HashAggregate)".r
      .findAllIn(plan).size
    assert(aggs >= 2, plan)
  }
}
