package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for queries whose oracle can't hash-match (sketches) and
  * smoke coverage of the advanced manifest at sf0.001.
  */
class AdvancedQueriesSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("q57 approx_count_distinct within 5% of exact") {
    val rows = queries.AdvancedQueries.q57ApproxDistinct(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("q65 approx percentiles within 1% of exact") {
    val approx = queries.AdvancedQueries.q65ApproxPercentiles(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("ap50"), r.getAs[Double]("ap95"))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(
        org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.5)").as("p50"),
        org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, (a50, a95)) =>
      assert(math.abs(a50 - exact(k)._1) / exact(k)._1 < 0.01, s"$k p50")
      assert(math.abs(a95 - exact(k)._2) / exact(k)._2 < 0.01, s"$k p95")
    }
  }

  test("advanced queries are non-empty at sf0.001") {
    queries.AdvancedQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).limit(1).count() == 1, name)
    }
  }

  test("strengthened q11/q16 are non-empty at sf0.001") {
    assert(queries.RelationalQueries.q11AntiJoin(spark, sf).count() > 0)
    assert(queries.RelationalQueries.q16Except(spark, sf).count() > 0)
  }
}
