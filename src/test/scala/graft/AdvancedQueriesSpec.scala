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
