package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for queries whose oracle can't hash-match (sketches) and
  * smoke coverage of the advanced manifest at sf0.001.
  */
class AdvancedQueriesSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("q57 approx_count_distinct within 5% of exact (est_ok flags)") {
    // the tolerance check is IN the query now (hash-compared by the
    // oracle); assert the flags hold and the exact side is sane
    val rows = queries.AdvancedQueries.q57ApproxDistinct(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"), r.toString)
      assert(r.getAs[Long]("exact_parts") > 0)
    }
  }

  test("q65 approx percentiles within 1% of exact (ok flags + parity)") {
    val rows = queries.AdvancedQueries.q65ApproxPercentiles(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), r.toString)
      assert(r.getAs[Boolean]("p95_ok"), r.toString)
      assert(r.getAs[Double]("p50") > 0 &&
        r.getAs[Double]("p95") >= r.getAs[Double]("p50"))
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
