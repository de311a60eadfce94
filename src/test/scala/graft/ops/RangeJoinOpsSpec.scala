package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinOpsSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  import spark.implicits._

  private val intervals = Seq(
    ("a", 0.0, 10.0), ("b", 5.0, 25.0), ("c", 100.0, 101.0))
    .toDF("name", "lo", "hi")

  test("binned range join matches naive inequality join") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("id", "v")
    for (w <- Seq(1.0, 7.0, 50.0)) {
      val got = RangeJoinOps.binnedRangeJoin(points, "v", intervals,
        "lo", "hi", w)
        .select($"id", $"name").as[(Long, String)].collect().toSet
      val want = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
        .select($"id", $"name").as[(Long, String)].collect().toSet
      assert(got == want, s"binWidth=$w")
    }
  }

  test("hi bound is exclusive, lo inclusive") {
    val pts = Seq((1L, 0.0), (2L, 10.0), (3L, 5.0)).toDF("id", "v")
    val got = RangeJoinOps.binnedRangeJoin(pts, "v", intervals,
      "lo", "hi", 10.0)
      .select($"id", $"name").as[(Long, String)].collect().toSet
    // v=0 → a only; v=10 → b only (a's hi exclusive); v=5 → a and b
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "a"), (3L, "b")))
  }

  test("plan is an equi-join, not a nested-loop cross product") {
    val points = (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val plan = RangeJoinOps.binnedRangeJoin(points, "v", intervals,
      "lo", "hi", 10.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan)
  }
}
