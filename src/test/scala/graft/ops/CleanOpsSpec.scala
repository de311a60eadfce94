package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("blankFill replaces empty strings only") {
    val out = Seq("", "x", "  ").toDF("c")
      .select(CleanOps.blankFill(col("c")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Not Available", "x", "  "))
  }

  test("notNullNotBlank drops nulls, empties, and whitespace-only") {
    val out = Seq(Some("a"), None, Some(""), Some("  "), Some("b"))
      .toDF("c").filter(CleanOps.notNullNotBlank(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b"))
  }

  test("filterNotBlank applies across multiple columns") {
    val df = Seq(("a", "x"), ("", "y"), ("c", ""), ("d", "w"))
      .toDF("c1", "c2")
    assert(CleanOps.filterNotBlank(df, "c1", "c2").count() == 2)
  }

  test("withDateParts adds year/month/day") {
    val out = Seq(java.sql.Timestamp.valueOf("2024-03-07 10:00:00"))
      .toDF("ts")
    val r = CleanOps.withDateParts(out, "ts").head()
    assert((r.getAs[Int]("year"), r.getAs[Int]("month"), r.getAs[Int]("day"))
      == ((2024, 3, 7)))
  }

  test("FrequencyEncoder attaches group counts, preserves row count") {
    val df = Seq("a", "a", "b", "a", "c").toDF("k")
    val enc = FrequencyEncoder.encode(df, "k", "freq")
    assert(enc.count() == 5)
    val m = enc.distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("dropFirstRows skips n rows under the ordering, keeps the plan") {
    val df = Seq((3L, "c"), (1L, "header"), (2L, "b"), (4L, "d"))
      .toDF("id", "v")
    val out = CleanOps.dropFirstRows(df, 1, Seq(col("id")))
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("b", "c", "d"))
    // plan-preserving: no RDD scan barrier — the logical plan still
    // bottoms out in the original LocalRelation, not an opaque
    // ExistingRDD (the reference's zipWithIndex detour would)
    val analyzed = out.queryExecution.optimizedPlan.toString
    assert(!analyzed.contains("ExistingRDD"), analyzed)
  }
}
