package graft.plans

import graft.{SparkSpec, Tables}
import graft.ops.EventOps
import org.apache.spark.sql.functions._

class NativeAsofSpec extends SparkSpec {
  import spark.implicits._

  private def native(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    NativeAsof.asof(left, right, "k", "t", Seq("v"))

  test("planner strategy produces AsofJoinExec with sorted exchanges") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "p")
    val r = Seq((1L, 5L, 7.0)).toDF("k", "t", "v")
    val df = native(l, r)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsofJoin"), plan)
  }

  test("backward match: latest right at or before left ts, inclusive") {
    val l = Seq((1L, 10L, "x"), (1L, 20L, "y"), (1L, 4L, "z"))
      .toDF("k", "t", "p")
    val r = Seq((1L, 5L, 5.0), (1L, 10L, 10.0), (1L, 15L, 15.0),
      (1L, 25L, 25.0)).toDF("k", "t", "v")
    val out = native(l, r).collect()
      .map(row => (row.getLong(1), Option(row.get(3)))).toMap
    assert(out(10L).contains(10.0)) // inclusive at equal ts
    assert(out(20L).contains(15.0)) // latest <= 20
    assert(out(4L).isEmpty) // nothing at or before 4
  }

  test("unmatched keys and empty right → null attach (left outer)") {
    val l = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "t", "p")
    val r = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    val out = native(l, r).collect()
      .map(row => row.getLong(0) -> Option(row.get(3))).toMap
    assert(out(1L).contains(1.0) && out(2L).isEmpty)
    assert(native(l, r.filter(col("k") < 0)).collect()
      .forall(_.isNullAt(3)))
  }

  test("candidate does not leak across keys") {
    // key 2 has no rights at all; key 1's candidate must not attach
    val l = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "p")
    val r = Seq((1L, 5L, 5.0)).toDF("k", "t", "v")
    val out = native(l, r).collect()
      .map(row => row.getLong(0) -> Option(row.get(3))).toMap
    assert(out(1L).contains(5.0) && out(2L).isEmpty)
  }

  test("matches the union+window asofJoin on the events table") {
    val ev = Tables.events(spark, sf0001)
      .withColumn("us", unix_micros(col("ts")))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("us"),
        col("value"))
    val nat = NativeAsof.asof(
        buys.withColumnRenamed("user_id", "k").withColumnRenamed("us", "t"),
        clicks.withColumnRenamed("user_id", "k").withColumnRenamed("us", "t"),
        "k", "t", Seq("click_id", "value"))
      .select(col("event_id"), col("asof_click_id"), col("asof_value"))
    val ref = EventOps.asofJoin(buys, clicks, "user_id", "us",
        Seq("click_id", "value"))
      .select(col("event_id"), col("asof_click_id"), col("asof_value"))
    assert(nat.exceptAll(ref).isEmpty && ref.exceptAll(nat).isEmpty)
  }

  test("toleranceUs nulls stale candidates without falling back") {
    val l = Seq((1L, 100L, "a"), (1L, 107L, "b"), (1L, 120L, "c"))
      .toDF("k", "t", "p")
    val r = Seq((1L, 95L, 95.0), (1L, 105L, 105.0)).toDF("k", "t", "v")
    val out = NativeAsof.asof(l, r, "k", "t", Seq("v"), toleranceUs = 5L)
      .collect().map(row => (row.getLong(1), Option(row.get(3)))).toMap
    assert(out(100L).contains(95.0)) // 100-95 = 5 <= 5: within fence
    assert(out(107L).contains(105.0)) // 107-105 = 2: within fence
    // 120-105 = 15 > 5: stale — NULL, not a fallback to the older 95
    assert(out(120L).isEmpty)
    // tolerance 0 keeps only exact-timestamp matches
    val exact = NativeAsof.asof(l, r, "k", "t", Seq("v"), toleranceUs = 0L)
      .collect().map(row => (row.getLong(1), Option(row.get(3)))).toMap
    assert(exact(100L).isEmpty && exact(107L).isEmpty && exact(120L).isEmpty)
    intercept[IllegalArgumentException] {
      NativeAsof.asof(l, r, "k", "t", Seq("v"), toleranceUs = -1L)
    }
  }
}
