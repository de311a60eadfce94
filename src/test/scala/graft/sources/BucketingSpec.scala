package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed join runs with zero exchanges; plain join shuffles") {
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)

    val joined = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey")
    val n = joined.count()
    assert(n == lineitem.join(orders, Seq("o_orderkey")).count())

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")

    // control: the same join on raw parquet does shuffle (or broadcasts)
    val control = Tables.orders(spark, sf0001)
      .join(lineitem, Seq("o_orderkey"))
    control.collect()
    val controlPlan = control.queryExecution.executedPlan.toString
    assert(controlPlan.contains("Exchange") ||
      controlPlan.contains("Broadcast"))
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    val agg = spark.table("orders_b")
      .groupBy(col("o_orderkey")).agg(sum("o_totalprice").as("t"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed groupBy should not shuffle:\n$plan")
  }
}
