package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TopKAggSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  import spark.implicits._

  test("matches window row_number top-k on random data") {
    val rnd = new Random(7)
    val df = (1 to 2000)
      .map(i => (rnd.nextInt(5), rnd.nextInt(40).toDouble, i.toLong))
      .toDF("g", "v", "id")
    for (k <- Seq(1, 3, 10)) {
      val got = df.groupBy($"g")
        .agg(TopKAgg.topK(k)($"v", $"id").as("tk"))
        .select($"g", posexplode(arrays_zip($"tk.vs", $"tk.ks")))
        .select($"g", $"col.vs", $"col.ks")
        .as[(Int, Double, Long)].collect().toSet
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val want = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k)
        .select($"g", $"v", $"id")
        .as[(Int, Double, Long)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("output is sorted v desc with key-asc tiebreak") {
    val df = Seq((1, 5.0, 9L), (1, 5.0, 2L), (1, 7.0, 5L), (1, 5.0, 1L))
      .toDF("g", "v", "id")
    val r = df.groupBy($"g").agg(TopKAgg.topK(3)($"v", $"id").as("tk"))
      .select($"tk.vs", $"tk.ks").as[(Seq[Double], Seq[Long])].collect().head
    assert(r._1 == Seq(7.0, 5.0, 5.0))
    assert(r._2 == Seq(5L, 1L, 2L))
  }

  test("two-phase aggregation: partial buffers before the exchange") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val plan = df.groupBy($"g").agg(TopKAgg.topK(2)($"v", $"id").as("tk"))
      .queryExecution.executedPlan.toString
    val aggs = "(ObjectHashAggregate|SortAggregate|HashAggregate)".r
      .findAllIn(plan).size
    assert(aggs >= 2, plan)
  }
}
