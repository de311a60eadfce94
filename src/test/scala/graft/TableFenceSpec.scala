package graft

import org.apache.spark.sql.functions._

/** Pins the [[Tables.fence]] contract: the barrier keeps a fenced
  * filter ABOVE a repartition (so an expensive predicate runs with
  * post-shuffle parallelism), is a semantic no-op, and — the reason
  * the `rand() < -1` spelling was replaced — survives the optimizer
  * structurally rather than by luck. If a future Spark folds or pushes
  * the barrier, these tests fail loudly.
  */
class TableFenceSpec extends SparkSpec {

  test("fence is a semantic no-op") {
    val df = spark.range(100).toDF("id")
    val plain = df.filter(col("id") % 7 === 0).count()
    val fenced = df.filter(Tables.fence(col("id") % 7 === 0)).count()
    assert(plain === fenced)
  }

  test("fenced filter is NOT pushed below a repartition") {
    val df = Tables.parallelize(
      Tables.table(spark, sf0001, "documents"))
    val fenced = df.filter(Tables.fence(length(col("text")) > 50))
    val plan = fenced.queryExecution.optimizedPlan
    // walk the optimized plan: the Filter containing the barrier must
    // sit ABOVE (i.e. be an ancestor of) the Repartition node
    import org.apache.spark.sql.catalyst.plans.logical._
    def containsBarrier(p: LogicalPlan): Boolean =
      p.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.PushdownBarrier]))
    val filterNode = plan.collectFirst {
      case f: Filter if containsBarrier(f) => f
    }
    assert(filterNode.isDefined,
      s"barrier filter folded away by the optimizer:\n$plan")
    assert(filterNode.get.collectFirst {
      case r: RepartitionOperation => r
    }.isDefined,
      s"barrier filter was pushed below the repartition:\n$plan")
  }

  test("barrier survives constant folding and codegen") {
    // evaluate through a whole-stage-codegen'd projection: the barrier
    // codegens to literal false, so the OR short-circuits to the left
    val out = spark.range(10).toDF("id")
      .filter(Tables.fence(col("id") >= 5))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(5L, 6L, 7L, 8L, 9L))
  }
}
