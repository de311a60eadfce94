package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (100 TB design surface; SURVEY.md §7.4).
  *
  * AQE's skew-join split handles sort-merge joins at runtime, but two
  * shapes still need manual salting:
  *  - aggregations where one key dominates (a single reducer drowns);
  *  - broadcast-infeasible joins against a skewed fact side when AQE is
  *    off or the skew is in a shuffle-hash join.
  *
  * Pattern: scatter each hot key across `salts` sub-keys, partially
  * aggregate, then merge the sub-aggregates — two small shuffles
  * instead of one stuck straggler.
  */
object SkewOps {

  /** Salted group-by count: groupBy(key, salt) → partial counts →
    * groupBy(key) merge. Equivalent to `groupBy(key).count()` for any
    * data; strictly better when key frequencies are badly skewed.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + pmod(monotonically_increasing_id(), lit(salts)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("count"))

  /** Salted aggregation for any commutative merge: partial agg on
    * (key, salt), then final merge on key. `partial` and `merge` take
    * the value column / partial column respectively.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String, salts: Int,
                partial: Column => Column, merge: Column => Column,
                outCol: String): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(merge(col("__partial")).as(outCol))

  /** Salted left equi-join against a SMALL-but-not-broadcastable right
    * side: replicate each right row `salts` times (one per salt value),
    * scatter left rows randomly across salts, join on (key, salt).
    * Hot left keys spread over `salts` reducers instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), "left")
      .drop("__salt")
  }
}
