package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to right rows whose
  * [lo, hi) interval contains the left value.
  *
  * Spark has no native range-join operator; the naive formulation
  * `l.join(r, l(v) >= r(lo) && l(v) < r(hi))` plans as
  * BroadcastNestedLoopJoin — O(|l|·|r|) comparisons, which is fine for
  * a handful of bands but fatal when the interval table grows. The
  * scalable shape used here is bin-and-equi-join (the same trick Spark
  * itself documents for point-in-interval joins, and what
  * Databricks' range-join hint does internally):
  *
  *  - each RIGHT interval is exploded to the coarse bins it covers
  *    (`sequence(floor(lo/w), floor(hi/w))` — hi's bin kept even when
  *    exclusive: a false candidate is dropped by the residual filter,
  *    never a correctness issue);
  *  - each LEFT row computes its single bin `floor(v/w)`;
  *  - equi-join on the bin (hash/broadcast — shuffle on a short int
  *    key, not a cross product), then residual `lo <= v < hi`.
  *
  * Bin width trades replication of the right side (wide intervals ÷ w
  * bins each) against candidate false positives; pick w ≈ median
  * interval width. At 100 TB the left side streams through a
  * broadcast-hash join against the exploded interval table — zero
  * shuffle of the fact table.
  */
object RangeJoinOps {

  def binnedRangeJoin(left: DataFrame, valueCol: String, right: DataFrame,
                      loCol: String, hiCol: String, binWidth: Double,
                      broadcastRight: Boolean = true): DataFrame = {
    val lb = left.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val rb0 = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val rb = if (broadcastRight) broadcast(rb0) else rb0
    lb.join(rb, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
