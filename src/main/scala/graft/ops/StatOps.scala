package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact statistics (SURVEY.md §2.4 extension surface).
  *
  * Spark's built-in exact `percentile` aggregate accumulates a
  * value→count OpenHashMap per group: partial maps as large as the
  * group's distinct-value count are built per task, shipped, and merged
  * on as few reducers as there are groups — at 100 TB that is an OOM
  * (or a GC collapse; measured 3-23 s swings on 600 k rows locally).
  * [[exactPercentiles]] is the sort-based shape instead: one range-
  * partitioned window sort, rank arithmetic to locate the two straddling
  * rows per quantile, and a trivial final aggregate — no per-group state
  * beyond the sort, fully streaming through codegen.
  */
object StatOps {

  /** Exact linear-interpolated percentiles (SQL percentile_cont
    * semantics, bit-identical to Spark's `percentile` and DuckDB's
    * `quantile_cont`) per group.
    *
    * NULL values (including non-castable inputs) are skipped, matching
    * both oracles — without the filter they would sort first under the
    * ascending window, occupy the lowest ranks, and inflate the row
    * count. One divergence remains by construction: a group whose values
    * are ALL null is absent from the output, where the built-in
    * aggregate would emit (group, null).
    *
    * @param qs (outputColumn, quantile) pairs, e.g. Seq("p50" -> 0.5)
    * @return one row per group: groupCol, then one double per q
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valCol: String,
                       qs: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(groupCol))
    // row_number ties between equal values are arbitrary but harmless:
    // straddling rows with the same rank-neighborhood carry equal values
    val ranked = df.select(col(groupCol), col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
    val flagged = qs.foldLeft(ranked) { case (d, (nm, q)) =>
      // bit-identity with the built-in `percentile` demands its EXACT
      // arithmetic: 0-based position q*(n-1) (adding 1.0 first would
      // perturb the fraction's low bits), and both interpolation
      // weights computed directly as (higher-pos) / (pos-lower) — not
      // derived as 1-frac, which rounds differently
      val pos = lit(q) * (col("__n") - 1).cast("double")
      d.withColumn(s"__lo_$nm", when(col("__rn") === floor(pos) + 1, col("__v")))
        .withColumn(s"__hi_$nm", when(col("__rn") === ceil(pos) + 1, col("__v")))
        .withColumn(s"__wl_$nm", (floor(pos) + 1.0) - pos)
        .withColumn(s"__wh_$nm", pos - floor(pos))
    }
    val aggs = qs.flatMap { case (nm, _) =>
      Seq(max(col(s"__lo_$nm")).as(s"__alo_$nm"),
        max(col(s"__hi_$nm")).as(s"__ahi_$nm"),
        max(col(s"__wl_$nm")).as(s"__awl_$nm"),
        max(col(s"__wh_$nm")).as(s"__awh_$nm"))
    }
    val out = qs.map { case (nm, _) =>
      // (higher - pos) * lower + (pos - lower) * higher — the built-in
      // Percentile.getPercentile operation order, bit-for-bit. At an
      // exact position both flags mark the same row and the weights are
      // (1, 0), so the value passes through unperturbed.
      (col(s"__awl_$nm") * col(s"__alo_$nm") +
        col(s"__awh_$nm") * col(s"__ahi_$nm")).as(nm)
    }
    flagged.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: out: _*)
  }
}
