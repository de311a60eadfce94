package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (SURVEY.md §2.13 X5/X6).
  *
  * Written batch-first but streaming-compatible: the hourly aggregation is
  * exactly the shape `readStream → withWatermark → groupBy(window) →
  * writeStream` accepts (see graft.streaming.StreamingOps for the
  * streaming wrapper).
  */
object EventOps {

  /** Tumbling-hour aggregation (batch form of a windowed streaming agg).
    * date_trunc keeps the group key a plain timestamp — engine-portable
    * and partition-prunable if the sink is partitioned by hour.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))

  /** Typed JSON extraction from the props payload (X5): schema-on-read of
    * a semi-structured column. `get_json_object` pushes through codegen;
    * for a fixed schema prefer `from_json` (one parse for many fields).
    */
  def propsK(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))

  /** Sessionization: a new session starts after `gapMinutes` of user
    * inactivity; session ids are per-user ordinals. Two stacked windows
    * over the same (user_id, ts) partitioning — ONE shuffle, the second
    * window reuses the first's sort order.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // integer-microsecond gap arithmetic: second-precision unix_timestamp
    // would round boundary gaps differently from the DuckDB oracle
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats built on sessionize. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
}
