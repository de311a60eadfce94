package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-4 temporal/CDC operators: merge upsert, transitions, interval
  * concurrency, window dedup (EventOps additions).
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mergeUpsert: update wins, unmatched keys survive from either side") {
    val base = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
      (1L, ts("2024-01-02 00:00:00"), 11L, 2.0), // latest base for key 1
      (2L, ts("2024-01-01 00:00:00"), 12L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val upd = Seq(
      (1L, ts("2024-01-03 00:00:00"), 20L, 9.0),
      (3L, ts("2024-01-03 00:00:00"), 21L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventOps.mergeUpsert(base, upd, "user_id",
      Seq("ts", "event_id"), "value")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 9.0, "update"), (2L, 5.0, "base"), (3L, 7.0, "update")))
  }

  test("mergeUpsert argmax tiebreak uses the full order-column list") {
    val base = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 00:00:00"), 2L, 2.0)) // same ts, higher seq wins
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventOps.mergeUpsert(base, base.limit(0), "user_id",
      Seq("ts", "event_id"), "value").collect()
    assert(out.head.getDouble(1) == 2.0 && out.head.getString(2) == "base")
  }

  test("transitionCounts counts adjacent pairs per key in (ts, seq) order") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "a"), // last per key → no pair
      (2L, ts("2024-01-01 00:01:00"), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.transitionCounts(df, "user_id", "ts", "event_id",
      "event_type")
      .orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("maxConcurrency: overlap peaks, closed-open boundaries, day carry-in") {
    // three intervals on day 1: two overlap; one starts exactly when
    // another ends (no overlap); one interval crosses midnight so day 2
    // opens with carry-in 1 and no start of its own
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:20:00")), // overlaps #1 → peak 2
      (3L, ts("2024-01-01 10:50:00")), // starts exactly at #2's end
      (4L, ts("2024-01-01 23:50:00"))) // open at midnight
      .toDF("event_id", "ts")
    val out = EventOps.maxConcurrency(df, durationMinutes = 30)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(("2024-01-01", 2L), ("2024-01-02", 1L)))
  }

  test("windowDedupStats collapses repeats within the hour to one keeper") {
    val df = Seq(
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")), // dup in same hour
      (1L, "click", ts("2024-01-01 11:00:01")), // next hour → kept
      (2L, "click", ts("2024-01-01 10:59:00")),
      (1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.windowDedupStats(df, "user_id", "event_type", "ts",
      "1 hour").orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("click", 4L, 3L), ("view", 1L, 1L)))
  }

  test("pit-join shape: asofJoin equals the explicit interval join") {
    // dim changes for user 1 at t=0 (v=1) and t=2 (v=2); facts at 1, 2, 3
    val dim = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 02:00:00"), 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val fact = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L), // inside first interval
      (1L, ts("2024-01-01 02:00:00"), 2L), // exactly at change → new row
      (2L, ts("2024-01-01 01:00:00"), 3L)) // no dim → null
      .toDF("user_id", "ts", "fact_id")
    val out = EventOps.asofJoin(fact, dim, "user_id", "ts",
      Seq("event_id", "value"))
      .orderBy("fact_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.toString)))
    assert(out.toSeq == Seq(
      (1L, Some("100")), (2L, Some("101")), (3L, None)))
  }
}
