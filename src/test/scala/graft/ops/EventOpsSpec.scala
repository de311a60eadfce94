package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 00:20:00"), 1.0), // 20 min — same session
      (1L, 12L, ts("2024-01-01 00:50:00"), 1.0), // exactly 30 min — same
      (1L, 13L, ts("2024-01-01 01:20:01"), 1.0), // 30m01s — new session
      (2L, 20L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = EventOps.sessionize(df, 30)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L), (1L, 13L, 2L),
      (2L, 20L, 1L)))
  }

  test("sessionStats aggregates per session") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 2.0),
      (1L, 2L, ts("2024-01-01 00:05:00"), 3.0),
      (1L, 3L, ts("2024-01-01 02:00:00"), 5.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = EventOps.sessionStats(df, 30).orderBy("session_id").collect()
    assert(out.map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"),
      r.getAs[Double]("session_value"))).toSeq
      == Seq((1L, 2L, 5.0), (2L, 1L, 5.0)))
  }

  test("hourlyAgg buckets by hour and type") {
    val df = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:00:00"), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val out = EventOps.hourlyAgg(df).orderBy("hour").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Double]("total_value") == 3.0)
  }

  test("propsK extracts typed json field") {
    val df = Seq((1L, """{"k": 42}"""), (2L, """{"k": 7, "x": 1}"""))
      .toDF("event_id", "props")
    val out = EventOps.propsK(df).select("event_id", "k")
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq
      == Seq((1L, 42), (2L, 7)))
  }

  test("hoppingAgg lands each event in exactly size/hop windows") {
    val df = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),  // windows 09:30, 10:00
      (ts("2024-01-01 10:40:00"), "click", 2.0))  // windows 10:00, 10:30
      .toDF("ts", "event_type", "value")
    val out = EventOps.hoppingAgg(df, 60, 30)
      .orderBy("win_start")
      .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (ts("2024-01-01 09:30:00"), 1L, 1.0),
      (ts("2024-01-01 10:00:00"), 2L, 3.0),
      (ts("2024-01-01 10:30:00"), 1L, 2.0)))
  }

  test("gapFill densifies hours and carries the last value forward") {
    val df = Seq(
      (1L, ts("2024-01-01 10:10:00"), 1.5),
      (1L, ts("2024-01-01 10:50:00"), 0.5), // same hour → 2.0
      (1L, ts("2024-01-01 13:20:00"), 7.0), // hours 11,12 are gaps
      (2L, ts("2024-01-01 00:00:00"), 3.0)) // single-hour user: no gaps
      .toDF("user_id", "ts", "value")
    val out = EventOps.gapFill(df).orderBy("user_id", "hour")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0, 0),
      (1L, ts("2024-01-01 11:00:00"), 2.0, 1),
      (1L, ts("2024-01-01 12:00:00"), 2.0, 1),
      (1L, ts("2024-01-01 13:00:00"), 7.0, 0),
      (2L, ts("2024-01-01 00:00:00"), 3.0, 0)))
  }

  test("slidingDistinctUsers counts each user once per trailing window") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 15:00:00")), // same user+day: dedup'd
      (2L, ts("2024-01-02 00:00:00")),
      (1L, ts("2024-01-05 00:00:00")))
      .toDF("user_id", "ts")
    val out = EventOps.slidingDistinctUsers(df, windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    // windows end at each contributing day ≤ last event day (Jan 5)
    assert(out == Seq(
      (ts("2024-01-01 00:00:00"), 1L), // {1}
      (ts("2024-01-02 00:00:00"), 2L), // {1@1, 2@2}
      (ts("2024-01-03 00:00:00"), 2L), // {1@1, 2@2}
      (ts("2024-01-04 00:00:00"), 1L), // {2@2}
      (ts("2024-01-05 00:00:00"), 1L))) // {1@5}
  }

  test("slidingDistinctUsersHll: small-cardinality estimates are exact " +
      "and gap days are densified") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-02 00:00:00")),
      (1L, ts("2024-01-05 00:00:00"))) // Jan 3/4 have no events
      .toDF("user_id", "ts")
    val out = EventOps.slidingDistinctUsersHll(df, windowDays = 3, lgK = 14)
      .orderBy("day").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    // HLL is exact far below 2^lgK buckets → identical to the exact op
    assert(out == Seq(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-02 00:00:00"), 2L),
      (ts("2024-01-03 00:00:00"), 2L),
      (ts("2024-01-04 00:00:00"), 1L),
      (ts("2024-01-05 00:00:00"), 1L)))
  }

  test("slidingDistinctUsersHll tracks the exact rewrite within 5% on " +
      "the events table") {
    val e = graft.Tables.events(spark, sf0001)
    val exact = EventOps.slidingDistinctUsers(e, 7)
    val est = EventOps.slidingDistinctUsersHll(e, 7, lgK = 14)
    val joined = exact.join(est, Seq("day")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ex, ap) = (r.getLong(1), r.getLong(2))
      assert(math.abs(ap - ex) <= 0.05 * ex, s"day ${r.get(0)}: $ap vs $ex")
    }
  }

  test("streaks finds maximal consecutive-day islands per user") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 22:00:00")),
      (1L, ts("2024-01-02 05:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-05 01:00:00")),  // gap → new streak
      (2L, ts("2024-01-10 00:00:00")))
      .toDF("user_id", "ts")
    val out = EventOps.streaks(df)
      .orderBy("user_id", "streak_start").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-10", "2024-01-10", 1L)))
  }

  test("hourlyPeaks picks each type's busiest hour with z vs own history") {
    val rows =
      // type A: hours with counts 1,1,1,5 → peak hour 13:00, z = (5-2)/2
      Seq.fill(1)(("a", ts("2024-01-01 10:00:00"))) ++
      Seq.fill(1)(("a", ts("2024-01-01 11:00:00"))) ++
      Seq.fill(1)(("a", ts("2024-01-01 12:00:00"))) ++
      Seq.fill(5)(("a", ts("2024-01-01 13:00:00"))) ++
      // type B: one constant hour → sd = 0 → z = 0 by convention
      Seq.fill(2)(("b", ts("2024-01-01 10:00:00")))
    val df = rows.toDF("event_type", "ts")
    val out = EventOps.hourlyPeaks(df)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("a", ts("2024-01-01 13:00:00"), 5L, 1.5),
      ("b", ts("2024-01-01 10:00:00"), 2L, 0.0)))
  }

  test("scd2 closes each interval with the key's next change") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "a", 1.0),
      (1L, ts("2024-01-01 12:00:00"), 101L, "b", 2.0),
      (1L, ts("2024-01-01 12:00:00"), 102L, "c", 3.0), // ts tie → seq order
      (2L, ts("2024-01-02 00:00:00"), 103L, "d", 4.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = EventOps.scd2(df, "user_id", "ts", "event_id",
        Seq("event_type", "value"))
      .orderBy("user_id", "valid_from", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")),
        r.getAs[Int]("is_current"))).toSeq
    assert(out == Seq(
      (1L, 100L, Some(ts("2024-01-01 12:00:00")), 0),
      (1L, 101L, Some(ts("2024-01-01 12:00:00")), 0), // closed by the tie
      (1L, 102L, None, 1),
      (2L, 103L, None, 1)))
  }

  test("compact keeps latest per key and flags tombstones") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "upsert", 10.0), (1L, 2L, "upsert", 20.0),
      (2L, 3L, "upsert", 5.0), (2L, 4L, "delete", 0.0),
      (3L, 5L, "delete", 0.0), (3L, 6L, "upsert", 7.0))
      .toDF("k", "seq", "op", "v")
    val out = EventOps.compact(df, "k", Seq("seq"), Seq("op", "v"),
        org.apache.spark.sql.functions.col("op") === "delete")
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"),
        r.getAs[Boolean]("is_tombstone"))).toSeq
    // key 2's final op is the delete; key 3's delete was superseded
    assert(out == Seq((1L, 20.0, false), (2L, 0.0, true), (3L, 7.0, false)))
  }

  test("events table loader yields microsecond timestamps (ns truncated)") {
    val e = graft.Tables.events(spark, sf0001)
    assert(e.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(e.count() > 0)
  }

  test("kaplanMeier: product-limit curve with horizon censoring") {
    val df = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")), // event, day 0
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-03 06:00:00")), // event, day 2
      (3L, "signup", ts("2024-01-01 00:00:00")),
      (3L, "purchase", ts("2024-01-06 00:00:00")), // past 3d → censored @3
      (4L, "signup", ts("2024-01-01 00:00:00"))) // never → censored @3
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.kaplanMeier(df, "signup", "purchase", 3)
      .orderBy("duration_day").collect()
      .map(r => (r.getAs[Long]("duration_day"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"),
        r.getAs[Double]("survival"))).toSeq
    // S(0)=3/4, S(2)=3/4 · 2/3 = 1/2, censoring leaves S unchanged
    assert(out == Seq(
      (0L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 0L, 0.5),
      (3L, 2L, 0L, 2L, 0.5)))
  }

  test("kaplanMeier pins survival to 0 when the risk set exhausts " +
    "(Spark log(0) is NULL, not -inf)") {
    val df = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "purchase", ts("2024-01-01 06:00:00")),
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-02 06:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.kaplanMeier(df, "signup", "purchase", 3)
      .orderBy("duration_day").collect()
      .map(r => (r.getAs[Long]("duration_day"), r.getAs[Double]("survival")))
    assert(out.toSeq == Seq((0L, 0.5), (1L, 0.0)))
  }

  test("cusumChangePoint flags the level-shift day") {
    // counts 5,5,5,9,9: the cumulative standardized sum bottoms out at
    // day 3 (-4.8/sqrt(4.8) = -2.1909), then recovers
    val rows = Seq(
      ("2024-01-01", 5), ("2024-01-02", 5), ("2024-01-03", 5),
      ("2024-01-04", 9), ("2024-01-05", 9)).flatMap { case (d, n) =>
      (1 to n).map(i => ("click", ts(s"$d 00:0${i % 6}:0$i")))
    }
    val df = rows.toDF("event_type", "ts")
    val out = EventOps.cusumChangePoint(df).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[java.sql.Date]("change_day").toString == "2024-01-03")
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("peak_cusum") == -2.1909)
    assert(r.getAs[Double]("peak_abs") == 2.1909)
  }

  test("ewmaDaily: hand-computed truncated-window weights") {
    // b=0.5, window=2. day1 cnt 2 → ewma 2;
    // day2 cnt 4 → (4·1 + 2·0.5)/1.5 = 3.3333;
    // day3 cnt 6 → (6·1 + 4·0.5)/1.5 = 5.3333 (day1 outside window)
    val df = (Seq.fill(2)("2024-01-01") ++ Seq.fill(4)("2024-01-02") ++
      Seq.fill(6)("2024-01-03"))
      .map(d => ("t", ts(s"$d 12:00:00"))).toDF("event_type", "ts")
    val out = EventOps.ewmaDaily(df, b = 0.5, windowDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("cnt"), r.getAs[Double]("ewma")))
    assert(out.toSeq == Seq((2L, 2.0), (4L, 3.3333), (6L, 5.3333)))
  }

  test("ewmaDaily: absent days carry no weight (gap does not bias)") {
    // b=0.5, window=3, days 1 and 3 only (day2 missing):
    // day3 → (4·b⁰ + 2·b²)/(1 + 0.25) = 4.5/1.25 = 3.6
    val df = (Seq.fill(2)("2024-01-01") ++ Seq.fill(4)("2024-01-03"))
      .map(d => ("t", ts(s"$d 12:00:00"))).toDF("event_type", "ts")
    val out = EventOps.ewmaDaily(df, b = 0.5, windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("cnt"), r.getAs[Double]("ewma")))
    assert(out.toSeq == Seq((2L, 2.0), (4L, 3.6)))
  }

  test("ewmaDaily rejects degenerate parameters up front") {
    val df = Seq(("t", ts("2024-01-01 12:00:00"))).toDF("event_type", "ts")
    intercept[IllegalArgumentException] {
      EventOps.ewmaDaily(df, b = 0.5, windowDays = 0)
    }
    intercept[IllegalArgumentException] {
      EventOps.ewmaDaily(df, b = 0.0, windowDays = 7)
    }
  }
}
