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

  /** Gap sessions via Spark's NATIVE `session_window` (the built-in
    * merge-based form of [[sessionStats]]'s lag/cumsum formulation):
    * each event opens a window [ts, ts+gap); overlapping windows per
    * key merge. Works identically under Structured Streaming with a
    * watermark (state = open windows per key). Events exactly `gap`
    * apart start a NEW session (merge condition is strict `<`).
    */
  def sessionWindowStats(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Hopping (sliding) window aggregation: overlapping windows of
    * `sizeMinutes` starting every `hopMinutes` — the batch form of
    * `groupBy(window(ts, size, hop))`, which accepts the identical
    * plan under Structured Streaming with a watermark. Each event lands
    * in size/hop windows (here 2 for 60/30), so output volume — and the
    * single shuffle's width — scales by that factor, not by window
    * length.
    */
  def hoppingAgg(events: DataFrame, sizeMinutes: Int,
                 hopMinutes: Int): DataFrame =
    events.groupBy(
        window(col("ts"), s"$sizeMinutes minutes", s"$hopMinutes minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window COUNT DISTINCT (here: trailing `windowDays`-day
    * active users per day) — the aggregate window functions can't
    * express (no `count(distinct) OVER`), rewritten into the scalable
    * shape: dedup to (user, day) first, explode each user-day into the
    * `windowDays` window-end days it contributes to, then ONE two-phase
    * distinct aggregation per day. Cost is bounded by
    * |distinct user-days| × windowDays — independent of raw event
    * volume — where the naive per-day re-scan is |days| × full corpus.
    */
  def slidingDistinctUsers(events: DataFrame, windowDays: Int): DataFrame = {
    val ud = events
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct()
    val last = ud.agg(max(col("d")).as("__d1"))
    ud.select(col("user_id"),
        explode(sequence(col("d"),
          col("d") + expr(s"interval ${windowDays - 1} days"),
          expr("interval 1 day"))).as("day"))
      .crossJoin(broadcast(last))
      .filter(col("day") <= col("__d1"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Approximate trailing-window distinct users via mergeable HLL
    * sketches (Apache DataSketches, `hll_sketch_agg`/`hll_union_agg`) —
    * the 100 TB scale path of [[slidingDistinctUsers]]: the exact
    * rewrite still shuffles |distinct user-days| × windowDays rows,
    * while this pass reduces each day to ONE constant-size sketch
    * (≈2^lgK bytes, map-side combined), then unions sketches over a
    * days-sized RANGE frame. Per-day error ~1.04/sqrt(2^lgK) (0.4% at
    * lgK=14); the union is lossless, so the trailing estimate carries
    * the same bound. The unpartitioned window is safe: its input is the
    * DAYS-sized sketch frame, never raw events.
    *
    * The day grid is densified (min..max day) so window-end days with
    * no events of their own still report the trailing estimate, exactly
    * like the exact rewrite's exploded coverage.
    */
  def slidingDistinctUsersHll(events: DataFrame, windowDays: Int,
                              lgK: Int): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("__sk"))
    val grid = daily
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("day"), "left")
      .withColumn("__dnum", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("est_users", expr("hll_sketch_estimate(" +
        s"hll_union_agg(__sk) OVER (ORDER BY __dnum " +
        s"RANGE BETWEEN ${windowDays - 1} PRECEDING AND CURRENT ROW))"))
      .select(col("day"), col("est_users"))
  }

  /** Time-series gap fill with forward fill (LOCF): project each user's
    * events onto a dense hourly grid between their first and last hour,
    * carrying the last observed hourly value across empty hours —
    * the standard regularization step before any ML on irregular event
    * streams.
    *
    * Scale shape: the hourly pre-aggregation shrinks the input BEFORE
    * the grid is generated (`sequence` explodes ~span/hour rows per
    * user, independent of event volume); the forward fill is one
    * streaming window frame per user — no whole-series buffering, no
    * driver-side loop. Total: two shuffles (hour agg, per-user window).
    */
  def gapFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(sum(col("value")), 2).as("hour_value"))
    val grid = hourly
      .groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_value",
        last(col("hour_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap",
        when(col("hour_value").isNull, 1).otherwise(0))
      .drop("hour_value")
  }

  /** Consecutive-day activity streaks (gaps-and-islands): maximal runs
    * of consecutive active days per user — the retention/engagement
    * primitive behind "longest streak" and churn features.
    *
    * The classic rewrite: distinct active days, per-user day-rank, and
    * `day − rank` is constant within a consecutive run — one groupBy on
    * that island key gives each streak's start/end/length with no
    * self-join and no iteration.
    *
    * Scale shape: the distinct-day dedup collapses event volume FIRST
    * (map-side combine on (user, day)); everything after runs on
    * O(users × active-days) rows — one window shuffle on user, one
    * island aggregation. No per-event window ever exists.
    */
  def streaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("__island", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("__island"))
      .agg(min(col("day")).as("streak_start"),
        max(col("day")).as("streak_end"),
        count(lit(1)).as("streak_len"))
      .drop("__island")
  }

  /** Per-type hourly peak detection: for each event type, the hour with
    * the most events, scored as a z-value against that type's own
    * hourly distribution — the anomaly-surfacing shape (traffic spikes,
    * abuse bursts) where each entity is judged against ITS OWN history,
    * not a global threshold.
    *
    * Scale shape: raw events collapse to (type, hour) counts in one
    * map-side-combined aggregation; the per-type stats and the peak
    * ranking then run on O(types × hours) rows — the window never sees
    * raw events. Ties break on the earlier hour (count is the ranking
    * key, so equal-count hours are true ties).
    */
  def hourlyPeaks(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    val rank = Window.partitionBy(col("event_type"))
      .orderBy(col("n_events").desc, col("hour"))
    hourly
      .withColumn("__mean", avg(col("n_events")).over(w))
      .withColumn("__sd", stddev_samp(col("n_events")).over(w))
      .withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col("event_type"), col("hour"), col("n_events"),
        when(col("__sd") > 0,
          (round((col("n_events") - col("__mean")) / col("__sd"), 4) + lit(0.0)))
          .otherwise(lit(0.0)).as("peak_z"))
  }

  /** Changelog → SCD2 snapshots: turn an append-only event/change log
    * into slowly-changing-dimension type-2 rows — each record becomes a
    * validity interval [valid_from, valid_to) closed by the key's next
    * change, with the open (current) row flagged. The warehouse
    * primitive behind time-travel joins and "state as of T" queries
    * (pair with [[asofJoin]] to query them).
    *
    * The window ordering includes `seqCol` so ties on the timestamp
    * have a TOTAL deterministic order.
    *
    * Scale shape: one shuffle on the key, one streaming lead() frame —
    * no self-join against the "next" row, no whole-history buffering.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col(seqCol))
    changes.select(
        (Seq(col(keyCol), col(tsCol).as("valid_from"), col(seqCol)) ++
          attrCols.map(col)): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }

  /** As-of join (inclusive): for each left row, attach `attachCols` from
    * the LATEST right row of the same `key` with right.tsCol <=
    * left.tsCol.
    *
    * Spark has no native as-of join; the naive range-join formulation
    * (l ⋈ r ON key AND r.ts <= l.ts, then max per left row) explodes to
    * O(|l|·|r|/keys) intermediate rows. This implementation is the
    * scalable shape: tag and union both inputs, ONE shuffle on key,
    * one window sort, and a running `last(..., ignoreNulls)` carries
    * right values forward onto left rows. Right rows sort BEFORE left
    * rows at equal timestamps, making the match inclusive.
    *
    * All attach columns ride in ONE struct so a single
    * `last(ignoreNulls)` picks them from the SAME (latest) right row:
    * carrying each column independently would skip a matched right row
    * whose attach value is genuinely NULL and take a stale value from
    * an older row — diverging from true as-of semantics (and the
    * DuckDB ASOF oracle) whenever right attach columns contain NULLs.
    * The struct itself is never null on right rows, so NULL fields
    * survive intact.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               attachCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(attachCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rightSel = right.select(
      (Seq(col(key), col(tsCol), lit(0).as("__side")) ++
        leftCols.filterNot(Seq(key, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(attachCols.map(col): _*).as("__r")): _*)
    val unioned = taggedLeft.unionByName(rightSel)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        attachCols.map(c => col("__r").getField(c).as(s"asof_$c"))): _*)
  }

  /** SCD1 merge (upsert): latest row per key from `updates` overrides the
    * latest row per key from `base`; keys present on either side survive.
    *
    * "Latest per key" is an argmax via `max(struct(orderCols..., payload))`
    * — a plain hash aggregate with map-side partial merge, NOT a
    * row_number window (which would sort every group). The two one-row-
    * per-key sides then full-outer join on the key; at 100 TB both sides
    * shuffle once on the key and the join is 1:1.
    *
    * @param orderCols total-order tiebreak within a key (e.g. ts, seq)
    * @param valueCol  the payload column carried to the output
    * @return key, final_<valueCol> (update wins over base), src
    *         ('update' | 'base' — which side supplied the value)
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keyCol: String,
                  orderCols: Seq[String], valueCol: String): DataFrame = {
    def latest(df: DataFrame, as: String): DataFrame =
      df.groupBy(col(keyCol))
        .agg(max(struct((orderCols.map(col) :+ col(valueCol)): _*))
          .getField(valueCol).as(as))
    latest(base, "__b").join(latest(updates, "__u"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("__u"), col("__b")).as(s"final_$valueCol"),
        when(col("__u").isNotNull, lit("update")).otherwise(lit("base"))
          .as("src"))
  }

  /** Changelog compaction with tombstones: reduce a CDC stream to one
    * row per key — the LATEST by the total order `orderCols` — and flag
    * keys whose final operation is a delete (`isDelete` on the
    * surviving row). The consumer drops flagged keys; base+delta
    * compaction jobs run exactly this shape.
    *
    * Same scale plan as [[mergeUpsert]]: argmax via `max(struct(...))`
    * — one hash aggregate with map-side partial merge, one shuffle on
    * the key, NO row_number window (which would sort every group).
    *
    * @param orderCols   total order within a key (e.g. ts, seq)
    * @param payloadCols columns carried through on the surviving row
    * @param isDelete    tombstone predicate evaluated on each change row
    */
  def compact(changes: DataFrame, keyCol: String, orderCols: Seq[String],
              payloadCols: Seq[String], isDelete: Column): DataFrame = {
    val st = struct(
      (orderCols ++ payloadCols).map(col) :+ isDelete.as("__del"): _*)
    changes.groupBy(col(keyCol)).agg(max(st).as("__m"))
      .select(col(keyCol) +:
        payloadCols.map(c => col(s"__m.$c").as(c)) :+
        col("__m.__del").as("is_tombstone"): _*)
  }

  /** Per-key transition (bigram) counts over an ordered event stream:
    * how often does `a` immediately precede `b` within a key. The
    * sequence-mining primitive behind next-event prediction features and
    * funnel discovery.
    *
    * One window per key partition (`lead` over ts+seq total order) — the
    * natural scale shape: partitions are keys, each sorted locally; the
    * bigram count aggregation then map-side combines into at most
    * |types|² rows.
    */
  def transitionCounts(events: DataFrame, keyCol: String, tsCol: String,
                       seqCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    events
      .select(col(keyCol), col(tsCol), col(seqCol), col(typeCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Max concurrent intervals per day (sweep-line): each event opens a
    * closed-open interval [ts, ts + durationMinutes); the answer is the
    * peak number of simultaneously open intervals within each day.
    *
    * Scale shape: the classic solution is ONE global sort of +1/−1
    * endpoints with a running sum — a single-partition window that dies
    * at 100 TB. Here the running sum is decomposed: endpoints partition
    * by DAY (parallel per-day windows over (t, delta) order), and each
    * day's carry-in (intervals still open at midnight) is the cumulative
    * sum of per-day delta totals — a window over one row per day, driver-
    * scale however big the data. Ordering −1 before +1 at equal t keeps
    * the closed-open semantics (an interval ending exactly when another
    * starts never overlaps it).
    */
  def maxConcurrency(events: DataFrame, durationMinutes: Int): DataFrame = {
    val rawEnds = events.select(col("ts").as("t"), lit(1).as("delta"))
      .unionByName(events.select(
        (col("ts") + expr(s"interval $durationMinutes minutes")).as("t"),
        lit(-1).as("delta")))
    // midnight sentinel (delta 0) per day: a day whose first endpoint is
    // an end must still report the carry-in state it woke up with
    val sentinels = rawEnds.select(to_date(col("t")).as("day")).distinct()
      .select(col("day").cast("timestamp").as("t"), lit(0).as("delta"))
    val ends = rawEnds.unionByName(sentinels)
      .withColumn("day", to_date(col("t")))
    val inDay = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = ends
      .withColumn("__run", sum(col("delta")).over(inDay))
      .groupBy(col("day"))
      .agg(max(col("__run")).as("__peak"), sum(col("delta")).as("__tot"))
    val carry = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    perDay
      .withColumn("__in", coalesce(sum(col("__tot")).over(carry), lit(0L)))
      .select(col("day"), (col("__in") + col("__peak")).as("max_concurrent"))
  }

  /** Dedup-within-window stats: collapse repeats of (key, type) inside
    * each tumbling window to their first occurrence — the batch form of
    * streaming `dropDuplicatesWithinWatermark`, and the idempotency pass
    * in front of any at-least-once event feed.
    *
    * The keeper is `min(struct(ts, seq))` per (key, type, window) — a
    * map-side-combining aggregate, no window sort; the per-type rollup
    * then counts groups (= kept rows) and raw rows in one more agg.
    */
  def windowDedupStats(events: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, windowSpec: String): DataFrame =
    events
      .groupBy(col(keyCol), col(typeCol),
        window(col(tsCol), windowSpec).as("__w"))
      .agg(count(lit(1)).as("__raw"))
      .groupBy(col(typeCol))
      .agg(sum(col("__raw")).as("n_raw"), count(lit(1)).as("n_kept"),
        round(count(lit(1)).cast("double") / sum(col("__raw")), 4)
          .as("keep_rate"))

  /** Kaplan–Meier survival estimator for time-to-event analysis: per
    * subject, the days from their first `startType` event to their first
    * subsequent `eventType` event, observed through a `horizonDays`
    * conversion window; subjects with no qualifying event inside
    * min(start + horizon, corpus max ts) are right-censored there. The
    * corpus max is an in-plan scalar — no wall clock, deterministic
    * across engines and reruns.
    *
    * Scale shape: the raw stream collapses to one row per subject in a
    * single left join + argmin aggregation (the conditional `min(when)`
    * ignores pre-start events without a second pass), then to one row
    * per distinct duration. The at-risk/survival windows run over that
    * duration frame — bounded by the horizon in days, never by corpus
    * size. Survival is the product-limit Π(1 − dᵢ/nᵢ) computed as
    * exp(Σ ln ·) over the ordered cumulative frame, with an explicit
    * zero guard for the d=n exhaustion row (Spark's log(0) is NULL, not
    * −∞); µs integer duration arithmetic keeps both engines on
    * identical doubles.
    */
  /** Per-user (start→target | censor-at-horizon) survival durations —
    * the shared front half of every survival estimator here (KM q204,
    * Nelson–Aalen, log-rank): first start per user, first target at or
    * after it, horizon/corpus-end censoring, integer day durations.
    * One corpus pass + a per-user aggregate. */
  def survivalDurations(events: DataFrame, startType: String,
      eventType: String, horizonDays: Int): DataFrame = {
    val dayUs = 86400000000L
    val starts = events.filter(col("event_type") === startType)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__t0"))
    val targets = events.filter(col("event_type") === eventType)
      .select(col("user_id"), unix_micros(col("ts")).as("__te"))
    val corpusEnd = events.agg(max(unix_micros(col("ts"))).as("__tmax"))
    starts.join(targets, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(first(col("__t0")).as("__t0"),
        min(when(col("__te") >= col("__t0"), col("__te"))).as("__t1"))
      .crossJoin(broadcast(corpusEnd))
      .withColumn("__cutoff",
        least(col("__tmax"), col("__t0") + lit(horizonDays * dayUs)))
      .select(col("user_id"),
        (col("__t1").isNotNull && col("__t1") <= col("__cutoff"))
          .as("__event"),
        floor((least(coalesce(col("__t1"), col("__cutoff")),
          col("__cutoff")) - col("__t0")) / lit(dayUs)).as("duration_day"))
  }

  def kaplanMeier(events: DataFrame, startType: String,
      eventType: String, horizonDays: Int): DataFrame = {
    val durations =
      survivalDurations(events, startType, eventType, horizonDays)
    val perDay = durations.groupBy(col("duration_day"))
      .agg(count(when(col("__event"), 1)).as("n_events"),
        count(when(!col("__event"), 1)).as("n_censored"))
    val total = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val upTo = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("n_at_risk",
        sum(col("n_events") + col("n_censored")).over(total) -
          coalesce(sum(col("n_events") + col("n_censored")).over(before),
            lit(0L)))
      // Π(1 − d/n) as exp(Σ ln): days with no events contribute ln(1)=0;
      // a d=n row exhausts the risk set → survival pins to 0 from there
      .withColumn("__exhausted",
        max(when(col("n_events") >= col("n_at_risk"), 1).otherwise(0))
          .over(upTo))
      .withColumn("survival",
        when(col("__exhausted") === 1, lit(0.0)).otherwise(
          (round(exp(sum(when(col("n_events") < col("n_at_risk"),
            log(lit(1.0) -
              col("n_events").cast("double") / col("n_at_risk")))
            .otherwise(lit(0.0))).over(upTo)), 4) + lit(0.0))))
      .select(col("duration_day"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Nelson–Aalen cumulative hazard H(t) = Σ_{t_j ≤ t} d_j / n_j and
    * the Fleming–Harrington survival estimate exp(−H) — the additive
    * dual of Kaplan–Meier's product form, preferred for small risk
    * sets and as the baseline-hazard input to Cox-style models. Same
    * per-day frame and at-risk windows as [[kaplanMeier]]; the sums
    * are exact integer ratios accumulated in day order in both
    * engines.
    */
  def nelsonAalen(events: DataFrame, startType: String,
      eventType: String, horizonDays: Int): DataFrame = {
    val perDay =
      survivalDurations(events, startType, eventType, horizonDays)
        .groupBy(col("duration_day"))
        .agg(count(when(col("__event"), 1)).as("n_events"),
          count(when(!col("__event"), 1)).as("n_censored"))
    val total = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val upTo = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("n_at_risk",
        sum(col("n_events") + col("n_censored")).over(total) -
          coalesce(sum(col("n_events") + col("n_censored")).over(before),
            lit(0L)))
      .withColumn("cum_hazard",
        (round(sum(col("n_events").cast("double") / col("n_at_risk"))
          .over(upTo), 4) + lit(0.0)))
      .withColumn("fh_survival",
        (round(exp(-sum(col("n_events").cast("double") / col("n_at_risk"))
          .over(upTo)), 4) + lit(0.0)))
      .select(col("duration_day"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("cum_hazard"), col("fh_survival"))
  }

  /** Two-arm log-rank test (Mantel 1966): does survival differ between
    * user arms? Per event day j: observed arm-A events d_Aj vs
    * hypergeometric expectation n_Aj·d_j/n_j and variance
    * d_j(n_Aj/n_j)(1−n_Aj/n_j)(n_j−d_j)/(n_j−1); χ² = (O−E)²/V with
    * df=1, whose upper tail is EXACTLY 2·Φ̄(√χ²) — no approximation
    * beyond the shared normal polynomial. The corpus collapses to the
    * per-(arm, day) count frame; at-risk counts come from the same
    * cumulative windows as [[kaplanMeier]], partitioned per arm via
    * conditional sums over the day frame.
    */
  def logRank(events: DataFrame, startType: String, eventType: String,
      horizonDays: Int, armSeed: String): DataFrame = {
    val dur =
      survivalDurations(events, startType, eventType, horizonDays)
        .withColumn("__arm",
          pmod(TextOps.hash32(col("user_id").cast("string"), armSeed),
            lit(2)))
    val perDay = dur.groupBy(col("duration_day"))
      .agg(
        count(when(col("__event") && col("__arm") === 0, 1)).as("__da"),
        count(when(col("__event") && col("__arm") === 1, 1)).as("__db"),
        count(when(col("__arm") === 0, 1)).as("__ta"),
        count(when(col("__arm") === 1, 1)).as("__tb"))
    val total = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val phiU = { (z: Column) =>
      val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
      exp(-z * z / 2) / sqrt(lit(2.0 * math.Pi)) *
        (t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
          (lit(1.781477937) + t * (lit(-1.821255978) +
            t * lit(1.330274429))))))
    }
    perDay
      .withColumn("__na",
        sum(col("__ta")).over(total) -
          coalesce(sum(col("__ta")).over(before), lit(0L)))
      .withColumn("__nb",
        sum(col("__tb")).over(total) -
          coalesce(sum(col("__tb")).over(before), lit(0L)))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
      .filter(col("__d") > 0)
      .withColumn("__e",
        col("__na") * col("__d") / col("__n").cast("double"))
      .withColumn("__v", try_divide(
        col("__d") * (col("__na") / col("__n").cast("double")) *
          (lit(1.0) - col("__na") / col("__n").cast("double")) *
          (col("__n") - col("__d")),
        (col("__n") - 1).cast("double")))
      .agg(sum(col("__da")).as("observed_a"),
        sum(col("__db")).as("observed_b"),
        sum(col("__e")).as("__ea"), sum(col("__v")).as("__va"))
      .withColumn("__chi2", try_divide(
        (col("observed_a") - col("__ea")) *
          (col("observed_a") - col("__ea")), col("__va")))
      .withColumn("__p", lit(2.0) * phiU(sqrt(col("__chi2"))))
      .select(col("observed_a"), col("observed_b"),
        (round(col("__ea"), 4) + lit(0.0)).as("expected_a"),
        (round(col("__chi2"), 4) + lit(0.0)).as("chi2"),
        (round(col("__p"), 4) + lit(0.0)).as("p_value"),
        (col("__p") < 0.05).as("significant"))
  }

  /** CUSUM change-point detection over each event type's daily count
    * series: standardize the series against its own mean/stddev, then
    * the peak |cumulative sum| marks the most likely level-shift day
    * (the classic offline CUSUM statistic). Raw events collapse to
    * |types|×|days| rows in one map-side-combined aggregation; the
    * standardization and cumulative windows share one partitioning on
    * event_type over that days-sized frame, and the peak is a 6-dp-keyed
    * rank (day tiebreak) so float noise cannot flip the argmax.
    */
  def cusumChangePoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("__cnt"))
    val full = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rk = Window.partitionBy(col("event_type"))
      .orderBy((round(abs(col("__cusum")), 6) + lit(0.0)).desc, col("day"))
    daily
      .withColumn("__mean", avg(col("__cnt")).over(full))
      .withColumn("__sd", stddev_samp(col("__cnt")).over(full))
      .withColumn("__n_days", count(lit(1)).over(full))
      .withColumn("__cusum", // try_divide: constant series has sd 0
        sum(try_divide(col("__cnt") - col("__mean"), col("__sd")))
          .over(cum))
      .withColumn("__rn", row_number().over(rk))
      .filter(col("__rn") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("__n_days").as("n_days"),
        (round(col("__cusum"), 4) + lit(0.0)).as("peak_cusum"),
        (round(abs(col("__cusum")), 4) + lit(0.0)).as("peak_abs"))
  }

  /** Truncated-window EWMA smoothing of each event type's daily count
    * series: s_t = Σ_{j=0..w−1} b^j·x_{t−j} / Σ b^j over the trailing
    * `windowDays` calendar days (decay `b` per day; α = 1−b). The
    * textbook recursive EWMA is not expressible as a declarative plan,
    * and the closed-form b^{−i} window trick overflows doubles on long
    * series — the truncated form is both scale-safe and, for any real
    * decay, numerically identical (b^28 ≈ 5e−5 of the mass at b=0.7).
    *
    * Raw events collapse to the |types|×|days| daily frame in ONE
    * map-side-combined aggregation; the trailing window is a self-join
    * of that bounded summary on event_type with a calendar-day band, so
    * the quadratic term never touches raw data — the same
    * aggregate-then-window shape as [[cusumChangePoint]]. Days absent
    * from the series carry no weight (normalized mean over present
    * days), so gaps do not bias the level estimate toward zero.
    *
    * `b` is applied as a literal constant in both engines (PERF_NOTES
    * R4.6): weights are pow(b, integer-day-distance), bit-identical
    * across engines; the 4-dp round absorbs join-order sum noise.
    */
  def ewmaDaily(events: DataFrame, b: Double, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays " +
      "(a non-positive window would make the join band empty and " +
      "silently return zero rows)")
    require(b > 0.0, s"decay b must be > 0, got $b")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val hist = daily.select(col("event_type").as("__t"),
      col("day").as("__d"), col("cnt").as("__c"))
    daily.join(hist,
        col("event_type") === col("__t") && col("__d") <= col("day") &&
          col("__d") >= date_sub(col("day"), windowDays - 1))
      .withColumn("__w", pow(lit(b), datediff(col("day"), col("__d"))))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cnt")).as("cnt"),
        round(sum(col("__w") * col("__c")) / sum(col("__w")), 4)
          .as("ewma"))
  }
}
