package graft.queries

import graft.Tables
import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 temporal/CDC manifest (SURVEY.md §2.13 X50, X51, X53-X55):
  * the changelog-consumption operators a warehouse ingest layer runs —
  * point-in-time dimension joins, SCD1 merge upserts, transition mining,
  * interval concurrency, and idempotent window dedup. Each oracle-checked
  * against DuckDB.
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The "dimension changelog" slice of events: purchases and signups are
    * state changes; clicks/views/errors are facts against that state.
    */
  private val dimTypes = Seq("purchase", "signup")

  /** q120_pit_join — point-in-time (SCD2 interval) join: each fact event
    * picks up the dimension state valid AT its timestamp. Semantically
    * the interval predicate `f.ts >= valid_from AND (valid_to IS NULL OR
    * f.ts < valid_to)` over the SCD2 form of the changelog (q106); the
    * PLAN is `EventOps.asofJoin`'s union + single key shuffle + LOCF
    * window — no range theta-join (BNLJ at scale) anywhere. The DuckDB
    * oracle runs the explicit interval join, proving the equivalence.
    */
  def q120PitJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dim = ev.filter(col("event_type").isin(dimTypes: _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val fact = ev.filter(!col("event_type").isin(dimTypes: _*))
    EventOps.asofJoin(fact, dim, "user_id", "ts", Seq("event_id", "value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("asof_event_id")).as("n_matched"),
        round(sum(col("asof_value")), 2).as("state_sum"))
      .orderBy(col("user_id"))
  }

  private val mergeCutoff = "2024-01-16 00:00:00"

  /** q121_merge_upsert — SCD1 merge (`EventOps.mergeUpsert`): the latest
    * pre-cutoff state per user merged with post-cutoff updates; updates
    * win, unmatched keys survive from either side. Latest-per-key is an
    * argmax `max(struct(ts, seq, value))` hash aggregate — map-side
    * combining, no row_number sort — and the merge itself is a 1:1
    * full-outer join on the key.
    */
  def q121MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventOps.mergeUpsert(
      ev.filter(col("ts") < lit(mergeCutoff).cast("timestamp")),
      ev.filter(col("ts") >= lit(mergeCutoff).cast("timestamp")),
      "user_id", Seq("ts", "event_id"), "value")
      .select(col("user_id"), round(col("final_value"), 2).as("final_value"),
        col("src"))
      .orderBy(col("user_id"))
  }

  /** q122_event_bigrams — per-user transition counts
    * (`EventOps.transitionCounts`): how often event type `a` immediately
    * precedes `b` in a user's stream. One lead() window per user
    * partition; the |types|² count rollup map-side combines.
    */
  def q122EventBigrams(s: SparkSession, dir: String): DataFrame =
    EventOps.transitionCounts(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type"))

  /** q123_concurrency — peak concurrent 30-minute intervals per day
    * (`EventOps.maxConcurrency`): sweep-line over +1/−1 endpoints, with
    * the global running sum decomposed into parallel per-day windows plus
    * a days-sized carry-in — the only shape where the sweep survives
    * 100 TB (a single global ORDER BY dies).
    */
  def q123Concurrency(s: SparkSession, dir: String): DataFrame =
    EventOps.maxConcurrency(Tables.events(s, dir), durationMinutes = 30)
      .orderBy(col("day"))

  /** q124_window_dedup — idempotency pass over an at-least-once feed
    * (`EventOps.windowDedupStats`): repeats of (user, type) within each
    * tumbling hour collapse to their first occurrence via a
    * `min(struct)` aggregate (batch form of streaming
    * `dropDuplicatesWithinWatermark`); per-type keep rates fall out of
    * the same aggregation tree.
    */
  def q124WindowDedup(s: SparkSession, dir: String): DataFrame =
    EventOps.windowDedupStats(Tables.events(s, dir),
      "user_id", "event_type", "ts", "1 hour")
      .orderBy(col("event_type"))

  /** q150_rolling_median — exact rolling median of each user's last 7
    * event values (ROWS 6 PRECEDING..CURRENT, total (ts, event_id)
    * order). Spark has no exact percentile over a window; the
    * frame-bounded form is collect_list over the frame + array_sort +
    * the SAME two-term interpolation `StatOps.exactPercentiles` uses
    * (bit-identical to quantile_cont). Memory is bounded by the FRAME
    * (7 values), not the partition, so the shape survives any corpus —
    * contrast `percentile_cont OVER`, which engines implement with a
    * whole-partition buffer. One shuffle on user_id.
    */
  def q150RollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, 0)
    val sorted = array_sort(collect_list(col("value")).over(w))
    val m = size(sorted)
    val pos = (m - 1).cast("double") * 0.5
    // exactPercentiles' two-term weights: bit-identical to quantile_cont
    val med =
      element_at(sorted, (floor(pos) + 1).cast("int")) *
        ((floor(pos) + lit(1.0)) - pos) +
        element_at(sorted, (ceil(pos) + 1).cast("int")) * (pos - floor(pos))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n_frame", m.cast("long"))
      .withColumn("rolling_med", round(med, 4))
      .select(col("user_id"), col("event_id"), col("n_frame"),
        col("rolling_med"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q164_dow_profile — day-of-week seasonality profile: mean daily
    * event count per (type, weekday) — the baseline any anomaly/forecast
    * layer normalizes against. Raw events collapse to daily counts
    * first (one map-side-combined agg at data scale); the profile runs
    * over the types×days frame. Weekday is 0=Sunday..6 in both engines
    * (Spark `dayofweek` is 1-based, DuckDB `dow` 0-based).
    */
  def q164DowProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("dow", dayofweek(col("day")) - 1)
      .groupBy(col("event_type"), col("dow"))
      .agg(round(avg(col("__n")), 2).as("avg_events"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"), col("dow"))

  /** q165_autocorr — lag-1 / lag-7 autocorrelation of the daily count
    * series per event type: the cheap periodicity detector (a high ac7
    * says "weekly cycle") run before committing to seasonal models.
    * The window sees only the days-sized series; `corr` ignores the
    * lag's leading nulls in both engines.
    */
  def q165Autocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("lag1", lag(col("n"), 1).over(w))
      .withColumn("lag7", lag(col("n"), 7).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("n"), col("lag1")), 4).as("ac1"),
        round(corr(col("n"), col("lag7")), 4).as("ac7"))
      .orderBy(col("event_type"))
  }

  /** q170_compaction — tombstone-aware changelog compaction
    * (`EventOps.compact`): the event stream reduced to each user's
    * final state; a final `error` event is the delete marker, so the
    * flag tells the consumer which keys to drop. One argmax hash
    * aggregate (no per-key sort), then a types-sized rollup of the
    * compacted frame.
    */
  def q170Compaction(s: SparkSession, dir: String): DataFrame =
    EventOps.compact(Tables.events(s, dir), "user_id",
      Seq("ts", "event_id"), Seq("event_type", "value"),
      col("event_type") === "error")
      .groupBy(col("event_type").as("final_type"), col("is_tombstone"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("final_type"))

  /** q175_decayed_counts — exponentially time-decayed frequency: each
    * event weighted 2^(−age/7d) relative to the corpus's max timestamp
    * (in-plan scalar, no wall clock — deterministic across engines and
    * reruns). The recency-weighted popularity signal feature stores
    * serve; one scan + one types-sized aggregation at any scale.
    * Microsecond integer age arithmetic, so both engines raise the
    * same doubles.
    */
  def q175DecayedCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val ref = ev.agg(max(unix_micros(col("ts"))).as("__ref"))
    ev.select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("__us"))
      .crossJoin(broadcast(ref))
      .withColumn("__w",
        pow(lit(0.5),
          (col("__ref") - col("__us")).cast("double") / (7.0 * 86400e6)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__w")), 4).as("decayed_count"),
        round(sum(col("__w") * col("value")), 2).as("decayed_value"))
      .orderBy(col("event_type"))
  }

  /** q179_attribution — bounded last-touch attribution: each purchase
    * credits the user's most recent click no older than 30 minutes.
    * The as-of machinery (`EventOps.asofJoin`: union + ONE key shuffle
    * + LOCF window — no range theta-join) attaches the click; the
    * bound is a post-filter on the µs gap. DuckDB's native
    * ASOF LEFT JOIN replays it.
    */
  def q179Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    EventOps.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("event_id", "ts"))
      .withColumn("__attr",
        col("asof_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("asof_ts")) <=
            30L * 60 * 1000000)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(when(col("__attr"), 1)).as("n_attributed"),
        round(sum(when(col("__attr"), col("value"))), 2)
          .as("attributed_value"))
      .orderBy(col("user_id"))
  }

  /** q188_time_range_frame — event-time RANGE window: each event's
    * trailing-1-hour count and value sum for its user, as a
    * value-based frame over epoch-µs (`rangeBetween(-3600e6, 0)`, both
    * bounds inclusive in both engines). The VALUE-based frame is the
    * correct semantics for irregular event spacing — a ROWS frame
    * (q150) counts rows, not time. Restricted to users 0-9 to bound
    * the verify output.
    */
  def q188TimeRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-3600L * 1000000, 0)
    Tables.events(s, dir)
      .filter(col("user_id") < 10)
      .withColumn("__us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        (round(sum(col("value")).over(w), 2) + lit(0.0)).as("value_last_hour"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q197_mad_anomaly — robust day-level anomaly detection on revenue:
    * median + MAD via the built-in EXACT `percentile` aggregate
    * (continuous interpolation — bit-identical to the oracle's
    * quantile_cont AND to StatOps.exactPercentiles, which exists for
    * the few-groups × UNBOUNDED-rows regime; here the raw table
    * reduces to ~|days| rows in one aggregation first, and on a
    * day-bounded frame the built-in is exact, memory-safe, and one
    * job instead of a 3-pass selection — was 3.2 s of pure pass
    * overhead at sf0.1, PERF_NOTES R8.5) with the 1.4826
    * normal-consistency factor; days with robust-z > 3 surface. The
    * robust fence survives the outliers that would inflate a
    * mean/stddev fence (q102's percentile-fence sibling on the time
    * axis). The two 1-row fence frames broadcast.
    */
  def q197MadAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice")).as("__total"))
      .localCheckpoint() // median agg + dev scan reread the day frame
    val med = daily.agg(
      expr("percentile(__total, 0.5)").as("med"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col("__total") - col("med")))
    val mad = dev.agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("robust_z", // try_divide: constant series has MAD 0
        try_divide(col("__dev"), lit(1.4826) * col("mad")))
      .filter(col("robust_z") > 3.0)
      .select(col("day"), (round(col("__total"), 2) + lit(0.0)).as("daily_total"),
        (round(col("robust_z"), 4) + lit(0.0)).as("robust_z"))
      .orderBy(col("day"))
  }

  /** q204_kaplan_meier — survival analysis of the signup→purchase
    * funnel (`EventOps.kaplanMeier`): days from each user's first signup
    * to their first subsequent purchase, right-censored at a 3-day
    * conversion window (or the corpus end, whichever is earlier). The
    * product-limit estimator runs over the horizon-sized duration frame
    * after the stream collapses to one row per user — time-to-event
    * analytics (activation latency, churn) with a plan bounded by the
    * horizon, not the corpus.
    */
  def q204KaplanMeier(s: SparkSession, dir: String): DataFrame =
    EventOps.kaplanMeier(Tables.events(s, dir), "signup", "purchase",
      horizonDays = 3)
      .orderBy(col("duration_day"))

  /** q411_rmst — restricted mean survival time over q204's
    * Kaplan–Meier curve: RMST(τ=3d) = ∫₀^τ S(t)dt, the area under
    * the step survival function — "expected conversion-free days
    * within the window", the single-number summary regulators and
    * experimenters prefer over median survival because it is defined
    * even when S never crosses 0.5 and it weights the WHOLE curve
    * (two arms with equal medians but different tails get different
    * RMSTs). Computed as Σ S(tᵢ)·(min(tᵢ₊₁,τ) − tᵢ) plus the S=1
    * head segment [0, t₁) — a lead window and one sum over the
    * horizon-bounded KM frame, so the add-on cost over q204 is O(τ).
    */
  def q411Rmst(s: SparkSession, dir: String): DataFrame = {
    val tau = 3.0
    val km = EventOps.kaplanMeier(Tables.events(s, dir), "signup",
      "purchase", horizonDays = 3)
    val w = Window.orderBy(col("duration_day")) // horizon-sized frame
    val seg = km
      .withColumn("__next", coalesce(
        lead(col("duration_day"), 1).over(w).cast("double"), lit(tau)))
      .withColumn("__seg", greatest(lit(0.0),
        least(col("__next"), lit(tau)) -
          least(col("duration_day").cast("double"), lit(tau))))
      .agg(sum(col("survival") * col("__seg")).as("__area"),
        min(col("duration_day")).cast("double").as("__t0"),
        sum(col("n_events") + col("n_censored")).as("n_subjects"))
    seg.select(col("n_subjects"),
      (round(least(col("__t0"), lit(tau)) + col("__area"), 4) + lit(0.0))
        .as("rmst_days"),
      lit(3).as("tau_days"))
  }

  /** q414_competing_risks — Aalen–Johansen cumulative incidence for
    * COMPETING outcomes after signup: first purchase vs first error
    * within the 3-day window, whichever strikes first (simultaneous
    * strikes resolve to purchase — a pinned, engine-identical rule).
    * CIF_k(t) = Σ_{j≤t} S(t_{j−1})·d_kj/n_j with S the ALL-CAUSE KM —
    * the estimator 1−KM_k gets WRONG under competing risks (it treats
    * the other event as censoring and overstates both incidences;
    * the CIFs here sum to ≤ 1 by construction). Corpus → per-user
    * first-event frame in three aggregations; every window runs on
    * the horizon-bounded day frame. The d/n divisions are structurally
    * safe: a day row exists only because ≥1 subject exits there, so
    * its n_at_risk ≥ 1.
    */
  def q414CompetingRisks(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables.events(s, dir)
    val starts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__t0"))
    def firstAfter(t: String, out: String): DataFrame =
      starts.join(ev.filter(col("event_type") === t)
          .select(col("user_id"), unix_micros(col("ts")).as("__te")),
        Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(min(when(col("__te") >= col("__t0"), col("__te"))).as(out))
    val corpusEnd = ev.agg(max(unix_micros(col("ts"))).as("__tmax"))
    val dur = starts
      .join(firstAfter("purchase", "__tp"), Seq("user_id"))
      .join(firstAfter("error", "__terr"), Seq("user_id"))
      .crossJoin(broadcast(corpusEnd))
      .withColumn("__cut",
        least(col("__tmax"), col("__t0") + lit(3 * dayUs)))
      .withColumn("__vp", when(col("__tp") <= col("__cut"), col("__tp")))
      .withColumn("__ve",
        when(col("__terr") <= col("__cut"), col("__terr")))
      .withColumn("__cause",
        when(col("__vp").isNotNull &&
          (col("__ve").isNull || col("__vp") <= col("__ve")),
          lit("purchase"))
          .when(col("__ve").isNotNull, lit("error"))
          .otherwise(lit("censored")))
      .select(col("__cause"),
        floor((when(col("__cause") === "purchase", col("__vp"))
          .when(col("__cause") === "error", col("__ve"))
          .otherwise(col("__cut")) - col("__t0")) / lit(dayUs))
          .as("duration_day"))
    val perDay = dur.groupBy(col("duration_day"))
      .agg(count(when(col("__cause") === "purchase", 1))
        .as("d_purchase"),
        count(when(col("__cause") === "error", 1)).as("d_error"),
        count(when(col("__cause") === "censored", 1)).as("n_censored"))
    val total = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val upTo = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("__all",
        col("d_purchase") + col("d_error") + col("n_censored"))
      .withColumn("n_at_risk", sum(col("__all")).over(total) -
        coalesce(sum(col("__all")).over(before), lit(0L)))
      .withColumn("__sprev", exp(coalesce(
        sum(when(col("d_purchase") + col("d_error") < col("n_at_risk"),
          log(lit(1.0) -
            (col("d_purchase") + col("d_error")).cast("double") /
              col("n_at_risk"))).otherwise(lit(0.0))).over(before),
        lit(0.0))))
      .withColumn("cif_purchase", sum(col("__sprev") *
        col("d_purchase").cast("double") / col("n_at_risk")).over(upTo))
      .withColumn("cif_error", sum(col("__sprev") *
        col("d_error").cast("double") / col("n_at_risk")).over(upTo))
      .select(col("duration_day"), col("n_at_risk"), col("d_purchase"),
        col("d_error"), col("n_censored"),
        (round(col("cif_purchase"), 4) + lit(0.0)).as("cif_purchase"),
        (round(col("cif_error"), 4) + lit(0.0)).as("cif_error"))
      .orderBy(col("duration_day"))
  }

  /** q416_hurst — rescaled-range (R/S) Hurst exponent of each type's
    * daily count series: for window sizes w ∈ {5, 10, 20}, complete
    * blocks of w days yield R = range of within-block cumulative
    * deviations and S = population σ; H is the least-squares slope of
    * ln(avg R/S) on ln(w). H ≈ 0.5 says the series is memoryless,
    * H > 0.5 long-range persistent (trends compound — q209/q372
    * smoothing will lag), H < 0.5 anti-persistent (mean-reverting) —
    * the LONG-memory diagnostic q165's fixed-lag ACF and q404's runs
    * test cannot see. One corpus aggregation → day frame; the 3-way
    * window-size explode, block windows, and 3-point regression all
    * run on bounded frames.
    */
  def q416Hurst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("__day"))
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as("__x"))
      .withColumn("__rn", row_number().over(w))
    val sized = daily
      .withColumn("__w", explode(array(lit(5), lit(10), lit(20))))
      .withColumn("__blk", floor((col("__rn") - 1) / col("__w")))
    val wb = Window.partitionBy(col("event_type"), col("__w"),
      col("__blk"))
    val wbOrd = wb.orderBy(col("__rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBlock = sized
      .withColumn("__bn", count(lit(1)).over(wb))
      .filter(col("__bn") === col("__w"))
      .withColumn("__mu", avg(col("__x")).over(wb))
      .withColumn("__z", sum(col("__x") - col("__mu")).over(wbOrd))
      .groupBy(col("event_type"), col("__w"), col("__blk"))
      .agg(max(col("__z")).as("__zmax"), min(col("__z")).as("__zmin"),
        sqrt(avg((col("__x") - col("__mu")) *
          (col("__x") - col("__mu")))).as("__s"))
      .withColumn("__rs",
        try_divide(col("__zmax") - col("__zmin"), col("__s")))
    val perW = perBlock.groupBy(col("event_type"), col("__w"))
      .agg(avg(col("__rs")).as("__avg_rs"))
    val fit = perW.filter(col("__avg_rs") > 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("__k"),
        sum(log(col("__w"))).as("__sx"),
        sum(log(col("__avg_rs"))).as("__sy"),
        sum(log(col("__w")) * log(col("__avg_rs"))).as("__sxy"),
        sum(log(col("__w")) * log(col("__w"))).as("__sxx"))
      .select(col("event_type"),
        (round(try_divide(
          col("__k") * col("__sxy") - col("__sx") * col("__sy"),
          col("__k") * col("__sxx") - col("__sx") * col("__sx")), 4) + lit(0.0))
          .as("hurst"))
    val wide = perW.groupBy(col("event_type"))
      .agg((round(max(when(col("__w") === 5, col("__avg_rs"))), 4) + lit(0.0))
        .as("rs_w5"),
        (round(max(when(col("__w") === 10, col("__avg_rs"))), 4) + lit(0.0))
          .as("rs_w10"),
        (round(max(when(col("__w") === 20, col("__avg_rs"))), 4) + lit(0.0))
          .as("rs_w20"))
    wide.join(fit, Seq("event_type")).orderBy(col("event_type"))
  }

  /** q322_log_rank — two-arm log-rank survival comparison
    * (`EventOps.logRank`): does signup→purchase time-to-event differ
    * between a deterministic hash split of users? The clinical-trial
    * standard for censored A/B outcomes (retention, conversion-time
    * experiments) where a means test on durations is wrong because
    * censoring is informative. Corpus → per-(arm, day) counts; the
    * hypergeometric E/V sums run over the ≤ horizon-day frame; χ²
    * df=1 upper tail is exactly 2·Φ̄(√χ²) through the shared
    * polynomial.
    */
  def q322LogRank(s: SparkSession, dir: String): DataFrame =
    EventOps.logRank(Tables.events(s, dir), "signup", "purchase",
      horizonDays = 3, armSeed = "lr:")

  /** q323_nelson_aalen — Nelson–Aalen cumulative hazard and the
    * Fleming–Harrington survival exp(−H) (`EventOps.nelsonAalen`) on
    * the same signup→purchase cohort as q204: the additive dual of
    * Kaplan–Meier, preferred at small risk sets and as the baseline
    * hazard a Cox-style model consumes. Same one-pass day frame and
    * at-risk windows as q204.
    */
  def q323NelsonAalen(s: SparkSession, dir: String): DataFrame =
    EventOps.nelsonAalen(Tables.events(s, dir), "signup", "purchase",
      horizonDays = 3)
      .orderBy(col("duration_day"))

  /** q372_holt_smoothing — Holt's linear (double-exponential)
    * smoothing of each type's daily count series: level
    * lₜ = αyₜ + (1−α)(lₜ₋₁+tₜ₋₁) and trend tₜ = β(lₜ−lₜ₋₁) +
    * (1−β)tₜ₋₁ (α=0.5, β=0.3, init l₁=y₁, t₁=0), plus the h=3-day
    * forecast l+3t — the EWMA (q209) upgraded with a trend state,
    * which a one-pass window cannot express because the recursion is
    * 2-dimensional. It runs instead as `aggregate` (fold) over the
    * BOUNDED ordered daily array (sort_array of (day, y) structs —
    * horizon-sized by construction, q310's bounded-frame contract),
    * with the identical step replayed by a DuckDB RECURSIVE CTE over
    * the indexed daily frame: same per-step expression tree, same
    * IEEE doubles, hash-exact. (DuckDB's list_reduce was tried and
    * rejected: with a struct accumulator its second field evaluates
    * against a partially-updated acc — a genuine engine bug this
    * oracle routes around.) Corpus cost is the one daily aggregation;
    * the fold is |days| flops per type.
    */
  def q372HoltSmoothing(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, n))), " +
          "x -> x.n)").as("__ys"))
      .withColumn("__h", expr(
        """aggregate(slice(__ys, 2, size(__ys) - 1),
          |  named_struct('l', __ys[0], 't', cast(0.0 as double)),
          |  (acc, y) -> named_struct(
          |    'l', 0.5 * y + 0.5 * (acc.l + acc.t),
          |    't', 0.3 * ((0.5 * y + 0.5 * (acc.l + acc.t)) - acc.l)
          |         + 0.7 * acc.t))""".stripMargin))
      .select(col("event_type"), col("n_days"),
        round(col("__h.l"), 4).as("level"),
        round(col("__h.t"), 4).as("trend"),
        round(col("__h.l") + lit(3.0) * col("__h.t"), 4).as("forecast_3d"))
      .orderBy(col("event_type"))
  }

  /** q376_mase — scaled forecast-accuracy evaluation (Hyndman &
    * Koehler 2006's MASE shape) on each type's daily count series:
    * the lag-1 naive forecaster's MAE scaled by the weekly
    * seasonal-naive (lag-7) MAE — the scale-free skill score that
    * compares forecasters across series of wildly different volume
    * (where raw MAE/RMSE can't), and the standard gate before
    * promoting any fancier model (q372's Holt) into a forecasting
    * pipeline: MASE < 1 ⇔ you beat the seasonal baseline. Two lag
    * windows per type over the horizon-bounded daily frame + one
    * aggregation; degenerate series (no lag-7 pairs, or a constant
    * series with zero seasonal error) null out via try_divide in both
    * engines.
    */
  def q376Mase(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("__l1", lag(col("n"), 1).over(w))
      .withColumn("__l7", lag(col("n"), 7).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        avg(abs(col("n") - col("__l1"))).as("__mae1"),
        avg(abs(col("n") - col("__l7"))).as("__mae7"))
      .select(col("event_type"), col("n_days"),
        (round(col("__mae1"), 4) + lit(0.0)).as("mae_naive1"),
        (round(col("__mae7"), 4) + lit(0.0)).as("mae_seasonal7"),
        (round(try_divide(col("__mae1"), col("__mae7")), 4) + lit(0.0)).as("mase"))
      .orderBy(col("event_type"))
  }

  /** q358_cox_score — Cox proportional-hazards score test at β = 0
    * (the efficient-score / Rao form, Breslow tie handling) for the
    * signup→purchase cohort with the user's click count as the single
    * covariate: U = Σ_days [Σx_deaths − d·S1/S0] and
    * V = Σ_days d·(S2/S0 − (S1/S0)²), where S0/S1/S2 are the size and
    * first two covariate moments of the RISK SET {duration ≥ t} —
    * exactly the log-rank (q322) generalized from a binary arm to a
    * continuous covariate, and the test a full Cox fit's first Newton
    * iteration reduces to. Corpus → per-user durations (q204's one
    * pass) → per-day moment frame; the risk-set sums are one
    * reverse-cumulative window over the ≤ horizon-sized day frame, so
    * everything after the user collapse is horizon-bounded arithmetic.
    */
  def q358CoxScore(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val dur = EventOps.survivalDurations(ev, "signup", "purchase",
      horizonDays = 3)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("__x"))
    val d = dur.join(clicks, Seq("user_id"), "left")
      .withColumn("__x", coalesce(col("__x"), lit(0.0)))
    val perDay = d.groupBy(col("duration_day"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        count(when(col("__event"), 1)).as("__d"),
        sum(when(col("__event"), col("__x")).otherwise(lit(0.0)))
          .as("__dx"))
    // risk set at day t = everyone still uncensored then: one reverse
    // cumulative over the horizon-sized day frame (bounded window)
    val w = Window.orderBy(col("duration_day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val k = perDay
      .withColumn("__S0", sum(col("__n")).over(w).cast("double"))
      .withColumn("__S1", sum(col("__sx")).over(w))
      .withColumn("__S2", sum(col("__sxx")).over(w))
      .filter(col("__d") > 0)
    val stats = k.agg(sum(col("__d")).as("n_deaths"),
      sum(col("__dx") - col("__d") * col("__S1") / col("__S0"))
        .as("__u"),
      sum(col("__d") * (col("__S2") / col("__S0") -
        pow(col("__S1") / col("__S0"), 2))).as("__v"))
    d.agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(stats))
      .select(col("n_users"), col("n_deaths"),
        (round(col("__u"), 4) + lit(0.0)).as("score_u"),
        (round(col("__v"), 4) + lit(0.0)).as("score_var"),
        (round(try_divide(col("__u"), sqrt(col("__v"))), 4) + lit(0.0)).as("z"),
        (abs(try_divide(col("__u"), sqrt(col("__v")))) > 1.96)
          .as("significant"))
  }

  /** q206_cusum — CUSUM change-point detection on each event type's
    * daily count series (`EventOps.cusumChangePoint`): the peak
    * |cumulative standardized deviation| marks the most likely
    * level-shift day. The monitoring primitive behind data-freshness /
    * volume alerts; one daily aggregation at data scale, windows over
    * the days-sized series only.
    */
  def q206Cusum(s: SparkSession, dir: String): DataFrame =
    EventOps.cusumChangePoint(Tables.events(s, dir))
      .orderBy(col("event_type"))

  /** q233_backtest_folds — rolling-origin (expanding-window) backtest
    * assignment: K=3 temporal folds, each training on everything
    * before its cutoff day and testing on the following 5-day horizon
    * — the leakage-safe alternative to random K-fold for any temporal
    * model (q153's target encoding, q183's scoring). Pure projection
    * against broadcast literal cutoffs (the corpus min-day anchors
    * them), so assignment is scan-stage at any scale; the census
    * proves folds nest (train_n grows with k) and horizons are
    * disjoint from their train sets.
    */
  def q233BacktestFolds(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("day", to_date(col("ts")))
    val anchor = e.agg(min(col("day")).as("__d0"))
    val folds = Seq(1, 2, 3)
    val tagged = e.crossJoin(broadcast(anchor))
      .select(col("day"), col("__d0"),
        explode(array(folds.map(lit): _*)).as("fold"))
      .withColumn("__cut", expr("date_add(__d0, fold * 7)"))
      .withColumn("part",
        when(col("day") < col("__cut"), "train")
          .when(col("day") < expr("date_add(__cut, 5)"), "test"))
      .filter(col("part").isNotNull)
    tagged.groupBy(col("fold"), col("part"))
      .agg(count(lit(1)).as("n_events"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .orderBy(col("fold"), col("part"))
  }

  /** q230_time_weighted_mean — duration-weighted mean value per user
    * (the TWAP shape): each event's value holds until the user's next
    * event, so the mean weights each value by how long it was held —
    * the correct aggregate for any sampled-state series (price, queue
    * depth, battery level), where the arithmetic mean over-counts
    * bursts. One lead() window per user + one aggregation; the last
    * event has no successor and carries zero weight, users with a
    * single event fall out (no held interval).
    */
  def q230TimeWeightedMean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("__next", lead(unix_micros(col("ts")), 1).over(w))
      .withColumn("__dur",
        (col("__next") - unix_micros(col("ts"))).cast("double"))
      .filter(col("__dur").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        round(sum(col("__dur")) / 1e6, 1).as("span_sec"),
        // try_divide: a user whose held intervals all have zero
        // duration (events sharing one microsecond) has sum(__dur)=0 —
        // null tw_mean instead of an ANSI DIVIDE_BY_ZERO crash
        round(try_divide(sum(col("value") * col("__dur")),
          sum(col("__dur"))), 2).as("tw_mean"),
        round(avg(col("value")), 2).as("plain_mean"))
      .orderBy(col("user_id"))
  }

  /** q231_burstiness — inter-arrival-time dispersion per event type:
    * mean/sd of the gaps and the Goh–Barabási burstiness
    * B = (σ−μ)/(σ+μ) ∈ (−1, 1): 0 for a Poisson stream, → 1 for
    * bursty traffic, < 0 for pacemaker-regular. The operational
    * signature that distinguishes organic activity from batch/bot
    * injection. One lag() window over (type, time)-sorted events +
    * one aggregation.
    */
  def q231Burstiness(s: SparkSession, dir: String): DataFrame = {
    // per-type inter-arrival gaps over RAW events: ~5 partition keys,
    // each holding n/5 rows in one task under a plain window — the
    // round-10 grouped single-task trap. shardedRank totally orders
    // each type by (event-time µs, event_id); the lag() predecessor is
    // the rank−1 row via an ordinary distributed equi-join (the inner
    // join drops each type's first event exactly as lag()'s null did).
    val e = Tables.events(s, dir)
      .withColumn("__us", unix_micros(col("ts")))
    // checkpoint: `ranked` feeds BOTH sides of the self-join — without
    // it the fence join + rank window re-run for each side (R5.2)
    val ranked = graft.ops.StatOps.shardedRank(
      e, "event_type", "__us", "event_id", "__rk")
      .localCheckpoint()
    val prev = ranked.select(col("event_type"),
      (col("__rk") + 1).as("__rk"), col("__us").as("__usp"))
    ranked.join(prev, Seq("event_type", "__rk"))
      .withColumn("__gap",
        (col("__us") - col("__usp")).cast("double") / 1e6)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("__gap")), 2).as("mean_gap_sec"),
        round(stddev_samp(col("__gap")), 2).as("sd_gap_sec"),
        // try_divide: sd + mean = 0 when every gap of a type is zero
        // (all events on one microsecond) — null burstiness, no ANSI
        // DIVIDE_BY_ZERO
        (round(try_divide(
          stddev_samp(col("__gap")) - avg(col("__gap")),
          stddev_samp(col("__gap")) + avg(col("__gap"))), 4) + lit(0.0))
          .as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** q224_mann_kendall — distribution-free monotonic-trend test on
    * each type's daily count series (`ModelEvalOps.mannKendall`):
    * tie-corrected S/z with a ±1.96 trend verdict — the significance
    * companion to q223's Theil–Sen slope. Bounded pair fan-out over
    * the daily frame only.
    */
  def q224MannKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01")))
    graft.ops.ModelEvalOps.mannKendall(daily, "event_type", "x", "n_events")
      .orderBy(col("event_type"))
  }

  /** q223_theil_sen — robust daily-count trend per event type
    * (`ModelEvalOps.theilSen`): median-of-pairwise-slopes, immune to
    * the outlier days that bend an OLS line (contrast q189). Raw
    * events collapse to the |types|×|days| frame first, so the O(n²)
    * pair fan-out is ~days²/2 per type — bounded by the horizon, not
    * the corpus; the medians use the built-in percentile aggregate,
    * which is the right tool for bounded groups (see
    * `ModelEvalOps.theilSen`).
    */
  def q223TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01")))
    graft.ops.ModelEvalOps.theilSen(daily, "event_type", "x", "n_events")
      .orderBy(col("event_type"))
  }

  /** q217_seasonal_anomaly — day-of-week-adjusted volume anomaly: each
    * (type, day) count is standardized against ITS OWN weekday's
    * mean/sd (q164's seasonality profile as windows over the bounded
    * daily frame), so a quiet Sunday isn't flagged for being quieter
    * than Tuesday. Emits days with |z| > 1.5 — the "volume looks wrong
    * for a Tuesday" alert, the seasonal refinement of q197's global
    * MAD fence. Raw events collapse to |types|×|days| in one agg;
    * everything after is window arithmetic on that summary.
    */
  def q217SeasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", dayofweek(col("day")) - 1)
    val w = Window.partitionBy(col("event_type"), col("dow"))
    daily
      .withColumn("__m", avg(col("n_events")).over(w))
      .withColumn("__sd", stddev_samp(col("n_events")).over(w))
      // try_divide, not `/`: a (type, dow) class whose daily counts are
      // all identical has __sd = 0.0, and ANSI `/` would throw
      // DIVIDE_BY_ZERO; the null z is dropped by the |z| filter below,
      // matching the oracle where the constant-class 0/0 is dropped too
      .withColumn("z", try_divide(col("n_events") - col("__m"), col("__sd")))
      .filter(abs(col("z")) > 1.5)
      .select(col("event_type"), col("day"), col("dow"), col("n_events"),
        (round(col("__m"), 2) + lit(0.0)).as("dow_mean"), (round(col("z"), 4) + lit(0.0)).as("z"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q215_rfm_features — the classic per-user RFM feature vector
    * (recency / frequency / monetary, plus engagement breadth) from
    * ONE aggregation over raw events: days since last activity vs the
    * corpus horizon, event count, summed value, distinct types and
    * active days. The feature-engineering pass a churn/LTV model
    * consumes; |users| output rows, every aggregate map-side-combined.
    * The two distinct counts use `collect_set` over BOUNDED domains
    * (|types|, |days| — partial buffers dedup map-side) instead of
    * `count_distinct`: two distinct aggregates in one groupBy would
    * otherwise Expand the raw scan 3×, tripling the shuffle of the
    * unbounded event stream.
    */
  def q215RfmFeatures(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val horizon = e.agg(max(to_date(col("ts"))).as("__maxd"))
    e.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col("value")), 2).as("monetary"),
        size(collect_set(col("event_type"))).cast("long").as("n_types"),
        size(collect_set(to_date(col("ts")))).cast("long")
          .as("active_days"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"),
        datediff(col("__maxd"), col("__last")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary"), col("n_types"),
        col("active_days"))
      .orderBy(col("user_id"))
  }

  /** q211_rollup_merge — incremental pre-aggregate maintenance
    * (`StatOps.dailyState` → `StatOps.rollupMerge`): raw events
    * collapse once to per-(type, day) algebraic state (count/sum/min/
    * max), and the monthly rollup is a MERGE of that bounded frame —
    * sums add, mins min, averages re-derive as sum/count. The oracle
    * computes the monthly numbers directly from raw data, so the hash
    * check proves the merge identity the whole pattern rests on: at
    * 100 TB only the current day is ever recomputed; history rolls up
    * from |days| rows of state.
    */
  def q211RollupMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.StatOps
    val daily = StatOps.dailyState(Tables.events(s, dir),
      Seq(col("event_type"), to_date(col("ts")).as("day")), "value")
    StatOps.rollupMerge(
        daily.withColumn("month",
          date_trunc("month", col("day")).cast("date")),
        Seq("event_type", "month"))
      .select(col("event_type"), col("month"),
        col("cnt").as("n_events"),
        round(col("sum_v"), 2).as("total_value"),
        round(col("min_v"), 4).as("min_value"),
        round(col("max_v"), 4).as("max_value"),
        round(col("sum_v") / col("cnt"), 4).as("avg_value"))
      .orderBy(col("event_type"), col("month"))
  }

  /** q209_ewma_daily — truncated-window EWMA smoothing of each event
    * type's daily count series (`EventOps.ewmaDaily`, b=0.7, 28-day
    * window): the trend line a volume monitor draws under the raw
    * counts. Raw events collapse to the |types|×|days| daily frame in
    * ONE aggregation; the trailing-window self-join runs over that
    * bounded summary only, never raw data.
    */
  def q209EwmaDaily(s: SparkSession, dir: String): DataFrame =
    EventOps.ewmaDaily(Tables.events(s, dir), b = 0.7, windowDays = 28)
      .orderBy(col("event_type"), col("day"))


  /** q386_interval_arith — ANSI day-time INTERVAL arithmetic as a
    * first-class surface (SPARK-27790): timestamp SUBTRACTION yields a
    * typed `INTERVAL DAY TO SECOND` (not a bare double), intervals
    * order/aggregate natively (min/max), and CAST to BIGINT converts to
    * total seconds — the ship-lag readout (l_shipdate − o_orderdate per
    * priority) expressed in the type system the SQL standard intends,
    * so unit errors (ms vs s vs days) are compile-time impossible. The
    * oracle replays via DuckDB's interval epoch(). Join shuffles on the
    * order key once; everything after is a bounded per-priority frame.
    */
  def q386IntervalArith(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        (col("l_shipdate") - col("o_orderdate")).as("__lag"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("__lag")).cast("long").as("min_lag_s"),
        max(col("__lag")).cast("long").as("max_lag_s"),
        round(avg(col("__lag").cast("long")), 2).as("avg_lag_s"))
      .orderBy(col("o_orderpriority"))


  /** q393_holt_winters — Holt–Winters ADDITIVE SEASONAL smoothing
    * (period 7) of each type's daily counts: the third member of the
    * exponential family — q209's EWMA tracks level, q372's Holt adds
    * trend, this adds the weekly seasonal state s[0..6] that both of
    * them alias into level/trend error: l_t = α(y_t − s_{t−7}) +
    * (1−α)(l_{t−1}+b_{t−1}), b_t = β·Δl + (1−β)b_{t−1}, s_t =
    * γ(y_t − l_t) + (1−γ)s_{t−7}; initialized from the first week
    * (l₀ = its mean, s = deviations). The inherently sequential
    * recursion folds over the BOUNDED ordered day array per type via
    * `aggregate` (q372's pattern — per-series state, no corpus-wide
    * sort), carrying the 7-slot seasonal ring in the accumulator
    * struct; the oracle replays it with a recursive CTE. Series with
    * under 8 days are excluded (no seasonal cycle to fit).
    */
  def q393HoltWinters(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, n))), " +
          "x -> x.n)").as("__ys"))
      .filter(col("n_days") >= 8)
      .withColumn("__l0", expr(
        "aggregate(slice(__ys, 1, 7), cast(0.0 as double), " +
          "(a, x) -> a + x) / 7.0"))
      .withColumn("__h", expr(
        """aggregate(slice(__ys, 8, size(__ys) - 7),
          |  named_struct('l', __l0, 'b', cast(0.0 as double),
          |    's', transform(slice(__ys, 1, 7), y -> y - __l0)),
          |  (acc, y) -> named_struct(
          |    'l', 0.3 * (y - acc.s[0]) + 0.7 * (acc.l + acc.b),
          |    'b', 0.2 * ((0.3 * (y - acc.s[0]) + 0.7 * (acc.l + acc.b))
          |         - acc.l) + 0.8 * acc.b,
          |    's', concat(slice(acc.s, 2, 6), array(
          |      0.4 * (y - (0.3 * (y - acc.s[0]) + 0.7 * (acc.l + acc.b)))
          |      + 0.6 * acc.s[0]))))""".stripMargin))
      .select(col("event_type"), col("n_days"),
        round(col("__h.l"), 4).as("level"),
        round(col("__h.b"), 4).as("trend"),
        round(col("__h.s")(0), 4).as("next_seasonal"),
        round(col("__h.l") + col("__h.b") + col("__h.s")(0), 4)
          .as("forecast_1d"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q393_holt_winters" -> (q393HoltWinters _),
    "q386_interval_arith" -> (q386IntervalArith _),
    "q223_theil_sen" -> (q223TheilSen _),
    "q224_mann_kendall" -> (q224MannKendall _),
    "q230_time_weighted_mean" -> (q230TimeWeightedMean _),
    "q231_burstiness" -> (q231Burstiness _),
    "q233_backtest_folds" -> (q233BacktestFolds _),
    "q217_seasonal_anomaly" -> (q217SeasonalAnomaly _),
    "q215_rfm_features" -> (q215RfmFeatures _),
    "q211_rollup_merge" -> (q211RollupMerge _),
    "q209_ewma_daily" -> (q209EwmaDaily _),
    "q204_kaplan_meier" -> (q204KaplanMeier _),
    "q411_rmst" -> (q411Rmst _),
    "q414_competing_risks" -> (q414CompetingRisks _),
    "q416_hurst" -> (q416Hurst _),
    "q322_log_rank" -> (q322LogRank _),
    "q323_nelson_aalen" -> (q323NelsonAalen _),
    "q358_cox_score" -> (q358CoxScore _),
    "q372_holt_smoothing" -> (q372HoltSmoothing _),
    "q376_mase" -> (q376Mase _),
    "q206_cusum" -> (q206Cusum _),
    "q197_mad_anomaly" -> (q197MadAnomaly _),
    "q188_time_range_frame" -> (q188TimeRangeFrame _),
    "q179_attribution" -> (q179Attribution _),
    "q175_decayed_counts" -> (q175DecayedCounts _),
    "q170_compaction" -> (q170Compaction _),
    "q164_dow_profile" -> (q164DowProfile _),
    "q165_autocorr" -> (q165Autocorr _),
    "q150_rolling_median" -> (q150RollingMedian _),
    "q120_pit_join" -> (q120PitJoin _),
    "q121_merge_upsert" -> (q121MergeUpsert _),
    "q122_event_bigrams" -> (q122EventBigrams _),
    "q123_concurrency" -> (q123Concurrency _),
    "q124_window_dedup" -> (q124WindowDedup _),
  )

  private val dimTypesSql = dimTypes.map(t => s"'$t'").mkString(", ")

  // Zelen–Severo 26.2.17 upper-tail normal CDF (z >= 0) — the shared
  // engine-portable polynomial (cf. ExperimentQueries/StatQueries)
  private def phiUpperSqlT(z: String): String =
    s"""(exp(-($z) * ($z) / 2) / sqrt(2.0 * pi()) *
       |  ((1.0 / (1.0 + 0.2316419 * ($z))) * (0.319381530 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-0.356563782 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (1.781477937 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-1.821255978 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * 1.330274429))))))"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "q393_holt_winters" ->
      """WITH RECURSIVE d0 AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, n, row_number() OVER (
        |    PARTITION BY event_type ORDER BY day) AS idx FROM d0),
        |nd AS (SELECT event_type, count(*)::BIGINT AS n_days FROM d
        |  GROUP BY 1 HAVING count(*) >= 8),
        |w1 AS (SELECT d.event_type,
        |    list(d.n ORDER BY d.idx) AS ys
        |  FROM d JOIN nd USING (event_type) WHERE d.idx <= 7
        |  GROUP BY 1),
        |ini AS (SELECT event_type,
        |    list_sum(ys) / 7.0 AS l0,
        |    list_transform(ys, y -> y - list_sum(ys) / 7.0) AS s0
        |  FROM w1),
        |hw(event_type, idx, l, b, sl) AS (
        |  SELECT event_type, 7::BIGINT, l0, 0.0::DOUBLE, s0 FROM ini
        |  UNION ALL
        |  SELECT h.event_type, h.idx + 1,
        |    0.3 * (d.n - h.sl[1]) + 0.7 * (h.l + h.b),
        |    0.2 * ((0.3 * (d.n - h.sl[1]) + 0.7 * (h.l + h.b)) - h.l)
        |      + 0.8 * h.b,
        |    list_append(h.sl[2:7],
        |      0.4 * (d.n - (0.3 * (d.n - h.sl[1]) + 0.7 * (h.l + h.b)))
        |      + 0.6 * h.sl[1])
        |  FROM hw h JOIN d ON d.event_type = h.event_type
        |    AND d.idx = h.idx + 1),
        |fin AS (SELECT hw.*, row_number() OVER (
        |    PARTITION BY event_type ORDER BY idx DESC) AS rk FROM hw)
        |SELECT f.event_type, nd.n_days, round(f.l, 4) AS level,
        |  round(f.b, 4) AS trend,
        |  round(f.sl[1], 4) AS next_seasonal,
        |  round(f.l + f.b + f.sl[1], 4) AS forecast_1d
        |FROM fin f JOIN nd USING (event_type) WHERE f.rk = 1
        |ORDER BY f.event_type""".stripMargin,
    "q386_interval_arith" ->
      """WITH j AS (SELECT o.o_orderpriority,
        |    l.l_shipdate::TIMESTAMP - o.o_orderdate::TIMESTAMP AS lag
        |  FROM orders o JOIN lineitem l
        |    ON o.o_orderkey = l.l_orderkey)
        |SELECT o_orderpriority, count(*)::BIGINT AS n,
        |  floor(epoch(min(lag)))::BIGINT AS min_lag_s,
        |  floor(epoch(max(lag)))::BIGINT AS max_lag_s,
        |  round(avg(floor(epoch(lag))), 2) AS avg_lag_s
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q233_backtest_folds" ->
      """WITH d0 AS (SELECT min(ts::DATE) AS d0 FROM events),
        |t AS (
        |  SELECT ts::DATE AS day, f.fold,
        |    (SELECT d0 FROM d0) + (f.fold * 7) AS cut
        |  FROM events CROSS JOIN (VALUES (1), (2), (3)) AS f(fold)),
        |p AS (
        |  SELECT fold, day,
        |    CASE WHEN day < cut THEN 'train'
        |      WHEN day < cut + 5 THEN 'test' END AS part
        |  FROM t)
        |SELECT fold, part, count(*) AS n_events,
        |  min(day) AS first_day, max(day) AS last_day
        |FROM p WHERE part IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q230_time_weighted_mean" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    epoch_us(ts::TIMESTAMP) AS us,
        |    lead(epoch_us(ts::TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |d AS (
        |  SELECT user_id, value, (next_us - us)::DOUBLE AS dur
        |  FROM e WHERE next_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_intervals,
        |  round(sum(dur) / 1e6, 1) AS span_sec,
        |  round(sum(value * dur) / sum(dur), 2) AS tw_mean,
        |  round(avg(value), 2) AS plain_mean
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q231_burstiness" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER
        |      (PARTITION BY event_type ORDER BY ts, event_id))::DOUBLE
        |      / 1e6 AS gap
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(avg(gap), 2) AS mean_gap_sec,
        |  round(stddev_samp(gap), 2) AS sd_gap_sec,
        |  (round((stddev_samp(gap) - avg(gap)) /
        |    (stddev_samp(gap) + avg(gap)), 4) + 0.0) AS burstiness
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q224_mann_kendall" ->
      """WITH d AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', ts::DATE)::DOUBLE AS x,
        |    count(*)::DOUBLE AS y
        |  FROM events GROUP BY event_type, ts::DATE),
        |s AS (
        |  SELECT a.event_type,
        |    sum(sign(b.y - a.y))::BIGINT AS s
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.x < b.x
        |  GROUP BY 1),
        |t AS (
        |  SELECT event_type,
        |    sum(c)::BIGINT AS n_obs,
        |    sum(c * (c - 1) * (2 * c + 5))::DOUBLE AS tiesum
        |  FROM (SELECT event_type, y, count(*) AS c FROM d GROUP BY 1, 2)
        |  GROUP BY 1),
        |j AS (
        |  SELECT s.event_type, t.n_obs, s.s,
        |    (t.n_obs::DOUBLE * (t.n_obs - 1) * (2 * t.n_obs + 5)
        |      - t.tiesum) / 18.0 AS var
        |  FROM s JOIN t ON s.event_type = t.event_type)
        |SELECT event_type, n_obs, s,
        |  (round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
        |    WHEN s < 0 THEN (s + 1) / sqrt(var) ELSE 0.0 END, 4) + 0.0) AS z,
        |  CASE WHEN CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
        |      WHEN s < 0 THEN (s + 1) / sqrt(var) ELSE 0.0 END > 1.96
        |    THEN 'increasing'
        |    WHEN CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
        |      WHEN s < 0 THEN (s + 1) / sqrt(var) ELSE 0.0 END < -1.96
        |    THEN 'decreasing' ELSE 'no_trend' END AS trend
        |FROM j ORDER BY event_type""".stripMargin,
    "q223_theil_sen" ->
      """WITH d AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', ts::DATE)::DOUBLE AS x,
        |    count(*)::DOUBLE AS y
        |  FROM events GROUP BY event_type, ts::DATE),
        |p AS (
        |  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS slope
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |m AS (SELECT event_type, quantile_cont(slope, 0.5) AS slope
        |      FROM p GROUP BY event_type),
        |r AS (
        |  SELECT d.event_type, d.y - m.slope * d.x AS b0
        |  FROM d JOIN m ON d.event_type = m.event_type)
        |SELECT m.event_type, round(m.slope, 4) AS slope,
        |  round(quantile_cont(r.b0, 0.5), 4) AS intercept
        |FROM m JOIN r ON m.event_type = r.event_type
        |GROUP BY m.event_type, m.slope
        |ORDER BY m.event_type""".stripMargin,
    "q217_seasonal_anomaly" ->
      """WITH d AS (
        |  SELECT event_type, ts::DATE AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, day, n_events,
        |    date_part('dow', day)::INTEGER AS dow,
        |    avg(n_events)
        |      OVER (PARTITION BY event_type, date_part('dow', day)) AS m,
        |    stddev_samp(n_events)
        |      OVER (PARTITION BY event_type, date_part('dow', day)) AS sd
        |  FROM d)
        |SELECT event_type, day, dow, n_events,
        |  round(m, 2) AS dow_mean,
        |  round((n_events - m) / sd, 4) AS z
        |FROM s WHERE abs((n_events - m) / sd) > 1.5
        |ORDER BY event_type, day""".stripMargin,
    "q215_rfm_features" ->
      """WITH m AS (SELECT max(ts::DATE) AS maxd FROM events)
        |SELECT user_id,
        |  date_diff('day', max(ts::DATE), (SELECT maxd FROM m))
        |    AS recency_days,
        |  count(*) AS frequency,
        |  round(sum(value), 2) AS monetary,
        |  count(DISTINCT event_type) AS n_types,
        |  count(DISTINCT ts::DATE) AS active_days
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q211_rollup_merge" ->
      """SELECT event_type,
        |  date_trunc('month', ts::DATE)::DATE AS month,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value,
        |  round(sum(value) / count(*), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q209_ewma_daily" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT d.event_type, d.day, max(d.cnt) AS cnt,
        |  round(
        |    sum(pow(0.7, date_diff('day', h.day, d.day)) * h.cnt) /
        |    sum(pow(0.7, date_diff('day', h.day, d.day))), 4) AS ewma
        |FROM daily d JOIN daily h
        |  ON d.event_type = h.event_type
        |  AND h.day <= d.day
        |  AND date_diff('day', h.day, d.day) < 28
        |GROUP BY d.event_type, d.day
        |ORDER BY d.event_type, d.day""".stripMargin,
    "q376_mase" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AS l1,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day)
        |      AS l7
        |  FROM d),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_days,
        |    avg(abs(n - l1)) AS mae1, avg(abs(n - l7)) AS mae7
        |  FROM l GROUP BY 1)
        |SELECT event_type, n_days, (round(mae1, 4) + 0.0) AS mae_naive1,
        |  (round(mae7, 4) + 0.0) AS mae_seasonal7,
        |  (round(mae1 / nullif(mae7, 0), 4) + 0.0) AS mase
        |FROM a ORDER BY event_type""".stripMargin,
    "q372_holt_smoothing" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, ts::DATE AS day, count(*)::DOUBLE AS n
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS i
        |  FROM d),
        |m AS (SELECT event_type, count(*)::BIGINT AS n_days
        |  FROM x GROUP BY 1),
        |r AS (
        |  SELECT event_type, 1::BIGINT AS i, n AS l, 0.0::DOUBLE AS t
        |  FROM x WHERE i = 1
        |  UNION ALL
        |  SELECT x.event_type, r.i + 1,
        |    0.5 * x.n + 0.5 * (r.l + r.t),
        |    0.3 * ((0.5 * x.n + 0.5 * (r.l + r.t)) - r.l)
        |      + 0.7 * r.t
        |  FROM r JOIN x ON x.event_type = r.event_type
        |    AND x.i = r.i + 1)
        |SELECT m.event_type, m.n_days, round(r.l, 4) AS level,
        |  round(r.t, 4) AS trend,
        |  round(r.l + 3 * r.t, 4) AS forecast_3d
        |FROM r JOIN m ON r.event_type = m.event_type
        |  AND r.i = m.n_days
        |ORDER BY m.event_type""".stripMargin,
    "q358_cox_score" ->
      """WITH starts AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tg AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS te
        |       FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |dur AS (
        |  SELECT s.user_id, any_value(t0) AS t0,
        |    min(CASE WHEN te >= t0 THEN te END) AS t1
        |  FROM starts s LEFT JOIN tg USING (user_id) GROUP BY s.user_id),
        |d0 AS (
        |  SELECT user_id, (t1 IS NOT NULL AND
        |      t1 <= least(tmax, t0 + 3*86400000000)) AS ev,
        |    floor((least(coalesce(t1, least(tmax, t0 + 3*86400000000)),
        |        least(tmax, t0 + 3*86400000000)) - t0)
        |      / 86400000000)::BIGINT AS dd
        |  FROM dur, h),
        |cl AS (SELECT user_id, count(*)::DOUBLE AS x FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |d AS (SELECT d0.*, coalesce(cl.x, 0.0) AS x
        |  FROM d0 LEFT JOIN cl USING (user_id)),
        |pd AS (SELECT dd, count(*)::BIGINT AS n, sum(x) AS sx,
        |    sum(x * x) AS sxx,
        |    count(CASE WHEN ev THEN 1 END)::BIGINT AS dth,
        |    sum(CASE WHEN ev THEN x ELSE 0.0 END) AS dx
        |  FROM d GROUP BY 1),
        |k AS (SELECT *,
        |    (sum(n) OVER (ORDER BY dd ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING))::DOUBLE AS s0,
        |    sum(sx) OVER (ORDER BY dd ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING) AS s1,
        |    sum(sxx) OVER (ORDER BY dd ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING) AS s2
        |  FROM pd),
        |st AS (SELECT sum(dth)::BIGINT AS n_deaths,
        |    sum(dx - dth * s1 / s0) AS u,
        |    sum(dth * (s2 / s0 - pow(s1 / s0, 2))) AS v
        |  FROM k WHERE dth > 0)
        |SELECT (SELECT count(*) FROM d)::BIGINT AS n_users, n_deaths,
        |  (round(u, 4) + 0.0) AS score_u, (round(v, 4) + 0.0) AS score_var,
        |  (round(u / nullif(sqrt(v), 0), 4) + 0.0) AS z,
        |  abs(u / nullif(sqrt(v), 0)) > 1.96 AS significant
        |FROM st""".stripMargin,
    "q322_log_rank" ->
      s"""WITH starts AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tg AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS te
        |       FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |dur AS (
        |  SELECT s.user_id, any_value(t0) AS t0,
        |    min(CASE WHEN te >= t0 THEN te END) AS t1
        |  FROM starts s LEFT JOIN tg USING (user_id) GROUP BY s.user_id),
        |d AS (
        |  SELECT user_id, (t1 IS NOT NULL AND
        |      t1 <= least(tmax, t0 + 3*86400000000)) AS ev,
        |    floor((least(coalesce(t1, least(tmax, t0 + 3*86400000000)),
        |        least(tmax, t0 + 3*86400000000)) - t0)
        |      / 86400000000)::BIGINT AS dd
        |  FROM dur, h),
        |a AS (SELECT *, ('0x' || substr(md5('lr:' || user_id::VARCHAR),
        |    1, 8))::BIGINT % 2 AS arm FROM d),
        |pd AS (SELECT dd,
        |    count(CASE WHEN ev AND arm = 0 THEN 1 END)::BIGINT AS da,
        |    count(CASE WHEN ev AND arm = 1 THEN 1 END)::BIGINT AS db,
        |    count(CASE WHEN arm = 0 THEN 1 END)::BIGINT AS ta,
        |    count(CASE WHEN arm = 1 THEN 1 END)::BIGINT AS tb
        |  FROM a GROUP BY 1),
        |k AS (SELECT *,
        |    (sum(ta) OVER ())::BIGINT - coalesce(sum(ta) OVER (
        |      ORDER BY dd ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0)::BIGINT AS na,
        |    (sum(tb) OVER ())::BIGINT - coalesce(sum(tb) OVER (
        |      ORDER BY dd ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0)::BIGINT AS nb
        |  FROM pd),
        |f AS (SELECT *, da + db AS d, na + nb AS n FROM k
        |  WHERE da + db > 0),
        |sm AS (SELECT sum(da)::BIGINT AS observed_a,
        |    sum(db)::BIGINT AS observed_b,
        |    sum(na * d / n::DOUBLE) AS ea,
        |    sum(CASE WHEN n > 1 THEN d * (na / n::DOUBLE) *
        |      (1.0 - na / n::DOUBLE) * (n - d) / (n - 1.0) END) AS va
        |  FROM f),
        |c AS (SELECT *,
        |    (observed_a - ea) * (observed_a - ea) / va AS chi2
        |  FROM sm),
        |p AS (SELECT *, sqrt(chi2) AS z, 2.0 *
        |    ${phiUpperSqlT("sqrt(chi2)")} AS p FROM c)
        |SELECT observed_a, observed_b, (round(ea, 4) + 0.0) AS expected_a,
        |  round(chi2, 4) AS chi2, round(p, 4) AS p_value,
        |  p < 0.05 AS significant
        |FROM p""".stripMargin,
    "q323_nelson_aalen" ->
      """WITH starts AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tg AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS te
        |       FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |dur AS (
        |  SELECT s.user_id, any_value(t0) AS t0,
        |    min(CASE WHEN te >= t0 THEN te END) AS t1
        |  FROM starts s LEFT JOIN tg USING (user_id) GROUP BY s.user_id),
        |d AS (
        |  SELECT (t1 IS NOT NULL AND
        |      t1 <= least(tmax, t0 + 3*86400000000)) AS ev,
        |    floor((least(coalesce(t1, least(tmax, t0 + 3*86400000000)),
        |        least(tmax, t0 + 3*86400000000)) - t0)
        |      / 86400000000)::BIGINT AS duration_day
        |  FROM dur, h),
        |pd AS (
        |  SELECT duration_day,
        |    count(CASE WHEN ev THEN 1 END) AS n_events,
        |    count(CASE WHEN NOT ev THEN 1 END) AS n_censored
        |  FROM d GROUP BY 1),
        |k AS (
        |  SELECT duration_day, n_events, n_censored,
        |    (sum(n_events + n_censored) OVER ())::BIGINT
        |      - coalesce(sum(n_events + n_censored) OVER (
        |          ORDER BY duration_day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0)::BIGINT AS n_at_risk
        |  FROM pd)
        |SELECT duration_day, n_at_risk, n_events, n_censored,
        |  (round(sum(n_events::DOUBLE / n_at_risk) OVER (
        |    ORDER BY duration_day ROWS UNBOUNDED PRECEDING), 4) + 0.0)
        |    AS cum_hazard,
        |  (round(exp(-sum(n_events::DOUBLE / n_at_risk) OVER (
        |    ORDER BY duration_day ROWS UNBOUNDED PRECEDING)), 4) + 0.0)
        |    AS fh_survival
        |FROM k ORDER BY duration_day""".stripMargin,
    "q414_competing_risks" ->
      """WITH starts AS (SELECT user_id,
        |    min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tp0 AS (SELECT s.user_id,
        |    min(CASE WHEN te >= t0 THEN te END) AS tp
        |  FROM starts s LEFT JOIN (SELECT user_id,
        |      epoch_us(ts::TIMESTAMP) AS te FROM events
        |      WHERE event_type = 'purchase') p USING (user_id)
        |  GROUP BY s.user_id),
        |te0 AS (SELECT s.user_id,
        |    min(CASE WHEN te >= t0 THEN te END) AS terr
        |  FROM starts s LEFT JOIN (SELECT user_id,
        |      epoch_us(ts::TIMESTAMP) AS te FROM events
        |      WHERE event_type = 'error') p USING (user_id)
        |  GROUP BY s.user_id),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |cls AS (SELECT st.user_id, st.t0,
        |    least(h.tmax, st.t0 + 3*86400000000) AS cut,
        |    CASE WHEN tp <= least(h.tmax, st.t0 + 3*86400000000)
        |      THEN tp END AS vp,
        |    CASE WHEN terr <= least(h.tmax, st.t0 + 3*86400000000)
        |      THEN terr END AS ve
        |  FROM starts st JOIN tp0 USING (user_id)
        |    JOIN te0 USING (user_id), h),
        |dur AS (SELECT
        |    CASE WHEN vp IS NOT NULL AND (ve IS NULL OR vp <= ve)
        |      THEN 'purchase'
        |    WHEN ve IS NOT NULL THEN 'error'
        |    ELSE 'censored' END AS cause,
        |    floor(((CASE WHEN vp IS NOT NULL AND
        |        (ve IS NULL OR vp <= ve) THEN vp
        |      WHEN ve IS NOT NULL THEN ve ELSE cut END) - t0)
        |      / 86400000000)::BIGINT AS duration_day
        |  FROM cls),
        |pd AS (SELECT duration_day,
        |    count(CASE WHEN cause = 'purchase' THEN 1 END)
        |      AS d_purchase,
        |    count(CASE WHEN cause = 'error' THEN 1 END) AS d_error,
        |    count(CASE WHEN cause = 'censored' THEN 1 END)
        |      AS n_censored
        |  FROM dur GROUP BY 1),
        |k AS (SELECT *,
        |    (sum(d_purchase + d_error + n_censored) OVER ())::BIGINT -
        |    coalesce(sum(d_purchase + d_error + n_censored) OVER (
        |        ORDER BY duration_day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS n_at_risk
        |  FROM pd),
        |sp AS (SELECT *, exp(coalesce(sum(
        |      CASE WHEN d_purchase + d_error < n_at_risk
        |        THEN ln(1.0 -
        |          (d_purchase + d_error)::DOUBLE / n_at_risk)
        |        ELSE 0.0 END)
        |    OVER (ORDER BY duration_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0.0)) AS sprev
        |  FROM k)
        |SELECT duration_day, n_at_risk, d_purchase, d_error,
        |  n_censored,
        |  (round(sum(sprev * d_purchase::DOUBLE / n_at_risk)
        |    OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING), 4) + 0.0)
        |    AS cif_purchase,
        |  (round(sum(sprev * d_error::DOUBLE / n_at_risk)
        |    OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING), 4) + 0.0)
        |    AS cif_error
        |FROM sp ORDER BY duration_day""".stripMargin,
    "q416_hurst" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS rn FROM d),
        |e AS (SELECT r.*, w.w, floor((rn - 1) / w.w)::BIGINT AS blk
        |  FROM r, (SELECT unnest([5, 10, 20]) AS w) w),
        |f AS (SELECT *, count(*) OVER (PARTITION BY event_type, w,
        |    blk) AS bn FROM e),
        |g AS (SELECT *, avg(x) OVER (PARTITION BY event_type, w, blk)
        |    AS mu FROM f WHERE bn = w),
        |hh AS (SELECT *, sum(x - mu) OVER (PARTITION BY event_type,
        |    w, blk ORDER BY rn ROWS UNBOUNDED PRECEDING) AS z FROM g),
        |pb AS (SELECT event_type, w, blk, max(z) AS zmax,
        |    min(z) AS zmin, sqrt(avg((x - mu) * (x - mu))) AS s
        |  FROM hh GROUP BY 1, 2, 3),
        |rs AS (SELECT *, (zmax - zmin) / nullif(s, 0) AS rsv FROM pb),
        |pw AS (SELECT event_type, w, avg(rsv) AS avg_rs
        |  FROM rs GROUP BY 1, 2),
        |ft AS (SELECT event_type, count(*)::DOUBLE AS k,
        |    sum(ln(w)) AS sx, sum(ln(avg_rs)) AS sy,
        |    sum(ln(w) * ln(avg_rs)) AS sxy,
        |    sum(ln(w) * ln(w)) AS sxx
        |  FROM pw WHERE avg_rs > 0 GROUP BY 1),
        |wd AS (SELECT event_type,
        |    (round(max(CASE WHEN w = 5 THEN avg_rs END), 4) + 0.0) AS rs_w5,
        |    (round(max(CASE WHEN w = 10 THEN avg_rs END), 4) + 0.0) AS rs_w10,
        |    (round(max(CASE WHEN w = 20 THEN avg_rs END), 4) + 0.0) AS rs_w20
        |  FROM pw GROUP BY 1)
        |SELECT wd.event_type, rs_w5, rs_w10, rs_w20,
        |  (round((k * sxy - sx * sy) / nullif(k * sxx - sx * sx, 0), 4) + 0.0)
        |    AS hurst
        |FROM wd JOIN ft USING (event_type)
        |ORDER BY wd.event_type""".stripMargin,
    "q411_rmst" ->
      """WITH starts AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tg AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS te
        |       FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |dur AS (
        |  SELECT s.user_id, any_value(t0) AS t0,
        |    min(CASE WHEN te >= t0 THEN te END) AS t1
        |  FROM starts s LEFT JOIN tg USING (user_id) GROUP BY s.user_id),
        |d AS (
        |  SELECT (t1 IS NOT NULL AND
        |      t1 <= least(tmax, t0 + 3*86400000000)) AS ev,
        |    floor((least(coalesce(t1, least(tmax, t0 + 3*86400000000)),
        |        least(tmax, t0 + 3*86400000000)) - t0)
        |      / 86400000000)::BIGINT AS duration_day
        |  FROM dur, h),
        |pd AS (
        |  SELECT duration_day,
        |    count(CASE WHEN ev THEN 1 END) AS n_events,
        |    count(CASE WHEN NOT ev THEN 1 END) AS n_censored
        |  FROM d GROUP BY 1),
        |k AS (
        |  SELECT duration_day, n_events, n_censored,
        |    (sum(n_events + n_censored) OVER ())::BIGINT
        |      - coalesce(sum(n_events + n_censored) OVER (
        |          ORDER BY duration_day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0)::BIGINT AS n_at_risk
        |  FROM pd),
        |kmf AS (
        |  SELECT duration_day, n_events, n_censored,
        |    CASE WHEN max(CASE WHEN n_events >= n_at_risk THEN 1
        |        ELSE 0 END)
        |      OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING) = 1
        |    THEN 0.0
        |    ELSE (round(exp(sum(CASE WHEN n_events < n_at_risk
        |      THEN ln(1.0 - n_events::DOUBLE / n_at_risk) ELSE 0.0 END)
        |      OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING)), 4) + 0.0)
        |  END AS survival
        |  FROM k),
        |sg AS (SELECT survival, n_events, n_censored, duration_day,
        |    greatest(0.0, least(coalesce(
        |        lead(duration_day) OVER (ORDER BY duration_day),
        |        3)::DOUBLE, 3.0) - least(duration_day::DOUBLE, 3.0))
        |      AS seglen
        |  FROM kmf)
        |SELECT sum(n_events + n_censored)::BIGINT AS n_subjects,
        |  round(least(min(duration_day)::DOUBLE, 3.0) +
        |    sum(survival * seglen), 4) AS rmst_days,
        |  3 AS tau_days
        |FROM sg""".stripMargin,
    "q204_kaplan_meier" ->
      """WITH starts AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |tg AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS te
        |       FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events),
        |dur AS (
        |  SELECT s.user_id, any_value(t0) AS t0,
        |    min(CASE WHEN te >= t0 THEN te END) AS t1
        |  FROM starts s LEFT JOIN tg USING (user_id) GROUP BY s.user_id),
        |d AS (
        |  SELECT (t1 IS NOT NULL AND
        |      t1 <= least(tmax, t0 + 3*86400000000)) AS ev,
        |    floor((least(coalesce(t1, least(tmax, t0 + 3*86400000000)),
        |        least(tmax, t0 + 3*86400000000)) - t0)
        |      / 86400000000)::BIGINT AS duration_day
        |  FROM dur, h),
        |pd AS (
        |  SELECT duration_day,
        |    count(CASE WHEN ev THEN 1 END) AS n_events,
        |    count(CASE WHEN NOT ev THEN 1 END) AS n_censored
        |  FROM d GROUP BY 1),
        |k AS (
        |  SELECT duration_day, n_events, n_censored,
        |    (sum(n_events + n_censored) OVER ())::BIGINT
        |      - coalesce(sum(n_events + n_censored) OVER (
        |          ORDER BY duration_day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0)::BIGINT AS n_at_risk
        |  FROM pd)
        |SELECT duration_day, n_at_risk, n_events, n_censored,
        |  CASE WHEN max(CASE WHEN n_events >= n_at_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING) = 1
        |    THEN 0.0
        |    ELSE (round(exp(sum(CASE WHEN n_events < n_at_risk
        |      THEN ln(1.0 - n_events::DOUBLE / n_at_risk) ELSE 0.0 END)
        |      OVER (ORDER BY duration_day ROWS UNBOUNDED PRECEDING)), 4) + 0.0)
        |  END AS survival
        |FROM k ORDER BY duration_day""".stripMargin,
    "q206_cusum" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day, count(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day, cnt,
        |    avg(cnt) OVER (PARTITION BY event_type) AS m,
        |    stddev_samp(cnt) OVER (PARTITION BY event_type) AS sd,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM d),
        |c AS (SELECT event_type, day, nd,
        |    sum((cnt - m) / sd) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum
        |  FROM s),
        |r AS (SELECT event_type, day, nd, cusum,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY round(abs(cusum), 6) DESC, day) AS rn
        |  FROM c)
        |SELECT event_type, day AS change_day, nd AS n_days,
        |  round(cusum, 4) AS peak_cusum, round(abs(cusum), 4) AS peak_abs
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q197_mad_anomaly" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day, sum(o_totalprice) AS total
        |  FROM orders GROUP BY 1),
        |med AS (SELECT quantile_cont(total, 0.5) AS med FROM daily),
        |dev AS (SELECT day, total, abs(total - med) AS dev
        |  FROM daily CROSS JOIN med),
        |mad AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
        |SELECT day, (round(total, 2) + 0.0) AS daily_total,
        |  round(dev / (1.4826 * mad), 4) AS robust_z
        |FROM dev CROSS JOIN mad
        |WHERE dev / (1.4826 * mad) > 3.0
        |ORDER BY day""".stripMargin,
    "q188_time_range_frame" ->
      """SELECT user_id, event_id,
        |  count(*) OVER wf AS n_last_hour,
        |  round(sum(value) OVER wf, 2) AS value_last_hour
        |FROM (SELECT user_id, event_id, value,
        |        epoch_us(ts::TIMESTAMP) AS us
        |      FROM events WHERE user_id < 10)
        |WINDOW wf AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q179_attribution" ->
      """WITH p AS (SELECT user_id, value, epoch_us(ts::TIMESTAMP) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS cus
        |      FROM events WHERE event_type = 'click'),
        |sel AS (SELECT p.user_id, p.value, p.us, c.cus
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.us >= c.cus)
        |SELECT user_id, count(*) AS n_purchases,
        |  count(*) FILTER (WHERE cus IS NOT NULL
        |    AND us - cus <= 1800000000) AS n_attributed,
        |  (round(sum(value) FILTER (WHERE cus IS NOT NULL
        |    AND us - cus <= 1800000000), 2) + 0.0) AS attributed_value
        |FROM sel GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q175_decayed_counts" ->
      """WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  (round(sum(pow(0.5,
        |    (r.ref - epoch_us(ts))::DOUBLE / (7.0 * 86400e6))), 4) + 0.0)
        |    AS decayed_count,
        |  (round(sum(pow(0.5,
        |    (r.ref - epoch_us(ts))::DOUBLE / (7.0 * 86400e6)) * value), 2) + 0.0)
        |    AS decayed_value
        |FROM events, r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q170_compaction" ->
      """WITH r AS (SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type AS final_type, event_type = 'error' AS is_tombstone,
        |  count(*) AS n_users, round(sum(value), 2) AS total_value
        |FROM r WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY final_type""".stripMargin,
    "q164_dow_profile" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, date_part('dow', day)::INTEGER AS dow,
        |  round(avg(n), 2) AS avg_events, count(*) AS n_days
        |FROM d GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin,
    "q165_autocorr" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS lag1,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS lag7
        |  FROM d)
        |SELECT event_type, count(*) AS n_days,
        |  round(corr(n, lag1), 4) AS ac1, round(corr(n, lag7), 4) AS ac7
        |FROM l GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q150_rolling_median" ->
      """SELECT user_id, event_id,
        |  count(*) OVER wf AS n_frame,
        |  round(quantile_cont(value, 0.5) OVER wf, 4) AS rolling_med
        |FROM events
        |WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q120_pit_join" ->
      s"""WITH dim AS (SELECT user_id, ts AS valid_from, event_id, value,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM events WHERE event_type IN ($dimTypesSql)),
        |fact AS (SELECT * FROM events
        |         WHERE event_type NOT IN ($dimTypesSql))
        |SELECT f.user_id, count(*) AS n_events,
        |  count(d.event_id) AS n_matched,
        |  round(sum(d.value), 2) AS state_sum
        |FROM fact f LEFT JOIN dim d ON f.user_id = d.user_id
        |  AND f.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        |GROUP BY f.user_id ORDER BY f.user_id""".stripMargin,
    "q121_merge_upsert" ->
      s"""WITH r AS (SELECT user_id, value,
        |    ts >= TIMESTAMP '$mergeCutoff' AS is_upd,
        |    row_number() OVER (
        |      PARTITION BY user_id, ts >= TIMESTAMP '$mergeCutoff'
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |b AS (SELECT user_id, value FROM r WHERE NOT is_upd AND rn = 1),
        |u AS (SELECT user_id, value FROM r WHERE is_upd AND rn = 1)
        |SELECT coalesce(b.user_id, u.user_id) AS user_id,
        |  (round(coalesce(u.value, b.value), 2) + 0.0) AS final_value,
        |  CASE WHEN u.user_id IS NOT NULL THEN 'update' ELSE 'base' END
        |    AS src
        |FROM b FULL OUTER JOIN u ON b.user_id = u.user_id
        |ORDER BY user_id""".stripMargin,
    "q122_event_bigrams" ->
      """WITH t AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    "q123_concurrency" ->
      """WITH ends AS (
        |  SELECT ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT ts + INTERVAL 30 MINUTE, -1 FROM events),
        |sent AS (SELECT DISTINCT t::DATE::TIMESTAMP AS t, 0 AS delta
        |         FROM ends),
        |pts AS (SELECT * FROM ends UNION ALL SELECT * FROM sent),
        |run AS (SELECT t::DATE AS day, delta,
        |    sum(delta) OVER (PARTITION BY t::DATE ORDER BY t, delta
        |      ROWS UNBOUNDED PRECEDING) AS r
        |  FROM pts),
        |d AS (SELECT day, max(r) AS peak, sum(delta) AS tot FROM run
        |      GROUP BY day),
        |c AS (SELECT day, peak, coalesce(sum(tot) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS carry_in
        |  FROM d)
        |SELECT day, (carry_in + peak)::BIGINT AS max_concurrent
        |FROM c ORDER BY day""".stripMargin,
    "q124_window_dedup" ->
      """WITH g AS (SELECT event_type, count(*) AS raw
        |  FROM events
        |  GROUP BY user_id, event_type, date_trunc('hour', ts))
        |SELECT event_type, sum(raw)::BIGINT AS n_raw, count(*) AS n_kept,
        |  round(count(*)::DOUBLE / sum(raw), 4) AS keep_rate
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
