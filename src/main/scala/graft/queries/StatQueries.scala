package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension operators, exact-statistics family (SURVEY.md
  * §2.13 X239+): rank-based k-group testing, variance-homogeneity
  * screening, path-dependent risk readouts, and optimal stratified
  * allocation. Each runs as bounded-frame relational algebra — the raw
  * corpus is consumed by ONE map-side-combinable aggregation, windows
  * and contrasts run over |distinct values| or |groups| summary frames
  * — so the plans hold at warehouse scale.
  */
object StatQueries {
  type Q = (SparkSession, String) => DataFrame

  // Zelen–Severo 26.2.17 upper-tail normal CDF (z >= 0), the same
  // polynomial the DuckDB oracle replays (cf. ExperimentQueries q277/
  // q295/q309 — duplicated locally by house style: each query module
  // stays self-contained).
  private def phiUpper(z: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    exp(-z * z / 2) / sqrt(lit(2.0 * math.Pi)) *
      (t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
        (lit(1.781477937) + t * (lit(-1.821255978) +
          t * lit(1.330274429))))))
  }

  private def phiUpperSql(z: String): String =
    s"""(exp(-($z) * ($z) / 2) / sqrt(2.0 * pi()) *
       |  ((1.0 / (1.0 + 0.2316419 * ($z))) * (0.319381530 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-0.356563782 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (1.781477937 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-1.821255978 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * 1.330274429))))))"""
      .stripMargin

  /** q310_kruskal_wallis — rank-based k-group location test (the
    * nonparametric one-way ANOVA; Kruskal & Wallis 1952) of l_quantity
    * across the three l_returnflag populations. Tied ranks are exact
    * mid-ranks computed on the |distinct values| frame (the
    * `rankAuc` trick, ModelEvalOps.scala:66): one count shuffle over
    * the corpus keyed by (group, value), a cumulative window over the
    * ~50-row distinct-quantity frame, and H with the tie correction
    * C = 1 − Σ(t³−t)/(N³−N). The p-value is the Wilson–Hilferty cube-
    * root normal approximation to the χ²(k−1) upper tail through the
    * shared Zelen–Severo polynomial, so both engines evaluate the
    * identical closed form. Every rank is an exact half-integer —
    * partition-order-free, no tolerance needed before the 4-dp
    * rounding.
    */
  def q310KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v"))
    val perGV = li.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("__c"))
    val perV = perGV.groupBy(col("v")).agg(sum(col("__c")).as("__cv"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perV.withColumn("__rank",
      sum(col("__cv")).over(w) - col("__cv") + (col("__cv") + 1) / 2.0)
    val ties = ranked.agg(
      sum(col("__cv")).as("__n"),
      sum(col("__cv") * col("__cv") * col("__cv") - col("__cv"))
        .as("__tie"))
    val perG = perGV
      .join(ranked.select(col("v"), col("__rank")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * col("__rank")).as("__rs"))
    val dfv = col("k") - 1
    perG.agg(count(lit(1)).as("k"),
        sum(try_divide(col("__rs") * col("__rs"), col("__ng")))
          .as("__s"))
      .crossJoin(broadcast(ties))
      .withColumn("__h",
        lit(12.0) / (col("__n") * (col("__n") + 1)) * col("__s") -
          lit(3.0) * (col("__n") + 1))
      .withColumn("__c",
        lit(1.0) - try_divide(col("__tie"),
          col("__n") * col("__n") * col("__n") - col("__n")))
      .withColumn("__ha", try_divide(col("__h"), col("__c")))
      .withColumn("__z",
        (pow(try_divide(col("__ha"), dfv), 1.0 / 3) -
          (lit(1.0) - lit(2.0) / (lit(9.0) * dfv))) /
          sqrt(lit(2.0) / (lit(9.0) * dfv)))
      .withColumn("__p",
        when(col("__z") >= 0, phiUpper(col("__z")))
          .otherwise(lit(1.0) - phiUpper(-col("__z"))))
      .select(col("k"), col("__n").as("n"),
        (round(col("__h"), 4) + lit(0.0)).as("h_stat"),
        (round(col("__ha"), 4) + lit(0.0)).as("h_adj"),
        dfv.as("df"),
        (round(col("__p"), 4) + lit(0.0)).as("p_value"),
        (col("__p") < 0.05).as("significant"))
  }

  /** q311_brown_forsythe — variance-homogeneity screen across the
    * l_returnflag groups on l_extendedprice via the Brown–Forsythe
    * (1974) statistic: one-way ANOVA F computed on absolute deviations
    * from the per-group MEDIAN (the robust form of Levene's test — the
    * mean-centered original is fooled by skew, which prices have).
    * Within/between sums run off per-group (n, Σz, Σz²) in a single
    * aggregation — no second corpus pass after the median join. The
    * per-group exact median uses `percentile`, which materializes each
    * group's values: fine for a BOUNDED group count on bounded-cardinality
    * keys (3 flags here, same contract as q305's per-event-type
    * median); the readout approximates the F upper tail by
    * d1·F ~ χ²(d1) (exact as d2 → ∞; d2 = N−k is huge by
    * construction) through Wilson–Hilferty + the shared polynomial.
    */
  def q311BrownForsythe(s: SparkSession, dir: String): DataFrame = {
    // group medians via the distributed-selection exactPercentiles, not
    // the built-in percentile() aggregate: the built-in buffers EVERY
    // group value in one task's aggregation buffer (O(corpus/k) per
    // group at any cluster size — the aggregate cousin of the
    // single-task window trap, guide §5); exactPercentiles reproduces
    // Percentile.getPercentile bit-for-bit on bounded buckets. The
    // 2-column input is checkpointed once for the selection's passes +
    // the deviation pass (q119 pattern).
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("x"))
      .localCheckpoint()
    val med = graft.ops.StatOps.exactPercentiles(li, "g", "x",
      Seq("__med" -> 0.5))
    val z = li.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("x") - col("__med")).as("__z"))
    val perG = z.groupBy(col("g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__z")).as("__sz"),
        sum(col("__z") * col("__z")).as("__sz2"))
    val d1 = col("k") - 1
    val d2 = col("n") - col("k")
    perG.agg(count(lit(1)).as("k"), sum(col("__ng")).as("n"),
        sum(col("__sz")).as("__tz"),
        sum(col("__sz2") -
          try_divide(col("__sz") * col("__sz"), col("__ng")))
          .as("__within"),
        sum(try_divide(col("__sz") * col("__sz"), col("__ng")))
          .as("__bsq"))
      .withColumn("__between",
        col("__bsq") - try_divide(col("__tz") * col("__tz"), col("n")))
      .withColumn("__f",
        try_divide(try_divide(col("__between"), d1),
          try_divide(col("__within"), d2)))
      .withColumn("__x2", col("__f") * d1)
      .withColumn("__z",
        (pow(try_divide(col("__x2"), d1), 1.0 / 3) -
          (lit(1.0) - lit(2.0) / (lit(9.0) * d1))) /
          sqrt(lit(2.0) / (lit(9.0) * d1)))
      .withColumn("__p",
        when(col("__z") >= 0, phiUpper(col("__z")))
          .otherwise(lit(1.0) - phiUpper(-col("__z"))))
      .select(col("k"), col("n"),
        (round(col("__f"), 4) + lit(0.0)).as("f_stat"),
        d1.as("df1"), d2.as("df2"),
        (round(col("__p"), 4) + lit(0.0)).as("p_approx"),
        (col("__p") < 0.05).as("heteroscedastic"))
  }

  /** q312_max_drawdown — per-user maximum drawdown of the cumulative
    * event-value path: running sum ordered by (ts, event_id), running
    * peak, drawdown = peak − cumulative, top-10 users by worst
    * drawdown. The canonical path-dependent risk statistic (portfolio
    * P&L, credit exposure, SLO error budgets) — NOT expressible as any
    * per-row aggregate, exactly what analytic windows are for. Both
    * window passes partition by user (parallel, bounded state per
    * group); the deterministic (ts, event_id) order makes the
    * sequential double accumulation identical in both engines, and the
    * 4-dp rounding plus user_id tiebreak pins the top-10 selection.
    */
  def q312MaxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("__cum", sum(col("value")).over(w))
      .withColumn("__peak", max(col("__cum")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (round(max(col("__peak") - col("__cum")), 4) + lit(0.0)).as("max_drawdown"),
        (round(max(col("__peak")), 4) + lit(0.0)).as("peak_value"))
      .orderBy(col("max_drawdown").desc, col("user_id"))
      .limit(10)
  }

  /** q313_neyman_allocation — optimal (Neyman 1934) sample-size
    * allocation of a 1000-unit budget across the o_orderpriority
    * strata: n_h ∝ N_h·σ_h (stddev_samp of o_totalprice), integerized
    * by the same largest-remainder rule as q302 so allocations sum
    * EXACTLY to the budget. This is how a survey/labeling pipeline
    * sizes per-stratum draws to minimize estimator variance at fixed
    * cost — the principled upgrade over proportional allocation when
    * strata variances differ. One corpus aggregation; shares and
    * remainder ranks run as windows over the |strata| frame. Ideal
    * shares are rounded to 6 dp BEFORE flooring so the engines' last-
    * bit stddev differences can't flip a floor.
    */
  def q313NeymanAllocation(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val g = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("stratum"))
      .agg(count(lit(1)).as("n_h"),
        stddev_samp(col("o_totalprice")).as("__sd"))
      .withColumn("__w", col("n_h") * col("__sd"))
    val w = Window.partitionBy()
    val rw = Window.orderBy(col("__rem").desc, col("stratum"))
    g.withColumn("__ideal",
        (round(lit(budget) * try_divide(col("__w"),
          sum(col("__w")).over(w)), 6) + lit(0.0)))
      .withColumn("__fl", floor(col("__ideal")).cast("long"))
      .withColumn("__rem", (round(col("__ideal") - col("__fl"), 6) + lit(0.0)))
      .withColumn("__short",
        lit(budget) - sum(col("__fl")).over(w))
      .withColumn("__rk", row_number().over(rw))
      .select(col("stratum"), col("n_h"),
        (round(col("__sd"), 4) + lit(0.0)).as("sd_h"),
        (round(col("__ideal"), 2) + lit(0.0)).as("ideal"),
        (col("__fl") +
          when(col("__rk") <= col("__short"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col("stratum"))
  }

  /** q335_dunn_posthoc — Dunn's (1964) pairwise post-hoc test with
    * Bonferroni correction, the follow-up q310's omnibus H demands:
    * WHICH l_returnflag groups differ in l_quantity? Per pair,
    * z = (r̄_a − r̄_b) / √(V·(1/n_a + 1/n_b)) with the tie-corrected
    * variance V = N(N+1)/12 − Σ(t³−t)/(12(N−1)), mean ranks from the
    * same |distinct values| mid-rank frame as q310 (one corpus count
    * shuffle, windows over ~50 rows), p = 2·Φ̄(|z|), p_adj = min(1,
    * m·p) over the m = k(k−1)/2 comparisons. Exact half-integer
    * ranks → engine-identical z before the display rounding.
    */
  def q335DunnPosthoc(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v"))
    val perGV = li.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("__c"))
    val perV = perGV.groupBy(col("v")).agg(sum(col("__c")).as("__cv"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perV.withColumn("__rank",
      sum(col("__cv")).over(w) - col("__cv") + (col("__cv") + 1) / 2.0)
    val glob = ranked.agg(sum(col("__cv")).as("__n"),
      sum(col("__cv") * col("__cv") * col("__cv") - col("__cv"))
        .as("__tie"))
    val perG = perGV
      .join(ranked.select(col("v"), col("__rank")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * col("__rank")).as("__rs"))
      .withColumn("__rbar", col("__rs") / col("__ng").cast("double"))
    val k = 3.0 // pairs m = k(k-1)/2
    val m = k * (k - 1) / 2
    perG.select(col("g").as("group_a"), col("__ng").as("__na"),
        col("__rbar").as("__ra"))
      .crossJoin(broadcast(perG.select(col("g").as("group_b"),
        col("__ng").as("__nb"), col("__rbar").as("__rb"))))
      .filter(col("group_a") < col("group_b"))
      .crossJoin(broadcast(glob))
      .withColumn("__V",
        col("__n") * (col("__n") + 1) / 12.0 -
          try_divide(col("__tie"), (col("__n") - 1) * 12.0))
      .withColumn("__z", try_divide(col("__ra") - col("__rb"),
        sqrt(col("__V") * (lit(1.0) / col("__na") +
          lit(1.0) / col("__nb")))))
      .withColumn("__p", lit(2.0) * phiUpper(abs(col("__z"))))
      .select(col("group_a"), col("group_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        (round(col("__z"), 4) + lit(0.0)).as("z"),
        (round(col("__p"), 6) + lit(0.0)).as("p_value"),
        (round(least(lit(1.0), lit(m) * col("__p")), 6) + lit(0.0)).as("p_adj"),
        (least(lit(1.0), lit(m) * col("__p")) < 0.05).as("significant"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** q340_cronbach_alpha — Cronbach's α internal-consistency
    * reliability (1951): treating each user's per-event-type activity
    * counts as a k=5-item instrument, α = k/(k−1)·(1 − Σσ²ᵢ/σ²ₜ)
    * measures whether the items move together (one latent "activity"
    * trait) — the survey/psychometrics staple that also screens
    * engineered feature groups for redundancy-vs-noise. One
    * conditional-pivot aggregation to the per-user item frame
    * (absent items count 0, as instrument scoring requires), then a
    * single variance aggregation — two map-side-combined passes,
    * scale-free. Variances are FP-order-sensitive across engines →
    * 4-dp display rounding absorbs the last-bit drift.
    */
  def q340CronbachAlpha(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val k = types.size
    val itemCols = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"__i_$t"))
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(itemCols.head, itemCols.tail: _*)
      .withColumn("__total", types.map(t => col(s"__i_$t")).reduce(_ + _))
    users.agg(
        count(lit(1)).as("n_users"),
        types.map(t => var_samp(col(s"__i_$t")))
          .reduce(_ + _).as("__sv"),
        var_samp(col("__total")).as("__vt"))
      .select(lit(k).as("k"), col("n_users"),
        round(col("__sv"), 4).as("sum_item_var"),
        (round(col("__vt"), 4) + lit(0.0)).as("total_var"),
        (round(lit(k.toDouble / (k - 1)) *
          (lit(1.0) - try_divide(col("__sv"), col("__vt"))), 4) + lit(0.0))
          .as("alpha"))
  }

  /** q341_friedman — Friedman's rank test (1937) for k related
    * treatments over b blocks: do the 5 event types differ in weekly
    * volume, controlling for week-to-week level shifts? Blocks =
    * anchored weeks (complete blocks only, as the test requires),
    * treatments ranked WITHIN each block by mid-ranks (the per-block
    * distinct-value cumulative trick — same exact-half-integer
    * machinery as q310), χ²_F = 12/(bk(k+1))·ΣR²ⱼ − 3b(k+1) on
    * k−1 df through the Wilson–Hilferty tail. The repeated-measures
    * sibling of q310's independent-groups H — what you use when the
    * same units are measured under every condition. Corpus →
    * |weeks|×|types| in one aggregation; everything after is
    * block-frame windows.
    */
  def q341Friedman(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val weekly = Tables.events(s, dir)
      .groupBy(floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
        .as("__wk"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("__cnt"))
    val complete = weekly.groupBy(col("__wk"))
      .agg(count(lit(1)).as("__nt")).filter(col("__nt") === k)
      .select(col("__wk"))
    val blocks = weekly.join(complete, Seq("__wk"), "left_semi")
    val perVal = blocks.groupBy(col("__wk"), col("__cnt"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__wk")).orderBy(col("__cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perVal.withColumn("__rank",
      sum(col("__c")).over(w) - col("__c") + (col("__c") + 1) / 2.0)
    val rj = blocks
      .join(ranked.select(col("__wk"), col("__cnt"), col("__rank")),
        Seq("__wk", "__cnt"))
      .groupBy(col("event_type"))
      .agg(sum(col("__rank")).as("__rj"), count(lit(1)).as("__b"))
    val dfv = lit((k - 1).toDouble)
    rj.agg(max(col("__b")).as("b"),
        sum(col("__rj") * col("__rj")).as("__s"))
      .withColumn("__chi2",
        lit(12.0) / (col("b") * k * (k + 1)) * col("__s") -
          lit(3.0) * col("b") * (k + 1))
      .withColumn("__z",
        (pow(try_divide(col("__chi2"), dfv), 1.0 / 3) -
          (lit(1.0) - lit(2.0) / (lit(9.0) * dfv))) /
          sqrt(lit(2.0) / (lit(9.0) * dfv)))
      .withColumn("__p",
        when(col("__z") >= 0, phiUpper(col("__z")))
          .otherwise(lit(1.0) - phiUpper(-col("__z"))))
      .select(col("b"), lit(k).as("k"),
        (round(col("__chi2"), 4) + lit(0.0)).as("chi2_f"),
        lit(k - 1).as("df"),
        (round(col("__p"), 4) + lit(0.0)).as("p_value"),
        (col("__p") < 0.05).as("significant"))
  }

  /** q350_jarque_bera — moment-based normality screen (Jarque & Bera
    * 1980) of `value` within each event_type: JB = n/6·(S² + (K−3)²/4)
    * from the 2nd–4th CENTRAL moments. Two passes, both
    * map-side-combinable: a per-group mean, broadcast back, then one
    * Σd²/Σd³/Σd⁴ aggregation — the numerically stable form (raw-moment
    * one-pass identities catastrophically cancel on large means, which
    * `value` has). The p-value is the EXACT χ²(2) upper tail
    * exp(−JB/2) — no polynomial approximation needed at df=2 — so both
    * engines evaluate the identical closed form. The screen a feature
    * pipeline runs before z-scoring or Gaussian-assuming tests (q205's
    * t-test, q270's CUPED) to know when to reach for the rank-based
    * family (q310/q335) instead.
    */
  def q350JarqueBera(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("value").cast("double").as("x"))
    val m = e.groupBy(col("event_type")).agg(avg(col("x")).as("__m"))
    e.join(broadcast(m), Seq("event_type"))
      .withColumn("__d", col("x") - col("__m"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        avg(col("__d") * col("__d")).as("__m2"),
        avg(col("__d") * col("__d") * col("__d")).as("__m3"),
        avg(col("__d") * col("__d") * col("__d") * col("__d"))
          .as("__m4"))
      .withColumn("__skew",
        try_divide(col("__m3"), pow(col("__m2"), 1.5)))
      .withColumn("__kurt",
        try_divide(col("__m4"), col("__m2") * col("__m2")))
      .withColumn("__jb",
        col("n") / 6.0 * (col("__skew") * col("__skew") +
          (col("__kurt") - 3.0) * (col("__kurt") - 3.0) / 4.0))
      .withColumn("__p", exp(-col("__jb") / 2))
      .select(col("event_type"), col("n"),
        (round(col("__skew"), 4) + lit(0.0)).as("skewness"),
        (round(col("__kurt"), 4) + lit(0.0)).as("kurtosis"),
        (round(col("__jb"), 4) + lit(0.0)).as("jb_stat"),
        (round(col("__p"), 4) + lit(0.0)).as("p_value"),
        (col("__p") < 0.05).as("non_normal"))
      .orderBy(col("event_type"))
  }

  /** q355_cramer_von_mises — two-sample Cramér–von Mises distribution
    * test between the click and purchase `value` populations, in the
    * tie-aware ECDF form: T = nm/N² · Σ_x cnt(x)·(F_n(x) − G_m(x))²
    * summed over the DISTINCT combined values (the integral against
    * the pooled empirical measure — exactly right under ties, where
    * the classic rank formula isn't defined). Against q115's KS (max
    * gap), CvM integrates the WHOLE gap profile, so it sees broad
    * low-amplitude shape differences KS misses. One count shuffle
    * keyed by value, a cumulative window over the |distinct values|
    * frame (q310's bounded-frame contract), inner products kept in
    * exact Long arithmetic (m·F_n − n·G_m) until the final square.
    * Asymptotic 5% critical value 0.461.
    */
  def q355CramerVonMises(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"), col("value").cast("double").as("v"))
    val perV = e.groupBy(col("v")).agg(
      count(when(col("g") === "click", 1)).as("__cn"),
      count(when(col("g") === "purchase", 1)).as("__cm"))
    // distinct-value frame: capped by the VALUE DOMAIN (2-dp events in
    // [0, 560] ⇒ ≤56k rows), but the cumulative ECDFs are pure integer
    // prefix sums over a unique ordered key — exactly
    // StatOps.shardedCumsum's shape, so the single-task window is
    // retired outright rather than argued bounded (round-10 audit)
    val cum = graft.ops.StatOps.shardedCumsum(perV, "v",
      Seq("__cn" -> "__Fn", "__cm" -> "__Gm"))
    val tot = perV.agg(sum(col("__cn")).as("n"), sum(col("__cm")).as("m"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("m")).as("m"),
        sum((col("__cn") + col("__cm")).cast("double") *
          pow((col("m") * col("__Fn") - col("n") * col("__Gm"))
            .cast("double"), 2)).as("__sq"))
      .withColumn("__t", col("__sq") /
        (pow((col("n") + col("m")).cast("double"), 2) *
          col("n") * col("m")))
      .select(col("n"), col("m"),
        (round(col("__t"), 4) + lit(0.0)).as("cvm_stat"),
        (col("__t") > 0.461).as("rejected"))
  }

  /** q359_wasserstein — 1-Wasserstein (earth mover's) distance between
    * the click and purchase `value` distributions, by the 1-D closed
    * form W₁ = ∫|F−G|: Σ over sorted distinct pooled values of
    * (next_v − v)·|F_n(v)/n − G_m(v)/m| — the actual transport cost in
    * the metric's own units (how much value-mass must move, and how
    * far), which rounds out the distribution-gap family: KS (q115)
    * takes the max gap, CvM (q355) integrates the squared gap against
    * the pooled measure, W₁ integrates the raw gap against Lebesgue.
    * Same one count-shuffle + cumulative-window shape as q355; the
    * inner gap m·F_n − n·G_m stays exact Long until the final scale by
    * gap width / nm.
    */
  def q359Wasserstein(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"), col("value").cast("double").as("v"))
    val perV = e.groupBy(col("v")).agg(
      count(when(col("g") === "click", 1)).as("__cn"),
      count(when(col("g") === "purchase", 1)).as("__cm"))
    // fully distributed CDF-gap frame (round-10 window audit): the
    // cumulative counts are sharded prefix sums, and the lead() that
    // fetched each value's successor — the one construct a shard-local
    // window cannot express (the successor may live in the next shard)
    // — becomes a rank self-join: rank r's next value is rank r+1's v
    // (cumsum of ones over the unique key IS the dense rank). The
    // inner join drops the max-rank row exactly as lead()'s null did.
    // checkpoint: `cums` feeds BOTH sides of the rank self-join (R5.2)
    val cums = graft.ops.StatOps.shardedCumsum(
      perV.withColumn("__one", lit(1L)), "v",
      Seq("__cn" -> "__Fn", "__cm" -> "__Gm", "__one" -> "__rk"))
      .localCheckpoint()
    val nxt = cums.select((col("__rk") - 1).as("__rk"),
      col("v").as("__vn"))
    val cum = cums.join(nxt, Seq("__rk"))
      .withColumn("__gap", col("__vn") - col("v"))
    val tot = perV.agg(sum(col("__cn")).as("n"), sum(col("__cm")).as("m"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("m")).as("m"),
        sum(col("__gap") *
          abs((col("m") * col("__Fn") - col("n") * col("__Gm"))
            .cast("double"))).as("__s"))
      .select(col("n"), col("m"),
        (round(col("__s") / (col("n") * col("m")), 4) + lit(0.0)).as("w1_distance"))
  }

  /** q363_anderson_darling — two-sample Anderson–Darling statistic in
    * the Scholz–Stephens (1987) tie-adjusted midrank form: A²ₐₖₙ =
    * (N−1)/N · Σᵢ (1/nᵢ) Σⱼ (lⱼ/N)·(N·Mₐᵢⱼ − nᵢ·Bₐⱼ)² /
    * (Bₐⱼ(N−Bₐⱼ) − N·lⱼ/4) over the distinct pooled values, with
    * midrank cumulatives Mₐ = M − l_i/2, Bₐ = B − l/2 — the
    * tail-weighted member of the gap family (KS q115 / CvM q355 / W₁
    * q359): the denominator up-weights discrepancies in the
    * distribution tails, where CvM's uniform pooled weighting is
    * blind. Under H₀ the statistic's mean is k−1 = 1, so values ≫ 1
    * indicate divergence. Same one count-shuffle + cumulative-window
    * shape as q355; numerators are formed as 2×-scaled integer-valued
    * doubles (exact below 2⁵³) before the one square, and degenerate
    * den = 0 cells null out via try_divide in both engines.
    */
  def q363AndersonDarling(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("g"), col("value").cast("double").as("v"))
    val perV = e.groupBy(col("v")).agg(
      count(when(col("g") === "click", 1)).as("__cn"),
      count(when(col("g") === "purchase", 1)).as("__cm"))
    // integer prefix sums over the unique distinct-value key — the
    // q355 rationale: StatOps.shardedCumsum retires the single-task
    // cumulative window (round-10 audit), bit-exact for long counts
    val cum = graft.ops.StatOps.shardedCumsum(
      perV.withColumn("__l", col("__cn") + col("__cm")), "v",
      Seq("__cn" -> "__Fn", "__cm" -> "__Gm", "__l" -> "__B"))
    val tot = perV.agg(sum(col("__cn")).cast("double").as("__n"),
      sum(col("__cm")).cast("double").as("__m"))
    val j = cum.crossJoin(broadcast(tot))
      .withColumn("__tt", col("__n") + col("__m"))
      // 2×-scaled midrank numerators: 2(N·Ma − nᵢ·Ba), integer-valued
      .withColumn("__u1", lit(2.0) * col("__tt") * col("__Fn") -
        col("__tt") * col("__cn") - lit(2.0) * col("__n") * col("__B") +
        col("__n") * col("__l"))
      .withColumn("__u2", lit(2.0) * col("__tt") * col("__Gm") -
        col("__tt") * col("__cm") - lit(2.0) * col("__m") * col("__B") +
        col("__m") * col("__l"))
      // 4×-scaled denominator: 4(Ba(N−Ba) − N·l/4)
      .withColumn("__d4", (lit(2.0) * col("__B") - col("__l")) *
        (lit(2.0) * col("__tt") - lit(2.0) * col("__B") + col("__l")) -
        col("__tt") * col("__l"))
    j.agg(max(col("__n")).cast("long").as("n"),
        max(col("__m")).cast("long").as("m"),
        sum(try_divide(col("__l") * col("__u1") * col("__u1"),
          col("__d4"))).as("__s1"),
        sum(try_divide(col("__l") * col("__u2") * col("__u2"),
          col("__d4"))).as("__s2"),
        max(col("__tt")).as("__tt"))
      .select(col("n"), col("m"),
        (round((col("__tt") - 1) / col("__tt") *
          (col("__s1") / (col("__tt") * col("n")) +
            col("__s2") / (col("__tt") * col("m"))), 4) + lit(0.0)).as("ad_stat"))
  }


  /** q379_kendall_tau — Kendall's τ-b rank correlation between daily
    * event volume and daily mean value per event type: τ-b =
    * (n_c − n_d)/√((n₀−n_x)(n₀−n_y)) over all day PAIRS, with the
    * tie-adjusted denominators the plain τ-a gets wrong on discrete
    * counts. The rank-based complement to q259's Spearman (which ranks
    * VALUES; Kendall counts concordant ORDERINGS and is the standard
    * trend-test kernel — q224's Mann–Kendall S is its numerator).
    * The corpus collapses to |type×day| rows in ONE aggregation; the
    * O(days²) pair join runs on that bounded frame, never on raw
    * events — at any corpus scale the pair count is days-bounded.
    */
  def q379KendallTau(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as("__x"),
        avg(col("value")).as("__y"))
      .localCheckpoint() // both pair-join sides read this
    val a = daily.select(col("event_type"), col("__day").as("__da"),
      col("__x").as("__xa"), col("__y").as("__ya"))
    val b = daily.select(col("event_type"), col("__day").as("__db"),
      col("__x").as("__xb"), col("__y").as("__yb"))
    a.join(b, Seq("event_type")).filter(col("__da") < col("__db"))
      .select(col("event_type"),
        signum(col("__xb") - col("__xa")).as("__sx"),
        signum(col("__yb") - col("__ya")).as("__sy"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("__sx") * col("__sy") > 0, 1)).as("concordant"),
        count(when(col("__sx") * col("__sy") < 0, 1)).as("discordant"),
        count(when(col("__sx") === 0, 1)).as("__tx"),
        count(when(col("__sy") === 0, 1)).as("__ty"))
      .select(col("event_type"), col("n_pairs"), col("concordant"),
        col("discordant"),
        (round(try_divide(
          (col("concordant") - col("discordant")).cast("double"),
          sqrt((col("n_pairs") - col("__tx")).cast("double") *
            (col("n_pairs") - col("__ty")))), 4) + lit(0.0)).as("tau_b"))
      .orderBy(col("event_type"))
  }

  /** q380_wilcoxon — Wilcoxon signed-rank test of week-over-week
    * change: per event type, paired differences d_t = count(t) −
    * count(t−7 days) via a calendar self-join on date−7 (NOT a row
    * lag — with gaps in a series a row lag would silently pair
    * non-week-apart days), zero differences dropped, |d|
    * tie-average-ranked,
    * W⁺ = Σ ranks of positive d, and the tie-corrected normal
    * approximation z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24 − Σ(t³−t)/48).
    * The PAIRED nonparametric test the Welch/Kruskal family lacks —
    * the right tool when each day is its own control. Ranks run over
    * the |distinct |d|| frame per type (integer cumulative counts →
    * half-integer average ranks, engine-exact); the corpus is consumed
    * by the one daily aggregation.
    */
  def q380Wilcoxon(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val paired = daily
      .join(daily.select(col("event_type"),
          date_add(col("__day"), 7).as("__day"),
          col("__n").as("__p7")),
        Seq("event_type", "__day"))
      .withColumn("__d", col("__n") - col("__p7"))
      .filter(col("__d") =!= 0)
    val g = paired
      .groupBy(col("event_type"), abs(col("__d")).as("__ad"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(col("__d") > 0, 1)).as("__pos"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("__ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("__avgrk",
        sum(col("__cnt")).over(wc) - (col("__cnt") - 1) / lit(2.0))
      .groupBy(col("event_type"))
      .agg(sum(col("__cnt")).as("n_pairs"),
        sum(col("__pos") * col("__avgrk")).as("w_plus"),
        sum(col("__cnt") * (col("__cnt") * col("__cnt") - 1))
          .as("__tie3"))
      .withColumn("__n", col("n_pairs").cast("double"))
      .select(col("event_type"), col("n_pairs"),
        (round(col("w_plus"), 1) + lit(0.0)).as("w_plus"),
        (round(try_divide(
          col("w_plus") - col("__n") * (col("__n") + 1) / 4,
          sqrt(col("__n") * (col("__n") + 1) *
            (lit(2) * col("__n") + 1) / 24
            - col("__tie3") / lit(48.0))), 4) + lit(0.0)).as("z"))
      .orderBy(col("event_type"))
  }

  /** q381_pacf — partial autocorrelation of each type's daily count
    * series at lags 1–2 via the Durbin–Levinson closed form: φ₁₁ = r₁,
    * φ₂₂ = (r₂ − r₁²)/(1 − r₁²), with the rₖ as lagged-pair sample
    * correlations from explicit moments (try_divide — a constant
    * series nulls out, DivisionAuditSpec). PACF is what q165's raw ACF
    * cannot say: whether lag-2 memory is REAL or just propagated
    * lag-1 — the AR-order diagnostic read before fitting any
    * autoregression (q189/q245). Day-frame arithmetic only.
    */
  def q381Pacf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("__day"))
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as("__v"))
      .withColumn("__l1", lag(col("__v"), 1).over(w))
      .withColumn("__l2", lag(col("__v"), 2).over(w))
    def r(lagCol: String): Column = {
      val m = count(when(col(lagCol).isNotNull, 1)).cast("double")
      val sx = sum(when(col(lagCol).isNotNull, col("__v")))
      val sy = sum(col(lagCol))
      val sxy = sum(col("__v") * col(lagCol))
      val sxx = sum(when(col(lagCol).isNotNull, col("__v") * col("__v")))
      val syy = sum(col(lagCol) * col(lagCol))
      try_divide(m * sxy - sx * sy,
        sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)))
    }
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), r("__l1").as("__r1"),
        r("__l2").as("__r2"))
      .select(col("event_type"), col("n_days"),
        (round(col("__r1"), 4) + lit(0.0)).as("pacf1"),
        (round(try_divide(col("__r2") - col("__r1") * col("__r1"),
          lit(1.0) - col("__r1") * col("__r1")), 4) + lit(0.0)).as("pacf2"))
      .orderBy(col("event_type"))
  }

  /** q382_ccf — lead–lag cross-correlation between the view and
    * purchase daily series: r(k) = corr(view_t, purchase_{t+k}) for
    * k ∈ [−3, 3] from explicit moments on the day-shifted join — does
    * today's browsing predict purchases days out (positive-k peaks),
    * or do purchases trail campaigns (negative k)? The two-series
    * generalization of q165 (ACF) and q381 (PACF); the argmax lag is
    * the transfer-function delay a forecaster feeds q245's rolling
    * regression. Two bounded day frames, a 7-way lag explode on the
    * smaller one, one moment aggregation per lag.
    */
  def q382Ccf(s: SparkSession, dir: String): DataFrame = {
    def daily(t: String, out: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as(out))
    val x = daily("view", "__x")
      .withColumn("lag", explode(array((-3 to 3).map(lit): _*)))
      .withColumn("__jday", expr("date_add(__day, lag)"))
    val y = daily("purchase", "__y").withColumnRenamed("__day", "__jday")
    x.join(y, Seq("__jday"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select(col("lag"), col("n_days"),
        (round(try_divide(
          col("n_days") * col("__sxy") - col("__sx") * col("__sy"),
          sqrt((col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
            * (col("n_days") * col("__syy") - col("__sy") * col("__sy")))),
          4) + lit(0.0)).as("ccf"))
      .orderBy(col("lag"))
  }


  /** q390_theil_decomp — Theil T inequality index with its exact
    * between/within decomposition by order priority: T = Σxlnx/S −
    * lnμ (population form), T = T_between + Σ s_g·T_g with s_g the
    * group INCOME share — the property Gini (q195) famously lacks:
    * Theil tells you whether concentration lives ACROSS segments or
    * INSIDE them, which decides whether rebalancing the mix or
    * flattening within segments moves the number. One pass collects
    * (n, Σx, Σx·lnx) per group; every index derives from those three
    * moments — global moments are the group sums, so the identity is
    * exact by construction and the oracle replays it to the digit.
    */
  def q390TheilDecomp(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("double").as("__x"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__s"),
        sum(col("__x") * log(col("__x"))).as("__sl"))
    val tot = g.agg(sum(col("__n")).as("__tn"), sum(col("__s")).as("__ts"),
      sum(col("__sl")).as("__tsl"))
    val w = g.crossJoin(broadcast(tot))
      .withColumn("__mu_g", col("__s") / col("__n"))
      .withColumn("__mu", col("__ts") / col("__tn"))
      .withColumn("__share", col("__s") / col("__ts"))
      .withColumn("__tg", col("__sl") / col("__s") - log(col("__mu_g")))
    val between = w.agg(
      sum(col("__share") * log(col("__mu_g") / col("__mu")))
        .as("__tb"),
      sum(col("__share") * col("__tg")).as("__tw"),
      max(col("__tsl") / col("__ts") - log(col("__mu"))).as("__tt"))
    w.crossJoin(broadcast(between))
      .select(col("o_orderpriority"), col("__n").cast("long").as("n"),
        (round(col("__share"), 4) + lit(0.0)).as("income_share"),
        (round(col("__tg"), 6) + lit(0.0)).as("theil_within_group"),
        (round(col("__tt"), 6) + lit(0.0)).as("theil_total"),
        (round(col("__tb"), 6) + lit(0.0)).as("theil_between"),
        (round(col("__tw"), 6) + lit(0.0)).as("theil_within"))
      .orderBy(col("o_orderpriority"))
  }

  /** q401_mcnemar — McNemar's test for paired binary outcomes with
    * continuity correction: does the share of users who VIEW but never
    * PURCHASE differ from the share who purchase without viewing? Each
    * user is its own pair (the two "treatments" are observed on the
    * same subject), so the two-proportion z-test (q207) is wrong here —
    * only the DISCORDANT cells carry information: χ² = (|b−c|−1)²/(b+c)
    * on 1 dof, p = 2·Φ̄(√χ²). ONE map-side-combinable per-user
    * aggregation collapses the corpus to 4 counts; the test is O(1)
    * arithmetic on that frame — the plan is a single agg at any scale.
    */
  def q401Mcnemar(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1).otherwise(0))
        .as("__v"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("__p"))
    per.agg(
        count(when(col("__v") === 1 && col("__p") === 1, 1))
          .as("n_both"),
        count(when(col("__v") === 1 && col("__p") === 0, 1))
          .as("n_view_only"),
        count(when(col("__v") === 0 && col("__p") === 1, 1))
          .as("n_purchase_only"),
        count(when(col("__v") === 0 && col("__p") === 0, 1))
          .as("n_neither"))
      .withColumn("__b", col("n_view_only").cast("double"))
      .withColumn("__c", col("n_purchase_only").cast("double"))
      .withColumn("__chi2", try_divide(
        pow(abs(col("__b") - col("__c")) - 1, 2),
        col("__b") + col("__c")))
      .select(col("n_both"), col("n_view_only"), col("n_purchase_only"),
        col("n_neither"),
        (round(col("__chi2"), 4) + lit(0.0)).as("chi2_cc"),
        (round(lit(2.0) * phiUpper(sqrt(col("__chi2"))), 4) + lit(0.0))
          .as("p_value"))
  }

  /** q402_fisher_exact — Fisher's EXACT one-tailed test on the 2×2
    * "nation has above-mean supplier presence × above-mean customer
    * presence" table: p = Σ_{k≥a} C(r1,k)·C(r2,c1−k)/C(n,c1), the
    * hypergeometric tail — the correct small-count test where q198's
    * χ² approximation breaks (expected cells < 5). Scale shape: the
    * corpus (suppliers, customers) collapses by TWO map-side
    * aggregations to the 25-nation frame; the factorial ladder runs
    * over sequences bounded by |nations|, evaluated by the identical
    * left-fold Σln(j) in both engines (guarded: Spark `sequence` would
    * generate DESCENDING for start > stop, so x<2 short-circuits to 0).
    */
  def q402FisherExact(s: SparkSession, dir: String): DataFrame = {
    val ns = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("__ns"))
    val nc = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("__nc"))
    val nat = Tables.nation(s, dir).select(col("n_nationkey").as("nk"))
      .join(ns, Seq("nk"), "left").join(nc, Seq("nk"), "left")
      .na.fill(0L, Seq("__ns", "__nc"))
    val means = nat.agg(avg(col("__ns")).as("__ma"),
      avg(col("__nc")).as("__mb"))
    val cells = nat.crossJoin(broadcast(means))
      .select((col("__ns") > col("__ma")).as("__ha"),
        (col("__nc") > col("__mb")).as("__hb"))
      .agg(count(when(col("__ha") && col("__hb"), 1)).as("a"),
        count(when(col("__ha") && !col("__hb"), 1)).as("b"),
        count(when(!col("__ha") && col("__hb"), 1)).as("c"),
        count(when(!col("__ha") && !col("__hb"), 1)).as("d"))
    val withMargins = cells
      .withColumn("__r1", col("a") + col("b"))
      .withColumn("__r2", col("c") + col("d"))
      .withColumn("__c1", col("a") + col("c"))
      .withColumn("__n", col("__r1") + col("__r2"))
    withMargins
      .withColumn("k",
        explode(expr("sequence(a, least(__r1, __c1))")))
      .withColumn("__pmf", exp(
        lfE("__r1") + lfE("__r2") + lfE("__c1") + lfE("__n - __c1")
          - lfE("k") - lfE("__r1 - k") - lfE("__c1 - k")
          - lfE("__r2 - __c1 + k") - lfE("__n")))
      .groupBy(col("a"), col("b"), col("c"), col("d"))
      .agg(round(sum(col("__pmf")), 6).as("p_one_tail"))
  }

  // Guarded log-factorial ladder: ln(x!) = Σ_{j=2..x} ln j, 0 for x<2.
  // Spark sequence(2, x) is DESCENDING when x < 2, so the guard is
  // load-bearing; both engines fold the identical ln sum left-to-right.
  private def lfSqlGuard(x: String): String =
    s"CASE WHEN ($x) >= 2 THEN aggregate(sequence(2, ($x)), 0D, " +
      s"(acc, j) -> acc + ln(double(j))) ELSE 0D END"
  private def lfE(colName: String): Column = expr(lfSqlGuard(colName))
  private def lfDuck(x: String): String =
    s"coalesce(list_sum(list_transform(range(2, ($x)+1), " +
      s"j -> ln(j::DOUBLE))), 0.0)"

  /** q403_periodogram — discrete-Fourier periodogram of each type's
    * daily count series at candidate periods 2–10 days: I(p) =
    * 2·[(Σ(x−x̄)cos φ)² + (Σ(x−x̄)sin φ)²] / (n·Σ(x−x̄)²), φ =
    * 2π(t mod p)/p — the FREQUENCY-domain seasonality detector beside
    * q164's calendar profile and q381's PACF (which see lag-domain
    * structure only). The mod-p phase reduction keeps both engines'
    * cos/sin arguments in [0, 2π) where libm results agree to well
    * under the 4-dp rounding. Day-frame arithmetic: the corpus
    * collapses to |type×day| in ONE aggregation; the 9-period explode
    * runs on that bounded frame.
    */
  def q403Periodogram(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as("__x"))
    val base = daily.groupBy(col("event_type"))
      .agg(min(col("__day")).as("__d0"), count(lit(1)).as("n_days"),
        avg(col("__x")).as("__mu"),
        (sum(col("__x") * col("__x")) -
          sum(col("__x")) * avg(col("__x"))).as("__ss"))
    daily.join(base, Seq("event_type"))
      .withColumn("__t", datediff(col("__day"), col("__d0")))
      .withColumn("period", explode(array((2 to 10).map(lit): _*)))
      .withColumn("__phi",
        lit(2.0 * math.Pi) * (col("__t") % col("period")) /
          col("period"))
      .groupBy(col("event_type"), col("period"))
      .agg(max(col("n_days")).as("n_days"),
        sum((col("__x") - col("__mu")) * cos(col("__phi"))).as("__c"),
        sum((col("__x") - col("__mu")) * sin(col("__phi"))).as("__s"),
        max(col("__ss")).as("__ssm"))
      .select(col("event_type"), col("period"), col("n_days"),
        (round(try_divide(
          lit(2.0) * (col("__c") * col("__c") + col("__s") * col("__s")),
          col("n_days") * col("__ssm")), 4) + lit(0.0)).as("intensity"))
      .orderBy(col("event_type"), col("period"))
  }

  /** q404_runs_test — Wald–Wolfowitz runs test for randomness of each
    * type's daily-count series around its mean: too FEW runs of
    * consecutive above/below-mean days means positive serial
    * dependence (trends/regimes), too many means oscillation — the
    * distribution-free "is this series exchangeable at all" gate run
    * before any of the trend family (q223/q224) is trusted. R = 1 +
    * #sign changes; z = (R − (2n₊n₋/n + 1)) / √(2n₊n₋(2n₊n₋−n) /
    * (n²(n−1))), days equal to the mean dropped. One corpus
    * aggregation → day frame; the lag window runs per type on that
    * bounded frame.
    */
  def q404RunsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("double").as("__x"))
    val mu = daily.groupBy(col("event_type"))
      .agg(avg(col("__x")).as("__mu"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("__day"))
    daily.join(mu, Seq("event_type"))
      .filter(col("__x") =!= col("__mu"))
      .withColumn("__s", (col("__x") > col("__mu")).cast("int"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(when(col("__s") === 1, 1)).cast("double").as("__n1"),
        count(when(col("__s") === 0, 1)).cast("double").as("__n0"),
        sum(when(col("__prev").isNull ||
          col("__prev") =!= col("__s"), 1).otherwise(0)).as("runs"))
      .withColumn("__n", col("__n1") + col("__n0"))
      .withColumn("__muR",
        lit(2.0) * col("__n1") * col("__n0") / col("__n") + 1)
      .withColumn("__z", try_divide(col("runs") - col("__muR"),
        sqrt(try_divide(
          lit(2.0) * col("__n1") * col("__n0") *
            (lit(2.0) * col("__n1") * col("__n0") - col("__n")),
          col("__n") * col("__n") * (col("__n") - 1)))))
      .select(col("event_type"),
        col("__n1").cast("long").as("n_above"),
        col("__n0").cast("long").as("n_below"), col("runs"),
        (round(col("__z"), 4) + lit(0.0)).as("z"),
        (round(lit(2.0) * phiUpper(abs(col("__z"))), 4) + lit(0.0)).as("p_value"))
      .orderBy(col("event_type"))
  }

  /** q405_cochran_q — Cochran's Q test for k=3 PAIRED binary
    * treatments: per user, did they ever view / click / purchase, and
    * do the three success rates differ once each user is its own
    * block? Q = (k−1)(k·ΣT_j² − T²)/(k·ΣR_i − ΣR_i²) on k−1=2 dof,
    * where the χ² upper tail is EXACTLY exp(−Q/2) — no polynomial
    * approximation needed. The k-treatment generalization of q401's
    * McNemar (k=2 reduces to it); q341's Friedman is its ordinal
    * big brother. ONE per-user aggregation → one global moment
    * aggregation; O(1) arithmetic after.
    */
  def q405CochranQ(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1).otherwise(0))
        .as("__tv"),
        max(when(col("event_type") === "click", 1).otherwise(0))
          .as("__tc"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("__tp"))
      .withColumn("__r", col("__tv") + col("__tc") + col("__tp"))
    per.agg(count(lit(1)).as("n_users"),
        sum(col("__tv")).cast("double").as("__sv"),
        sum(col("__tc")).cast("double").as("__sc"),
        sum(col("__tp")).cast("double").as("__sp"),
        sum(col("__r")).cast("double").as("__sr"),
        sum(col("__r") * col("__r")).cast("double").as("__sr2"))
      .withColumn("__q", try_divide(
        lit(2.0) * (lit(3.0) * (col("__sv") * col("__sv") +
          col("__sc") * col("__sc") + col("__sp") * col("__sp")) -
          col("__sr") * col("__sr")),
        lit(3.0) * col("__sr") - col("__sr2")))
      .select(col("n_users"),
        col("__sv").cast("long").as("n_view"),
        col("__sc").cast("long").as("n_click"),
        col("__sp").cast("long").as("n_purchase"),
        round(col("__q"), 4).as("q_stat"),
        round(exp(-col("__q") / 2), 6).as("p_value"))
  }

  /** q415_mood_median — Mood's median test of l_quantity across the
    * three return-flag populations: count above/at-or-below the
    * POOLED median per group, Pearson χ² on the resulting 2×k table,
    * df = k−1 = 2 so the upper tail is exactly exp(−χ²/2). The
    * coarsest — and most outlier-immune — of the k-group location
    * tests: q310's Kruskal–Wallis uses full rank information, Mood
    * uses only the above/below bit, which is exactly what survives
    * heavy censoring or gross contamination. The pooled median is
    * `StatOps.exactPercentiles` (distributed selection, bit-identical
    * to quantile_cont); the contingency table is ONE
    * map-side-combinable aggregation over the corpus.
    */
  def q415MoodMedian(s: SparkSession, dir: String): DataFrame = {
    // one materialization feeds the pooled-median selection's passes +
    // the contingency pass (q311/q119 pattern)
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("__v"),
        lit(1).as("__all"))
      .localCheckpoint()
    val med = graft.ops.StatOps.exactPercentiles(li, "__all", "__v",
      Seq("med" -> 0.5)).select(col("med"))
    // cells is |groups| rows on top of the corpus contingency pass;
    // its consumers (margin totals, the χ² frame used twice) would
    // each re-run that pass AND the pooled-median selection feeding it
    // — checkpoint the 3-row frame once (q119 pattern, guide §2.4)
    val cells = li.crossJoin(broadcast(med))
      .groupBy(col("g"))
      .agg(count(when(col("__v") > col("med"), 1)).cast("double")
        .as("__a"),
        count(when(col("__v") <= col("med"), 1)).cast("double")
          .as("__b"),
        max(col("med")).as("__med"))
      .localCheckpoint()
    val tot = cells.agg(sum(col("__a")).as("__ta"),
      sum(col("__b")).as("__tb"))
    val chi = cells.crossJoin(broadcast(tot))
      .withColumn("__n_i", col("__a") + col("__b"))
      .withColumn("__ea",
        col("__ta") * col("__n_i") / (col("__ta") + col("__tb")))
      .withColumn("__eb",
        col("__tb") * col("__n_i") / (col("__ta") + col("__tb")))
      .withColumn("__cell",
        try_divide((col("__a") - col("__ea")) *
          (col("__a") - col("__ea")), col("__ea")) +
          try_divide((col("__b") - col("__eb")) *
            (col("__b") - col("__eb")), col("__eb")))
    val stat = chi.agg(sum(col("__cell")).as("__chi2"))
    chi.crossJoin(broadcast(stat))
      .select(col("g").as("l_returnflag"),
        col("__a").cast("long").as("n_above"),
        col("__b").cast("long").as("n_at_or_below"),
        round(col("__med"), 2).as("pooled_median"),
        (round(col("__chi2"), 4) + lit(0.0)).as("chi2"),
        (round(exp(-col("__chi2") / 2), 6) + lit(0.0)).as("p_value"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "q415_mood_median" -> (q415MoodMedian _),
    "q401_mcnemar" -> (q401Mcnemar _),
    "q402_fisher_exact" -> (q402FisherExact _),
    "q403_periodogram" -> (q403Periodogram _),
    "q404_runs_test" -> (q404RunsTest _),
    "q405_cochran_q" -> (q405CochranQ _),
    "q390_theil_decomp" -> (q390TheilDecomp _),
    "q379_kendall_tau" -> (q379KendallTau _),
    "q380_wilcoxon" -> (q380Wilcoxon _),
    "q381_pacf" -> (q381Pacf _),
    "q382_ccf" -> (q382Ccf _),
    "q363_anderson_darling" -> (q363AndersonDarling _),
    "q359_wasserstein" -> (q359Wasserstein _),
    "q355_cramer_von_mises" -> (q355CramerVonMises _),
    "q350_jarque_bera" -> (q350JarqueBera _),
    "q340_cronbach_alpha" -> (q340CronbachAlpha _),
    "q341_friedman" -> (q341Friedman _),
    "q335_dunn_posthoc" -> (q335DunnPosthoc _),
    "q310_kruskal_wallis" -> (q310KruskalWallis _),
    "q311_brown_forsythe" -> (q311BrownForsythe _),
    "q312_max_drawdown" -> (q312MaxDrawdown _),
    "q313_neyman_allocation" -> (q313NeymanAllocation _),
  )

  val oracle: Map[String, String] = Map(
    "q415_mood_median" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |    l_quantity::DOUBLE AS v FROM lineitem),
        |m AS (SELECT quantile_cont(v, 0.5) AS med FROM li),
        |c AS (SELECT g,
        |    count(CASE WHEN v > med THEN 1 END)::DOUBLE AS a,
        |    count(CASE WHEN v <= med THEN 1 END)::DOUBLE AS b,
        |    max(med) AS med
        |  FROM li, m GROUP BY 1),
        |t AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c),
        |x AS (SELECT c.*, t.ta, t.tb, a + b AS ni,
        |    ta * (a + b) / (ta + tb) AS ea,
        |    tb * (a + b) / (ta + tb) AS eb
        |  FROM c, t),
        |cc AS (SELECT *,
        |    (a - ea) * (a - ea) / nullif(ea, 0) +
        |    (b - eb) * (b - eb) / nullif(eb, 0) AS cell
        |  FROM x),
        |s AS (SELECT sum(cell) AS chi2 FROM cc)
        |SELECT cc.g AS l_returnflag, cc.a::BIGINT AS n_above,
        |  cc.b::BIGINT AS n_at_or_below,
        |  round(cc.med, 2) AS pooled_median,
        |  (round(s.chi2, 4) + 0.0) AS chi2,
        |  (round(exp(-s.chi2 / 2), 6) + 0.0) AS p_value
        |FROM cc, s ORDER BY cc.g""".stripMargin,
    "q401_mcnemar" ->
      s"""WITH per AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS p
        |  FROM events GROUP BY 1),
        |c AS (SELECT
        |    count(CASE WHEN v = 1 AND p = 1 THEN 1 END)::BIGINT
        |      AS n_both,
        |    count(CASE WHEN v = 1 AND p = 0 THEN 1 END)::BIGINT
        |      AS n_view_only,
        |    count(CASE WHEN v = 0 AND p = 1 THEN 1 END)::BIGINT
        |      AS n_purchase_only,
        |    count(CASE WHEN v = 0 AND p = 0 THEN 1 END)::BIGINT
        |      AS n_neither
        |  FROM per),
        |x AS (SELECT *,
        |    pow(abs(n_view_only::DOUBLE - n_purchase_only) - 1, 2) /
        |      nullif(n_view_only + n_purchase_only, 0) AS chi2
        |  FROM c)
        |SELECT n_both, n_view_only, n_purchase_only, n_neither,
        |  (round(chi2, 4) + 0.0) AS chi2_cc,
        |  round(2 * ${phiUpperSql("sqrt(chi2)")}, 4) AS p_value
        |FROM x""".stripMargin,
    "q402_fisher_exact" ->
      s"""WITH ns AS (SELECT s_nationkey AS nk, count(*)::BIGINT AS cs
        |  FROM supplier GROUP BY 1),
        |ncu AS (SELECT c_nationkey AS nk, count(*)::BIGINT AS cc
        |  FROM customer GROUP BY 1),
        |nat AS (SELECT n.n_nationkey AS nk, coalesce(ns.cs, 0) AS cs,
        |    coalesce(ncu.cc, 0) AS cc
        |  FROM nation n LEFT JOIN ns ON n.n_nationkey = ns.nk
        |  LEFT JOIN ncu ON n.n_nationkey = ncu.nk),
        |m AS (SELECT avg(cs) AS ma, avg(cc) AS mb FROM nat),
        |cells AS (SELECT
        |    count(CASE WHEN cs > ma AND cc > mb THEN 1 END)::BIGINT
        |      AS a,
        |    count(CASE WHEN cs > ma AND cc <= mb THEN 1 END)::BIGINT
        |      AS b,
        |    count(CASE WHEN cs <= ma AND cc > mb THEN 1 END)::BIGINT
        |      AS c,
        |    count(CASE WHEN cs <= ma AND cc <= mb THEN 1 END)::BIGINT
        |      AS d
        |  FROM nat, m),
        |mg AS (SELECT *, a + b AS r1, c + d AS r2, a + c AS c1,
        |    a + b + c + d AS n FROM cells),
        |kk AS (SELECT mg.*, unnest(range(a, least(r1, c1) + 1)) AS k
        |  FROM mg),
        |t AS (SELECT a, b, c, d,
        |    exp(${lfDuck("r1")} + ${lfDuck("r2")} + ${lfDuck("c1")}
        |      + ${lfDuck("n - c1")} - ${lfDuck("k")}
        |      - ${lfDuck("r1 - k")} - ${lfDuck("c1 - k")}
        |      - ${lfDuck("r2 - c1 + k")} - ${lfDuck("n")}) AS pmf
        |  FROM kk)
        |SELECT a, b, c, d, round(sum(pmf), 6) AS p_one_tail
        |FROM t GROUP BY 1, 2, 3, 4""".stripMargin,
    "q403_periodogram" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(day) AS d0,
        |    count(*)::BIGINT AS n_days, avg(x) AS mu,
        |    sum(x * x) - sum(x) * avg(x) AS ss
        |  FROM d GROUP BY 1),
        |e AS (SELECT d.event_type, p.period, b.n_days,
        |    d.x - b.mu AS xc,
        |    2 * pi() * (date_diff('day', b.d0, d.day) % p.period)
        |      / p.period AS phi,
        |    b.ss
        |  FROM d JOIN b ON d.event_type = b.event_type,
        |    (SELECT unnest(range(2, 11)) AS period) p)
        |SELECT event_type, period, n_days,
        |  (round(2 * (pow(sum(xc * cos(phi)), 2) +
        |      pow(sum(xc * sin(phi)), 2)) /
        |    nullif(n_days * max(ss), 0), 4) + 0.0) AS intensity
        |FROM e GROUP BY event_type, period, n_days
        |ORDER BY event_type, period""".stripMargin,
    "q404_runs_test" ->
      s"""WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, avg(x) AS mu FROM d GROUP BY 1),
        |s AS (SELECT d.event_type, d.day,
        |    CASE WHEN d.x > m.mu THEN 1 ELSE 0 END AS sgn
        |  FROM d JOIN m ON d.event_type = m.event_type
        |  WHERE d.x <> m.mu),
        |r AS (SELECT event_type, sgn,
        |    lag(sgn) OVER (PARTITION BY event_type ORDER BY day)
        |      AS prev
        |  FROM s),
        |a AS (SELECT event_type,
        |    count(CASE WHEN sgn = 1 THEN 1 END)::DOUBLE AS n1,
        |    count(CASE WHEN sgn = 0 THEN 1 END)::DOUBLE AS n0,
        |    sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1
        |      ELSE 0 END)::BIGINT AS runs
        |  FROM r GROUP BY 1),
        |z AS (SELECT *,
        |    (runs - (2 * n1 * n0 / (n1 + n0) + 1)) /
        |      nullif(sqrt(2 * n1 * n0 * (2 * n1 * n0 - (n1 + n0)) /
        |        nullif((n1 + n0) * (n1 + n0) * (n1 + n0 - 1), 0)), 0)
        |      AS zz
        |  FROM a)
        |SELECT event_type, n1::BIGINT AS n_above,
        |  n0::BIGINT AS n_below, runs,
        |  round(zz, 4) AS z,
        |  round(2 * ${phiUpperSql("abs(zz)")}, 4) AS p_value
        |FROM z ORDER BY event_type""".stripMargin,
    "q405_cochran_q" ->
      """WITH per AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS tv,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS tc,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS tp
        |  FROM events GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_users,
        |    sum(tv)::DOUBLE AS sv, sum(tc)::DOUBLE AS sc,
        |    sum(tp)::DOUBLE AS sp,
        |    sum(tv + tc + tp)::DOUBLE AS sr,
        |    sum((tv + tc + tp) * (tv + tc + tp))::DOUBLE AS sr2
        |  FROM per),
        |q AS (SELECT *,
        |    2 * (3 * (sv * sv + sc * sc + sp * sp) - sr * sr) /
        |      nullif(3 * sr - sr2, 0) AS qs
        |  FROM a)
        |SELECT n_users, sv::BIGINT AS n_view, sc::BIGINT AS n_click,
        |  sp::BIGINT AS n_purchase, round(qs, 4) AS q_stat,
        |  round(exp(-qs / 2), 6) AS p_value FROM q""".stripMargin,
    "q390_theil_decomp" ->
      """WITH g AS (SELECT o_orderpriority,
        |    count(*)::DOUBLE AS n, sum(o_totalprice) AS s,
        |    sum(o_totalprice * ln(o_totalprice)) AS sl
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(sl) AS tsl
        |  FROM g),
        |w AS (SELECT g.*, t.tn, t.ts, t.tsl, g.s / g.n AS mu_g,
        |    t.ts / t.tn AS mu, g.s / t.ts AS share,
        |    g.sl / g.s - ln(g.s / g.n) AS tg
        |  FROM g, t),
        |b AS (SELECT sum(share * ln(mu_g / mu)) AS tb,
        |    sum(share * tg) AS tw,
        |    max(tsl / ts - ln(mu)) AS tt FROM w)
        |SELECT o_orderpriority, n::BIGINT AS n,
        |  round(share, 4) AS income_share,
        |  round(tg, 6) AS theil_within_group,
        |  round(tt, 6) AS theil_total,
        |  (round(tb, 6) + 0.0) AS theil_between,
        |  (round(tw, 6) + 0.0) AS theil_within
        |FROM w, b ORDER BY o_orderpriority""".stripMargin,
    "q379_kendall_tau" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS x, avg(value) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
        |  FROM d a JOIN d b ON a.event_type = b.event_type
        |    AND a.day < b.day)
        |SELECT event_type, count(*)::BIGINT AS n_pairs,
        |  count(CASE WHEN sx * sy > 0 THEN 1 END)::BIGINT
        |    AS concordant,
        |  count(CASE WHEN sx * sy < 0 THEN 1 END)::BIGINT
        |    AS discordant,
        |  (round((count(CASE WHEN sx * sy > 0 THEN 1 END) -
        |      count(CASE WHEN sx * sy < 0 THEN 1 END)) /
        |    nullif(sqrt((count(*) -
        |        count(CASE WHEN sx = 0 THEN 1 END))::DOUBLE *
        |      (count(*) - count(CASE WHEN sy = 0 THEN 1 END))), 0), 4) + 0.0)
        |    AS tau_b
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q380_wilcoxon" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |df AS (SELECT a.event_type, a.n - b.n AS dd
        |  FROM d a JOIN d b ON a.event_type = b.event_type
        |    AND b.day = a.day - INTERVAL 7 DAY
        |  WHERE a.n - b.n <> 0),
        |g AS (SELECT event_type, abs(dd) AS ad,
        |    count(*)::BIGINT AS cnt,
        |    count(CASE WHEN dd > 0 THEN 1 END)::BIGINT AS pos
        |  FROM df GROUP BY 1, 2),
        |rk AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
        |    ORDER BY ad ROWS UNBOUNDED PRECEDING) - (cnt - 1) / 2.0
        |    AS avgrk FROM g),
        |agg AS (SELECT event_type, sum(cnt)::BIGINT AS n_pairs,
        |    sum(pos * avgrk) AS w_plus,
        |    sum(cnt * (cnt * cnt - 1)) AS tie3
        |  FROM rk GROUP BY 1)
        |SELECT event_type, n_pairs, (round(w_plus, 1) + 0.0) AS w_plus,
        |  (round((w_plus - n_pairs * (n_pairs + 1.0) / 4) /
        |    nullif(sqrt(n_pairs * (n_pairs + 1.0) *
        |      (2 * n_pairs + 1) / 24 - tie3 / 48.0), 0), 4) + 0.0) AS z
        |FROM agg ORDER BY event_type""".stripMargin,
    "q381_pacf" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |    count(*)::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(v, 1) OVER (PARTITION BY event_type
        |    ORDER BY day) AS l1, lag(v, 2) OVER (
        |    PARTITION BY event_type ORDER BY day) AS l2 FROM d),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_days,
        |  (count(l1) * sum(CASE WHEN l1 IS NOT NULL THEN v * l1 END) -
        |    sum(CASE WHEN l1 IS NOT NULL THEN v END) * sum(l1)) /
        |  nullif(sqrt((count(l1) *
        |      sum(CASE WHEN l1 IS NOT NULL THEN v * v END) -
        |      sum(CASE WHEN l1 IS NOT NULL THEN v END) ^ 2) *
        |    (count(l1) * sum(l1 * l1) - sum(l1) ^ 2)), 0) AS r1,
        |  (count(l2) * sum(CASE WHEN l2 IS NOT NULL THEN v * l2 END) -
        |    sum(CASE WHEN l2 IS NOT NULL THEN v END) * sum(l2)) /
        |  nullif(sqrt((count(l2) *
        |      sum(CASE WHEN l2 IS NOT NULL THEN v * v END) -
        |      sum(CASE WHEN l2 IS NOT NULL THEN v END) ^ 2) *
        |    (count(l2) * sum(l2 * l2) - sum(l2) ^ 2)), 0) AS r2
        |  FROM l GROUP BY 1)
        |SELECT event_type, n_days, (round(r1, 4) + 0.0) AS pacf1,
        |  (round((r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0), 4) + 0.0) AS pacf2
        |FROM a ORDER BY event_type""".stripMargin,
    "q382_ccf" ->
      """WITH x AS (SELECT ts::DATE AS day, count(*)::DOUBLE AS x
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |y AS (SELECT ts::DATE AS day, count(*)::DOUBLE AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |k AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        |j AS (SELECT k.lag, x.x, y.y FROM x CROSS JOIN k
        |  JOIN y ON y.day = x.day + k.lag::INTEGER),
        |a AS (SELECT lag, count(*)::BIGINT AS n_days, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
        |    sum(y * y) AS syy
        |  FROM j GROUP BY 1)
        |SELECT lag, n_days,
        |  (round((n_days * sxy - sx * sy) /
        |    nullif(sqrt((n_days * sxx - sx * sx) *
        |      (n_days * syy - sy * sy)), 0), 4) + 0.0) AS ccf
        |FROM a ORDER BY lag""".stripMargin,
    "q363_anderson_darling" ->
      """WITH e AS (SELECT event_type AS g, value::DOUBLE AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |pv AS (SELECT v,
        |    count(CASE WHEN g = 'click' THEN 1 END)::BIGINT AS cn,
        |    count(CASE WHEN g = 'purchase' THEN 1 END)::BIGINT AS cm
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, cn, cm, cn + cm AS l,
        |    sum(cn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fn,
        |    sum(cm) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS gm,
        |    sum(cn + cm) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS b
        |  FROM pv),
        |t AS (SELECT sum(cn)::DOUBLE AS n, sum(cm)::DOUBLE AS m
        |  FROM pv),
        |j AS (SELECT c.*, t.n, t.m, t.n + t.m AS nn,
        |    2.0 * (t.n + t.m) * c.fn - (t.n + t.m) * c.cn -
        |      2.0 * t.n * c.b + t.n * c.l AS u1,
        |    2.0 * (t.n + t.m) * c.gm - (t.n + t.m) * c.cm -
        |      2.0 * t.m * c.b + t.m * c.l AS u2,
        |    (2.0 * c.b - c.l) * (2.0 * (t.n + t.m) - 2.0 * c.b + c.l)
        |      - (t.n + t.m) * c.l AS d4
        |  FROM c CROSS JOIN t),
        |s AS (SELECT max(n) AS n, max(m) AS m, max(nn) AS nn,
        |    sum(l * u1 * u1 / nullif(d4, 0)) AS s1,
        |    sum(l * u2 * u2 / nullif(d4, 0)) AS s2
        |  FROM j)
        |SELECT n::BIGINT AS n, m::BIGINT AS m,
        |  (round((nn - 1) / nn * (s1 / (nn * n) + s2 / (nn * m)), 4) + 0.0)
        |    AS ad_stat
        |FROM s""".stripMargin,
    "q359_wasserstein" ->
      """WITH e AS (SELECT event_type AS g, value::DOUBLE AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |pv AS (SELECT v,
        |    count(CASE WHEN g = 'click' THEN 1 END)::BIGINT AS cn,
        |    count(CASE WHEN g = 'purchase' THEN 1 END)::BIGINT AS cm
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, cn, cm,
        |    sum(cn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fn,
        |    sum(cm) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS gm,
        |    lead(v) OVER (ORDER BY v) - v AS gap
        |  FROM pv),
        |t AS (SELECT sum(cn)::BIGINT AS n, sum(cm)::BIGINT AS m
        |  FROM pv),
        |s AS (SELECT max(t.n) AS n, max(t.m) AS m,
        |    sum(c.gap * abs((t.m * c.fn - t.n * c.gm)::DOUBLE)) AS sq
        |  FROM c CROSS JOIN t WHERE c.gap IS NOT NULL)
        |SELECT n, m, (round(sq / (n * m), 4) + 0.0) AS w1_distance
        |FROM s""".stripMargin,
    "q355_cramer_von_mises" ->
      """WITH e AS (SELECT event_type AS g, value::DOUBLE AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |pv AS (SELECT v,
        |    count(CASE WHEN g = 'click' THEN 1 END)::BIGINT AS cn,
        |    count(CASE WHEN g = 'purchase' THEN 1 END)::BIGINT AS cm
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, cn, cm,
        |    sum(cn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fn,
        |    sum(cm) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS gm
        |  FROM pv),
        |t AS (SELECT sum(cn)::BIGINT AS n, sum(cm)::BIGINT AS m
        |  FROM pv),
        |s AS (SELECT max(t.n) AS n, max(t.m) AS m,
        |    sum((c.cn + c.cm)::DOUBLE *
        |      pow((t.m * c.fn - t.n * c.gm)::DOUBLE, 2)) AS sq
        |  FROM c CROSS JOIN t)
        |SELECT n, m,
        |  (round(sq / (pow((n + m)::DOUBLE, 2) * n * m), 4) + 0.0)
        |    AS cvm_stat,
        |  sq / (pow((n + m)::DOUBLE, 2) * n * m) > 0.461 AS rejected
        |FROM s""".stripMargin,
    "q350_jarque_bera" ->
      """WITH e AS (SELECT event_type, value::DOUBLE AS x FROM events),
        |m AS (SELECT event_type, avg(x) AS m FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, e.x - m.m AS d
        |  FROM e JOIN m USING (event_type)),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    avg(d * d) AS m2, avg(d * d * d) AS m3,
        |    avg(d * d * d * d) AS m4
        |  FROM d GROUP BY 1),
        |st AS (SELECT event_type, n, m3 / pow(m2, 1.5) AS skew,
        |    m4 / (m2 * m2) AS kurt FROM a),
        |jb AS (SELECT *, n / 6.0 * (skew * skew +
        |    (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb FROM st)
        |SELECT event_type, n, round(skew, 4) AS skewness,
        |  round(kurt, 4) AS kurtosis, round(jb, 4) AS jb_stat,
        |  round(exp(-jb / 2), 4) AS p_value,
        |  exp(-jb / 2) < 0.05 AS non_normal
        |FROM jb ORDER BY event_type""".stripMargin,
    "q340_cronbach_alpha" ->
      """WITH u AS (SELECT user_id,
        |    count(CASE WHEN event_type = 'click' THEN 1 END)
        |      ::BIGINT AS i1,
        |    count(CASE WHEN event_type = 'error' THEN 1 END)
        |      ::BIGINT AS i2,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      ::BIGINT AS i3,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END)
        |      ::BIGINT AS i4,
        |    count(CASE WHEN event_type = 'view' THEN 1 END)
        |      ::BIGINT AS i5
        |  FROM events GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_users,
        |    var_samp(i1) + var_samp(i2) + var_samp(i3) +
        |      var_samp(i4) + var_samp(i5) AS sv,
        |    var_samp(i1 + i2 + i3 + i4 + i5) AS vt FROM u)
        |SELECT 5 AS k, n_users, (round(sv, 4) + 0.0) AS sum_item_var,
        |  (round(vt, 4) + 0.0) AS total_var,
        |  (round(5.0 / 4.0 * (1.0 - sv / vt), 4) + 0.0) AS alpha
        |FROM a""".stripMargin,
    "q341_friedman" ->
      s"""WITH wk AS (SELECT
        |    floor(date_diff('day', DATE '2024-01-01', ts::DATE) / 7.0)
        |      ::BIGINT AS wk, event_type,
        |    count(*)::DOUBLE AS cnt
        |  FROM events GROUP BY 1, 2),
        |cmp AS (SELECT wk FROM wk GROUP BY wk HAVING count(*) = 5),
        |b AS (SELECT wk.* FROM wk JOIN cmp USING (wk)),
        |pv AS (SELECT wk, cnt, count(*)::BIGINT AS c FROM b
        |  GROUP BY 1, 2),
        |rk AS (SELECT wk, cnt,
        |    sum(c) OVER (PARTITION BY wk ORDER BY cnt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - c + (c + 1) / 2.0 AS rank
        |  FROM pv),
        |rj AS (SELECT event_type, sum(rk.rank) AS rj,
        |    count(*)::BIGINT AS nb
        |  FROM b JOIN rk ON b.wk = rk.wk AND b.cnt = rk.cnt
        |  GROUP BY 1),
        |st AS (SELECT max(nb)::BIGINT AS b, sum(rj * rj) AS s
        |  FROM rj),
        |c2 AS (SELECT b,
        |    12.0 / (b * 5 * 6) * s - 3.0 * b * 6 AS chi2 FROM st),
        |z AS (SELECT b, chi2, (pow(chi2 / 4.0, 1.0 / 3) -
        |    (1.0 - 2.0 / 36.0)) / sqrt(2.0 / 36.0) AS z FROM c2),
        |p AS (SELECT *, CASE WHEN z >= 0 THEN ${phiUpperSql("z")}
        |    ELSE 1.0 - ${phiUpperSql("-z")} END AS p FROM z)
        |SELECT b, 5 AS k, (round(chi2, 4) + 0.0) AS chi2_f, 4 AS df,
        |  round(p, 4) AS p_value, p < 0.05 AS significant
        |FROM p""".stripMargin,
    "q335_dunn_posthoc" ->
      s"""WITH li AS (SELECT l_returnflag AS g,
        |    l_quantity::DOUBLE AS v FROM lineitem),
        |pgv AS (SELECT g, v, count(*)::BIGINT AS c FROM li
        |  GROUP BY 1, 2),
        |pv AS (SELECT v, sum(c)::BIGINT AS cv FROM pgv GROUP BY 1),
        |rk AS (SELECT v, cv,
        |    sum(cv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) - cv + (cv + 1) / 2.0 AS rank
        |  FROM pv),
        |gl AS (SELECT sum(cv)::BIGINT AS n,
        |    sum(cv * cv * cv - cv)::DOUBLE AS tie FROM rk),
        |pg AS (SELECT g, sum(c)::BIGINT AS ng,
        |    sum(c * rk.rank) / sum(c)::DOUBLE AS rbar
        |  FROM pgv JOIN rk ON pgv.v = rk.v GROUP BY g),
        |pr AS (SELECT a.g AS group_a, b.g AS group_b,
        |    a.ng AS na, b.ng AS nb, a.rbar AS ra, b.rbar AS rb
        |  FROM pg a JOIN pg b ON a.g < b.g),
        |z AS (SELECT *,
        |    (n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))) AS V
        |  FROM pr, gl),
        |zz AS (SELECT *, (ra - rb) /
        |    sqrt(V * (1.0 / na + 1.0 / nb)) AS z FROM z),
        |p AS (SELECT *, 2.0 * ${phiUpperSql("abs(z)")} AS p FROM zz)
        |SELECT group_a, group_b, na AS n_a, nb AS n_b,
        |  (round(z, 4) + 0.0) AS z, round(p, 6) AS p_value,
        |  round(least(1.0, 3.0 * p), 6) AS p_adj,
        |  least(1.0, 3.0 * p) < 0.05 AS significant
        |FROM p ORDER BY group_a, group_b""".stripMargin,
    "q310_kruskal_wallis" ->
      s"""WITH li AS (SELECT l_returnflag AS g,
        |    l_quantity::DOUBLE AS v FROM lineitem),
        |pgv AS (SELECT g, v, count(*)::BIGINT AS c FROM li
        |  GROUP BY 1, 2),
        |pv AS (SELECT v, sum(c)::BIGINT AS cv FROM pgv GROUP BY 1),
        |rk AS (SELECT v, cv,
        |    sum(cv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) - cv + (cv + 1) / 2.0 AS rank
        |  FROM pv),
        |t AS (SELECT sum(cv)::BIGINT AS n,
        |    sum(cv * cv * cv - cv)::DOUBLE AS tie FROM rk),
        |pg AS (SELECT g, sum(c)::BIGINT AS ng,
        |    sum(c * rk.rank) AS rs
        |  FROM pgv JOIN rk ON pgv.v = rk.v GROUP BY g),
        |agg AS (SELECT count(*)::BIGINT AS k,
        |    sum(rs * rs / ng) AS s FROM pg),
        |h AS (SELECT k, n,
        |    12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0) AS h,
        |    1.0 - tie / (n::DOUBLE * n * n - n) AS c
        |  FROM agg, t),
        |ha AS (SELECT k, n, h, h / c AS ha, (k - 1)::BIGINT AS df
        |  FROM h),
        |z AS (SELECT *, (pow(ha / df, 1.0 / 3) -
        |    (1.0 - 2.0 / (9.0 * df))) / sqrt(2.0 / (9.0 * df)) AS z
        |  FROM ha),
        |p AS (SELECT *, CASE WHEN z >= 0 THEN ${phiUpperSql("z")}
        |    ELSE 1.0 - ${phiUpperSql("-z")} END AS p FROM z)
        |SELECT k, n, round(h, 4) AS h_stat, round(ha, 4) AS h_adj,
        |  df, round(p, 4) AS p_value, p < 0.05 AS significant
        |FROM p""".stripMargin,
    "q311_brown_forsythe" ->
      s"""WITH li AS (SELECT l_returnflag AS g,
        |    l_extendedprice::DOUBLE AS x FROM lineitem),
        |med AS (SELECT g, quantile_cont(x, 0.5) AS med FROM li
        |  GROUP BY 1),
        |z AS (SELECT li.g, abs(li.x - med.med) AS z
        |  FROM li JOIN med ON li.g = med.g),
        |pg AS (SELECT g, count(*)::BIGINT AS ng, sum(z) AS sz,
        |    sum(z * z) AS sz2 FROM z GROUP BY 1),
        |agg AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
        |    sum(sz) AS tz,
        |    sum(sz2 - sz * sz / ng) AS within,
        |    sum(sz * sz / ng) AS bsq FROM pg),
        |f AS (SELECT k, n, (bsq - tz * tz / n) AS between_ss, within
        |  FROM agg),
        |fs AS (SELECT k, n,
        |    (between_ss / (k - 1.0)) / (within / (n - k)) AS f,
        |    (k - 1)::BIGINT AS df1, (n - k)::BIGINT AS df2 FROM f),
        |z2 AS (SELECT *, f * df1 AS x2,
        |    (pow(f * df1 / df1, 1.0 / 3) -
        |      (1.0 - 2.0 / (9.0 * df1))) / sqrt(2.0 / (9.0 * df1))
        |      AS z FROM fs),
        |p AS (SELECT *, CASE WHEN z >= 0 THEN ${phiUpperSql("z")}
        |    ELSE 1.0 - ${phiUpperSql("-z")} END AS p FROM z2)
        |SELECT k, n, round(f, 4) AS f_stat, df1, df2,
        |  round(p, 4) AS p_approx, p < 0.05 AS heteroscedastic
        |FROM p""".stripMargin,
    "q312_max_drawdown" ->
      """WITH cu AS (SELECT user_id, ts, event_id,
        |    sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM events),
        |c AS (SELECT user_id, cum,
        |    max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM cu)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  round(max(peak - cum), 4) AS max_drawdown,
        |  round(max(peak), 4) AS peak_value
        |FROM c GROUP BY 1
        |ORDER BY max_drawdown DESC, user_id LIMIT 10""".stripMargin,
    "q313_neyman_allocation" ->
      """WITH g AS (SELECT o_orderpriority AS stratum,
        |    count(*)::BIGINT AS n_h,
        |    stddev_samp(o_totalprice) AS sd FROM orders GROUP BY 1),
        |sh AS (SELECT *, n_h * sd AS w FROM g),
        |id AS (SELECT *,
        |    (round(1000 * w / sum(w) OVER (), 6) + 0.0) AS ideal FROM sh),
        |fl AS (SELECT *, floor(ideal)::BIGINT AS f,
        |    (round(ideal - floor(ideal), 6) + 0.0) AS rem FROM id),
        |rk AS (SELECT *, 1000 - sum(f) OVER () AS short,
        |    row_number() OVER (ORDER BY rem DESC, stratum) AS rk
        |  FROM fl)
        |SELECT stratum, n_h, (round(sd, 4) + 0.0) AS sd_h,
        |  (round(ideal, 2) + 0.0) AS ideal,
        |  (f + CASE WHEN rk <= short THEN 1 ELSE 0 END)::BIGINT
        |    AS alloc
        |FROM rk ORDER BY stratum""".stripMargin,
  )
}
