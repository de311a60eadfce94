package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation analytics the reference computes driver-side with
  * sklearn/MLlib evaluators (`random_forest_final_class_8.py:237-261`,
  * `timely_LR.py:125-148`) or not at all, re-expressed as distributed
  * Spark plans so they run inside the engine at corpus scale:
  *
  *  - per-group simple OLS regression (closed form from raw sums),
  *  - Mann-Whitney / rank-sum ROC AUC with tie-averaged ranks,
  *  - decision-stump split search (weighted Gini over candidate
  *    thresholds) — the inner loop of the reference's tree learners.
  *
  * All three reduce the data to a bounded aggregate (|groups|,
  * |distinct scores|, |distinct thresholds|) before any window runs, so
  * the unbounded input is consumed by one map-side-combined shuffle and
  * the window/sort operates on the small summary frame — the shape that
  * holds at 100 TB.
  */
object ModelEvalOps {

  /** Per-group simple OLS of y on x, computed from raw co-moments
    * (n, Σx, Σy, Σxy, Σx², Σy²) in ONE map-side-combined aggregation —
    * no second pass, no driver collect. slope/intercept/r² derive in
    * the projection. The identical closed form runs in the oracle so
    * both engines share the arithmetic (4-dp rounding absorbs
    * partition-order float noise, PERF_NOTES R4 float-sum rule).
    */
  def groupRegression(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
      .select(col(groupCol), col("n"),
        // try_divide: a constant-x group has zero Sxx — null out, never
        // throw (DivisionAuditSpec's degenerate corpus)
        (round(try_divide(
          col("n") * col("__sxy") - col("__sx") * col("__sy"),
          col("n") * col("__sxx") - col("__sx") * col("__sx")), 4) + lit(0.0))
          .as("slope"),
        (round((col("__sy") - try_divide(
          col("n") * col("__sxy") - col("__sx") * col("__sy"),
          col("n") * col("__sxx") - col("__sx") * col("__sx")) *
          col("__sx")) / col("n"), 4) + lit(0.0)).as("intercept"),
        (round(try_divide(
          (col("n") * col("__sxy") - col("__sx") * col("__sy")) *
            (col("n") * col("__sxy") - col("__sx") * col("__sy")),
          (col("n") * col("__sxx") - col("__sx") * col("__sx")) *
            (col("n") * col("__syy") - col("__sy") * col("__sy"))), 4) + lit(0.0))
          .as("r2"))
  }

  /** Per-group ROC AUC via the Mann-Whitney rank-sum identity with
    * tie-averaged ranks: collapse to one row per (group, score) with
    * (cnt, pos) counts, cumulative-count window → average rank of the
    * tie block, then AUC = (Σ_pos rank − P(P+1)/2) / (P·N).
    *
    * Every intermediate is an integer or an exact half-integer in
    * doubles, so the result is BIT-exact and partition-order-free —
    * no rounding tolerance needed (4 dp kept for report formatting).
    * The window runs over |distinct scores| rows per group, not raw
    * rows; the raw pass is one map-side-combined count shuffle.
    */
  def rankAuc(df: DataFrame, groupCol: String, scoreCol: String,
      posCond: Column): DataFrame = {
    val perScore = df
      .groupBy(col(groupCol), col(scoreCol).cast("double").as("__score"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(posCond, lit(1))).as("__pos"))
    // per-group mid-ranks over distinct scores: the group key is low-
    // cardinality, so the plain partitionBy(g) cumulative window held
    // each group's whole distinct-score frame (corpus-proportional for
    // continuous scores) in one task — StatOps.withMidRanks runs the
    // cumulative through shardedCumsumBy; long-count sums make the
    // decomposition bit-exact (round-10 window audit)
    StatOps.withMidRanks(perScore, groupCol, "__score", "__cnt", "__rank")
      .groupBy(col(groupCol))
      .agg(sum(col("__pos")).as("n_pos"),
        sum(col("__cnt") - col("__pos")).as("n_neg"),
        sum(col("__pos") * col("__rank")).as("__rp"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        (round((col("__rp") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos") * col("n_neg")), 4) + lit(0.0)).as("auc"))
  }

  /** Decision-stump split search — the inner loop of the reference's
    * DecisionTree/RandomForest grid (`decision_tree_final_class_8
    * .py:229-232`) as a declarative plan: one count aggregation per
    * distinct feature value, a cumulative window over the sorted
    * candidate frame, and weighted binary Gini for the (≤ t | > t)
    * partition at every candidate threshold. Returns the topK lowest-
    * impurity splits (6-dp impurity key, threshold tiebreak — both
    * engines evaluate the identical integer-ratio formula).
    *
    * The raw table is consumed by the value-histogram aggregation
    * (map-side combine, |distinct values| output rows); the window and
    * top-k sort touch only that summary, exactly how MLlib's binned
    * split evaluation scales.
    */
  def bestSplit(df: DataFrame, featureCol: String, posCond: Column,
      topK: Int): DataFrame = {
    val perV = df.groupBy(col(featureCol).cast("double").as("threshold"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(posCond, lit(1))).as("__pos"))
    val cumW = Window.orderBy(col("threshold"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nL = col("__nl"); val pL = col("__pl")
    val nT = col("__nt"); val pT = col("__pt")
    val nR = nT - nL; val pR = pT - pL
    val giniL = lit(1.0) - (pL / nL) * (pL / nL) -
      ((nL - pL) / nL) * ((nL - pL) / nL)
    val giniR = lit(1.0) - (pR / nR) * (pR / nR) -
      ((nR - pR) / nR) * ((nR - pR) / nR)
    perV
      .withColumn("__nl", sum(col("__cnt")).over(cumW))
      .withColumn("__pl", sum(col("__pos")).over(cumW))
      .withColumn("__nt", sum(col("__cnt")).over(totW))
      .withColumn("__pt", sum(col("__pos")).over(totW))
      .filter(nL < nT) // the max value splits nothing off
      .select(col("threshold"), nL.as("n_left"), nR.as("n_right"),
        pL.as("pos_left"), pR.as("pos_right"),
        round((nL * giniL + nR * giniR) / nT, 4).as("weighted_gini"),
        round((nL * giniL + nR * giniR) / nT, 6).as("__key"))
      .orderBy(col("__key"), col("threshold"))
      .limit(topK)
      .drop("__key")
  }

  /** Per-group Welch's two-sample t-test (unequal variances): does the
    * mean of `valueCol` differ between the `condA` and `condB` cohorts
    * inside each group? Both cohorts' moments (n, Σx, Σx²) come from
    * ONE map-side-combined aggregation over the unsplit input — no
    * per-cohort scan, no join; t and the Welch–Satterthwaite df derive
    * in the projection. Sample variance via the (Σx² − (Σx)²/n)/(n−1)
    * identity — the same closed form the oracle runs.
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      condA: Column, condB: Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val agg = df.groupBy(col(groupCol))
      .agg(count(when(condA, 1)).as("n_a"),
        sum(when(condA, v)).as("__sa"),
        sum(when(condA, v * v)).as("__ssa"),
        count(when(condB, 1)).as("n_b"),
        sum(when(condB, v)).as("__sb"),
        sum(when(condB, v * v)).as("__ssb"))
    // try_divide throughout: an empty arm (n=0), a single observation
    // (n−1=0), or two zero-variance arms (pooled SE 0) must null out,
    // never throw (DivisionAuditSpec's degenerate corpus)
    val va = try_divide(
      col("__ssa") - try_divide(col("__sa") * col("__sa"), col("n_a")),
      col("n_a") - 1)
    val vb = try_divide(
      col("__ssb") - try_divide(col("__sb") * col("__sb"), col("n_b")),
      col("n_b") - 1)
    val sea = try_divide(va, col("n_a"))
    val seb = try_divide(vb, col("n_b"))
    agg.select(col(groupCol), col("n_a"), col("n_b"),
      (round(try_divide(col("__sa"), col("n_a")), 2) + lit(0.0)).as("mean_a"),
      (round(try_divide(col("__sb"), col("n_b")), 2) + lit(0.0)).as("mean_b"),
      (round(try_divide(
        try_divide(col("__sa"), col("n_a")) -
          try_divide(col("__sb"), col("n_b")),
        sqrt(sea + seb)), 4) + lit(0.0)).as("t_stat"),
      round(try_divide((sea + seb) * (sea + seb),
        try_divide(sea * sea, col("n_a") - 1) +
          try_divide(seb * seb, col("n_b") - 1)), 2)
        .as("welch_df"))
  }

  /** Theil–Sen robust trend estimator per group: slope = median of all
    * pairwise slopes (y_j−y_i)/(x_j−x_i), intercept = median of
    * y − slope·x. Breakdown point ~29% — a level shift or outlier
    * burst that wrecks OLS ([[groupRegression]]) barely moves it; the
    * trend line a volume monitor should actually draw.
    *
    * Scale contract: intended for BOUNDED per-group series (daily
    * aggregates — the caller collapses raw data first), where the
    * O(n²) pair fan-out is horizon²/2 rows per group. Because the
    * medians run over that BOUNDED frame, they use the built-in
    * `percentile` aggregate (quantile_cont parity) — per the StatOps
    * guidance, the distributed-selection op only pays off when group
    * value sets are unbounded; here its multi-pass job overhead
    * dominated (3.7 s → sub-second on the manifest query).
    */
  /** In-plan enforcement of the bounded-series contract shared by
    * [[theilSen]] and [[mannKendall]]: both fan out O(n²) pairs PER
    * GROUP, which is only sane on a pre-collapsed series (daily
    * aggregates — horizon-bounded), never on raw events. A doc-only
    * contract is a foot-gun at 100 TB, so the bound is enforced in the
    * plan itself: per-group sizes join back and `assert_true` fails the
    * job on the FIRST oversized group — before the pair join runs,
    * since the guard filter sits below it. Costs one extra aggregation
    * of the (already bounded) input frame; `maxSeriesPoints` is a
    * caller-visible knob for legitimately longer horizons.
    */
  private def boundedSeriesGuard(pts: DataFrame, groupCol: String,
      maxSeriesPoints: Int, op: String): DataFrame = {
    val sizes = pts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__series_n"))
    pts.join(sizes, Seq(groupCol))
      .filter(coalesce(assert_true(col("__series_n") <= maxSeriesPoints,
        concat(lit(s"$op: per-group series of "),
          col("__series_n").cast("string"),
          lit(s" points exceeds maxSeriesPoints=$maxSeriesPoints — " +
            "collapse raw data to bounded aggregates (e.g. daily) " +
            "first; the O(n^2) pair fan-out would explode"))),
        lit(true)))
      .drop("__series_n")
  }

  def theilSen(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, maxSeriesPoints: Int = 10000): DataFrame = {
    val pts = boundedSeriesGuard(
      df.select(col(groupCol), col(xCol).cast("double").as("__x"),
          col(yCol).cast("double").as("__y"))
        .filter(col("__x").isNotNull && col("__y").isNotNull),
      groupCol, maxSeriesPoints, "theilSen")
    val a = pts.select(col(groupCol), col("__x").as("__xa"),
      col("__y").as("__ya"))
    val b = pts.select(col(groupCol).as("__g"), col("__x").as("__xb"),
      col("__y").as("__yb"))
    // try_divide, NOT /: downstream null-filters get predicate-pushed
    // into the join, where Catalyst may evaluate isNotNull(slope)
    // BEFORE the __xa < __xb conjunct — an ANSI `/` then throws
    // DIVIDE_BY_ZERO on the equal-x pairs the condition would have
    // dropped. try_divide is evaluation-order-safe; the join condition
    // still excludes those pairs from the output.
    val pairs = a.join(b, col(groupCol) === col("__g") &&
        col("__xa") < col("__xb"))
      .select(col(groupCol),
        try_divide(col("__yb") - col("__ya"), col("__xb") - col("__xa"))
          .as("__slope"))
    val m = pairs.filter(col("__slope").isNotNull)
      .groupBy(col(groupCol))
      .agg(expr("percentile(__slope, 0.5)").as("slope"))
    val resid = pts.join(broadcast(m), Seq(groupCol))
      .select(col(groupCol),
        (col("__y") - col("slope") * col("__x")).as("__b0"))
    val b0 = resid.groupBy(col(groupCol))
      .agg(expr("percentile(__b0, 0.5)").as("intercept"))
    m.join(b0, Seq(groupCol))
      .select(col(groupCol), (round(col("slope"), 4) + lit(0.0)).as("slope"),
        (round(col("intercept"), 4) + lit(0.0)).as("intercept"))
  }

  /** Mann–Kendall monotonic-trend test per group — [[theilSen]]'s
    * significance companion: S = Σ_{i<j} sign(y_j − y_i) over the
    * x-ordered series, tie-corrected variance
    * Var = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18, continuity-corrected
    * z. Distribution-free: answers "is there ANY monotonic trend"
    * without assuming linearity or normality. Same bounded-series
    * contract as theilSen (collapse to daily aggregates first); the
    * pair fan-out, the tie census, and the count reduce map-side.
    */
  def mannKendall(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, maxSeriesPoints: Int = 10000): DataFrame = {
    val pts = boundedSeriesGuard(
      df.select(col(groupCol), col(xCol).cast("double").as("__x"),
          col(yCol).cast("double").as("__y"))
        .filter(col("__x").isNotNull && col("__y").isNotNull),
      groupCol, maxSeriesPoints, "mannKendall")
    val b = pts.select(col(groupCol).as("__g"), col("__x").as("__xb"),
      col("__y").as("__yb"))
    val s = pts.join(b, col(groupCol) === col("__g") &&
        col("__x") < col("__xb"))
      .groupBy(col(groupCol))
      .agg(sum(signum(col("__yb") - col("__y"))).cast("long").as("s"))
    val ties = pts.groupBy(col(groupCol), col("__y"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(groupCol))
      .agg(sum(col("__t")).as("n_obs"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))
          .as("__tiesum"))
    val joined = s.join(ties, Seq(groupCol))
    val n = col("n_obs").cast("double")
    val variance = (n * (n - 1) * (n * 2 + 5) -
      col("__tiesum").cast("double")) / 18.0
    val z = when(col("s") > 0, (col("s") - 1) / sqrt(variance))
      .when(col("s") < 0, (col("s") + 1) / sqrt(variance))
      .otherwise(lit(0.0))
    joined.select(col(groupCol), col("n_obs"), col("s"),
      round(z, 4).as("z"),
      when(z > 1.96, "increasing").when(z < -1.96, "decreasing")
        .otherwise("no_trend").as("trend"))
  }

  /** Two-proportion z-test (pooled variance): does the success RATE
    * differ between the `condA` and `condB` cohorts? The conversion-rate
    * companion to [[welchTTest]]'s mean test — the readout of any A/B
    * experiment whose metric is binary (converted, clicked, churned).
    * One map-side-combined aggregation produces all four counts; the
    * z statistic derives in the projection. Every intermediate before
    * the final divisions is an exact integer in doubles, so rates and z
    * are the same integer-ratio arithmetic in both engines.
    *
    * Degenerate cohorts surface as SQL nulls rather than exceptions —
    * an empty cohort (n=0) nulls its rate and z, and a pooled rate of
    * exactly 0 or 1 (no successes / all successes) nulls z via the
    * zero pooled variance. Callers alerting on z must treat null as
    * "test not evaluable", not as zero.
    */
  def propZTest(df: DataFrame, condA: Column, condB: Column,
      successCond: Column): DataFrame = {
    val agg = df.agg(
      count(when(condA, 1)).as("n_a"),
      count(when(condA && successCond, 1)).as("x_a"),
      count(when(condB, 1)).as("n_b"),
      count(when(condB && successCond, 1)).as("x_b"))
    val pa = try_divide(col("x_a"), col("n_a"))
    val pb = try_divide(col("x_b"), col("n_b"))
    val pp = try_divide(col("x_a") + col("x_b"), col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("n_b"),
      round(pa, 4).as("rate_a"), round(pb, 4).as("rate_b"),
      round(pp, 4).as("pooled_rate"),
      round(try_divide(pa - pb,
        sqrt(pp * (lit(1.0) - pp) *
          (try_divide(lit(1.0), col("n_a")) +
            try_divide(lit(1.0), col("n_b"))))), 4).as("z"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (columns) over the same rows, any number of categories.
    * The inter-annotator / model-vs-model agreement statistic a labeling
    * pipeline reports next to raw accuracy (q160's confusion counts).
    *
    * One contingency aggregation collapses the input to |r·c| cells;
    * observed agreement p_o sums the diagonal, expected agreement p_e
    * needs per-category marginal PRODUCTS — cells alone can't provide
    * them when a diagonal cell is absent, so the two marginal frames
    * (each ≤ |categories| rows, derived from the cells frame, not the
    * raw data) full-outer-join on category. Counts stay integers until
    * the marginal products, which are computed in DOUBLES: Σ rᵢ·cᵢ and
    * n² overflow Long past ~3×10⁹ rows — routine at 100 TB — and a
    * silent wraparound would yield a plausible-looking wrong κ. The
    * double detour is exact up to 2⁵³ and the final ratios round to
    * 4 dp anyway. Null labels are excluded up front: null===null never
    * counts as agreement and null keys don't meet in the outer join,
    * so keeping them would only bias κ downward. Degenerate p_e = 1
    * (both raters constant and equal) yields κ = null (0/0), which the
    * caller should read as "agreement is not chance-correctable".
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df
      .where(raterA.isNotNull && raterB.isNotNull)
      .groupBy(raterA.as("a"), raterB.as("b"))
      .agg(count(lit(1)).as("o"))
    val base = cells.agg(
      sum(col("o")).as("n"),
      sum(when(col("a") === col("b"), col("o")).otherwise(lit(0)))
        .as("__agree"))
    val margA = cells.groupBy(col("a").as("k")).agg(sum(col("o")).as("__ra"))
    val margB = cells.groupBy(col("b").as("k")).agg(sum(col("o")).as("__cb"))
    val rc = margA.join(margB, Seq("k"), "full_outer")
      .agg(sum(coalesce(col("__ra"), lit(0L)).cast("double") *
        coalesce(col("__cb"), lit(0L)).cast("double")).as("__rc"))
    val po = col("__agree") / col("n")
    val pe = col("__rc") / (col("n").cast("double") * col("n").cast("double"))
    base.crossJoin(rc)
      .select(col("n"), round(po, 4).as("po"), round(pe, 4).as("pe"),
        round(try_divide(po - pe, lit(1.0) - pe), 4).as("kappa"))
  }
}
