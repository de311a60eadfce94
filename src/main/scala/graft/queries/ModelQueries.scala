package graft.queries

import graft.Tables
import graft.ops.ModelEvalOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine model-evaluation analytics (SURVEY.md §2.13 X118-X120):
  * the statistics the reference computes driver-side with MLlib
  * evaluators or sklearn (`random_forest_final_class_8.py:237-261`,
  * `desicion_tree_confusion_matrix.py:16-31`), re-expressed as
  * distributed plans that reduce the unbounded input to a bounded
  * summary before any window/sort — each oracle-checked against DuckDB.
  */
object ModelQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q189_group_regression — per-return-flag simple OLS of extended
    * price on quantity (`ModelEvalOps.groupRegression`): closed-form
    * slope/intercept/r² from one pass of raw co-moments. The whole
    * input collapses in a single map-side-combined aggregation to
    * |groups| rows — no iteration, no collect, scale-free.
    */
  def q189GroupRegression(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.groupRegression(Tables.lineitem(s, dir),
      "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy(col("l_returnflag"))

  /** q190_auc — ROC AUC of "total price predicts fulfilled status" per
    * order priority (`ModelEvalOps.rankAuc`): the Mann-Whitney
    * rank-sum identity with tie-averaged ranks. Integer/half-integer
    * arithmetic end-to-end, so the AUC is bit-exact across engines and
    * partition orders; the window runs over distinct scores only.
    * The reference's BinaryClassificationEvaluator
    * (`timely_LR.py:125-148`) computes this same statistic driver-side.
    */
  def q190Auc(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.rankAuc(Tables.orders(s, dir),
      "o_orderpriority", "o_totalprice", col("o_orderstatus") === "F")
      .orderBy(col("o_orderpriority"))

  /** q191_best_split — decision-stump split search on quantity for
    * "returned" (`ModelEvalOps.bestSplit`): weighted binary Gini at
    * every distinct-value threshold, top-5 lowest impurity. The inner
    * loop of the reference's tree grid (`decision_tree_final_class_8
    * .py:229-232`) as one histogram aggregation + a window over the
    * candidate frame.
    */
  def q191BestSplit(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.bestSplit(Tables.lineitem(s, dir),
      "l_quantity", col("l_returnflag") === "R", 5)
      .orderBy(col("weighted_gini"), col("threshold"))

  /** q195_gini_lorenz — Gini concentration of customer spend per market
    * segment via the rank form of the Lorenz integral:
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over spend sorted ascending
    * (custkey tiebreak → total order). Per-customer spend is one
    * map-side-combined aggregation; the per-segment rank runs through
    * `StatOps.shardedRank` (round 11) — a plain partitionBy(segment)
    * window would hold each segment's whole per-customer frame
    * (corpus-proportional) in ONE task; the sharded form bounds every
    * task at ~|segment|/nShards rows. The concentration audit
    * a curation pipeline runs on source/domain shares before fixing
    * mixture weights (q186).
    */
  def q195GiniLorenz(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("__spend"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    graft.ops.StatOps.shardedRank(spend, "c_mktsegment", "__spend",
        "o_custkey", "__rk")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        (round(sum(col("__spend")), 2) + lit(0.0)).as("total_spend"),
        (round(lit(2) * sum(col("__rk") * col("__spend")) /
          (count(lit(1)) * sum(col("__spend"))) -
          (count(lit(1)) + 1) / count(lit(1)).cast("double"), 4) + lit(0.0)).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  /** q198_mutual_info — association screen between two categoricals
    * (order priority × status): mutual information, normalized MI, χ²
    * of independence, and Cramér's V, all from ONE contingency-table
    * aggregation. Marginals ride as windows over the |r·c|-cell frame
    * (15 rows), entropies use the Σ-over-cells weighting identity
    * (Σ_cells (o/n)·ln(rx/n) = Σ_x px·ln px), and absent cells are
    * exact via χ² = Σ o²·n/(rx·cy) − n. The feature-selection pass the
    * reference approximates by eyeballing groupBy counts
    * (`README.md:21`); everything reduces map-side, scale-free.
    */
  def q198MutualInfo(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("x"), col("o_orderstatus").as("y"))
      .agg(count(lit(1)).as("o"))
    val wx = Window.partitionBy(col("x"))
    val wy = Window.partitionBy(col("y"))
    val wAll = Window.partitionBy()
    val withMarg = cells
      .withColumn("rx", sum(col("o")).over(wx))
      .withColumn("cy", sum(col("o")).over(wy))
      .withColumn("n", sum(col("o")).over(wAll))
    withMarg.agg(
        max(col("n")).as("n"),
        count_distinct(col("x")).as("r"),
        count_distinct(col("y")).as("c"),
        (round(sum((col("o") / col("n")) *
          log(col("o") * col("n") / (col("rx") * col("cy")))), 4) + lit(0.0)).as("mi"),
        (round(sum((col("o") / col("n")) *
            log(col("o") * col("n") / (col("rx") * col("cy")))) /
          sqrt(sum((col("o") / col("n")) * -log(col("rx") / col("n"))) *
            sum((col("o") / col("n")) * -log(col("cy") / col("n")))), 4) + lit(0.0))
          .as("nmi"),
        (round(sum(col("o") * col("o") * col("n") / (col("rx") * col("cy"))) -
          max(col("n")), 4) + lit(0.0)).as("chi2"),
        (round(sqrt((sum(col("o") * col("o") * col("n") /
            (col("rx") * col("cy"))) - max(col("n"))) /
          (max(col("n")) * least(count_distinct(col("x")) - 1,
            count_distinct(col("y")) - 1))), 4) + lit(0.0)).as("cramers_v"))
  }

  /** q205_welch_ttest — Welch's unequal-variance two-sample t-test per
    * market segment (`ModelEvalOps.welchTTest`): do fulfilled ('F') and
    * open ('O') orders differ in mean total price? The A/B-test
    * primitive behind any experimentation readout; both cohorts' moments
    * come from ONE map-side-combined aggregation over the joined frame —
    * no per-cohort scan, no second pass — and t / Welch–Satterthwaite df
    * derive in the projection.
    */
  def q205WelchTtest(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.welchTTest(
      Tables.orders(s, dir).join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_totalprice",
      col("o_orderstatus") === "F", col("o_orderstatus") === "O")
      .orderBy(col("c_mktsegment"))

  /** q207_prop_ztest — two-proportion z-test
    * (`ModelEvalOps.propZTest`): do urgent (1-URGENT) and low-priority
    * (5-LOW) orders convert to fulfilled ('F') at different rates? The
    * binary-metric A/B readout; all four counts come from ONE
    * map-side-combined aggregation — no per-cohort scan.
    */
  def q207PropZtest(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.propZTest(Tables.orders(s, dir),
      col("o_orderpriority") === "1-URGENT",
      col("o_orderpriority") === "5-LOW",
      col("o_orderstatus") === "F")

  /** q208_cohen_kappa — chance-corrected agreement
    * (`ModelEvalOps.cohenKappa`) between two binarized "raters" over
    * lineitem: does "returned" (l_returnflag = 'R') agree with "large
    * order" (l_quantity > 25) beyond chance? The inter-annotator
    * statistic a labeling pipeline reports next to raw accuracy; one
    * contingency aggregation collapses the table to 4 cells, marginal
    * products are computed in overflow-safe doubles.
    */
  def q208CohenKappa(s: SparkSession, dir: String): DataFrame =
    ModelEvalOps.cohenKappa(Tables.lineitem(s, dir),
      when(col("l_returnflag") === "R", "hi").otherwise("lo"),
      when(col("l_quantity") > 25, "hi").otherwise("lo"))

  /** q225_wilson_ci — Wilson 95% score interval for the fulfilled rate
    * per order priority: the binomial CI that behaves at extreme rates
    * and small n (unlike the Wald interval a naive pipeline reports).
    * The uncertainty readout that belongs next to every q207-style
    * rate comparison. One aggregation; the interval is pure projection
    * arithmetic — identical integer-ratio doubles in both engines.
    */
  def q225WilsonCi(s: SparkSession, dir: String): DataFrame = {
    val zc = 1.96
    val agg = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("x"))
    val n = col("n").cast("double")
    val p = col("x") / col("n")
    val denom = lit(1.0) + lit(zc * zc) / n
    val center = (p + lit(zc * zc) / (lit(2.0) * n)) / denom
    val half = (lit(zc) * sqrt(p * (lit(1.0) - p) / n +
      lit(zc * zc) / (lit(4.0) * n * n))) / denom
    agg.select(col("o_orderpriority"), col("n"), col("x"),
        round(p, 4).as("rate"),
        round(center - half, 4).as("ci_lo"),
        round(center + half, 4).as("ci_hi"))
      .orderBy(col("o_orderpriority"))
  }

  /** q326_isotonic_calibration — EXACT isotonic regression (the PAV
    * fit Spark ML's IsotonicRegression iterates) via the minimax
    * closed form: iso(i) = max_{j≤i} min_{k≥i} weightedMean(y, j..k),
    * which equals the pool-adjacent-violators solution exactly
    * (Barlow et al. 1972) but is PURE relational algebra — no loops,
    * no model object, hash-checkable. The corpus collapses to 20
    * equal-width score bins (one aggregation); the j×k prefix-mean
    * triangle (210 rows), suffix-min window and per-i max all run on
    * the bin frame, so cost is O(bins²) regardless of data scale.
    * Calibrating order F-status rate against o_totalprice; every
    * intermediate is an integer-count ratio, so the fit is bit-exact
    * across engines before the display rounding.
    */
  def q326IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val nb = 20
    val o = Tables.orders(s, dir)
      .select(col("o_totalprice").cast("double").as("x"),
        (col("o_orderstatus") === "F").as("y"))
    val mm = o.agg(min(col("x")).as("__mn"), max(col("x")).as("__mx"))
    val bins = o.crossJoin(broadcast(mm))
      .withColumn("b", // try_divide: a constant score column has zero
        // range — every row lands in bin 0 instead of throwing
        least(floor(coalesce(try_divide(col("x") - col("__mn"),
          col("__mx") - col("__mn")), lit(0.0)) * nb),
          lit((nb - 1).toDouble))
          .cast("int"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), count(when(col("y"), 1)).as("pos"),
        round(avg(col("x")), 2).as("mean_score"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
    val c = bins
      .withColumn("__cw", sum(col("n")).over(wOrd))
      .withColumn("__cp", sum(col("pos")).over(wOrd))
    val jSide = c.select(col("b").as("__j"),
      (col("__cw") - col("n")).as("__wj"),
      (col("__cp") - col("pos")).as("__pj"))
    val kSide = c.select(col("b").as("__k"), col("__cw").as("__wk"),
      col("__cp").as("__pk"))
    val wMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__j")).orderBy(col("__k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val iso = jSide.crossJoin(broadcast(kSide))
      .filter(col("__k") >= col("__j"))
      .withColumn("__avg", (col("__pk") - col("__pj")) /
        (col("__wk") - col("__wj")).cast("double"))
      .withColumn("__m", min(col("__avg")).over(wMin))
      .groupBy(col("__k").as("b"))
      .agg(max(col("__m")).as("__iso"))
    bins.join(iso, Seq("b"))
      .select(col("b"), col("n"), col("pos"),
        (round(col("pos") / col("n").cast("double"), 4) + lit(0.0)).as("frac_pos"),
        (round(col("__iso"), 6) + lit(0.0)).as("iso_calibrated"), col("mean_score"))
      .orderBy(col("b"))
  }

  /** q328_eb_shrinkage — empirical-Bayes beta-binomial shrinkage of
    * per-customer order-failure rates (the "smoothed CTR" estimator):
    * method-of-moments fits Beta(α, β) to the observed rate
    * distribution (α+β = µ(1−µ)/σ² − 1), then every customer's rate
    * is posterior-shrunk to (x+α)/(n+α+β) — small-sample customers
    * pull hard toward the prior, high-volume ones barely move. The
    * standard fix for ranking entities by rate when group sizes vary
    * wildly (CTR, defect rates, seller scores). One corpus
    * aggregation to the per-customer frame; µ/σ²/α/β ride back as a
    * broadcast scalar. Output: the 10 largest |raw − shrunk| movers
    * (6-dp key, custkey tiebreak).
    */
  def q328EbShrinkage(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("x"))
      .withColumn("__raw", col("x") / col("n").cast("double"))
    val mom = g.agg(avg(col("__raw")).as("__mu"),
        var_samp(col("__raw")).as("__v"))
      .select(col("__mu"),
        greatest((col("__mu") * (lit(1.0) - col("__mu")))
          / greatest(col("__v"), lit(1e-6)) - 1, lit(0.1)).as("__ab"))
      .select(col("__mu"), (col("__mu") * col("__ab")).as("__alpha"),
        ((lit(1.0) - col("__mu")) * col("__ab")).as("__beta"))
    g.crossJoin(broadcast(mom))
      .withColumn("__shrunk", (col("x") + col("__alpha")) /
        (col("n") + col("__alpha") + col("__beta")))
      .select(col("o_custkey"), col("n"), col("x"),
        (round(col("__raw"), 4) + lit(0.0)).as("raw_rate"),
        (round(col("__shrunk"), 4) + lit(0.0)).as("shrunk_rate"),
        (round(col("__alpha"), 4) + lit(0.0)).as("alpha"),
        (round(col("__beta"), 4) + lit(0.0)).as("beta"),
        (round(abs(col("__raw") - col("__shrunk")), 6) + lit(0.0)).as("__mv"))
      .orderBy(col("__mv").desc, col("o_custkey"))
      .limit(10)
      .drop("__mv")
  }

  /** q344_gmm_em_step — one EM iteration of a 1-D two-component
    * Gaussian mixture on o_totalprice, as pure relational algebra
    * (q308's oracle-the-training-step move, for soft clustering):
    * deterministic quartile-anchored init (µ at ¼/¾ of the range,
    * common σ = range/4, equal weights), E-step responsibilities from
    * the normal pdf ratio, M-step via the one-pass moment identities
    * (Σr, Σrx, Σrx² → w', µ', σ'²) — so the whole iteration is ONE
    * corpus aggregation after a broadcast min/max scalar. What
    * MLlib's GaussianMixture iterates, spelled out once and
    * hash-checked; 4-dp rounding absorbs cross-engine exp()/sum-order
    * last bits.
    */
  def q344GmmEmStep(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_totalprice").cast("double").as("x"))
    val mm = o.agg(min(col("x")).as("__mn"), max(col("x")).as("__mx"))
    val base = o.crossJoin(broadcast(mm))
      .withColumn("__mu1", col("__mn") + (col("__mx") - col("__mn")) / 4)
      .withColumn("__mu2",
        col("__mn") + (col("__mx") - col("__mn")) * 3 / 4)
      .withColumn("__sd", (col("__mx") - col("__mn")) / 4)
    // try_divide: a constant column collapses the range, sd = 0 — the
    // densities (and downstream moments) null out instead of throwing
    def pdf(mu: Column, sd: Column, x: Column): Column =
      try_divide(
        exp(-try_divide((x - mu) * (x - mu), lit(2.0) * sd * sd)),
        sd * math.sqrt(2 * math.Pi))
    val e = base
      .withColumn("__p1", pdf(col("__mu1"), col("__sd"), col("x")) * 0.5)
      .withColumn("__p2", pdf(col("__mu2"), col("__sd"), col("x")) * 0.5)
      .withColumn("__r2",
        try_divide(col("__p2"), col("__p1") + col("__p2")))
      .withColumn("__r1", lit(1.0) - col("__r2"))
    e.agg(count(lit(1)).as("n"),
        sum(col("__r1")).as("__s1"), sum(col("__r1") * col("x")).as("__sx1"),
        sum(col("__r1") * col("x") * col("x")).as("__sxx1"),
        sum(col("__r2")).as("__s2"), sum(col("__r2") * col("x")).as("__sx2"),
        sum(col("__r2") * col("x") * col("x")).as("__sxx2"))
      .select(col("n"),
        (round(col("__s1") / col("n"), 4) + lit(0.0)).as("w1"),
        (round(col("__s2") / col("n"), 4) + lit(0.0)).as("w2"),
        (round(try_divide(col("__sx1"), col("__s1")), 2) + lit(0.0)).as("mu1"),
        (round(try_divide(col("__sx2"), col("__s2")), 2) + lit(0.0)).as("mu2"),
        (round(sqrt(try_divide(col("__sxx1"), col("__s1")) -
          try_divide(col("__sx1"), col("__s1")) *
            try_divide(col("__sx1"), col("__s1"))), 2) + lit(0.0))
          .as("sd1"),
        (round(sqrt(try_divide(col("__sxx2"), col("__s2")) -
          try_divide(col("__sx2"), col("__s2")) *
            try_divide(col("__sx2"), col("__s2"))), 2) + lit(0.0))
          .as("sd2"))
  }

  /** q375_brier_decomposition — Murphy (1973) decomposition of the
    * Brier score for q227's sigmoid scorer on F-status: over K = 10
    * score bins, B = REL − RES + UNC + WV, with reliability
    * REL = Σnₖ(p̄ₖ−ōₖ)²/N (calibration gap, lower better), resolution
    * RES = Σnₖ(ōₖ−ō)²/N (how much the bins separate outcomes, higher
    * better), irreducible uncertainty UNC = ō(1−ō), and the
    * within-bin forecast-variance remainder WV = Σₖ Σᵢ(pᵢ−p̄ₖ)²/N −
    * 2·Σₖ Σᵢ(pᵢ−p̄ₖ)(oᵢ−ōₖ)/N that makes the identity EXACT for
    * non-constant bins (emitted, and the oracle certifies
    * B ≡ REL − RES + UNC + WV to the rounding). This is the readout
    * that tells you WHERE a probability model loses: q227's ECE only
    * sees REL. One aggregation to the 10-bin frame, scalar arithmetic
    * after — the within-bin cross-moments ride the same pass.
    */
  def q375BrierDecomposition(s: SparkSession, dir: String): DataFrame = {
    val pr = substring(col("o_orderpriority"), 1, 1).cast("int")
    val score = lit(1.0) / (lit(1.0) +
      exp(-(lit(0.00002) * col("o_totalprice") - lit(0.5) * pr - lit(1.0))))
    val rows = Tables.orders(s, dir)
      .select(score.as("p"),
        (col("o_orderstatus") === "F").cast("int").cast("double").as("o"))
      .withColumn("bin", least(floor(col("p") * 10).cast("int"), lit(9)))
    val binned = rows.groupBy(col("bin"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("p")).as("__sp"), sum(col("p") * col("p")).as("__spp"),
        sum(col("o")).as("__so"), sum(col("o") * col("o")).as("__soo"),
        sum(col("p") * col("o")).as("__spo"))
    binned.agg(sum(col("__n")).as("__N"),
        sum(col("__so")).as("__sumo"),
        sum(col("__n") * pow(col("__sp") / col("__n") -
          col("__so") / col("__n"), 2)).as("__rel"),
        sum(col("__spp") - col("__sp") * col("__sp") / col("__n"))
          .as("__wvp"),
        sum(col("__spo") - col("__sp") * col("__so") / col("__n"))
          .as("__wcov"),
        sum(col("__spp") - lit(2.0) * col("__spo") + col("__soo")).as("__bsum"),
        sum(col("__n") * pow(col("__so") / col("__n"), 2)).as("__sobar2"))
      .withColumn("__obar", col("__sumo") / col("__N"))
      .withColumn("__brier", col("__bsum") / col("__N"))
      .withColumn("__rel", col("__rel") / col("__N"))
      .withColumn("__res", col("__sobar2") / col("__N") -
        col("__obar") * col("__obar"))
      .withColumn("__unc", col("__obar") * (lit(1.0) - col("__obar")))
      .withColumn("__wv", (col("__wvp") - lit(2.0) * col("__wcov")) / col("__N"))
      .select(col("__N").cast("long").as("n"),
        (round(col("__brier"), 4) + lit(0.0)).as("brier"),
        (round(col("__rel"), 4) + lit(0.0)).as("reliability"),
        (round(col("__res"), 4) + lit(0.0)).as("resolution"),
        (round(col("__unc"), 4) + lit(0.0)).as("uncertainty"),
        (round(col("__wv"), 4) + lit(0.0)).as("within_bin_term"),
        (abs(col("__brier") - (col("__rel") - col("__res") +
          col("__unc") + col("__wv"))) < 1e-9).as("identity_exact"))
  }

  /** q373_avg_precision — average precision (area under the
    * precision–recall curve, the ranking metric that — unlike q190's
    * ROC AUC — doesn't reward true negatives and so is the right
    * readout under heavy class imbalance): AP = (1/P)·Σ_{positives}
    * precision@rank(i) = (1/P)·Σ pos_rank(i)/rank(i) over the
    * (score desc, id asc) total order. Global ranks are assembled
    * WITHOUT a global window: per-distinct-score cumulative counts
    * (the q190 rankAuc collapse) give the "strictly better" offsets,
    * and a per-score-PARTITIONED window adds the in-tie local rank —
    * every window is bounded by one tie group, so the plan is two
    * bounded shuffles at any corpus size. The oracle replays the same
    * total order with a plain row_number, proving the distributed
    * rank assembly exact.
    */
  def q373AvgPrecision(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id").as("id"),
        col("value").cast("double").as("v"),
        (col("event_type") === "purchase").cast("int").as("pos"))
    val perV = e.groupBy(col("v"))
      .agg(count(lit(1)).as("__c"), sum(col("pos")).as("__cp"))
    // score-DESCENDING exclusive prefix counts, distributed: the
    // descending-exclusive sum at unique v equals total − ascending-
    // inclusive sum (exact long arithmetic), so the single-task
    // `ORDER BY v DESC` window becomes StatOps.shardedCumsum plus a
    // broadcast 1-row total (round-10 window audit)
    val cums = graft.ops.StatOps.shardedCumsum(perV, "v",
      Seq("__c" -> "__upto", "__cp" -> "__posUpto"))
    val tot = perV.agg(sum(col("__c")).as("__tc"),
      sum(col("__cp")).as("__tcp"))
    val offsets = cums.crossJoin(broadcast(tot))
      .select(col("v"), (col("__tc") - col("__upto")).as("__before"),
        (col("__tcp") - col("__posUpto")).as("__posBefore"))
    val wtie = Window.partitionBy(col("v")).orderBy(col("id"))
    val ranked = e.join(offsets, Seq("v"))
      .withColumn("__rank", col("__before") +
        row_number().over(wtie))
      .withColumn("__posRank", col("__posBefore") + sum(col("pos"))
        .over(wtie.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    ranked.filter(col("pos") === 1)
      .agg(count(lit(1)).as("n_pos"),
        avg(col("__posRank").cast("double") / col("__rank"))
          .as("__ap"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n"))))
      .select(col("n"), col("n_pos"),
        (round(col("__ap"), 4) + lit(0.0)).as("avg_precision"),
        (round(col("n_pos").cast("double") / col("n"), 4) + lit(0.0))
          .as("baseline_prevalence"))
  }

  /** q353_logreg_newton — one Newton–Raphson (IRLS) step for logistic
    * regression y ~ 1 + x from β = 0, in closed form (q344's
    * oracle-the-training-step move for GLMs): at β = 0 every p = ½, so
    * W = ¼I, gradient g = Σ xᵢ(yᵢ − ½), Hessian H = ¼·ΣxᵢxᵢT, and
    * β₁ = H⁻¹g by the 2×2 Cramer solve — ONE corpus aggregation for
    * the five moments, pure arithmetic on the 1-row frame, then a
    * second pass scores the log-likelihood at β₁ against the null
    * −n·ln 2 (the broadcast-scalar idiom). What MLlib's
    * LogisticRegression iterates, spelled once and hash-checked;
    * o_totalprice is pre-scaled /1e5 so the moment sums stay
    * well-conditioned.
    */
  def q353LogregNewton(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      (col("o_totalprice").cast("double") / 100000.0).as("x"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
    val beta = o.agg(count(lit(1)).cast("double").as("__n"),
        sum(col("x")).as("__sx"), sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") - 0.5).as("__g0"),
        sum(col("x") * (col("y") - 0.5)).as("__g1"))
      .withColumn("__det",
        lit(0.0625) * (col("__n") * col("__sxx") -
          col("__sx") * col("__sx")))
      .select(col("__n"),
        ((lit(0.25) * col("__sxx") * col("__g0") -
          lit(0.25) * col("__sx") * col("__g1")) / col("__det"))
          .as("__b0"),
        ((lit(0.25) * col("__n") * col("__g1") -
          lit(0.25) * col("__sx") * col("__g0")) / col("__det"))
          .as("__b1"))
    o.crossJoin(broadcast(beta))
      .withColumn("__eta", col("__b0") + col("__b1") * col("x"))
      .agg(count(lit(1)).as("n"), max(col("__b0")).as("__b0"),
        max(col("__b1")).as("__b1"),
        sum(col("y") * col("__eta") - log(lit(1.0) + exp(col("__eta"))))
          .as("__ll1"))
      .select(col("n"),
        (round(col("__b0"), 6) + lit(0.0)).as("beta0"),
        (round(col("__b1"), 6) + lit(0.0)).as("beta1"),
        (round(-col("n") * math.log(2.0), 4) + lit(0.0)).as("ll_null"),
        (round(col("__ll1"), 4) + lit(0.0)).as("ll_newton"),
        (col("__ll1") > -col("n") * math.log(2.0)).as("improved"))
  }

  /** q397_ridge_gram — multi-feature ridge regression by Gram-matrix
    * normal equations: β = (XᵀX + λI)⁻¹ Xᵀy for y ~ 1 + quantity +
    * discount, solved in closed form by the 3×3 Cramer expansion over
    * NINE moment sums collected in ONE map-side-combined corpus pass —
    * the O(d²)-state aggregation that trains linear models on 100 TB
    * without gradient iterations (what MLlib's "normal" solver does
    * internally). A second broadcast-scalar pass scores train RMSE
    * against the intercept-only baseline. y is pre-scaled /1e3 so the
    * moment sums stay well-conditioned (q353's discipline); λ = 1.0
    * on all coefficients (documented: the intercept is penalized too,
    * keeping A symmetric ridge-shifted).
    */
  def q397RidgeGram(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("double").as("x1"),
      col("l_discount").cast("double").as("x2"),
      (col("l_extendedprice").cast("double") / 1000.0).as("y"))
    val lam = 1.0
    val m = li.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("x1")).as("__s1"), sum(col("x2")).as("__s2"),
      sum(col("x1") * col("x1")).as("__s11"),
      sum(col("x1") * col("x2")).as("__s12"),
      sum(col("x2") * col("x2")).as("__s22"),
      sum(col("y")).as("__sy"),
      sum(col("x1") * col("y")).as("__s1y"),
      sum(col("x2") * col("y")).as("__s2y"))
    val beta = m
      .withColumn("__a00", col("__n") + lit(lam))
      .withColumn("__a11", col("__s11") + lit(lam))
      .withColumn("__a22", col("__s22") + lit(lam))
      .withColumn("__det",
        col("__a00") * (col("__a11") * col("__a22") -
          col("__s12") * col("__s12")) -
        col("__s1") * (col("__s1") * col("__a22") -
          col("__s12") * col("__s2")) +
        col("__s2") * (col("__s1") * col("__s12") -
          col("__a11") * col("__s2")))
      .select(col("__n"), col("__sy"),
        ((col("__sy") * (col("__a11") * col("__a22") -
            col("__s12") * col("__s12")) -
          col("__s1") * (col("__s1y") * col("__a22") -
            col("__s12") * col("__s2y")) +
          col("__s2") * (col("__s1y") * col("__s12") -
            col("__a11") * col("__s2y"))) / col("__det")).as("__b0"),
        ((col("__a00") * (col("__s1y") * col("__a22") -
            col("__s12") * col("__s2y")) -
          col("__sy") * (col("__s1") * col("__a22") -
            col("__s12") * col("__s2")) +
          col("__s2") * (col("__s1") * col("__s2y") -
            col("__s1y") * col("__s2"))) / col("__det")).as("__b1"),
        ((col("__a00") * (col("__a11") * col("__s2y") -
            col("__s12") * col("__s1y")) -
          col("__s1") * (col("__s1") * col("__s2y") -
            col("__s1y") * col("__s2")) +
          col("__sy") * (col("__s1") * col("__s12") -
            col("__a11") * col("__s2"))) / col("__det")).as("__b2"))
    li.crossJoin(broadcast(beta))
      .withColumn("__e",
        col("y") - col("__b0") - col("__b1") * col("x1") -
          col("__b2") * col("x2"))
      .withColumn("__e0", col("y") - col("__sy") / col("__n"))
      .agg(count(lit(1)).as("n"),
        (round(max(col("__b0")), 6) + lit(0.0)).as("beta0"),
        (round(max(col("__b1")), 6) + lit(0.0)).as("beta1"),
        (round(max(col("__b2")), 6) + lit(0.0)).as("beta2"),
        (round(sqrt(avg(col("__e") * col("__e"))), 4) + lit(0.0)).as("rmse"),
        (round(sqrt(avg(col("__e0") * col("__e0"))), 4) + lit(0.0)).as("rmse_null"))
  }

  /** q399_davies_bouldin — Davies–Bouldin cluster-validity index over
    * the embedding corpus, the internal-quality readout a pipeline
    * runs AFTER a clustering step (q308's Lloyd / q344's GMM) to pick
    * k: assign every vector to its nearest of k=4 deterministic seed
    * centroids (vec_id 0–3), recompute the k mean centroids (6-dp
    * rounded, q395's engine-parity discipline), then per cluster the
    * scatter Sᵢ = avg‖x−cᵢ‖ and the worst separation ratio
    * Rᵢ = maxⱼ≠ᵢ (Sᵢ+Sⱼ)/‖cᵢ−cⱼ‖; DB = avg Rᵢ (lower = tighter).
    * Scale shape: one corpus pass to assign (k centroids broadcast),
    * one to re-mean, one for scatters — every aggregate map-side
    * combined; the k×k ratio lattice is a broadcast of two k-row
    * frames (justified in the BNLJ allowlist).
    */
  def q399DaviesBouldin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .localCheckpoint() // read by assign, re-mean, and scatter passes
    def sqd(a: String, b: String) = expr(
      s"""aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)),
         |  cast(0.0 as double), (acc, e) -> acc + e)""".stripMargin)
    val init = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("code"), col("v").as("cv"))
    val assigned = emb.crossJoin(broadcast(init))
      .withColumn("__d", round(sqd("v", "cv"), 6))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("__d"), col("code"))).as("__m"))
      .select(col("vec_id"), col("__m.code").as("code"))
      .join(emb, Seq("vec_id")) // recover v without shuffling arrays
      .localCheckpoint()
    val cents = assigned
      .select(col("code"), posexplode(col("v")))
      .groupBy(col("code"), col("pos"))
      .agg(round(avg(col("col")), 6).as("__c"))
      .groupBy(col("code"))
      .agg(expr("transform(sort_array(collect_list(" +
        "struct(pos, __c))), x -> x.__c)").as("cv"))
    val scatter = assigned.join(broadcast(cents), Seq("code"))
      .groupBy(col("code"))
      .agg(count(lit(1)).as("n"), avg(sqrt(sqd("v", "cv"))).as("__s"))
    val si = scatter.join(cents, Seq("code"))
    val rij = si.select(col("code"), col("n"), col("__s"), col("cv"))
      .crossJoin(broadcast(si.select(col("code").as("__oc"),
        col("__s").as("__os"), col("cv").as("__ocv"))))
      .filter(col("code") =!= col("__oc"))
      .withColumn("__r",
        (col("__s") + col("__os")) / sqrt(sqd("cv", "__ocv")))
      .groupBy(col("code"), col("n"), col("__s"))
      .agg(max(col("__r")).as("__rmax"))
    rij.crossJoin(broadcast(
        rij.agg(avg(col("__rmax")).as("__db"))))
      .select(col("code"), col("n"), (round(col("__s"), 4) + lit(0.0)).as("scatter"),
        (round(col("__rmax"), 4) + lit(0.0)).as("r_max"),
        (round(col("__db"), 4) + lit(0.0)).as("db_index"))
      .orderBy(col("code"))
  }

  /** q354_als_step — one alternating-least-squares half-sweep for a
    * rank-1 implicit-feedback factor model over the user×event_type
    * rating frame r = interaction count (the training step inside
    * MLlib's ALS, spelled as relational algebra): item factors
    * initialized deterministically in [0.5, 1.5) by the md5-hash
    * uniform (q241's house pattern, replayed bit-identically by the
    * oracle), then the exact 1-D ridge solves u_f = Σrv/(λ+Σv²) per
    * user and v' = Σru/(λ+Σu²) per item, λ = 0.1. Each solve is one
    * broadcast-joined map-side-combinable aggregation — the rating
    * frame is built by ONE corpus pass and checkpointed across the
    * three reads. Per-item RMSE after the half-sweep is the
    * convergence readout.
    */
  def q354AlsStep(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("r"))
      .localCheckpoint() // read by both solves + the RMSE pass
    val v0 = r.select(col("event_type")).distinct()
      .withColumn("v0", lit(0.5) +
        graft.ops.TextOps.hash32(col("event_type"), "als:")
          .cast("double") / lit(4294967296.0))
    val u1 = r.join(broadcast(v0), Seq("event_type"))
      .groupBy(col("user_id"))
      .agg((sum(col("r") * col("v0")) /
        (lit(0.1) + sum(col("v0") * col("v0")))).as("u"))
    val v1 = r.join(u1, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        (sum(col("r") * col("u")) /
          (lit(0.1) + sum(col("u") * col("u")))).as("v1"))
    val rmse = r.join(u1, Seq("user_id"))
      .join(broadcast(v1.select(col("event_type"), col("v1"))),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sqrt(avg(pow(col("r") - col("u") * col("v1"), 2)))
        .as("__rmse"))
    v0.join(v1, Seq("event_type")).join(rmse, Seq("event_type"))
      .select(col("event_type"), round(col("v0"), 6).as("item_init"),
        col("n_users"), (round(col("v1"), 6) + lit(0.0)).as("item_factor"),
        (round(col("__rmse"), 4) + lit(0.0)).as("rmse"))
      .orderBy(col("event_type"))
  }


  /** q383_pinball_loss — quantile-forecast evaluation by pinball
    * (quantile) loss: the corpus splits temporally at the 70% day mark
    * (leakage-safe, q233's rule), the train split fits per-type P50/P90
    * constant quantile predictors through the distributed-selection
    * percentile (`StatOps.exactPercentiles`, percentile_cont parity),
    * and the test split scores them with
    * L_q(y, ŷ) = max(q·(y−ŷ), (q−1)·(y−ŷ)) plus the P90 empirical
    * coverage. Pinball is THE proper scoring rule for quantile
    * regression — MAE/MASE (q376) grade point forecasts, this grades
    * the interval service levels a capacity planner actually ships.
    * One train-side selection pass + one broadcast-joined test scan.
    */
  def q383PinballLoss(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("__day"),
        col("value").cast("double").as("y"))
    val cut = e.agg(min(col("__day")).as("__d0"),
        max(col("__day")).as("__d1"))
      .select(expr(
        "date_add(__d0, CAST(datediff(__d1, __d0) * 0.7 AS INT))")
        .as("__cut"))
    val tagged = e.crossJoin(broadcast(cut))
    val preds = graft.ops.StatOps.exactPercentiles(
      tagged.filter(col("__day") < col("__cut"))
        .select(col("event_type"), col("y")),
      "event_type", "y", Seq("p50" -> 0.5, "p90" -> 0.9))
    tagged.filter(col("__day") >= col("__cut"))
      .join(broadcast(preds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        (round(avg(greatest(lit(0.5) * (col("y") - col("p50")),
          lit(-0.5) * (col("y") - col("p50")))), 4) + lit(0.0)).as("pinball_p50"),
        (round(avg(greatest(lit(0.9) * (col("y") - col("p90")),
          lit(-0.1) * (col("y") - col("p90")))), 4) + lit(0.0)).as("pinball_p90"),
        round(avg((col("y") <= col("p90")).cast("double")), 4)
          .as("cov_p90"))
      .orderBy(col("event_type"))
  }

  /** q406_huber_m — Huber M-estimator of location for each event
    * type's value distribution: two IRLS iterations of μ ← Σwᵢxᵢ/Σwᵢ
    * with w = min(1, δ/|x−μ|), δ = 1.345σ (the 95%-efficiency
    * constant), σ from exact one-pass moments and μ₀ = mean — the
    * principled middle ground between the outlier-owned mean and the
    * fully-insensitive median (q119's MAD family): extreme values keep
    * CONSTANT (not proportional) influence. Each iteration is one
    * map-side-combinable weighted aggregation over the corpus keyed by
    * type — 3 passes total, no window, no sort; the oracle replays the
    * identical unrolled recursion. The w=1 branch is taken whenever
    * |x−μ| ≤ δ, so the δ/|x−μ| division only ever sees a strictly
    * positive denominator (a constant corpus has δ = 0 and all rows on
    * the w=1 branch — DivisionAuditSpec-proof by construction).
    */
  def q406HuberM(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir)
      .select(col("event_type"), col("value").cast("double").as("__x"))
    val base = pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("__x")).as("__mu0"),
        (sum(col("__x") * col("__x")) / count(lit(1)) -
          avg(col("__x")) * avg(col("__x"))).as("__var"))
      .withColumn("__delta",
        lit(1.345) * sqrt(greatest(col("__var"), lit(0.0))))
    def irls(joined: DataFrame, muCol: String, out: String): DataFrame =
      joined
        .withColumn("__w",
          when(abs(col("__x") - col(muCol)) <= col("__delta"), lit(1.0))
            .otherwise(col("__delta") / abs(col("__x") - col(muCol))))
        .groupBy(col("event_type"))
        .agg(sum(col("__w") * col("__x")).as("__swx"),
          sum(col("__w")).as("__sw"))
        .withColumn(out, try_divide(col("__swx"), col("__sw")))
        .select(col("event_type"), col(out))
    val mu1 = irls(pts.join(broadcast(base), Seq("event_type")),
      "__mu0", "__mu1")
    val mu2 = irls(
      pts.join(broadcast(base), Seq("event_type"))
        .join(broadcast(mu1), Seq("event_type")), "__mu1", "__mu2")
    base.join(mu1, Seq("event_type")).join(mu2, Seq("event_type"))
      .select(col("event_type"), col("n"),
        (round(col("__mu0"), 4) + lit(0.0)).as("mean"),
        (round(col("__delta"), 4) + lit(0.0)).as("delta"),
        (round(col("__mu1"), 4) + lit(0.0)).as("huber_mu_iter1"),
        (round(col("__mu2"), 4) + lit(0.0)).as("huber_mu_iter2"))
      .orderBy(col("event_type"))
  }

  /** q407_geometric_median — Weiszfeld's algorithm for the spatial
    * (L1-in-distance) median of the per-user activity cloud
    * (x = event count, y = mean value): three iterations of
    * m ← Σ(pᵢ/dᵢ)/Σ(1/dᵢ), dᵢ = ‖pᵢ−m‖, from the centroid, points
    * coincident with the current iterate skipped (the standard
    * Weiszfeld guard — also what makes every 1/d division provably
    * nonzero). The geometric median is the robust 2-D center the
    * coordinate-wise median is NOT (it's rotation-equivariant and
    * resists correlated outliers) — the anchor for multivariate
    * anomaly fences beside q102's per-dimension ones. Scale: corpus →
    * per-user frame in ONE aggregation; each Weiszfeld step is one
    * map-side-combinable weighted sum over that frame.
    */
  def q407GeometricMedian(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("__px"),
        avg(col("value")).as("__py"))
      .localCheckpoint() // 4 aggregation passes read this frame
    val c0 = pts.agg(avg(col("__px")).as("__mx"),
      avg(col("__py")).as("__my"), count(lit(1)).as("n_points"))
    def step(cur: DataFrame): DataFrame =
      pts.crossJoin(broadcast(cur))
        .withColumn("__d", sqrt(
          (col("__px") - col("__mx")) * (col("__px") - col("__mx")) +
            (col("__py") - col("__my")) * (col("__py") - col("__my"))))
        .filter(col("__d") > 0)
        .agg(max(col("n_points")).as("n_points"),
          (sum(col("__px") / col("__d")) / sum(lit(1.0) / col("__d")))
            .as("__mx"),
          (sum(col("__py") / col("__d")) / sum(lit(1.0) / col("__d")))
            .as("__my"))
    val m3 = step(step(step(c0)))
    val obj = pts.crossJoin(broadcast(m3))
      .agg(max(col("n_points")).as("n_points"),
        max(col("__mx")).as("__mx"), max(col("__my")).as("__my"),
        avg(sqrt(
          (col("__px") - col("__mx")) * (col("__px") - col("__mx")) +
            (col("__py") - col("__my")) * (col("__py") - col("__my"))))
          .as("__avgd"))
    obj.select(col("n_points"),
      (round(col("__mx"), 4) + lit(0.0)).as("gm_x"), (round(col("__my"), 4) + lit(0.0)).as("gm_y"),
      (round(col("__avgd"), 4) + lit(0.0)).as("avg_dist"))
  }

  /** q412_adaboost — two AdaBoost.M1 rounds of decision stumps on the
    * lineitem return-flag task: round 1 picks the min-weighted-error
    * stump from a fixed 26-candidate grid (13 thresholds × 2
    * polarities over price/qty/discount), α = ½ln((1−ε)/ε), weights
    * reweight by exp(−αyh), round 2 re-searches under the new
    * weights, and the 2-stump ensemble sign(α₁h₁+α₂h₂) is scored for
    * training accuracy — BOOSTING expressed as relational algebra:
    * each round is ONE map-side-combinable (candidate × corpus)
    * weighted-error aggregation (26× map amplification, combiner
    * collapses to 26 rows — no per-row state, no driver loop), and
    * the stump argmin is a struct-min with a total (ε, feat, thr,
    * pol) tie-break so both engines pick the identical stump. ε is
    * clamped to [1e-9, 1−1e-9] before the log-odds (Spark ln(0) is
    * NULL, DuckDB −inf — the clamp makes the question moot). The
    * single-stump ancestor is q191; q167's GBT is the MLlib
    * black-box this replays in the open.
    */
  def q412Adaboost(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(s, dir).select(
      when(col("l_returnflag") === "R", 1.0).otherwise(-1.0).as("__y"),
      col("l_extendedprice").cast("double").as("__price"),
      col("l_quantity").cast("double").as("__qty"),
      col("l_discount").cast("double").as("__disc"))
      .localCheckpoint() // 3 candidate-grid passes read this
    val grid = Seq("price" -> Seq(1000.0, 5000.0, 10000.0, 20000.0,
      40000.0, 70000.0), "qty" -> Seq(10.0, 20.0, 30.0, 40.0),
      "disc" -> Seq(0.02, 0.05, 0.08))
    // The candidate grid is a compile-time constant, so each round's
    // (candidate × corpus) weighted-error sweep is ONE map-side
    // aggregation with 26 parallel aggregate columns — no 26× crossJoin
    // row amplification, no 26-key hash probe per input row (guide
    // §2.3 "aggregate before you shuffle" + §1.2 per-task work: the
    // whole sweep is a single WholeStageCodegen pass over the
    // checkpointed points). The stump argmin keeps the identical total
    // (ε, feat, thr, pol) order via least() over the 26 structs —
    // least() compares structs exactly like min(struct(...)) and no
    // field is ever NULL here (ε is an avg / a guarded try_divide with
    // a strictly positive denominator).
    val cands: Seq[(String, Double, Double)] = grid.flatMap {
      case (f, ts) => ts.flatMap(t => Seq((f, t, 1.0), (f, t, -1.0)))
    }
    def fxOf(f: String): Column =
      if (f == "price") col("__price")
      else if (f == "qty") col("__qty") else col("__disc")
    def hC(f: String, t: Double, p: Double): Column =
      when(fxOf(f) <= lit(t), lit(p)).otherwise(lit(-p))
    def clamp(e: Column): Column =
      least(greatest(e, lit(1e-9)), lit(1.0 - 1e-9))
    def alphaOf(e: Column): Column =
      lit(0.5) * log((lit(1.0) - clamp(e)) / clamp(e))
    def bestOf(errs: DataFrame): DataFrame = errs.select(
      least(cands.zipWithIndex.map { case ((f, t, p), i) =>
        struct(col(s"__err$i").as("__err"), lit(f).as("feat"),
          lit(t).as("thr"), lit(p).as("pol"))
      }: _*).as("__b"))
    val e1 = pts.agg(
      cands.zipWithIndex.map { case ((f, t, p), i) =>
        avg(when(hC(f, t, p) =!= col("__y"), 1.0).otherwise(0.0))
          .as(s"__err$i")
      }.head,
      cands.zipWithIndex.map { case ((f, t, p), i) =>
        avg(when(hC(f, t, p) =!= col("__y"), 1.0).otherwise(0.0))
          .as(s"__err$i")
      }.tail: _*)
    val b1 = bestOf(e1)
      .select(col("__b.__err").as("__e1"), col("__b.feat").as("__f1"),
        col("__b.thr").as("__t1"), col("__b.pol").as("__p1"))
      .withColumn("__a1", alphaOf(col("__e1")))
    val fx1 = expr("CASE __f1 WHEN 'price' THEN __price " +
      "WHEN 'qty' THEN __qty ELSE __disc END")
    val h1 = when(fx1 <= col("__t1"), col("__p1")).otherwise(-col("__p1"))
    val w2 = pts.crossJoin(broadcast(b1))
      .withColumn("__w", exp(-col("__a1") * col("__y") * h1))
    val e2 = w2.agg(
      sum(col("__w")).as("__sw"),
      cands.zipWithIndex.map { case ((f, t, p), i) =>
        sum(col("__w") * when(hC(f, t, p) =!= col("__y"), 1.0)
          .otherwise(0.0)).as(s"__swe$i")
      }: _*)
      .select(cands.indices.map(i =>
        try_divide(col(s"__swe$i"), col("__sw")).as(s"__err$i")): _*)
    val b2 = bestOf(e2)
      .select(col("__b.__err").as("__e2"), col("__b.feat").as("__f2"),
        col("__b.thr").as("__t2"), col("__b.pol").as("__p2"))
      .withColumn("__a2", alphaOf(col("__e2")))
    val fx2 = expr("CASE __f2 WHEN 'price' THEN __price " +
      "WHEN 'qty' THEN __qty ELSE __disc END")
    val h2 = when(fx2 <= col("__t2"), col("__p2")).otherwise(-col("__p2"))
    val acc = pts.crossJoin(broadcast(b1)).crossJoin(broadcast(b2))
      .agg(avg(when((when(col("__a1") * h1 + col("__a2") * h2 >= 0,
        1.0).otherwise(-1.0)) === col("__y"), 1.0).otherwise(0.0))
        .as("__acc"))
    val r1 = b1.crossJoin(broadcast(acc)).select(lit(1).as("round_no"),
      col("__f1").as("feat"), col("__t1").as("thr"),
      col("__p1").as("pol"), round(col("__e1"), 6).as("err"),
      round(col("__a1"), 4).as("alpha"),
      (round(col("__acc"), 4) + lit(0.0)).as("ensemble_train_acc"))
    val r2 = b2.crossJoin(broadcast(acc)).select(lit(2).as("round_no"),
      col("__f2").as("feat"), col("__t2").as("thr"),
      col("__p2").as("pol"), round(col("__e2"), 6).as("err"),
      round(col("__a2"), 4).as("alpha"),
      (round(col("__acc"), 4) + lit(0.0)).as("ensemble_train_acc"))
    r1.unionByName(r2).orderBy(col("round_no"))
  }

  val queries: Map[String, Q] = Map(
    "q412_adaboost" -> (q412Adaboost _),
    "q406_huber_m" -> (q406HuberM _),
    "q407_geometric_median" -> (q407GeometricMedian _),
    "q383_pinball_loss" -> (q383PinballLoss _),
    "q373_avg_precision" -> (q373AvgPrecision _),
    "q375_brier_decomposition" -> (q375BrierDecomposition _),
    "q353_logreg_newton" -> (q353LogregNewton _),
    "q397_ridge_gram" -> (q397RidgeGram _),
    "q399_davies_bouldin" -> (q399DaviesBouldin _),
    "q354_als_step" -> (q354AlsStep _),
    "q344_gmm_em_step" -> (q344GmmEmStep _),
    "q328_eb_shrinkage" -> (q328EbShrinkage _),
    "q326_isotonic_calibration" -> (q326IsotonicCalibration _),
    "q225_wilson_ci" -> (q225WilsonCi _),
    "q207_prop_ztest" -> (q207PropZtest _),
    "q208_cohen_kappa" -> (q208CohenKappa _),
    "q205_welch_ttest" -> (q205WelchTtest _),
    "q189_group_regression" -> (q189GroupRegression _),
    "q190_auc" -> (q190Auc _),
    "q191_best_split" -> (q191BestSplit _),
    "q195_gini_lorenz" -> (q195GiniLorenz _),
    "q198_mutual_info" -> (q198MutualInfo _))

  val oracle: Map[String, String] = Map(
    "q412_adaboost" ->
      """WITH pts AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE -1.0 END AS y,
        |    l_extendedprice::DOUBLE AS price,
        |    l_quantity::DOUBLE AS qty, l_discount::DOUBLE AS disc
        |  FROM lineitem),
        |cands AS (SELECT f.feat, f.thr, p.pol FROM (VALUES
        |    ('price', 1000.0), ('price', 5000.0), ('price', 10000.0),
        |    ('price', 20000.0), ('price', 40000.0), ('price', 70000.0),
        |    ('qty', 10.0), ('qty', 20.0), ('qty', 30.0), ('qty', 40.0),
        |    ('disc', 0.02), ('disc', 0.05), ('disc', 0.08))
        |    f(feat, thr), (VALUES (1.0), (-1.0)) p(pol)),
        |e1 AS (SELECT feat, thr, pol,
        |    avg(CASE WHEN (CASE WHEN (CASE feat WHEN 'price' THEN price
        |        WHEN 'qty' THEN qty ELSE disc END) <= thr
        |      THEN pol ELSE -pol END) <> y THEN 1.0 ELSE 0.0 END)
        |      AS err
        |  FROM pts, cands GROUP BY 1, 2, 3),
        |b1 AS (SELECT feat, thr, pol, err,
        |    0.5 * ln((1 - least(greatest(err, 1e-9), 1 - 1e-9)) /
        |      least(greatest(err, 1e-9), 1 - 1e-9)) AS alpha
        |  FROM e1 ORDER BY err, feat, thr, pol LIMIT 1),
        |w2 AS (SELECT pts.*, exp(-b1.alpha * y *
        |    (CASE WHEN (CASE b1.feat WHEN 'price' THEN price
        |        WHEN 'qty' THEN qty ELSE disc END) <= b1.thr
        |      THEN b1.pol ELSE -b1.pol END)) AS w
        |  FROM pts, b1),
        |e2 AS (SELECT feat, thr, pol,
        |    sum(w * CASE WHEN (CASE WHEN (CASE feat
        |        WHEN 'price' THEN price WHEN 'qty' THEN qty
        |        ELSE disc END) <= thr THEN pol ELSE -pol END) <> y
        |      THEN 1.0 ELSE 0.0 END) / nullif(sum(w), 0) AS err
        |  FROM w2, cands GROUP BY 1, 2, 3),
        |b2 AS (SELECT feat, thr, pol, err,
        |    0.5 * ln((1 - least(greatest(err, 1e-9), 1 - 1e-9)) /
        |      least(greatest(err, 1e-9), 1 - 1e-9)) AS alpha
        |  FROM e2 ORDER BY err, feat, thr, pol LIMIT 1),
        |sc AS (SELECT avg(CASE WHEN (CASE WHEN
        |      b1.alpha * (CASE WHEN (CASE b1.feat
        |        WHEN 'price' THEN price WHEN 'qty' THEN qty
        |        ELSE disc END) <= b1.thr THEN b1.pol
        |        ELSE -b1.pol END) +
        |      b2.alpha * (CASE WHEN (CASE b2.feat
        |        WHEN 'price' THEN price WHEN 'qty' THEN qty
        |        ELSE disc END) <= b2.thr THEN b2.pol
        |        ELSE -b2.pol END) >= 0
        |      THEN 1.0 ELSE -1.0 END) = y THEN 1.0 ELSE 0.0 END)
        |      AS acc
        |  FROM pts, b1, b2)
        |SELECT 1 AS round_no, b1.feat, b1.thr, b1.pol,
        |  (round(b1.err, 6) + 0.0) AS err, (round(b1.alpha, 4) + 0.0) AS alpha,
        |  round(sc.acc, 4) AS ensemble_train_acc FROM b1, sc
        |UNION ALL
        |SELECT 2, b2.feat, b2.thr, b2.pol, (round(b2.err, 6) + 0.0),
        |  (round(b2.alpha, 4) + 0.0), round(sc.acc, 4) FROM b2, sc
        |ORDER BY round_no""".stripMargin,
    "q406_huber_m" ->
      """WITH pts AS (SELECT event_type, value::DOUBLE AS x
        |  FROM events),
        |b AS (SELECT event_type, count(*)::BIGINT AS n, avg(x) AS mu0,
        |    1.345 * sqrt(greatest(
        |      sum(x * x) / count(*) - avg(x) * avg(x), 0.0)) AS delta
        |  FROM pts GROUP BY 1),
        |i1 AS (SELECT p.event_type,
        |    sum((CASE WHEN abs(x - mu0) <= delta THEN 1.0
        |         ELSE delta / abs(x - mu0) END) * x) /
        |    nullif(sum(CASE WHEN abs(x - mu0) <= delta THEN 1.0
        |         ELSE delta / abs(x - mu0) END), 0) AS mu1
        |  FROM pts p JOIN b USING (event_type) GROUP BY 1),
        |i2 AS (SELECT p.event_type,
        |    sum((CASE WHEN abs(x - mu1) <= delta THEN 1.0
        |         ELSE delta / abs(x - mu1) END) * x) /
        |    nullif(sum(CASE WHEN abs(x - mu1) <= delta THEN 1.0
        |         ELSE delta / abs(x - mu1) END), 0) AS mu2
        |  FROM pts p JOIN b USING (event_type)
        |    JOIN i1 USING (event_type) GROUP BY 1)
        |SELECT b.event_type, n, (round(mu0, 4) + 0.0) AS mean,
        |  (round(delta, 4) + 0.0) AS delta,
        |  (round(mu1, 4) + 0.0) AS huber_mu_iter1,
        |  (round(mu2, 4) + 0.0) AS huber_mu_iter2
        |FROM b JOIN i1 USING (event_type) JOIN i2 USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q407_geometric_median" ->
      """WITH pts AS (SELECT user_id, count(*)::DOUBLE AS px,
        |    avg(value) AS py
        |  FROM events GROUP BY 1),
        |c0 AS (SELECT avg(px) AS mx, avg(py) AS my,
        |    count(*)::BIGINT AS n FROM pts),
        |s1 AS (SELECT max(n) AS n, sum(px / d) / sum(1.0 / d) AS mx,
        |    sum(py / d) / sum(1.0 / d) AS my
        |  FROM (SELECT p.px, p.py, c.n,
        |      sqrt((px - mx) * (px - mx) + (py - my) * (py - my)) AS d
        |    FROM pts p, c0 c) WHERE d > 0),
        |s2 AS (SELECT max(n) AS n, sum(px / d) / sum(1.0 / d) AS mx,
        |    sum(py / d) / sum(1.0 / d) AS my
        |  FROM (SELECT p.px, p.py, c.n,
        |      sqrt((px - mx) * (px - mx) + (py - my) * (py - my)) AS d
        |    FROM pts p, s1 c) WHERE d > 0),
        |s3 AS (SELECT max(n) AS n, sum(px / d) / sum(1.0 / d) AS mx,
        |    sum(py / d) / sum(1.0 / d) AS my
        |  FROM (SELECT p.px, p.py, c.n,
        |      sqrt((px - mx) * (px - mx) + (py - my) * (py - my)) AS d
        |    FROM pts p, s2 c) WHERE d > 0),
        |o AS (SELECT max(s.n) AS n_points, max(mx) AS mx,
        |    max(my) AS my,
        |    avg(sqrt((px - mx) * (px - mx) + (py - my) * (py - my)))
        |      AS avgd
        |  FROM pts, s3 s)
        |SELECT n_points, (round(mx, 4) + 0.0) AS gm_x, (round(my, 4) + 0.0) AS gm_y,
        |  round(avgd, 4) AS avg_dist FROM o""".stripMargin,
    "q399_davies_bouldin" ->
      """WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |ini AS (SELECT vec_id::INT AS code, v AS cv FROM v
        |  WHERE vec_id < 4),
        |ar AS (SELECT v.vec_id, i.code,
        |    (round(list_sum(list_transform(range(1, 65),
        |      k -> (v.v[k] - i.cv[k]) ^ 2)), 6) + 0.0) AS d
        |  FROM v, ini i),
        |asg AS (SELECT vec_id, code FROM (SELECT *, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY d, code) AS rk
        |  FROM ar) WHERE rk = 1),
        |cent AS (SELECT a.code, k.k AS pos, (round(avg(v.v[k.k]), 6) + 0.0) AS c
        |  FROM asg a JOIN v USING (vec_id),
        |    (SELECT unnest(range(1, 65)) AS k) k
        |  GROUP BY 1, 2),
        |cl AS (SELECT code, list(c ORDER BY pos) AS cv
        |  FROM cent GROUP BY 1),
        |sc AS (SELECT a.code, count(*)::BIGINT AS n,
        |    avg(sqrt(list_sum(list_transform(range(1, 65),
        |      k -> (v.v[k] - c.cv[k]) ^ 2)))) AS s
        |  FROM asg a JOIN v USING (vec_id) JOIN cl c ON a.code = c.code
        |  GROUP BY 1),
        |r AS (SELECT i.code, i.n, i.s,
        |    max((i.s + j.s) / sqrt(list_sum(list_transform(range(1, 65),
        |      k -> (ci.cv[k] - cj.cv[k]) ^ 2)))) AS rmax
        |  FROM sc i JOIN cl ci ON i.code = ci.code,
        |    sc j JOIN cl cj ON j.code = cj.code
        |  WHERE i.code <> j.code GROUP BY 1, 2, 3),
        |db AS (SELECT avg(rmax) AS db FROM r)
        |SELECT code, n, (round(s, 4) + 0.0) AS scatter,
        |  (round(rmax, 4) + 0.0) AS r_max, (round(db.db, 4) + 0.0) AS db_index
        |FROM r, db ORDER BY code""".stripMargin,
    "q397_ridge_gram" ->
      """WITH d AS (SELECT l_quantity::DOUBLE AS x1,
        |    l_discount::DOUBLE AS x2,
        |    l_extendedprice::DOUBLE / 1000.0 AS y FROM lineitem),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |    sum(x1) AS s1, sum(x2) AS s2,
        |    sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
        |    sum(x2 * x2) AS s22, sum(y) AS sy,
        |    sum(x1 * y) AS s1y, sum(x2 * y) AS s2y FROM d),
        |a AS (SELECT *, n + 1.0 AS a00, s11 + 1.0 AS a11,
        |    s22 + 1.0 AS a22 FROM m),
        |det AS (SELECT *,
        |    a00 * (a11 * a22 - s12 * s12)
        |      - s1 * (s1 * a22 - s12 * s2)
        |      + s2 * (s1 * s12 - a11 * s2) AS dt FROM a),
        |b AS (SELECT n, sy,
        |    (sy * (a11 * a22 - s12 * s12)
        |      - s1 * (s1y * a22 - s12 * s2y)
        |      + s2 * (s1y * s12 - a11 * s2y)) / dt AS b0,
        |    (a00 * (s1y * a22 - s12 * s2y)
        |      - sy * (s1 * a22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2)) / dt AS b1,
        |    (a00 * (a11 * s2y - s12 * s1y)
        |      - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - a11 * s2)) / dt AS b2
        |  FROM det)
        |SELECT count(*)::BIGINT AS n,
        |  (round(max(b.b0), 6) + 0.0) AS beta0, (round(max(b.b1), 6) + 0.0) AS beta1,
        |  (round(max(b.b2), 6) + 0.0) AS beta2,
        |  (round(sqrt(avg((y - b.b0 - b.b1 * x1 - b.b2 * x2) ^ 2)), 4) + 0.0)
        |    AS rmse,
        |  (round(sqrt(avg((y - b.sy / b.n) ^ 2)), 4) + 0.0) AS rmse_null
        |FROM d, b""".stripMargin,
    "q383_pinball_loss" ->
      """WITH e AS (SELECT event_type, ts::DATE AS day,
        |    value::DOUBLE AS y FROM events),
        |c AS (SELECT min(day) + CAST(floor((max(day) - min(day))
        |    * 0.7) AS INTEGER) AS cut FROM e),
        |p AS (SELECT event_type,
        |    quantile_cont(y, 0.5) AS p50, quantile_cont(y, 0.9) AS p90
        |  FROM e, c WHERE day < cut GROUP BY 1)
        |SELECT e.event_type, count(*)::BIGINT AS n_test,
        |  (round(avg(greatest(0.5 * (y - p50), -0.5 * (y - p50))), 4) + 0.0)
        |    AS pinball_p50,
        |  (round(avg(greatest(0.9 * (y - p90), -0.1 * (y - p90))), 4) + 0.0)
        |    AS pinball_p90,
        |  round(avg(CASE WHEN y <= p90 THEN 1.0 ELSE 0.0 END), 4)
        |    AS cov_p90
        |FROM e JOIN p USING (event_type), c WHERE day >= cut
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q375_brier_decomposition" ->
      """WITH r AS (
        |  SELECT 1.0 / (1.0 + exp(-(0.00002 * o_totalprice
        |      - 0.5 * substr(o_orderpriority, 1, 1)::INT - 1.0)))
        |    AS p,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS o
        |  FROM orders),
        |b AS (SELECT least(floor(p * 10)::INT, 9) AS bin,
        |    count(*)::DOUBLE AS n, sum(p) AS sp, sum(p * p) AS spp,
        |    sum(o) AS so, sum(o * o) AS soo, sum(p * o) AS spo
        |  FROM r GROUP BY 1),
        |a AS (SELECT sum(n) AS nn, sum(so) AS sumo,
        |    sum(n * pow(sp / n - so / n, 2)) AS rel,
        |    sum(spp - sp * sp / n) AS wvp,
        |    sum(spo - sp * so / n) AS wcov,
        |    sum(spp - 2 * spo + soo) AS bsum,
        |    sum(n * pow(so / n, 2)) AS sobar2
        |  FROM b),
        |f AS (SELECT nn, bsum / nn AS brier, rel / nn AS rel,
        |    sobar2 / nn - (sumo / nn) * (sumo / nn) AS res,
        |    (sumo / nn) * (1.0 - sumo / nn) AS unc,
        |    (wvp - 2 * wcov) / nn AS wv
        |  FROM a)
        |SELECT nn::BIGINT AS n, (round(brier, 4) + 0.0) AS brier,
        |  (round(rel, 4) + 0.0) AS reliability, round(res, 4) AS resolution,
        |  round(unc, 4) AS uncertainty,
        |  round(wv, 4) AS within_bin_term,
        |  abs(brier - (rel - res + unc + wv)) < 1e-9
        |    AS identity_exact
        |FROM f""".stripMargin,
    "q373_avg_precision" ->
      """WITH e AS (SELECT event_id AS id, value::DOUBLE AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (SELECT *,
        |    row_number() OVER (ORDER BY v DESC, id) AS rk,
        |    sum(pos) OVER (ORDER BY v DESC, id
        |      ROWS UNBOUNDED PRECEDING) AS prk
        |  FROM e),
        |a AS (SELECT count(*)::BIGINT AS n_pos,
        |    avg(prk::DOUBLE / rk) AS ap
        |  FROM r WHERE pos = 1)
        |SELECT (SELECT count(*) FROM e)::BIGINT AS n, n_pos,
        |  (round(ap, 4) + 0.0) AS avg_precision,
        |  round(n_pos::DOUBLE / (SELECT count(*) FROM e), 4)
        |    AS baseline_prevalence
        |FROM a""".stripMargin,
    "q353_logreg_newton" ->
      """WITH o AS (SELECT o_totalprice::DOUBLE / 100000.0 AS x,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
        |  FROM orders),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx,
        |    sum(x * x) AS sxx, sum(y - 0.5) AS g0,
        |    sum(x * (y - 0.5)) AS g1 FROM o),
        |b AS (SELECT n,
        |    (0.25 * sxx * g0 - 0.25 * sx * g1) /
        |      (0.0625 * (n * sxx - sx * sx)) AS b0,
        |    (0.25 * n * g1 - 0.25 * sx * g0) /
        |      (0.0625 * (n * sxx - sx * sx)) AS b1 FROM m),
        |l AS (SELECT count(*)::BIGINT AS n, max(b.b0) AS b0,
        |    max(b.b1) AS b1,
        |    sum(o.y * (b.b0 + b.b1 * o.x) -
        |      ln(1.0 + exp(b.b0 + b.b1 * o.x))) AS ll1
        |  FROM o CROSS JOIN b)
        |SELECT n, round(b0, 6) AS beta0, round(b1, 6) AS beta1,
        |  (round(-n * ln(2.0), 4) + 0.0) AS ll_null,
        |  (round(ll1, 4) + 0.0) AS ll_newton,
        |  ll1 > -n * ln(2.0) AS improved
        |FROM l""".stripMargin,
    "q354_als_step" ->
      """WITH r AS (SELECT user_id, event_type,
        |    count(*)::DOUBLE AS r FROM events GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT event_type,
        |    0.5 + ('0x' || substr(md5('als:' || event_type), 1, 8))
        |      ::BIGINT / 4294967296.0 AS v0
        |  FROM r),
        |u1 AS (SELECT r.user_id,
        |    sum(r.r * v0.v0) / (0.1 + sum(v0.v0 * v0.v0)) AS u
        |  FROM r JOIN v0 USING (event_type) GROUP BY 1),
        |v1 AS (SELECT r.event_type, count(*)::BIGINT AS n_users,
        |    sum(r.r * u1.u) / (0.1 + sum(u1.u * u1.u)) AS v1
        |  FROM r JOIN u1 USING (user_id) GROUP BY 1),
        |e AS (SELECT r.event_type,
        |    sqrt(avg(pow(r.r - u1.u * v1.v1, 2))) AS rmse
        |  FROM r JOIN u1 USING (user_id) JOIN v1 USING (event_type)
        |  GROUP BY 1)
        |SELECT event_type, round(v0.v0, 6) AS item_init,
        |  v1.n_users, (round(v1.v1, 6) + 0.0) AS item_factor,
        |  (round(e.rmse, 4) + 0.0) AS rmse
        |FROM v0 JOIN v1 USING (event_type) JOIN e USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q344_gmm_em_step" ->
      """WITH o AS (SELECT o_totalprice::DOUBLE AS x FROM orders),
        |mm AS (SELECT min(x) AS mn, max(x) AS mx FROM o),
        |b AS (SELECT x, mn + (mx - mn) / 4 AS mu1,
        |    mn + (mx - mn) * 3 / 4 AS mu2, (mx - mn) / 4 AS sd
        |  FROM o, mm),
        |e AS (SELECT x,
        |    exp(-(x - mu1) * (x - mu1) / (2.0 * sd * sd)) /
        |      (sd * sqrt(2 * pi())) * 0.5 AS p1,
        |    exp(-(x - mu2) * (x - mu2) / (2.0 * sd * sd)) /
        |      (sd * sqrt(2 * pi())) * 0.5 AS p2
        |  FROM b),
        |r AS (SELECT x, p2 / (p1 + p2) AS r2, 1.0 - p2 / (p1 + p2)
        |    AS r1 FROM e),
        |a AS (SELECT count(*)::BIGINT AS n,
        |    sum(r1) AS s1, sum(r1 * x) AS sx1, sum(r1 * x * x) AS sxx1,
        |    sum(r2) AS s2, sum(r2 * x) AS sx2, sum(r2 * x * x) AS sxx2
        |  FROM r)
        |SELECT n, (round(s1 / n, 4) + 0.0) AS w1, (round(s2 / n, 4) + 0.0) AS w2,
        |  (round(sx1 / s1, 2) + 0.0) AS mu1, (round(sx2 / s2, 2) + 0.0) AS mu2,
        |  (round(sqrt(sxx1 / s1 - (sx1 / s1) * (sx1 / s1)), 2) + 0.0) AS sd1,
        |  (round(sqrt(sxx2 / s2 - (sx2 / s2) * (sx2 / s2)), 2) + 0.0) AS sd2
        |FROM a""".stripMargin,
    "q328_eb_shrinkage" ->
      """WITH g AS (SELECT o_custkey, count(*)::BIGINT AS n,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END)::BIGINT
        |      AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT *, x / n::DOUBLE AS raw FROM g),
        |mom AS (SELECT avg(raw) AS mu,
        |    greatest(var_samp(raw), 1e-6) AS v FROM r),
        |ab AS (SELECT mu,
        |    greatest(mu * (1.0 - mu) / v - 1, 0.1) AS s FROM mom),
        |pr AS (SELECT mu, mu * s AS alpha, (1.0 - mu) * s AS beta
        |  FROM ab),
        |sh AS (SELECT r.o_custkey, r.n, r.x, r.raw,
        |    (r.x + pr.alpha) / (r.n + pr.alpha + pr.beta) AS shrunk,
        |    pr.alpha, pr.beta
        |  FROM r, pr)
        |SELECT o_custkey, n, x, round(raw, 4) AS raw_rate,
        |  round(shrunk, 4) AS shrunk_rate, (round(alpha, 4) + 0.0) AS alpha,
        |  (round(beta, 4) + 0.0) AS beta
        |FROM sh
        |ORDER BY round(abs(raw - shrunk), 6) DESC, o_custkey
        |LIMIT 10""".stripMargin,
    "q326_isotonic_calibration" ->
      """WITH o AS (SELECT o_totalprice::DOUBLE AS x,
        |    o_orderstatus = 'F' AS y FROM orders),
        |mm AS (SELECT min(x) AS mn, max(x) AS mx FROM o),
        |bins AS (SELECT
        |    least(floor((x - mn) / (mx - mn) * 20), 19)::INT AS b,
        |    count(*)::BIGINT AS n,
        |    count(CASE WHEN y THEN 1 END)::BIGINT AS pos,
        |    round(avg(x), 2) AS mean_score
        |  FROM o, mm GROUP BY 1),
        |c AS (SELECT *, sum(n) OVER (ORDER BY b) AS cw,
        |    sum(pos) OVER (ORDER BY b) AS cp FROM bins),
        |p AS (SELECT j.b AS j, k.b AS k,
        |    (k.cp - (j.cp - j.pos)) /
        |      (k.cw - (j.cw - j.n))::DOUBLE AS avgv
        |  FROM c j JOIN c k ON k.b >= j.b),
        |m AS (SELECT j, k, min(avgv) OVER (PARTITION BY j
        |    ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS mv FROM p),
        |iso AS (SELECT k AS b, max(mv) AS iso FROM m GROUP BY 1)
        |SELECT bins.b, n, pos, (round(pos / n::DOUBLE, 4) + 0.0) AS frac_pos,
        |  round(iso.iso, 6) AS iso_calibrated, mean_score
        |FROM bins JOIN iso USING (b) ORDER BY bins.b""".stripMargin,
    "q225_wilson_ci" ->
      """WITH a AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS x
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT o_orderpriority, n, x,
        |    x::DOUBLE / n AS p,
        |    1.0 + (1.96 * 1.96) / n AS denom
        |  FROM a)
        |SELECT o_orderpriority, n, x,
        |  round(p, 4) AS rate,
        |  (round(((p + (1.96 * 1.96) / (2.0 * n)) / denom) -
        |    (1.96 * sqrt(p * (1.0 - p) / n +
        |      (1.96 * 1.96) / (4.0 * n::DOUBLE * n))) / denom, 4) + 0.0) AS ci_lo,
        |  (round(((p + (1.96 * 1.96) / (2.0 * n)) / denom) +
        |    (1.96 * sqrt(p * (1.0 - p) / n +
        |      (1.96 * 1.96) / (4.0 * n::DOUBLE * n))) / denom, 4) + 0.0) AS ci_hi
        |FROM m ORDER BY o_orderpriority""".stripMargin,
    "q207_prop_ztest" ->
      """WITH a AS (
        |  SELECT
        |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |      AS n_a,
        |    count(CASE WHEN o_orderpriority = '1-URGENT'
        |      AND o_orderstatus = 'F' THEN 1 END) AS x_a,
        |    count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_b,
        |    count(CASE WHEN o_orderpriority = '5-LOW'
        |      AND o_orderstatus = 'F' THEN 1 END) AS x_b
        |  FROM orders),
        |m AS (
        |  SELECT n_a, n_b,
        |    x_a::DOUBLE / n_a AS pa, x_b::DOUBLE / n_b AS pb,
        |    (x_a + x_b)::DOUBLE / (n_a + n_b) AS pp
        |  FROM a)
        |SELECT n_a, n_b,
        |  round(pa, 4) AS rate_a, round(pb, 4) AS rate_b,
        |  round(pp, 4) AS pooled_rate,
        |  round((pa - pb) /
        |    sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |FROM m""".stripMargin,
    "q208_cohen_kappa" ->
      """WITH r AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 'hi' ELSE 'lo' END
        |      AS a,
        |    CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS b
        |  FROM lineitem),
        |base AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN a = b THEN 1 END) AS agree
        |  FROM r),
        |ma AS (SELECT a AS k, count(*) AS ra FROM r GROUP BY 1),
        |mb AS (SELECT b AS k, count(*) AS cb FROM r GROUP BY 1),
        |rc AS (
        |  SELECT sum(coalesce(ra, 0)::DOUBLE * coalesce(cb, 0)::DOUBLE)
        |    AS rcsum
        |  FROM ma FULL OUTER JOIN mb USING (k))
        |SELECT n,
        |  (round(agree::DOUBLE / n, 4) + 0.0) AS po,
        |  (round(rcsum / (n::DOUBLE * n::DOUBLE), 4) + 0.0) AS pe,
        |  (round((agree::DOUBLE / n - rcsum / (n::DOUBLE * n::DOUBLE)) /
        |    (1.0 - rcsum / (n::DOUBLE * n::DOUBLE)), 4) + 0.0) AS kappa
        |FROM base, rc""".stripMargin,
    "q205_welch_ttest" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_totalprice AS v, o_orderstatus AS st
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |a AS (
        |  SELECT c_mktsegment,
        |    count(CASE WHEN st = 'F' THEN 1 END) AS n_a,
        |    sum(CASE WHEN st = 'F' THEN v END) AS sa,
        |    sum(CASE WHEN st = 'F' THEN v * v END) AS ssa,
        |    count(CASE WHEN st = 'O' THEN 1 END) AS n_b,
        |    sum(CASE WHEN st = 'O' THEN v END) AS sb,
        |    sum(CASE WHEN st = 'O' THEN v * v END) AS ssb
        |  FROM j GROUP BY 1),
        |m AS (
        |  SELECT c_mktsegment, n_a, n_b, sa, sb,
        |    ((ssa - sa * sa / n_a) / (n_a - 1)) / n_a AS sea,
        |    ((ssb - sb * sb / n_b) / (n_b - 1)) / n_b AS seb
        |  FROM a)
        |SELECT c_mktsegment, n_a, n_b,
        |  (round(sa / n_a, 2) + 0.0) AS mean_a, (round(sb / n_b, 2) + 0.0) AS mean_b,
        |  (round((sa / n_a - sb / n_b) / sqrt(sea + seb), 4) + 0.0) AS t_stat,
        |  round((sea + seb) * (sea + seb) /
        |    (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)), 2)
        |    AS welch_df
        |FROM m ORDER BY c_mktsegment""".stripMargin,
    "q189_group_regression" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity::DOUBLE) AS sx,
        |    sum(l_extendedprice::DOUBLE) AS sy,
        |    sum(l_quantity::DOUBLE * l_extendedprice::DOUBLE) AS sxy,
        |    sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS sxx,
        |    sum(l_extendedprice::DOUBLE * l_extendedprice::DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) + 0.0) AS slope,
        |  (round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 4) + 0.0)
        |    AS intercept,
        |  (round(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
        |    ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) + 0.0) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q190_auc" ->
      """WITH ps AS (
        |  SELECT o_orderpriority, o_totalprice::DOUBLE AS score,
        |    count(*) AS cnt,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS pos
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderpriority, pos, cnt,
        |    (sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY score
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |      - cnt + (cnt + 1) / 2.0 AS avg_rank
        |  FROM ps)
        |SELECT o_orderpriority,
        |  sum(pos)::BIGINT AS n_pos, sum(cnt - pos)::BIGINT AS n_neg,
        |  (round((sum(pos * avg_rank) -
        |      sum(pos)::BIGINT * (sum(pos)::BIGINT + 1) / 2.0) /
        |    (sum(pos)::BIGINT * sum(cnt - pos)::BIGINT), 4) + 0.0) AS auc
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q195_gini_lorenz" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(o_totalprice) AS spend
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT c_mktsegment, spend,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY spend, o_custkey) AS rk
        |  FROM spend JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  (round(sum(spend), 2) + 0.0) AS total_spend,
        |  (round(2.0 * sum(rk * spend) / (count(*) * sum(spend)) -
        |    (count(*) + 1) / count(*)::DOUBLE, 4) + 0.0) AS gini
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q198_mutual_info" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS x, o_orderstatus AS y,
        |    count(*) AS o
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o,
        |    (sum(o) OVER (PARTITION BY x))::BIGINT AS rx,
        |    (sum(o) OVER (PARTITION BY y))::BIGINT AS cy,
        |    (sum(o) OVER ())::BIGINT AS n, x, y
        |  FROM cells)
        |SELECT max(n) AS n, count(DISTINCT x) AS r, count(DISTINCT y) AS c,
        |  (round(sum((o / n::DOUBLE) * ln(o * n / (rx * cy::DOUBLE))), 4) + 0.0)
        |    AS mi,
        |  (round(sum((o / n::DOUBLE) * ln(o * n / (rx * cy::DOUBLE))) /
        |    sqrt(sum((o / n::DOUBLE) * -ln(rx / n::DOUBLE)) *
        |      sum((o / n::DOUBLE) * -ln(cy / n::DOUBLE))), 4) + 0.0) AS nmi,
        |  (round(sum(o * o * n / (rx * cy::DOUBLE)) - max(n), 4) + 0.0) AS chi2,
        |  (round(sqrt((sum(o * o * n / (rx * cy::DOUBLE)) - max(n)) /
        |    (max(n) * least(count(DISTINCT x) - 1,
        |      count(DISTINCT y) - 1))), 4) + 0.0) AS cramers_v
        |FROM m""".stripMargin,
    "q191_best_split" ->
      """WITH pv AS (
        |  SELECT l_quantity::DOUBLE AS threshold, count(*) AS cnt,
        |    count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT threshold,
        |    (sum(cnt) OVER (ORDER BY threshold
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS nl,
        |    (sum(pos) OVER (ORDER BY threshold
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS pl,
        |    (sum(cnt) OVER ())::BIGINT AS nt,
        |    (sum(pos) OVER ())::BIGINT AS pt
        |  FROM pv),
        |g AS (
        |  SELECT threshold, nl AS n_left, nt - nl AS n_right,
        |    pl AS pos_left, pt - pl AS pos_right,
        |    (nl * (1.0 - (pl/nl)*(pl/nl) - ((nl-pl)/nl)*((nl-pl)/nl))
        |     + (nt-nl) * (1.0 - ((pt-pl)/(nt-nl))*((pt-pl)/(nt-nl))
        |         - (((nt-nl)-(pt-pl))/(nt-nl))*(((nt-nl)-(pt-pl))/(nt-nl))))
        |      / nt AS wg
        |  FROM c WHERE nl < nt)
        |SELECT * FROM (
        |  SELECT threshold, n_left, n_right, pos_left, pos_right,
        |    round(wg, 4) AS weighted_gini
        |  FROM g ORDER BY round(wg, 6), threshold LIMIT 5)
        |ORDER BY weighted_gini, threshold""".stripMargin)
}
