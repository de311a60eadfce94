package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelEvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("groupRegression recovers an exact linear relationship") {
    // y = 3x + 2 exactly → slope 3, intercept 2, r² 1
    val df = (1 to 100).map(i => ("g", i.toDouble, 3.0 * i + 2.0))
      .toDF("grp", "x", "y")
    val r = ModelEvalOps.groupRegression(df, "grp", "x", "y").collect()(0)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("groupRegression slope sign follows the correlation per group") {
    val up = (1 to 50).map(i => ("up", i.toDouble, i + (i % 3).toDouble))
    val dn = (1 to 50).map(i => ("dn", i.toDouble, 100.0 - i + (i % 3)))
    val out = ModelEvalOps.groupRegression((up ++ dn).toDF("grp", "x", "y"),
      "grp", "x", "y").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("slope")).toMap
    assert(out("up") > 0 && out("dn") < 0)
  }

  test("rankAuc: perfect separation → 1.0, anti-separation → 0.0") {
    // positives all score higher than negatives
    val df = ((1 to 10).map(i => ("g", i + 100.0, true)) ++
      (1 to 10).map(i => ("g", i.toDouble, false)))
      .toDF("grp", "score", "label")
    val auc = ModelEvalOps.rankAuc(df, "grp", "score", col("label"))
      .collect()(0).getAs[Double]("auc")
    assert(auc == 1.0)
    val anti = ModelEvalOps.rankAuc(df, "grp", "score", !col("label"))
      .collect()(0).getAs[Double]("auc")
    assert(anti == 0.0)
  }

  test("rankAuc: all-tied scores → 0.5 via average ranks") {
    val df = ((1 to 7).map(_ => ("g", 5.0, true)) ++
      (1 to 13).map(_ => ("g", 5.0, false))).toDF("grp", "score", "label")
    val row = ModelEvalOps.rankAuc(df, "grp", "score", col("label"))
      .collect()(0)
    assert(row.getAs[Double]("auc") == 0.5)
    assert(row.getAs[Long]("n_pos") == 7 && row.getAs[Long]("n_neg") == 13)
  }

  test("rankAuc matches the hand-computed Mann-Whitney on a tied mix") {
    // scores: 1(neg) 2(pos,neg) 3(pos) → ranks 1, 2.5, 2.5, 4
    // U = sum_pos_ranks - P(P+1)/2 = (2.5 + 4) - 3 = 3.5; AUC = 3.5/(2*2)
    val df = Seq(("g", 1.0, false), ("g", 2.0, true), ("g", 2.0, false),
      ("g", 3.0, true)).toDF("grp", "score", "label")
    val auc = ModelEvalOps.rankAuc(df, "grp", "score", col("label"))
      .collect()(0).getAs[Double]("auc")
    assert(auc == 0.875)
  }

  test("bestSplit finds the exact boundary of a separable feature") {
    // label = x > 30: threshold 30 separates perfectly → gini 0
    val df = (1 to 60).map(i => (i.toDouble, i > 30)).toDF("x", "label")
    val top = ModelEvalOps.bestSplit(df, "x", col("label"), 3).collect()
    assert(top(0).getAs[Double]("threshold") == 30.0)
    assert(top(0).getAs[Double]("weighted_gini") == 0.0)
    assert(top(0).getAs[Long]("n_left") == 30 &&
      top(0).getAs[Long]("pos_left") == 0)
    // every other candidate is strictly worse
    assert(top(1).getAs[Double]("weighted_gini") > 0.0)
  }

  test("bestSplit drops the max-value threshold (splits nothing)") {
    val df = (1 to 10).map(i => (i.toDouble, i % 2 == 0)).toDF("x", "label")
    val all = ModelEvalOps.bestSplit(df, "x", col("label"), 100)
    assert(all.count() == 9)
    assert(all.agg(max("threshold")).collect()(0).getDouble(0) == 9.0)
  }

  test("weightedMedian: weight mass shifts the median") {
    // values 1..5 weight 1 → median 3; weight concentrated on 5 → 5
    val flat = (1 to 5).map(i => ("g", i.toDouble, 1.0)).toDF("g", "v", "w")
    val m1 = StatOps.weightedMedian(flat, "g", "v", "w")
      .collect()(0).getAs[Double]("weighted_median")
    assert(m1 == 3.0)
    val heavy = flat.union(Seq(("g", 5.0, 10.0)).toDF("g", "v", "w"))
    val m2 = StatOps.weightedMedian(heavy, "g", "v", "w")
      .collect()(0).getAs[Double]("weighted_median")
    assert(m2 == 5.0)
  }

  test("weightedMedian with unit weights equals the lower median") {
    val df = (1 to 9).map(i => ("g", i.toDouble, 1.0)).toDF("g", "v", "w")
    val r = StatOps.weightedMedian(df, "g", "v", "w").collect()(0)
    assert(r.getAs[Double]("weighted_median") == 5.0)
    assert(r.getAs[Double]("total_weight") == 9.0)
  }

  test("welchTTest: hand-computed t and Welch-Satterthwaite df") {
    // A = [1,2,3] (mean 2, var 1), B = [4,6] (mean 5, var 2):
    // t = -3/sqrt(1/3 + 1) = -2.5981, df = (4/3)² / (1/18 + 1) = 1.68
    val df = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 4.0), ("g", "b", 6.0)).toDF("g", "side", "v")
    val r = ModelEvalOps.welchTTest(df, "g", "v",
      org.apache.spark.sql.functions.col("side") === "a",
      org.apache.spark.sql.functions.col("side") === "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 5.0)
    assert(r.getAs[Double]("t_stat") == -2.5981)
    assert(r.getAs[Double]("welch_df") == 1.68)
  }

  test("theilSen recovers an exact line and shrugs off an outlier") {
    val line = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 1.0))
    val r = ModelEvalOps.theilSen(line.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    // one wild outlier: the median-of-slopes barely moves (OLS would
    // bend hard); intercept median likewise robust
    val dirty = line :+ (("g", 10.5, 1000.0))
    val r2 = ModelEvalOps.theilSen(dirty.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0)
    assert(math.abs(r2.getAs[Double]("slope") - 2.0) < 0.1,
      s"slope ${r2.getAs[Double]("slope")}")
    assert(math.abs(r2.getAs[Double]("intercept") - 1.0) < 1.0)
  }

  test("mannKendall: monotone series flags a trend, shuffled noise none") {
    // strictly increasing, no ties: S = C(20,2) = 190,
    // Var = 20·19·45/18 = 950, z = 189/sqrt(950) = 6.132
    val up = (1 to 20).map(i => ("up", i.toDouble, i + 0.5))
    val r = ModelEvalOps.mannKendall(up.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0)
    assert(r.getAs[Long]("s") == 190L)
    assert(r.getAs[Double]("z") == 6.132)
    assert(r.getAs[String]("trend") == "increasing")
    // alternating values: pair signs cancel, no trend
    val flat = (1 to 20).map(i => ("f", i.toDouble, (i % 2).toDouble))
    val rf = ModelEvalOps.mannKendall(flat.toDF("g", "x", "y"),
      "g", "x", "y").collect()(0)
    assert(rf.getAs[String]("trend") == "no_trend")
  }

  test("theilSen/mannKendall fail fast on an unbounded per-group series") {
    // the O(n²) pair fan-out is only sane on pre-collapsed series; the
    // in-plan guard must abort BEFORE the pair join, with a message
    // naming the contract — simulate with a tiny maxSeriesPoints bound
    val big = (1 to 50).map(i => ("g", i.toDouble, i * 2.0))
      .toDF("g", "x", "y")
    val e1 = intercept[Exception] {
      ModelEvalOps.theilSen(big, "g", "x", "y", maxSeriesPoints = 10)
        .collect()
    }
    assert(e1.getMessage.contains("maxSeriesPoints") ||
      String.valueOf(e1.getCause).contains("maxSeriesPoints"),
      s"wrong error: $e1")
    val e2 = intercept[Exception] {
      ModelEvalOps.mannKendall(big, "g", "x", "y", maxSeriesPoints = 10)
        .collect()
    }
    assert(e2.getMessage.contains("maxSeriesPoints") ||
      String.valueOf(e2.getCause).contains("maxSeriesPoints"),
      s"wrong error: $e2")
    // at the bound itself: no throw (guard is <=)
    val ok = (1 to 10).map(i => ("g", i.toDouble, i * 2.0))
      .toDF("g", "x", "y")
    assert(ModelEvalOps.theilSen(ok, "g", "x", "y", maxSeriesPoints = 10)
      .collect().length == 1)
  }

  test("propZTest: hand-computed pooled z") {
    // A: 3/4 success, B: 1/4 success, pooled 4/8 = 0.5
    // z = 0.5 / sqrt(0.5·0.5·(1/4+1/4)) = 0.5/sqrt(0.125) = 1.4142
    val df = (Seq.fill(3)(("a", true)) ++ Seq(("a", false)) ++
      Seq(("b", true)) ++ Seq.fill(3)(("b", false)))
      .toDF("side", "ok")
    val r = ModelEvalOps.propZTest(df,
      col("side") === "a", col("side") === "b", col("ok")).collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("rate_a") == 0.75)
    assert(r.getAs[Double]("rate_b") == 0.25)
    assert(r.getAs[Double]("pooled_rate") == 0.5)
    assert(r.getAs[Double]("z") == 1.4142)
  }

  test("propZTest: empty cohort surfaces as null rate and z, not a throw") {
    val df = Seq(("a", true), ("a", false)).toDF("side", "ok")
    val r = ModelEvalOps.propZTest(df,
      col("side") === "a", col("side") === "b", col("ok")).collect()(0)
    assert(r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("rate_b")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("cohenKappa: the textbook 50-row contingency example") {
    // cells (a,b,count): (y,y,20) (y,n,5) (n,y,10) (n,n,15)
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/2500 = 0.5; κ = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = ModelEvalOps.cohenKappa(rows.toDF("ra", "rb"),
      col("ra"), col("rb")).collect()(0)
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa excludes null-labeled rows from n and marginals") {
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq(("y", null), (null, "n"), (null, null))
    val r = ModelEvalOps.cohenKappa(rows.toDF("ra", "rb"),
      col("ra"), col("rb")).collect()(0)
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa degenerate constant-equal raters yields null kappa") {
    // po = pe = 1 → κ = 0/0 → SQL null ("not chance-correctable")
    val r = ModelEvalOps.cohenKappa(
      Seq.fill(10)(("y", "y")).toDF("ra", "rb"),
      col("ra"), col("rb")).collect()(0)
    assert(r.getAs[Double]("po") == 1.0)
    assert(r.getAs[Double]("pe") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }
}
