package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / class-balancing operators (SURVEY.md §2.7 R1-R3).
  *
  * Re-expresses the reference's two balancing strategies:
  *  - binary oversampling of the minority class to parity
  *    (`timely_LR.py:88-96`): sample-with-replacement at ratio
  *    majority/minority, union with the majority class;
  *  - stratified resample-to-target (`random_forest_final_class_8.py:
  *    176-191`): every class re-sampled (over- OR under-) to ~N rows.
  *
  * Scale notes: the reference scans the cached relation once per class
  * (8 counts + 8 sampled scans). `resampleToTarget` keeps those exact
  * semantics (Poisson per-row sampling, per-class fractions) but computes
  * ALL class counts in ONE groupBy pass and applies ALL fractions in ONE
  * scan — a rand()-free `sample` per class is replaced by a single
  * per-row Poisson draw keyed by the row's class. At 100 TB that is 2
  * passes instead of 16.
  */
object BalanceOps {

  /** R1 — oversample the minority value of a binary label to parity in
    * expectation. Matches `timely_LR.py:88-96`: minority rows are
    * REPLACED by a with-replacement sample of themselves at fraction
    * majority/minority.
    */
  def oversampleBinary(df: DataFrame, labelCol: String, minorityValue: String,
                       seed: Long = 42L): DataFrame = {
    val minority = df.filter(col(labelCol) === minorityValue)
    val majority = df.filter(col(labelCol) =!= minorityValue)
    val nMin = minority.count()
    val nMaj = majority.count()
    require(nMin > 0, s"no rows with $labelCol == $minorityValue")
    val fraction = nMaj.toDouble / nMin.toDouble
    majority.unionByName(minority.sample(withReplacement = true, fraction, seed))
  }

  /** R2 (reference-parity form) — per-class filter + sample + union, one
    * sampled scan per class, exactly as `random_forest_final_class_8.py:
    * 176-191` does. Kept for semantic parity; prefer
    * `resampleToTarget` at scale.
    */
  def resamplePerClassScan(df: DataFrame, classCol: String, target: Long,
                           seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(classCol).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    counts.keys.toSeq.sortBy(_.toString).map { cls =>
      val fraction = target.toDouble / counts(cls).toDouble
      df.filter(col(classCol) === cls)
        .sample(withReplacement = true, fraction, seed)
    }.reduce(_ unionByName _)
  }

  /** R2 (single-pass form) — same expected row counts (~target per
    * class, Poisson-with-replacement), but one count pass + one sampled
    * scan total. Each row draws Poisson(target/classCount) copies via
    * explode of a per-row draw; the fractions ride in as a broadcast
    * map literal.
    */
  def resampleToTarget(df: DataFrame, classCol: String, target: Long,
                       seed: Long = 42L): DataFrame =
    resampleImpl(df, classCol, target, d => d.withColumn("__u", rand(seed)))

  /** R2, content-keyed form: the same single-pass Poisson resample but
    * with the uniform derived from md5 of a row id
    * (u = (hash32(id)+0.5)/2³², the [[weightedSampleKPerGroup]] trick)
    * instead of `rand(seed)`. Draws are then deterministic across
    * engines, retries AND partitionings — `rand(seed)` is only fixed
    * for a fixed partitioning — which makes the resample's output
    * DuckDB-replayable bit-for-bit (manifest q235): the oracle rebuilds
    * u and walks the identical inverse-CDF recurrence. Prefer this form
    * whenever rows carry a stable id; it is also the safer shape at
    * 100 TB (a lost executor's recomputed partition re-draws the SAME
    * copies, so speculative execution can't skew class balance).
    */
  def resampleToTargetDeterministic(df: DataFrame, classCol: String,
      target: Long, idCol: String): DataFrame =
    resampleImpl(df, classCol, target, d => d.withColumn("__u",
      (TextOps.hash32(col(idCol).cast("string"), seed = "rs:") + 0.5) /
        lit(4294967296.0)))

  private def resampleImpl(df: DataFrame, classCol: String, target: Long,
      withU: DataFrame => DataFrame): DataFrame = {
    val counts = df.groupBy(classCol).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val fracExpr = counts.foldLeft(lit(Double.NaN)) { case (acc, (cls, n)) =>
      when(col(classCol).cast("string") === cls, lit(target.toDouble / n))
        .otherwise(acc)
    }
    // The inverse-CDF walk below is unrolled `cap` steps, so it
    // truncates any draw above cap. Size cap from the LARGEST per-class
    // λ = target/count so the truncation error is provably negligible:
    // P[Poisson(λ) > λ + 10√λ + 10] < 1e-18 (Chernoff), i.e. under one
    // clipped row per 10^18. Tiny classes under heavy imbalance — the
    // primary resample-to-target use case — get the cap they need
    // instead of a silent bias toward fewer copies. Guard the unroll
    // size: past λ≈200 the expression tree itself becomes the problem;
    // use resamplePerClassScan (per-class Bernoulli/Poisson `sample`)
    // for such extremes.
    val maxLam = counts.values.foldLeft(0.0)((m, n) =>
      math.max(m, target.toDouble / n))
    require(maxLam <= 200.0,
      f"resampleToTarget: per-class λ=$maxLam%.1f too large for the " +
        "unrolled Poisson walk; use resamplePerClassScan for >200x " +
        "oversampling of a class")
    val cap = math.max(10, math.ceil(maxLam + 10 * math.sqrt(maxLam) + 10).toInt)
    // Poisson(λ) draw per row via the native inverse-CDF loop
    // (`functions.PoissonDraw`): N = #{k ≤ cap : U > CDF(k−1)}. The
    // former pure-Column unrolled fold embedded each step's term/cum
    // subtree (and the λ when-chain) into the next — a quadratically
    // large tree whose per-job analysis/codegen dominated the resample
    // at any data size. Draws are bit-identical (same op order).
    // The uniform MUST be materialized as its own column first:
    // inlining rand(seed) per consumer would create independent RNG
    // streams. Rand is nondeterministic, so CollapseProject keeps the
    // projection boundary and each row reads one shared u.
    graft.functions.GraftSparkExtensions.register(df.sparkSession)
    val uDf = withU(df)
    val copies = call_function("poisson_draw",
      col("__u"), fracExpr.cast("double"), lit(cap))
    uDf.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("__dup", explode(sequence(lit(1), col("__copies"))))
      .drop("__u", "__copies", "__dup")
  }

  /** R3 — seeded train/test split (`timely_LR.py:100` et al.). */
  def trainTestSplit(df: DataFrame, trainFraction: Double = 0.7,
                     seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) =
      df.randomSplit(Array(trainFraction, 1.0 - trainFraction), seed)
    (train, test)
  }

  /** Exactly-k-per-group random sample (training-data corpus capping:
    * "at most k documents per domain/source"). Seeded `rand` ranked by
    * a window → deterministic for a fixed input partitioning, exact
    * group sizes min(k, |group|) — unlike `sampleBy`, whose Bernoulli
    * fractions only hit k in expectation. One shuffle on the group key;
    * per-group state in the window sort is the group itself, so cap
    * skew with salting if a single group dominates.
    */
  def sampleKPerGroup(df: DataFrame, groupCol: String, k: Int,
                      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__r"), col("__r2"))
    df.withColumn("__r", rand(seed))
      .withColumn("__r2", rand(seed + 1)) // tiebreak: P[collision]≈0 twice
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__r", "__r2", "__rk")
  }

  /** Weighted k-per-group sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): item i is kept iff its key
    * ln(u_i)/w_i ranks in the group's top k, where u_i ∈ (0,1) — the
    * exact distribution of weighted sequential sampling, order- and
    * partitioning-independent. How a quality-weighted corpus subset is
    * drawn ("keep 100k docs per domain, ∝ quality score") without an
    * RNG whose draw order changes the result.
    *
    * u_i derives from the md5-based [[TextOps.hash32]] of the id —
    * deterministic across engines, retries, AND partitionings (unlike
    * `rand(seed)`, which is only fixed for a fixed partitioning — the
    * trade [[sampleKPerGroup]] accepts). Rows with weight <= 0 are
    * dropped (E-S requires positive weights).
    *
    * Scale shape: one shuffle on the group key, streaming row_number
    * frame. For huge groups swap the window for the k-bounded
    * [[graft.functions.TopKAgg]] on the same key (O(groups×k) shuffle).
    */
  def weightedSampleKPerGroup(df: DataFrame, groupCol: String,
                              idCol: String, weight: Column,
                              k: Int): DataFrame = {
    // (h + 0.5) / 2^32 ∈ (0,1): never 0 or 1, so ln is finite
    val u = (TextOps.hash32(col(idCol).cast("string"), seed = "ws:") + 0.5) /
      lit(4294967296.0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__es").desc, col(idCol))
    df.withColumn("__w", weight.cast("double"))
      .filter(col("__w") > 0)
      .withColumn("__es", log(u) / col("__w"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__w", "__es", "__rk")
  }
}
