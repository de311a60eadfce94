package graft.queries

import graft.Tables
import graft.ops.{CurationOps, QualityOps, StatOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 data-quality / corpus-statistics manifest (SURVEY.md §2.13
  * X52, X56-X61): the validation and distribution-analysis passes a
  * 100 TB pipeline runs before (gate, splits) and after (binning, ECDF,
  * correlation, PMI, Zipf) publishing a snapshot. Each oracle-checked
  * against DuckDB.
  */
object QualityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q125_dq_gate — declarative data contract (`QualityOps`): row-level
    * rules (one single-pass aggregation per table), PK uniqueness, and
    * FK orphan counts (left-anti joins), unioned into one report. The
    * publish gate in front of any snapshot.
    */
  def q125DqGate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    QualityOps.gate(Seq(
      QualityOps.ruleViolations(li, Seq(
        "li_discount_le_10pct" -> (col("l_discount") <= 0.1),
        "li_quantity_in_1_50" ->
          (col("l_quantity") >= 1 && col("l_quantity") <= 50),
        "li_tax_le_5pct" -> (col("l_tax") <= 0.05),
        "li_price_positive" -> (col("l_extendedprice") > 0))),
      QualityOps.ruleViolations(ord, Seq(
        "ord_totalprice_positive" -> (col("o_totalprice") > 0),
        "ord_orderdate_present" -> col("o_orderdate").isNotNull)),
      QualityOps.pkDuplicates(ord, "pk_orders_unique", Seq("o_orderkey")),
      QualityOps.fkOrphans(li, "l_orderkey",
        ord.select(col("o_orderkey").as("l_orderkey")), "l_orderkey",
        "fk_lineitem_orderkey"),
      QualityOps.fkOrphans(ord, "o_custkey",
        cust.select(col("c_custkey").as("o_custkey")), "o_custkey",
        "fk_orders_custkey")))
  }

  /** q126_equidepth_bins — quantile discretization
    * (`StatOps.equiDepthBins`): quartile fences per return flag from the
    * distributed-selection percentiles (bit-identical to quantile_cont
    * on any engine), rows binned by broadcast-join + first-match CASE.
    * QuantileDiscretizer's semantics, exact instead of sketched.
    */
  def q126EquidepthBins(s: SparkSession, dir: String): DataFrame =
    StatOps.equiDepthBins(
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .orderBy(col("l_returnflag"), col("bin"))

  /** q127_ecdf — exact empirical CDF of l_quantity (`StatOps.ecdf`):
    * distinct-value collapse first, THEN the running sum — the window
    * sees |distinct| rows, never the data. `cume_dist()` over raw rows
    * is the single-partition anti-pattern this replaces.
    */
  def q127Ecdf(s: SparkSession, dir: String): DataFrame =
    StatOps.ecdf(Tables.lineitem(s, dir).select(col("l_quantity")),
      "l_quantity")
      .orderBy(col("value"))

  /** q128_corr_matrix — per-group second-moment statistics in ONE hash
    * aggregation: Pearson correlations, sample covariance and stddevs of
    * the lineitem measures per return flag. All six moments merge
    * map-side; nothing but the |groups|-row result ever moves.
    */
  def q128CorrMatrix(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        // Pearson from moments with try_divide rather than the built-in
        // corr(): under ANSI, Spark's Corr aggregate THROWS
        // DIVIDE_BY_ZERO on a zero-variance group (DivisionAuditSpec's
        // degenerate corpus); the moment form nulls out instead
        round(try_divide(covar_samp(col("l_quantity"),
            col("l_extendedprice")),
          stddev_samp(col("l_quantity")) *
            stddev_samp(col("l_extendedprice"))), 4)
          .as("corr_qty_price"),
        round(try_divide(covar_samp(col("l_extendedprice"),
            col("l_discount")),
          stddev_samp(col("l_extendedprice")) *
            stddev_samp(col("l_discount"))), 4)
          .as("corr_price_disc"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
      .orderBy(col("l_returnflag"))

  /** q129_token_pmi — token co-occurrence PMI (`CurationOps.tokenPmi`):
    * document-level pointwise mutual information over the top-64-df
    * vocabulary. The pair fan-out is bounded by the broadcast vocabulary
    * cap BEFORE the self-join — the quadratic term can't explode.
    */
  def q129TokenPmi(s: SparkSession, dir: String): DataFrame =
    CurationOps.tokenPmi(
      Tables.parallelize(Tables.documents(s, dir)), "doc_id", "text",
      topK = 64)
      .orderBy(col("a_token"), col("b_token"))

  /** q130_zipf — Zipf's-law fit (`CurationOps.zipfFit`): least-squares
    * slope/intercept/R² of ln(count) vs ln(rank) over the token
    * frequency table. One data-scale counting pass; the regression runs
    * on |vocabulary| rows. The one-row corpus health check.
    */
  def q130Zipf(s: SparkSession, dir: String): DataFrame =
    CurationOps.zipfFit(Tables.parallelize(Tables.documents(s, dir)), "text")

  /** q131_split_report — deterministic train/val/test assignment: split =
    * portable hash32(doc_id) mod 10 → 80/10/10, reported per (lang,
    * split) with doc and token counts. Hash-based assignment is
    * reproducible across engines, retries, and partitionings — seeded
    * rand() is none of those (the reference's randomSplit,
    * `timely_LR.py:100`, re-rolls per recomputation).
    */
  def q131SplitReport(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket",
        pmod(graft.ops.TextOps.hash32(col("doc_id").cast("string"),
          seed = "split:"), lit(10L)))
      .withColumn("split",
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") === 8, lit("val")).otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.ops.TextOps.tokenCount(col("text"))).as("n_tokens"))
      .orderBy(col("lang"), col("split"))

  /** q196_benford — Benford first-digit conformance of order totals per
    * priority: the fraud/synthetic-data screen. First significant digit
    * comes from the INTEGER cent value's string form (identical across
    * engines, no log10 boundary noise); expected shares are hard-coded
    * 6-dp Benford literals summing to exactly 1, so the absent-digit
    * χ² identity Σ o²/(n·p) − n is exact. One two-level aggregation,
    * scale-free.
    */
  def q196Benford(s: SparkSession, dir: String): DataFrame = {
    val benfordP = expr(
      "CASE __d WHEN 1 THEN 0.30103D WHEN 2 THEN 0.176091D " +
        "WHEN 3 THEN 0.124939D WHEN 4 THEN 0.09691D WHEN 5 THEN 0.079181D " +
        "WHEN 6 THEN 0.066947D WHEN 7 THEN 0.057992D WHEN 8 THEN 0.051153D " +
        "WHEN 9 THEN 0.045757D END")
    Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("__d"))
      .groupBy(col("o_orderpriority"), col("__d"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__p", benfordP)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("__cnt")).as("n_orders"),
        (round(sum(col("__cnt") * col("__cnt") / col("__p")) /
          sum(col("__cnt")) - sum(col("__cnt")), 4) + lit(0.0)).as("chi2"),
        round(sum(when(col("__d") === 1, col("__cnt")).otherwise(lit(0L)))
          / sum(col("__cnt")), 4).as("freq_digit1"))
      .orderBy(col("o_orderpriority"))
  }

  /** q214_strat_split — EXACT-proportion stratified 70/20/10 split:
    * per-class row_number over a total deterministic order, integer
    * threshold arithmetic (rn·10 vs n·7 / n·9) — every class lands
    * within 1 row of its target fraction, reproducible with no RNG at
    * all. The contrast to q131's hash-based assignment (exact
    * proportions vs exact independence) and to `randomSplit`
    * (binomial jitter); the per-class window sort is the price, paid
    * once at split time. Output is the per-(class, split) census the
    * pipeline records next to the split.
    */
  def q214StratSplit(s: SparkSession, dir: String): DataFrame = {
    // ~5 priority strata over the whole orders table — the round-10
    // grouped single-task trap: per-stratum row_number comes from
    // StatOps.shardedRank and the stratum size from a broadcast
    // aggregate instead of a whole-partition count window
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"))
    val sizes = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("__n"))
    graft.ops.StatOps.shardedRank(
        o.withColumn("__ok", col("o_orderkey")),
        "o_orderpriority", "__ok", "o_orderkey", "__rn")
      .join(broadcast(sizes), Seq("o_orderpriority"))
      .withColumn("split",
        when(col("__rn") * 10 <= col("__n") * 7, "train")
          .when(col("__rn") * 10 <= col("__n") * 9, "val")
          .otherwise("test"))
      .groupBy(col("o_orderpriority"), col("split"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__rn")).as("first_rank"), max(col("__rn")).as("last_rank"))
      .orderBy(col("o_orderpriority"), col("split"))
  }

  val queries: Map[String, Q] = Map(
    "q214_strat_split" -> (q214StratSplit _),
    "q196_benford" -> (q196Benford _),
    "q125_dq_gate" -> (q125DqGate _),
    "q126_equidepth_bins" -> (q126EquidepthBins _),
    "q127_ecdf" -> (q127Ecdf _),
    "q128_corr_matrix" -> (q128CorrMatrix _),
    "q129_token_pmi" -> (q129TokenPmi _),
    "q130_zipf" -> (q130Zipf _),
    "q131_split_report" -> (q131SplitReport _),
  )

  import ExtensionQueries.{toksSql, tokSetSql}

  private def h32(expr: String, seed: String = ""): String =
    s"('0x' || substr(md5('$seed' || $expr), 1, 8))::BIGINT"

  val oracle: Map[String, String] = Map(
    "q214_strat_split" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |s AS (
        |  SELECT o_orderpriority, rn,
        |    CASE WHEN rn * 10 <= n * 7 THEN 'train'
        |      WHEN rn * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split
        |  FROM r)
        |SELECT o_orderpriority, split, count(*) AS n_rows,
        |  min(rn) AS first_rank, max(rn) AS last_rank
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q196_benford" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    substr(round(o_totalprice * 100)::BIGINT::VARCHAR, 1, 1)::INT
        |      AS d,
        |    count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT *, (CASE d WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091
        |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181
        |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |    WHEN 9 THEN 0.045757 END)::DOUBLE AS pd
        |  FROM c)
        |SELECT o_orderpriority, sum(cnt)::BIGINT AS n_orders,
        |  (round(sum(cnt * cnt / pd) / sum(cnt) - sum(cnt), 4) + 0.0) AS chi2,
        |  round(sum(CASE WHEN d = 1 THEN cnt ELSE 0 END)::DOUBLE /
        |    sum(cnt), 4) AS freq_digit1
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q125_dq_gate" ->
      """SELECT * FROM (
        |  SELECT 'li_discount_le_10pct' AS "check",
        |    count(*) FILTER (WHERE NOT coalesce(l_discount <= 0.1, false))
        |      AS violations FROM lineitem
        |  UNION ALL
        |  SELECT 'li_quantity_in_1_50',
        |    count(*) FILTER (WHERE NOT coalesce(
        |      l_quantity >= 1 AND l_quantity <= 50, false)) FROM lineitem
        |  UNION ALL
        |  SELECT 'li_tax_le_5pct',
        |    count(*) FILTER (WHERE NOT coalesce(l_tax <= 0.05, false))
        |    FROM lineitem
        |  UNION ALL
        |  SELECT 'li_price_positive',
        |    count(*) FILTER (WHERE NOT coalesce(l_extendedprice > 0, false))
        |    FROM lineitem
        |  UNION ALL
        |  SELECT 'ord_totalprice_positive',
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, false))
        |    FROM orders
        |  UNION ALL
        |  SELECT 'ord_orderdate_present',
        |    count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
        |  UNION ALL
        |  SELECT 'pk_orders_unique',
        |    count(*) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'fk_lineitem_orderkey', count(*) FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'fk_orders_custkey', count(*) FROM orders
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |) ORDER BY "check"""".stripMargin,
    "q126_equidepth_bins" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS x
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |f AS (SELECT g, quantile_cont(x, 0.25) AS f0,
        |    quantile_cont(x, 0.5) AS f1, quantile_cont(x, 0.75) AS f2
        |  FROM v GROUP BY g),
        |b AS (SELECT v.g, v.x,
        |    CASE WHEN v.x <= f.f0 THEN 1 WHEN v.x <= f.f1 THEN 2
        |         WHEN v.x <= f.f2 THEN 3 ELSE 4 END AS bin
        |  FROM v JOIN f USING (g))
        |SELECT g AS l_returnflag, bin, count(*) AS n,
        |  round(min(x), 4) AS lo, round(max(x), 4) AS hi
        |FROM b GROUP BY g, bin ORDER BY g, bin""".stripMargin,
    "q127_ecdf" ->
      """WITH c AS (SELECT l_quantity::DOUBLE AS value, count(*) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1)
        |SELECT value, n,
        |  (round(sum(n) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |    / (SELECT sum(n) FROM c), 6) + 0.0) AS ecdf
        |FROM c ORDER BY value""".stripMargin,
    "q128_corr_matrix" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
        |  round(covar_samp(l_quantity, l_extendedprice), 4)
        |    AS covar_qty_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q129_token_pmi" ->
      s"""WITH tok AS (SELECT doc_id AS id, unnest($tokSetSql) AS token
        |  FROM documents),
        |dfc AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
        |top AS (SELECT token FROM dfc ORDER BY df DESC, token LIMIT 64),
        |cap AS (SELECT id, token FROM tok SEMI JOIN top USING (token)),
        |nd AS (SELECT count(*)::DOUBLE AS n FROM documents)
        |SELECT a.token AS a_token, b.token AS b_token, count(*) AS n_ab,
        |  round(ln(count(*) * any_value(nd.n) /
        |    (any_value(da.df) * any_value(db.df))), 4) AS pmi
        |FROM cap a JOIN cap b ON a.id = b.id AND a.token < b.token
        |JOIN dfc da ON da.token = a.token
        |JOIN dfc db ON db.token = b.token, nd
        |GROUP BY a.token, b.token ORDER BY a_token, b_token""".stripMargin,
    "q130_zipf" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
        |c AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |xy AS (SELECT ln(row_number() OVER (ORDER BY c DESC, token)::DOUBLE)
        |    AS x, ln(c::DOUBLE) AS y FROM c),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM xy)
        |SELECT n::BIGINT AS n_tokens,
        |  (round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) + 0.0) AS slope,
        |  (round((sy - sx * ((n*sxy - sx*sy) / (n*sxx - sx*sx))) / n, 4) + 0.0)
        |    AS intercept,
        |  (round(pow(n*sxy - sx*sy, 2) /
        |    ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) + 0.0) AS r2
        |FROM s""".stripMargin,
    "q131_split_report" ->
      s"""WITH d AS (SELECT lang,
        |    ${h32("doc_id::VARCHAR", "split:")} % 10 AS bucket,
        |    len($toksSql) AS n_toks
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens
        |FROM d GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
  )
}
