package graft.queries

import graft.Tables
import graft.ops.{CleanOps, FrequencyEncoder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator coverage (SURVEY.md §2.2-2.8) as named queries over
  * the driver testdata, each with a DuckDB oracle (see `oracle`).
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - results carry a deterministic ORDER BY on a unique key;
  *  - double aggregates are wrapped in `round(_, 2)` in BOTH engines so
  *    summation-order jitter cannot flip the hash.
  *
  * Scale notes are per-query in the Scaladoc.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q1_agg — TPC-H Q1-shaped hash aggregation over lineitem (SURVEY §2.4
    * A1-A3). Partial map-side aggregation then one shuffle of (flag,status)
    * keys: 6 groups regardless of input size, so this scales linearly.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        (round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2) + lit(0.0)).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2_filter_project — scan-time predicate + projection + casts + date
    * parts (SURVEY §2.2 P2/P10/P12, §2.3 F2). The filter and the 3-column
    * read schema are pushed into the parquet scan.
    */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 150000.0)
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"))
      .orderBy(col("o_orderkey"))

  /** q3_when_fill — when/otherwise blank-fill (reference `init.py:32-33`)
    * + null-safe trim filters (SURVEY §2.2 P6/P7/P9, §2.3 F1/F3).
    */
  def q3WhenFill(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(CleanOps.notNullNotBlank(col("c_name")))
      .select(
        col("c_custkey"),
        CleanOps.blankFill(col("c_mktsegment")).as("segment"),
        when(col("c_acctbal") < 0, lit("delinquent"))
          .otherwise(lit("ok")).as("standing"))
      .orderBy(col("c_custkey"))

  /** q4_freq_encode — the flagship frequency-encoding chain (SURVEY §2.4
    * A1 + §2.5 J1): groupBy-count then broadcast left join back on the
    * fact. This is the reference's core feature-engineering operator
    * (`random_forest_final_class_8.py:77-86`).
    */
  def q4FreqEncode(s: SparkSession, dir: String): DataFrame =
    FrequencyEncoder.encode(Tables.orders(s, dir), "o_custkey", "frequency_cust")
      .select(col("o_orderkey"), col("o_custkey"), col("frequency_cust"))
      .orderBy(col("o_orderkey"))

  /** q5_join_multi — 3-way dimension join customer⋈nation⋈region + agg
    * (SURVEY §2.5). nation (25 rows) and region (5 rows) broadcast; the
    * only shuffle is the final tiny groupBy.
    */
  def q5JoinMulti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))

  /** q6_union — positional union of disjoint filtered subsets (SURVEY
    * §2.6 U1; reference class-balancing union
    * `random_forest_final_class_8.py:183-191`). `unionByName` guards
    * against silent column-order bugs.
    */
  def q6Union(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val hi = o.filter(col("o_totalprice") > 250000.0)
      .select(col("o_orderkey"), lit("high").as("bucket"))
    val lo = o.filter(col("o_totalprice") < 50000.0)
      .select(col("o_orderkey"), lit("low").as("bucket"))
    hi.unionByName(lo).orderBy(col("o_orderkey"))
  }

  /** q7_distinct — distinct projection (SURVEY §2.4 A4): partial-agg then
    * shuffle of distinct pairs only.
    */
  def q7Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q8_topk — global top-k = orderBy desc + limit (SURVEY §2.8 O2).
    * Spark plans this as TakeOrderedAndProject: each partition keeps a
    * k-sized heap, no global sort shuffle — the scalable form of top-k.
    */
  def q8TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** q9_window_rownum — keep-first dedup via row_number window (SURVEY
    * §2.8 O3, §2.13 X1): first line of each order. One shuffle on the
    * partition key; at scale, skew on a hot key is handled by AQE.
    */
  def q9WindowRownum(s: SparkSession, dir: String): DataFrame = {
    // l_linenumber is NOT unique per order in the synthetic data — the
    // window ordering must be total over the projected columns or the
    // keep-first pick is engine-dependent.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"))
  }

  /** q10_semi_join — EXISTS as left-semi (SURVEY §2.5 J2): customers with
    * at least one high-value order. Semi-join never duplicates left rows
    * and only ships the join key of the right side.
    */
  def q10SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** q11_anti_join — NOT EXISTS as left-anti: customers with no
    * high-value order. (The synthetic data gives every customer at
    * least one order, so the unfiltered variant is vacuously empty —
    * the >300k restriction keeps the result non-trivial at every SF.)
    */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** q12_rollup — hierarchical subtotals via ROLLUP (SURVEY §2.4 A4). */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q13_conditional_pivot — confusion-matrix-shaped conditional
    * aggregation (SURVEY §2.12 M16: DataFrame-native pivot alternative to
    * RDD MulticlassMetrics). Written as explicit sum(when) cells so the
    * oracle SQL is engine-portable.
    */
  def q13ConditionalPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        count(when(col("o_orderpriority") === "2-HIGH", 1)).as("n_high"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("n_other"))
      .orderBy(col("o_orderstatus"))

  /** q14_group_topk — per-group top-k via ranked window (SURVEY §2.8 O3):
    * 3 most expensive parts per brand.
    */
  def q14GroupTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** q15_stats — statistical aggregates (min/max/avg/stddev) per group. */
  def q15Stats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"))
      .orderBy(col("l_returnflag"))

  /** q16_except — set difference (SURVEY §2.6 U2): customers with
    * finished (F) orders but no open (O) orders. (The original
    * orders-minus-customers referential check is vacuously empty on the
    * synthetic data; this variant stays non-empty at every SF.) Both
    * sides are distinct so EXCEPT ALL ≡ EXCEPT; ExceptAll is kept to
    * exercise the multiset physical operator.
    */
  def q16Except(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
      .exceptAll(o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey")).distinct())
      .orderBy(col("custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_when_fill" -> (q3WhenFill _),
    "q4_freq_encode" -> (q4FreqEncode _),
    "q5_join_multi" -> (q5JoinMulti _),
    "q6_union" -> (q6Union _),
    "q7_distinct" -> (q7Distinct _),
    "q8_topk" -> (q8TopK _),
    "q9_window_rownum" -> (q9WindowRownum _),
    "q10_semi_join" -> (q10SemiJoin _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_rollup" -> (q12Rollup _),
    "q13_conditional_pivot" -> (q13ConditionalPivot _),
    "q14_group_topk" -> (q14GroupTopK _),
    "q15_stats" -> (q15Stats _),
    "q16_except" -> (q16Except _),
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  (round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  CAST(day(o_orderdate) AS INT) AS o_day
        |FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q3_when_fill" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment = '' THEN 'Not Available' ELSE c_mktsegment END AS segment,
        |  CASE WHEN c_acctbal < 0 THEN 'delinquent' ELSE 'ok' END AS standing
        |FROM customer
        |WHERE NOT (c_name IS NULL OR trim(c_name) = '')
        |ORDER BY c_custkey""".stripMargin,
    "q4_freq_encode" ->
      """SELECT o_orderkey, o_custkey, frequency_cust
        |FROM orders
        |LEFT JOIN (SELECT o_custkey AS k, count(*) AS frequency_cust
        |           FROM orders GROUP BY o_custkey) f
        |  ON orders.o_custkey = f.k
        |ORDER BY o_orderkey""".stripMargin,
    "q5_join_multi" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q6_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 250000.0
        |  UNION ALL
        |  SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 50000.0
        |) ORDER BY o_orderkey""".stripMargin,
    "q7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q8_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q9_window_rownum" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
        |  FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q10_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q12_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q13_conditional_pivot" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS n_other
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q14_group_topk" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part)
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q15_stats" ->
      """SELECT l_returnflag,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q16_except" ->
      """SELECT custkey FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY custkey""".stripMargin,
  )
}
