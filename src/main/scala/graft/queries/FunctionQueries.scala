package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function / analytic-window / join-shape coverage beyond the
  * reference's direct usage (SURVEY.md §2.3 note: the engine exposes the
  * full functions surface; §2.5 J2; §2.8 O3). Each query is
  * oracle-checked against DuckDB on the same parquet.
  */
object FunctionQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q32_window_analytics — lag/lead/rank/dense_rank + running frame sum
    * over a per-customer ordered window. One shuffle on o_custkey; all
    * five functions share the same window sort.
    */
  def q32WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        (round(sum(col("o_totalprice")).over(wf), 2) + lit(0.0)).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q33_string_funcs — string scalar surface: concat/substring/upper/
    * lower/lpad/replace/position/like/regexp_extract. All codegen'd.
    */
  def q33StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 2000)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first_word"),
        col("p_name").like("%green%").as("is_green"),
        instr(col("p_type"), "BRASS").cast("long").as("brass_pos"))
      .orderBy(col("p_partkey"))

  /** q34_math_funcs — math scalar surface over lineitem prices. */
  def q34MathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** q35_date_funcs — date/time scalar surface over orders. */
  def q35DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 3000)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
        datediff(lit("1998-12-31").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_eoy"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        last_day(col("o_orderdate")).as("month_end"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .orderBy(col("o_orderkey"))

  /** q36_array_agg — collect_list into a sorted array per group +
    * array scalar ops. Sorting inside the aggregate (array_sort after
    * collect) makes the result deterministic — collect order is not.
    * The array itself ships as a joined string: the driver's comparator
    * sorts rows with pandas, which cannot order/hash raw array cells.
    */
  def q36ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 200)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_linenumber"))).as("arr"))
      .select(col("l_orderkey"),
        array_join(transform(col("arr"), _.cast("string")), ",").as("linenums"),
        size(col("arr")).as("n_lines"),
        element_at(col("arr"), 1).as("first_line"),
        array_contains(col("arr"), 3).as("has_line3"))
      .orderBy(col("l_orderkey"))

  /** q37_from_json — full-schema JSON parse (one parse, many fields) vs
    * q18's per-path get_json_object; the scale-correct form when
    * extracting multiple fields.
    */
  def q37FromJson(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))
    Tables.events(s, dir)
      .withColumn("p", from_json(col("props"), schema))
      .groupBy(col("p.k").as("k"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("k"))
  }

  /** q38_outer_joins — full-outer join preserving both unmatched sides
    * (supplier vs distinct lineitem suppliers with stats).
    */
  def q38OuterJoins(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_items"))
      .filter(col("l_suppkey") % 3 === 0)
    Tables.supplier(s, dir)
      .filter(col("s_suppkey") % 2 === 0)
      .join(li, col("s_suppkey") === col("l_suppkey"), "full_outer")
      .select(col("s_suppkey"), col("s_name"), col("l_suppkey"), col("n_items"))
      .orderBy(col("s_suppkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)
  }

  /** q39_scalar_subquery — orders above the global average price
    * (uncorrelated scalar subquery → broadcast of one value).
    */
  def q39ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgPrice = o.agg(avg(col("o_totalprice")).as("a"))
    o.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("a") * 1.5)
      .select(col("o_orderkey"),
        (round(col("o_totalprice") - col("a"), 2) + lit(0.0)).as("above_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** q40_percentiles — exact percentiles + count_distinct per group.
    * Exact (not approx) so DuckDB's quantile_cont matches bit-for-bit.
    * Percentiles run sort-based (graft.ops.StatOps.exactPercentiles)
    * rather than through the built-in `percentile` aggregate, whose
    * per-group value→count hashmaps GC-collapse as groups grow; the
    * distinct count is its own two-phase branch joined on the (tiny)
    * group key.
    */
  def q40Percentiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // pct's window shuffle redistributes on its own; only the distinct
    // count's map-side partial needs the explicit repartition
    val pct = graft.ops.StatOps.exactPercentiles(
      li.select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice",
      Seq("p50" -> 0.5, "p95" -> 0.95))
    // no Tables.parallelize here: the map-side (flag, partkey) partial
    // dedup shrinks 600 k rows to ~60 k distinct pairs ON the scan task
    // before any exchange — cheaper than round-robin-shuffling the full
    // rows to parallelize a hash insert that is memory-bandwidth-bound
    // anyway
    val nd = li.select(col("l_returnflag"), col("l_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("n_parts"))
    pct.join(nd, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        round(col("p50"), 2).as("p50"),
        round(col("p95"), 2).as("p95"),
        col("n_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** q193_weighted_median — quantity-weighted median extended price per
    * return flag (`StatOps.weightedMedian`): each row counts with its
    * shipped-quantity mass, the estimator a price index actually wants.
    * Pre-aggregation by (group, value) makes the cumulative-weight
    * window tie-order-free and shrinks its input to distinct values;
    * q40's per-row percentile family is the unweighted special case.
    */
  def q193WeightedMedian(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.weightedMedian(Tables.lineitem(s, dir),
      "l_returnflag", "l_extendedprice", "l_quantity")
      .orderBy(col("l_returnflag"))

  /** q41_intersect — INTERSECT set op (SURVEY §2.6 U2): custkeys present
    * in both high- and low-price order populations.
    */
  def q41Intersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      .intersect(o.filter(col("o_totalprice") < 100000).select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** q42_cross_join — small×small cartesian (region × order status
    * histogram) — the only safe cross-join shape at scale.
    */
  def q42CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val statuses = Tables.orders(s, dir).select(col("o_orderstatus")).distinct()
    Tables.region(s, dir).crossJoin(statuses)
      .select(col("r_name"), col("o_orderstatus"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** q43_na_drop — na.drop subset semantics (SURVEY §2.2 P11) on the
    * full-outer join result of q38 (which manufactures nulls).
    */
  def q43NaDrop(s: SparkSession, dir: String): DataFrame =
    q38OuterJoins(s, dir).na.drop(Seq("s_suppkey", "n_items"))
      .orderBy(col("s_suppkey"))

  /** q185_optimized_intersect — the optimizer-extension demo
    * (`graft.plans.IntersectCountRewrite` via `injectOptimizerRule`):
    * the query is WRITTEN as the naive
    * `size(array_intersect(sort_array(array_distinct(a)), ...))` —
    * per-pair hash set + materialized intersection — and the injected
    * rule compiles it to the native zero-allocation
    * `sorted_intersect_count` merge (the pattern itself proves the
    * sorted/distinct/int contract). PlanQualitySpec asserts the
    * rewrite fired; the DuckDB oracle replays the naive form, proving
    * it semantics-preserving. Day-set overlap between users is the
    * co-activity matrix shape.
    */
  def q185OptimizedIntersect(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("int").as("d"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("d")).as("ds"))
    val a = days.select(col("user_id").as("user_a"), col("ds").as("da"))
    val b = days.select(col("user_id").as("user_b"), col("ds").as("db"))
    a.join(b, col("user_a") < col("user_b"))
      .select(col("user_a"), col("user_b"),
        size(array_intersect(
          sort_array(array_distinct(col("da"))),
          sort_array(array_distinct(col("db"))))).cast("long")
          .as("shared_days"))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** q374_map_functions — the MapType higher-order surface as a
    * round trip: per-user event-type counts are packed into a real
    * map column (`map_from_entries` over the SORTED entry list, so
    * map order is canonical), pruned with `map_filter` (≥ 3 events),
    * value-transformed with `transform_values` (log-count), sanity-
    * gated with `map_contains_key`/`cardinality`, and then EXPLODED
    * back to rows — so the map algebra's net effect is certified by a
    * plain relational oracle (group → filter → ln), while the plan
    * exercises build/filter/transform/explode of MapData end to end.
    * Maps are the natural carrier for sparse per-entity feature
    * bundles at scale (schema stays fixed as the key domain grows);
    * this is the operator that proves the engine's map kernels agree
    * with relational semantics. Users capped to id < 200 to bound the
    * dump.
    */
  def q374MapFunctions(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .filter(col("user_id") < 200)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("event_type"), col("__c")))))
        .as("__m"))
      .withColumn("__f", map_filter(col("__m"), (_, v) => v >= 3))
      .withColumn("__t", transform_values(col("__f"),
        (_, v) => round(log(v.cast("double")), 4)))
      .filter(size(col("__t")) > 0)
      .select(col("user_id"), size(col("__m")).as("n_types"),
        size(col("__t")).as("n_frequent"),
        explode(col("__t")).as(Seq("event_type", "log_count")))
      .orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q374_map_functions" -> (q374MapFunctions _),
    "q185_optimized_intersect" -> (q185OptimizedIntersect _),
    "q32_window_analytics" -> (q32WindowAnalytics _),
    "q33_string_funcs" -> (q33StringFuncs _),
    "q34_math_funcs" -> (q34MathFuncs _),
    "q35_date_funcs" -> (q35DateFuncs _),
    "q36_array_agg" -> (q36ArrayAgg _),
    "q37_from_json" -> (q37FromJson _),
    "q38_outer_joins" -> (q38OuterJoins _),
    "q39_scalar_subquery" -> (q39ScalarSubquery _),
    "q40_percentiles" -> (q40Percentiles _),
    "q193_weighted_median" -> (q193WeightedMedian _),
    "q41_intersect" -> (q41Intersect _),
    "q42_cross_join" -> (q42CrossJoin _),
    "q43_na_drop" -> (q43NaDrop _),
  )

  val oracle: Map[String, String] = Map(
    "q374_map_functions" ->
      """WITH c AS (SELECT user_id, event_type,
        |    count(*)::BIGINT AS n FROM events
        |  WHERE user_id < 200 GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*)::INT AS n_types,
        |    count(CASE WHEN n >= 3 THEN 1 END)::INT AS n_frequent
        |  FROM c GROUP BY 1)
        |SELECT c.user_id, u.n_types, u.n_frequent, c.event_type,
        |  round(ln(c.n::DOUBLE), 4) AS log_count
        |FROM c JOIN u USING (user_id)
        |WHERE c.n >= 3 AND u.n_frequent > 0
        |ORDER BY c.user_id, c.event_type""".stripMargin,
    "q185_optimized_intersect" ->
      """WITH d AS (SELECT user_id,
        |    list_sort(list_distinct(
        |      list(date_diff('day', DATE '2024-01-01', ts::DATE)))) AS ds
        |  FROM events WHERE user_id < 40 GROUP BY user_id)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  len(list_intersect(a.ds, b.ds)) AS shared_days
        |FROM d a JOIN d b ON a.user_id < b.user_id
        |ORDER BY user_a, user_b""".stripMargin,
    "q32_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  (round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0.0) AS running_total
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q33_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  lpad(p_partkey::VARCHAR, 10, '0') AS key_padded,
        |  coalesce(regexp_extract(p_type, '^(\w+)', 1), '') AS type_first_word,
        |  p_name LIKE '%green%' AS is_green,
        |  CAST(coalesce(position('BRASS' IN p_type), 0) AS BIGINT) AS brass_pos
        |FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""".stripMargin,
    "q34_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(abs(l_discount - 0.05), 4) AS disc_dev,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |  round(pow(l_quantity, 2), 2) AS qty_sq,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  l_orderkey % 7 AS key_mod7
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q35_date_funcs" ->
      """SELECT o_orderkey,
        |  o_orderdate::DATE AS d,
        |  o_orderdate::DATE + INTERVAL 30 DAY AS d_plus30,
        |  CAST(date_diff('day', o_orderdate::DATE, DATE '1998-12-31') AS INT) AS days_to_eoy,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  last_day(o_orderdate::DATE) AS month_end,
        |  date_trunc('month', o_orderdate)::DATE AS month_start
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin,
    "q36_array_agg" ->
      """SELECT l_orderkey, array_to_string(arr, ',') AS linenums,
        |  CAST(len(arr) AS INT) AS n_lines,
        |  arr[1] AS first_line,
        |  list_contains(arr, 3) AS has_line3
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr
        |      FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
        |ORDER BY l_orderkey""".stripMargin,
    "q37_from_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n, round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q38_outer_joins" ->
      """SELECT s_suppkey, s_name, l_suppkey, n_items
        |FROM (SELECT * FROM supplier WHERE s_suppkey % 2 = 0) s
        |FULL OUTER JOIN (
        |  SELECT l_suppkey, count(*) AS n_items FROM lineitem
        |  GROUP BY l_suppkey HAVING l_suppkey % 3 = 0) li
        |ON s.s_suppkey = li.l_suppkey
        |ORDER BY s_suppkey NULLS FIRST, l_suppkey NULLS FIRST""".stripMargin,
    "q39_scalar_subquery" ->
      """SELECT o_orderkey,
        |  (round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) + 0.0) AS above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,
    "q40_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q41_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 100000
        |ORDER BY o_custkey""".stripMargin,
    "q42_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q43_na_drop" ->
      """SELECT s_suppkey, s_name, l_suppkey, n_items
        |FROM (SELECT * FROM supplier WHERE s_suppkey % 2 = 0) s
        |JOIN (SELECT l_suppkey, count(*) AS n_items FROM lineitem
        |      GROUP BY l_suppkey HAVING l_suppkey % 3 = 0) li
        |ON s.s_suppkey = li.l_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "q193_weighted_median" ->
      """WITH pv AS (
        |  SELECT l_returnflag, l_extendedprice::DOUBLE AS value,
        |    sum(l_quantity::DOUBLE) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, value,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM pv)
        |SELECT l_returnflag, min(value) AS weighted_median,
        |  round(max(tw), 2) AS total_weight
        |FROM c WHERE cw >= tw / 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
