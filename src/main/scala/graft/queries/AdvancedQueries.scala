package graft.queries

import graft.Tables
import graft.functions.GeometricMean
import graft.ops.{DedupOps, GraphOps, RangeJoinOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Second wave of operator coverage: explode/unnest, true pivot, CUBE +
  * grouping_id, string-distance + crypto hashes, MapType columns,
  * binned range join, sequence/date series, typed Aggregator UDAF,
  * HLL approximate distinct. Same oracle conventions as
  * `RelationalQueries`.
  */
object AdvancedQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q49_explode_wordcount — UNNEST/explode generator (SURVEY §2.11 D4)
    * + corpus word frequency, top-50. Explode multiplies rows ~180× here;
    * partial aggregation collapses them map-side before the one shuffle
    * of (word, count) pairs, and top-k is TakeOrderedAndProject — no
    * global sort. The canonical first half of any word-count /
    * vocabulary-build pipeline at 100 TB.
    */
  def q49ExplodeWordcount(s: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables.documents(s, dir))
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)

  /** q50_pivot — real relational PIVOT (`df.groupBy().pivot(col,
    * values)`): one shuffle, cells filled by the pivot aggregate.
    * Explicit value list keeps the plan static (no extra distinct-scan
    * job to discover values — at 100 TB that discovery pass is a full
    * extra scan, so production pivots should always pin values).
    * Columns renamed to identifier-safe names for parquet/oracle parity.
    */
  def q50Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0)
      .toDF("o_orderstatus", "p_urgent", "p_high", "p_medium",
        "p_not_spec", "p_low")
      .orderBy(col("o_orderstatus"))

  /** q51_cube — CUBE over two dimensions + grouping_id (SURVEY §2.4 A4):
    * all 2^2 grouping sets in one pass. Spark expands the cube in the
    * Expand operator — each input row fans out to 4 grouping-set rows
    * BEFORE the shuffle, so at scale prefer partial aggregation pushdown
    * (enabled by default) and low-cardinality dimensions.
    */
  def q51Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q52_text_sim — edit distance (levenshtein) + SHA-256 content hash
    * per row: the string-similarity and content-addressing scalar
    * surface (both codegen'd built-ins, no UDF).
    */
  def q52TextSim(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("lev_dist"),
        sha2(col("p_name"), 256).as("name_sha"))
      .orderBy(col("p_partkey"))

  /** q53_map_funcs — MapType column surface (SURVEY §1.2): construct,
    * concat, size, key/value access. Maps stay columnar in Tungsten;
    * element_at is O(entries) so wide maps belong exploded, not probed.
    */
  def q53MapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("m", map_concat(
        map(lit("status"), col("o_orderstatus")),
        map(lit("priority"), col("o_orderpriority"))))
      .select(col("o_orderkey"),
        element_at(col("m"), "priority").as("prio"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys_csv"))
      .orderBy(col("o_orderkey"))

  /** q54_range_join — point-in-interval join against a non-uniform
    * price-band table via `RangeJoinOps.binnedRangeJoin` (bin +
    * equi-join + residual filter; no BroadcastNestedLoopJoin, no
    * cross-product blowup — see RangeJoinOps scaladoc).
    */
  def q54RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("micro", 0.0, 50000.0),
      ("small", 50000.0, 100000.0),
      ("mid", 100000.0, 200000.0),
      ("large", 200000.0, 400000.0),
      ("huge", 400000.0, 600000.0)).toDF("band", "lo", "hi")
    RangeJoinOps.binnedRangeJoin(
      Tables.orders(s, dir), "o_totalprice", bands, "lo", "hi", 50000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("band"))
  }

  /** q55_month_series — sequence() + explode as a table generator
    * (date scaffold), left-joined against per-month order counts so
    * empty months surface as 0 — the standard gap-free time-series
    * shape. The scaffold is 80 rows; the aggregate side is shuffled by
    * month (≤80 keys), then a broadcast join.
    */
  def q55MonthSeries(s: SparkSession, dir: String): DataFrame = {
    val months = s.range(1).select(explode(expr(
      "sequence(timestamp'1995-01-01 00:00:00', timestamp'2001-08-01 00:00:00', interval 1 month)"))
      .as("month_start"))
    val counts = Tables.orders(s, dir)
      .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month_start"))
      .agg(count(lit(1)).as("n_orders"))
    months.join(counts, Seq("month_start"), "left")
      .select(col("month_start"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("month_start"))
  }

  /** q56_geomean — custom typed Aggregator UDAF (SURVEY §2.11 D3):
    * per-group geometric mean of extended price. Two-phase (partial +
    * final) like any built-in aggregate; see
    * `graft.functions.GeometricMean`.
    */
  def q56Geomean(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(GeometricMean.geometricMean(col("l_extendedprice")), 2)
        .as("geo_price"))
      .orderBy(col("l_returnflag"))

  /** q216_cooccur_lift — order-free event-type co-occurrence lift per
    * user: lift(a,b) = P(a∧b)/(P(a)·P(b)) = n_both·n_users/(n_a·n_b)
    * over the user×type membership set. The market-basket association
    * screen (which behaviors travel together), distinct from q122's
    * SEQUENTIAL transition bigrams. Raw events collapse to the
    * distinct user×type frame first (≤ users·|types| rows), so the
    * self-join on user_id fans out at most C(|types|,2) pairs per user
    * — bounded by the type-domain size, independent of event volume.
    */
  def q216CooccurLift(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("__n"))
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    val marg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_u"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("n_u").as("__na"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("n_u").as("__nb"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      // double the factors BEFORE multiplying: n_both·n and n_a·n_b
      // overflow Long past ~3e9 users (the cohenKappa fix, same class)
      .select(col("type_a"), col("type_b"), col("n_both"),
        (round((col("n_both").cast("double") * col("__n").cast("double")) /
          (col("__na").cast("double") * col("__nb").cast("double")), 4) + lit(0.0))
          .as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q221_skyline — Pareto frontier of (extended price, quantity) over
    * lineitem (`StatOps.skyline2d`): the line items not dominated on
    * both dimensions — best-tradeoff mining. Bucket prefilter drops
    * dominated points map-side via a broadcast fence; only frontier
    * candidates reach the exact scan. Oracle replays the sort-scan
    * identity in SQL; brute-force dominance equivalence is
    * spec-asserted.
    */
  def q221Skyline(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.skyline2d(Tables.lineitem(s, dir),
      "l_extendedprice", "l_quantity", bucketWidth = 5000.0)
      .select(round(col("x"), 2).as("price"), col("y").as("qty"))
      .orderBy(col("price"))

  /** q222_session_window — the BUILT-IN `session_window` grouping API
    * (30-min gap), the declarative sibling of q19's lag/cumsum
    * sessionization and q174's stateful streaming form: Spark merges
    * events whose windows overlap (exactly-gap-apart events merge;
    * strictly greater breaks — probed, matches q19's semantics).
    * Per-session census hash-checks against the gap-island oracle.
    */
  def q222SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** q212_hll_overlap — audience-overlap estimation from mergeable
    * Apache DataSketches HLL sketches (`hll_sketch_agg`/`hll_union`):
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) by inclusion-exclusion, the
    * only way to intersect cohorts whose membership lists are too big
    * to shuffle — each cohort collapses to a ~kB sketch that unions
    * losslessly across partitions/days. Cohorts: urgent vs low-priority
    * customers. The manifest hashes the EXACT counts (one two-level
    * aggregation) plus a ±5 %-tolerance flag on the sketch estimate
    * (q200 pattern; HLL is order-independent, so the flag is
    * deterministic); the oracle replays the exact side.
    */
  def q212HllOverlap(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val inA = col("o_orderpriority") === "1-URGENT"
    val inB = col("o_orderpriority") === "5-LOW"
    val exact = o.groupBy(col("o_custkey"))
      .agg(max(when(inA, 1).otherwise(0)).as("__a"),
        max(when(inB, 1).otherwise(0)).as("__b"))
      .agg(sum(col("__a")).as("n_a_exact"),
        sum(col("__b")).as("n_b_exact"),
        sum(col("__a") * col("__b")).as("n_inter_exact"))
    val sketches = o.agg(
      hll_sketch_agg(when(inA, col("o_custkey"))).as("__ska"),
      hll_sketch_agg(when(inB, col("o_custkey"))).as("__skb"))
    val est = sketches.select(
      hll_sketch_estimate(col("__ska")).as("__ea"),
      hll_sketch_estimate(col("__skb")).as("__eb"),
      hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
        .as("__eu"))
    // tolerance is 5% of the UNION, not the intersection: the
    // inclusion-exclusion error combines three sketches whose rse
    // scales with COHORT cardinality, so an intersection-relative
    // bound would flap whenever the overlap is small relative to the
    // cohorts even though the sketches are within spec
    exact.crossJoin(est)
      .select(col("n_a_exact"), col("n_b_exact"), col("n_inter_exact"),
        (abs(col("__ea") + col("__eb") - col("__eu") -
          col("n_inter_exact")) <=
          greatest(col("n_a_exact") + col("n_b_exact") -
            col("n_inter_exact"), lit(1L)) * 0.05)
          .as("est_ok"))
  }

  /** q57_approx_distinct — HyperLogLog++ approximate distinct counts
    * validated against the exact ones. Raw sketch estimates differ
    * across engines, so the manifest hashes the exact count plus a
    * ±5 %-tolerance flag (the q200 pattern): the DuckDB oracle replays
    * the exact side and asserts `est_ok` literally true, turning the
    * former rows-only check into a full hash check of the accuracy
    * invariant. Deterministic: HLL++ is order-independent. At 100 TB
    * approx_count_distinct is THE way to count uniques: fixed ~kB
    * sketch per group vs an unbounded distinct-shuffle.
    */
  def q57ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      // rsd=0.02 against the 5% flag: a 2.5-sigma margin at a quarter
      // of rsd=0.01's sketch cost. The default rsd=0.05 would make
      // the hashed flag a 1-sigma coin flip on fresh data.
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("__approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("__approx") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("est_ok"))
      .orderBy(col("l_returnflag"))

  /** q58_group_topk_agg — q14's per-brand top-3 restated on the
    * k-bounded `TopKAgg` aggregate (SURVEY §7.3): map-side partial
    * buffers cap the shuffle at O(groups × k) rows instead of shuffling
    * and sorting every row under the window. Same oracle as q14.
    */
  def q58GroupTopKAgg(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(graft.functions.TopKAgg.topK(3)(
        col("p_retailprice"), col("p_partkey")).as("tk"))
      .select(col("p_brand"),
        posexplode(arrays_zip(col("tk.vs"), col("tk.ks"))))
      .select(col("p_brand"), (col("pos") + 1).cast("int").as("rk"),
        col("col.ks").as("p_partkey"), col("col.vs").as("p_retailprice"))
      .orderBy(col("p_brand"), col("rk"))

  /** q59_simhash_neardup — SimHash near-duplicate JOIN (completes the
    * X2 dedup path: q30 emits signatures, this finds the pairs). 32-bit
    * signature, Hamming ≤ 3 via 4×8-bit LSH bands: two docs within
    * Hamming 3 differ in ≤3 bit positions, so by pigeonhole at least
    * one band is identical — the equi-join on (band_id, band_key)
    * finds EVERY qualifying pair (no recall loss), while only
    * same-band buckets are compared (no O(n²) all-pairs). The residual
    * `bit_count(xor)` filter drops false candidates. At 100 TB: one
    * shuffle of (band, 8-bit key, id, sig), bucket-local joins.
    */
  def q59SimhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    // materialize the signatures once: the banded self-join inside
    // simhashHammingPairs reads them from BOTH sides, and Catalyst does
    // not reuse the exchange across the differently-aliased subplans —
    // unchecked, every simhash is computed twice
    val sh = DedupOps.withSimhash(docs, TextOps.tokens(col("text")), 32, "sh")
      .select(col("doc_id"), col("sh"))
      .localCheckpoint()
    DedupOps.simhashHammingPairs(sh, "doc_id", "sh", maxHamming = 3, bands = 4)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q151_frequent_itemsets — association mining (M-surface extension):
    * FPGrowth over per-order brand baskets, reported at itemset size
    * <= 2 so the DuckDB oracle can replay it as plain counting
    * (singles = per-brand basket counts, pairs = the basket self-join)
    * — the hash match checks FPGrowth's support arithmetic exactly
    * (minCount = ceil(minSupport × nBaskets), both engines computing
    * the same double product). Scale shape: FPGrowth shuffles
    * conditional pattern bases by item — never materializing the
    * all-pairs basket join the oracle (deliberately) runs.
    */
  def q151FrequentItemsets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.fpm.FPGrowth
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.part(s, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        Seq("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_distinct(collect_list(col("p_brand"))).as("items"))
    val model = new FPGrowth().setItemsCol("items")
      .setMinSupport(0.015).fit(baskets)
    model.freqItemsets
      .filter(size(col("items")) <= 2)
      .select(array_join(sort_array(col("items")), ",").as("items"),
        col("freq"))
      .orderBy(col("items"))
  }

  /** q342_prefixspan — Spark ML's PrefixSpan made oracle-hash-checkable:
    * frequent sequential patterns (length ≤ 3, minSupport 0.3) over
    * each user's time-ordered event-type sequence. PrefixSpan projects
    * databases recursively; but for single-item itemsets its OUTPUT is
    * exactly "count of sequences containing the subsequence (gaps
    * allowed)", and subsequence containment has a greedy closed form —
    * first a, then first b AFTER it, then first c after that — that
    * the DuckDB oracle replays with two position joins. So a real
    * MLlib mining component's result hash-matches a relational replay
    * (the q314 Naive-Bayes move, for sequence mining). Corpus cost:
    * one sequence-collect per user; the model's projected databases
    * are distributed by prefix, and the oracle side's join frames are
    * |users|×|types|ᵏ bounded.
    */
  def q342Prefixspan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.fpm.PrefixSpan
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seqs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__rn"), col("event_type")))),
        e => array(e.getField("event_type"))).as("sequence"))
    val nFrame = seqs.agg(count(lit(1)).as("__n"))
    new PrefixSpan().setMinSupport(0.3).setMaxPatternLength(3)
      .setSequenceCol("sequence")
      .findFrequentSequentialPatterns(seqs)
      .crossJoin(broadcast(nFrame))
      .select(
        array_join(flatten(col("sequence")), ">").as("pattern"),
        col("freq"),
        round(col("freq") / col("__n").cast("double"), 4).as("support"))
      .orderBy(col("pattern"))
  }

  /** q152_triangles — triangle counting over the simhash near-dup graph
    * (q59's edges): the graph-analytics step past connected components
    * — triangle density separates genuine duplicate clusters from
    * chains of borderline pairs. Counted via
    * [[GraphOps.orientedTriangles]] DEGREE orientation (each edge
    * directed from its lower-(degree, id) endpoint, wedges emitted
    * only between oriented out-neighbors): the compact-forward bound
    * keeps wedge fan-out at Σ outdeg(u)² ≤ O(m^1.5) even when the dup
    * graph is hub-heavy, where id orientation pays Σ deg(w)² on the
    * hubs. The count is orientation-invariant — the oracle's
    * id-oriented three-way join replays it exactly.
    */
  def q152Triangles(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.simhashDocEdges(s, dir)
    val tri = GraphOps.orientedTriangles(e)
      .agg(count(lit(1)).as("n_triangles"))
    val stats = e.agg(count(lit(1)).as("n_edges"))
    val nodes = e.select(col("id_a").as("n")).unionByName(
        e.select(col("id_b").as("n"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    nodes.crossJoin(stats).crossJoin(tri)
  }

  /** q172_pagerank — fixed-iteration PageRank over the simhash
    * near-dup graph (q152's edge source): 3 synchronous iterations,
    * damping 0.85, nodes restricted to edge participants (undirected ⇒
    * every node has out-degree, no dangling mass). Rank centrality
    * over the dup graph surfaces hub documents (template pages) that
    * plain degree misses. Each iteration is one join + one
    * map-side-combined sum on the checkpointed symmetric edge list —
    * the standard BSP shape; ranks are checkpointed per round so the
    * plan stays iteration-deep, not product-deep. Constants are
    * literal (0.15, not 1−0.85) so both engines sum identical doubles.
    */
  def q172Pagerank(s: SparkSession, dir: String): DataFrame = {
    val sym = GraphOps.symmetrize(GraphOps.simhashDocEdges(s, dir))
      .localCheckpoint() // 3 iterations + degree read this
    // deg feeds every round — checkpoint it (and sym above) once;
    // each rank frame is referenced exactly once per round, so the
    // iteration chain needs NO per-round barrier (a localCheckpoint
    // per round measured 2x slower: 4 extra materialization jobs)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nFrame = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val init = deg.crossJoin(broadcast(nFrame))
      .select(col("src").as("node"), col("deg"),
        (lit(1.0) / col("n_nodes")).as("p"))
    val ranks = GraphOps.unrolledRounds(init, 3) { (r, _) =>
      val contrib = r.join(sym, r("node") === sym("src"))
        .select(col("dst").as("node"), (col("p") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("__in"))
      deg.select(col("src").as("node"), col("deg"))
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nFrame))
        .select(col("node"), col("deg"),
          (lit(0.15) / col("n_nodes") +
            lit(0.85) * coalesce(col("__in"), lit(0.0))).as("p"))
    }
    ranks.select(col("node").as("doc_id"), (round(col("p"), 4) + lit(0.0)).as("pagerank"),
        col("deg"))
      .orderBy(col("pagerank").desc, col("doc_id")).limit(25)
  }

  /** q180_typed_cogroup — the typed Dataset escape hatch (SURVEY §7's
    * preference (d)): `KeyValueGroupedDataset.cogroup` merges each
    * order with its lineitems under case-class Encoders and runs
    * arbitrary per-key Scala (here: net-price reconciliation). One
    * shuffle per side on the key — same exchange plan as the join the
    * DuckDB oracle uses; the per-key fold is in integer cents, so it
    * is deterministic under any iterator order. Use the declarative
    * join+agg when
    * semantics allow (everything else in this engine does); cogroup is
    * for logic Catalyst can't express.
    */
  def q180TypedCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ords = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)]
    val lis = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)]
    ords.groupByKey(_._1).cogroup(lis.groupByKey(_._1)) { (k, os, ls) =>
      val o = os.toSeq
      if (o.isEmpty) Iterator.empty
      else {
        val items = ls.toSeq
        // integer-cent fold: each term is one double product rounded
        // identically in both engines; the long sum is then exact under
        // ANY order — a double fold flipped a half-cent boundary on 1
        // of 15k orders between engines
        val cents = items.iterator
          .map(t => math.floor(t._2 * (1 - t._3) * 100 + 0.5).toLong).sum
        Iterator((k, o.head._2, items.size.toLong, cents / 100.0))
      }
    }.toDF("o_orderkey", "o_totalprice", "n_items", "items_net")
      .orderBy(col("o_orderkey"))
  }

  /** q181_exists_subquery — EXISTS / NOT EXISTS predicate subqueries
    * through `spark.sql`: Catalyst rewrites both into one left-semi
    * and one left-anti hash join (no per-row re-scan) — the
    * decorrelation counterpart to q79's scalar subquery.
    */
  def q181ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_q181")
    Tables.orders(s, dir).createOrReplaceTempView("orders_q181")
    s.sql(
      """SELECT c_custkey, c_nationkey FROM customer_q181 c
        |WHERE EXISTS (SELECT 1 FROM orders_q181 o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders_q181 o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q182_ntile — quartile bucketing via `ntile(4)` per return flag:
    * the rank-based window form, correct when partitions fit a sort
    * (ties share a price, so bucket stats are deterministic under any
    * tie order). The scale path for unbounded groups is
    * `StatOps.equiDepthBins` (q126) — fences without a per-group sort.
    */
  def q182Ntile(s: SparkSession, dir: String): DataFrame = {
    // ~3 return flags over the whole lineitem table — the round-10
    // grouped single-task trap; rank via StatOps.shardedRank with the
    // (orderkey, linenumber) tiebreak folded into one long (linenumber
    // ≤ 7, so key*8+line preserves the lex order), quartile from the
    // exact integer cut points
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("__tie"))
    val ranked = graft.ops.StatOps.shardedRank(
      li, "l_returnflag", "l_extendedprice", "__tie", "__rk")
    val sizes = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("__k"))
    ranked.join(broadcast(sizes), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("l_extendedprice"),
        ntile4FromRank(col("__rk"), col("__k")).as("quartile"))
      .groupBy(col("l_returnflag"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy(col("l_returnflag"), col("quartile"))
  }

  /** q153_target_encoding — leakage-safe K-fold target encoding (the
    * feature-engineering step the reference's frequency encoding M4
    * approximates without labels): each (category, fold) gets the mean
    * label computed from the OTHER folds only — encode(c, f) =
    * (sum_all(c) − sum_f(c)) / (n_all(c) − n_f(c)) — so a row never
    * sees its own label. Folds are md5-hash-assigned (engine-portable,
    * retry-stable). ONE aggregation at data scale; the per-category
    * totals ride a category-sized window — no second pass.
    */
  def q153TargetEncoding(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
    Tables.orders(s, dir)
      .withColumn("fold",
        TextOps.hash32(col("o_orderkey").cast("string"), seed = "fold:") % 5)
      .groupBy(col("o_orderpriority"), col("fold"))
      .agg(sum(col("o_totalprice")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("encoding",
        (round((sum(col("__s")).over(w) - col("__s")) /
          (sum(col("__n")).over(w) - col("__n")), 4) + lit(0.0)))
      .select(col("o_orderpriority"), col("fold"), col("__n").as("n_rows"),
        col("encoding"))
      .orderBy(col("o_orderpriority"), col("fold"))
  }

  /** q154_dedup_survivors — best-of-cluster survivorship: q66's
    * simhash near-dup clusters reduced to one survivor each, chosen by
    * QUALITY (longest token count, doc_id tiebreak) rather than the
    * min-id keeper — the policy real pipelines want (keep the best
    * copy, drop the rest). Selection is one `max_by` hash aggregate
    * over (cluster, quality-key) — no window sort over the corpus.
    */
  def q154DedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val clusters = q66DedupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    val quality = Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    clusters.join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        // numeric total-order key (n_tokens, doc_id) — exact in long,
        // and the one arg_max ordering DuckDB replays identically
        max_by(col("doc_id"),
          col("n_tokens") * lit(10000000L) + col("doc_id"))
          .as("survivor_id"),
        max(col("n_tokens")).as("survivor_tokens"))
      .orderBy(col("cluster_id"))
  }

  /** q60_funnel — ordered conversion funnel over the events stream:
    * users whose first view is followed by a click, then a purchase
    * (each stage's timestamp ≥ the previous stage's first hit). Three
    * user_id-keyed aggregations + two broadcast-size joins — the
    * standard product-analytics funnel at event-log scale; no window
    * over the full log, state is one row per user per stage.
    */
  def q60Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("ts") >= col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("ts") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
      .unionByName(
        c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
      .unionByName(
        p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
      .select(col("stage"), col("n_users"))
      .orderBy(col("stage"))
  }

  /** q202_seq_pattern — event-SEQUENCE pattern matching (the
    * MATCH_RECOGNIZE analogue): each user's history compresses to a
    * type-letter string in total (ts, event_id) order — one shuffle,
    * per-user state bounded by that user's event count, never the
    * corpus — then regexes run per USER, not per event: subsequence
    * funnel `v.*c.*p` and non-overlapping view→purchase runs with no
    * intermediate purchase (`v[^p]*p`). q60 counts per-stage
    * populations with joins; this matches ORDER-dependent patterns the
    * stage joins can't express (e.g. "no purchase between").
    */
  def q202SeqPattern(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("c")))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), length(col("seq")).cast("long").as("n_events"),
        col("seq").rlike("v.*c.*p").as("funnel_matched"),
        size(expr("regexp_extract_all(seq, 'v[^p]*p', 0)"))
          .cast("long").as("n_vp_runs"))
      .orderBy(col("user_id"))

  /** q61_retention — cohort retention: users grouped by first-seen day,
    * counted on each subsequent active day offset. Two user_id
    * aggregations + one join; the result is O(days²) rows regardless
    * of input size — the shape that stays cheap at any event volume.
    */
  def q61Retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val first = e.groupBy(col("user_id"))
      .agg(date_trunc("DAY", min(col("ts"))).as("cohort"))
    val active = e.select(col("user_id"),
      date_trunc("DAY", col("ts")).as("day")).distinct()
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** q62_tfidf_keywords — per-document top-3 keywords by smoothed
    * TF-IDF (`tf · (ln((N+1)/(df+1)) + 1)`), end-to-end in the plan:
    * explode → (doc, term) counts → document-frequency aggregate →
    * broadcast of the tiny N scalar → score → ranked window. The
    * all-relational form of "keyword extraction" — no vocabulary
    * collected to the driver (contrast CountVectorizer.fit), so at
    * 100 TB the term space stays distributed; the only wide shuffle
    * carries (doc_id, word) pairs.
    */
  def q62TfidfKeywords(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    val dw = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("word"))
    // tf feeds both the score join and the document-frequency
    // aggregate — materialize once or the explode+count runs twice
    val tf = dw.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("dfx"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("word")).crossJoin(broadcast(n))
      .withColumn("score", col("tf") *
        (log((col("n_docs") + lit(1.0)) / (col("dfx") + lit(1.0))) + lit(1.0)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("int").as("rk"), col("word"),
        (round(col("score"), 4) + lit(0.0)).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** q63_argminmax — min_by/max_by (argmin/argmax) aggregates: which
    * order carries each status's extreme price. Ordering value is a
    * composite integer (price-cents ×1e8 + orderkey, exact in double →
    * long range) because ties on raw price would make the pick
    * engine-dependent. One partial-aggregated shuffle; the classic
    * "top-1 per group without a window" shape.
    */
  def q63ArgMinMax(s: SparkSession, dir: String): DataFrame = {
    val ord = (round(col("o_totalprice") * 100).cast("long") *
      lit(100000000L)) + col("o_orderkey")
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(max_by(col("o_orderkey"), ord).as("top_order"),
        min_by(col("o_orderkey"), ord).as("bottom_order"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** q64_salted_agg — skew-resistant two-phase aggregation
    * (`SkewOps.saltedAgg`): scatter each key over 8 salts, partial-sum,
    * merge. Result is IDENTICAL to the plain groupBy (the oracle runs
    * the plain form) — the salting only changes the shuffle shape, so
    * a single hot key spreads across 8 reducers instead of one
    * straggler. l_quantity sums are integer-valued, so the two-phase
    * summation order cannot change the result.
    */
  def q64SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val qty = graft.ops.SkewOps.saltedAgg(
      Tables.lineitem(s, dir), "l_returnflag", "l_quantity", 8,
      sum, sum, "total_qty")
    val cnt = graft.ops.SkewOps.saltedCount(
      Tables.lineitem(s, dir), "l_returnflag", 8)
    qty.join(cnt, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        (round(col("total_qty"), 2) + lit(0.0)).as("total_qty"), col("count").as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q65_approx_percentiles — quantile sketches (Greenwald-Khanna
    * `approx_percentile`) validated against the exact linear-
    * interpolated percentiles. Sketch estimates are engine-specific,
    * so the manifest hashes the EXACT percentiles (bit-identical to
    * DuckDB's `quantile_cont`, cf. StatOps) plus ≤1 %-relative-error
    * flags for the sketch side; the oracle replays the exact values
    * and asserts both flags literally true — a full hash check of the
    * accuracy invariant instead of the former rows-only check. At
    * 100 TB the sketch is mergeable, bounded-memory state — exact
    * percentile must buffer every group value.
    */
  def q65ApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val approx = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("__a50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("__a95"))
    // exact side via the distributed-selection op (quantile_cont /
    // built-in-percentile parity, see StatOps scaladoc) — the built-in
    // exact aggregate's value->count maps are the thing this engine
    // replaces at scale
    val exact = graft.ops.StatOps.exactPercentiles(
      Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice",
      Seq("__p50" -> 0.5, "__p95" -> 0.95))
    approx.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        round(col("__p50"), 2).as("p50"), round(col("__p95"), 2).as("p95"),
        (abs(col("__a50") - col("__p50")) <= col("__p50") * 0.01)
          .as("p50_ok"),
        (abs(col("__a95") - col("__p95")) <= col("__p95") * 0.01)
          .as("p95_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** q66_dedup_clusters — duplicate-GROUP resolution: q59's pairwise
    * near-dup candidates closed into transitive clusters via
    * distributed min-label propagation (`DedupOps.connectedComponents`).
    * cluster_id = min doc_id of the component; singleton docs map to
    * themselves. This is the step that turns "a~b, b~c" into "keep one
    * of {a,b,c}" in a real dedup pipeline.
    */
  def q66DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = q59SimhashNearDup(s, dir).select(col("doc_a"), col("doc_b"))
    val nodes = Tables.documents(s, dir).select(col("doc_id"))
    DedupOps.connectedComponents(nodes, "doc_id", pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** q67_incremental_agg — incremental view maintenance: the daily
    * aggregate is built as merge(old partials, new partials) across a
    * mid-day cutoff instead of re-aggregating history — count/sum are
    * mergeable, so the merged result equals the direct group-by (the
    * oracle computes the direct form). At 100 TB this is how daily
    * rollups actually run: yesterday's partials are a table, only the
    * new slice is scanned.
    */
  def q67IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-15 12:00:00").cast(TimestampType)
    val e = Tables.events(s, dir)
      .withColumn("day", date_trunc("DAY", col("ts")))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("day")).agg(count(lit(1)).as("pn"),
        sum(col("value")).as("pv"))
    partial(e.filter(col("ts") < cutoff))
      .unionByName(partial(e.filter(col("ts") >= cutoff)))
      .groupBy(col("day"))
      .agg(sum(col("pn")).as("n_events"),
        (round(sum(col("pv")), 2) + lit(0.0)).as("total_value"))
      .orderBy(col("day"))
  }

  /** q68_corpus_prep — the full LLM-training-corpus preparation
    * pipeline as ONE plan + one iterative clustering step, composing
    * the individually-verified operators: language filter → token
    * quality gate (≥20 tokens) → exact dedup (md5 keep-min) → SimHash
    * near-dup clustering (banded Hamming ≤3 + connected components) →
    * one representative per cluster → per-source corpus stats. This is
    * the "could a user run their pipeline on this engine" query: every
    * stage is the scalable shape (hash dedup, banded LSH, label
    * propagation — no all-pairs, no driver data).
    */
  def q68CorpusPrep(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.parallelize(Tables.documents(s, dir))
      .filter(col("lang") === "en")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("ntok", size(col("toks")))
      .filter(col("ntok") >= 20)
    val exact = DedupOps.keepFirst(
      base.withColumn("__h", md5(col("text"))), Seq("__h"), Seq(col("doc_id")))
      .drop("__h")
    val withSh = DedupOps.withSimhash(exact, col("toks"), 32, "sh")
      .select(col("doc_id"), col("source"), col("ntok"), col("sh"))
      .localCheckpoint() // reused by pairs, nodes, and the final join
    val pairs = DedupOps.simhashHammingPairs(withSh, "doc_id", "sh",
      maxHamming = 3, bands = 4)
    val cc = DedupOps.connectedComponents(
      withSh.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
    withSh.join(cc, withSh("doc_id") === cc("node"))
      .filter(col("doc_id") === col("cluster_id")) // cluster representative
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        round(avg(col("ntok")), 2).as("avg_tokens"))
      .orderBy(col("source"))
  }

  /** q69_range_frame — VALUE-based window frame (RANGE, vs q32's
    * row-count frames): per-customer trailing-30-day order total and
    * each customer's first order date (first_value over an unbounded
    * frame). Time is compared in epoch seconds on both engines so the
    * frame bound is exact. One shuffle on the partition key; the frame
    * scan is a per-partition sliding aggregate, O(rows) total.
    */
  def q69RangeFrame(s: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ: hop via TIMESTAMP (session tz is
    // pinned UTC everywhere) to epoch seconds — matches DuckDB epoch()
    val secs = col("o_orderdate").cast("timestamp").cast("long")
    val w30 = Window.partitionBy(col("o_custkey")).orderBy(secs)
      .rangeBetween(-30L * 86400, 0)
    val wAll = Window.partitionBy(col("o_custkey")).orderBy(secs)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (round(sum(col("o_totalprice")).over(w30), 2) + lit(0.0)).as("trailing_30d"),
        first(col("o_orderdate")).over(wAll).as("first_order"))
      .orderBy(col("o_orderkey"))
  }

  /** Spark's NTile bucket from a total-order rank and the partition
    * size, in exact integer arithmetic: the first `k % n` buckets get
    * `k/n + 1` rows, the rest `k/n` — expressed as comparisons against
    * the three cumulative cut points (no integer division of the rank,
    * which would round through doubles).
    */
  private def ntile4FromRank(rn: org.apache.spark.sql.Column,
      k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rem = pmod(k, lit(4L))
    val bs = ((k - rem) / 4).cast("long")
    def cut(i: Int) = bs * i + least(lit(i.toLong), rem)
    when(rn <= cut(1), 1).when(rn <= cut(2), 2)
      .when(rn <= cut(3), 3).otherwise(4)
  }

  /** q70_rank_dist — distribution ranking functions: ntile quartiles,
    * percent_rank, cume_dist per status ordered by (price, key). The
    * ordering is TOTAL (key tiebreak) because ntile buckets by row
    * position — ties straddling a bucket boundary would otherwise be
    * engine-dependent. The status key is ~3 values over the whole
    * orders table — the round-10 grouped single-task trap — so the
    * rank comes from StatOps.shardedRank and all three distribution
    * functions derive from (rank, group size) in exact arithmetic:
    * ntile via integer cut points, percent_rank = (rn−1)/(k−1),
    * cume_dist = rn/k (the total order makes rank == row_number and
    * every row its own cume group).
    */
  def q70RankDist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val ranked = graft.ops.StatOps.shardedRank(
      o, "o_orderstatus", "o_totalprice", "o_orderkey", "__rk")
    val sizes = o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("__k"))
    ranked.join(broadcast(sizes), Seq("o_orderstatus"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile4FromRank(col("__rk"), col("__k")).as("quartile"),
        round(when(col("__k") === 1, lit(0.0)).otherwise(
          (col("__rk") - 1).cast("double") /
            (col("__k") - 1).cast("double")), 6).as("pct_rank"),
        round(col("__rk").cast("double") / col("__k").cast("double"), 6)
          .as("cume"))
      .orderBy(col("o_orderkey"))
  }

  /** q71_session_window — native `session_window` sessions (vs q19's
    * lag/cumsum formulation): one shuffle on user_id, windows merged by
    * the operator, streaming-ready as-is. Oracle reproduces the strict
    * merge rule (gap-apart events start a new session).
    */
  def q71SessionWindow(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventOps.sessionWindowStats(Tables.events(s, dir), 30)
      .orderBy(col("user_id"), col("session_start"))

  /** q72_having — post-aggregation filter (HAVING): repeat customers
    * above both a count and a spend threshold. In Spark this is just
    * `filter` above `agg` — Catalyst keeps the partial-agg pushdown;
    * the filter runs on the tiny aggregated side.
    */
  def q72Having(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("spend"))
      .filter(col("n_orders") >= 12 && col("spend") > 1500000.0)
      .orderBy(col("o_custkey"))

  /** q73_union_distinct — set-semantics UNION (vs q6's UNION ALL):
    * overlapping key sets collapse to distinct rows — one extra
    * distinct-aggregation shuffle after the concatenation, which is
    * exactly what UNION costs over UNION ALL at any scale.
    */
  def q73UnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    val big = o.filter(col("o_totalprice") > 250000.0)
      .select(col("o_custkey").as("custkey"))
    urgent.unionByName(big).distinct().orderBy(col("custkey"))
  }

  /** q351_hits — HITS hubs-and-authorities (Kleinberg 1999) on the
    * weighted user→event_type bipartite graph: authority(t) = Σ_u
    * w(u,t)·hub(u), hub(u) = Σ_t w(u,t)·auth(t), L2-normalized each
    * half-step, two full iterations unrolled. Every step is one
    * broadcast-joined map-side-combinable sum over the aggregated edge
    * frame (|users|×|types| ≤ corpus, built by ONE corpus pass) — the
    * same BSP shape as q172's PageRank but on the bipartite adjacency,
    * where mutual reinforcement separates "heavy users of everything"
    * (hubs) from "types that heavy users concentrate on" (authorities)
    * — plain degree (the iteration-0 column) can't. Norm scalars are
    * broadcast 1-row frames; 6-dp rounding absorbs cross-engine
    * sum-order last bits.
    */
  def q351Hits(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint() // read by both iterations' join sides
    val a1raw = e.groupBy(col("event_type")).agg(sum(col("w")).as("__a"))
    val a1n = a1raw.agg(sqrt(sum(col("__a") * col("__a"))).as("__na"))
    val a1 = a1raw.crossJoin(broadcast(a1n))
      .select(col("event_type"),
        (col("__a") / col("__na")).as("a0"))
    val h1raw = e.join(broadcast(a1), Seq("event_type"))
      .groupBy(col("user_id"))
      .agg(sum(col("w") * col("a0")).as("__h"))
    val h1n = h1raw.agg(sqrt(sum(col("__h") * col("__h"))).as("__nh"))
    val h1 = h1raw.crossJoin(broadcast(h1n))
      .select(col("user_id"), (col("__h") / col("__nh")).as("h1"))
    val a2raw = e.join(h1, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(sum(col("w") * col("h1")).as("__a2"))
    val a2n = a2raw.agg(sqrt(sum(col("__a2") * col("__a2"))).as("__na2"))
    a2raw.crossJoin(broadcast(a2n))
      .join(a1, Seq("event_type"))
      .select(col("event_type"),
        (round(col("a0"), 6) + lit(0.0)).as("authority_iter0"),
        (round(col("__a2") / col("__na2"), 6) + lit(0.0)).as("authority"))
      .orderBy(col("event_type"))
  }

  /** q352_adamic_adar — link prediction over the simhash near-dup
    * graph (q152/q172's edge source) by Adamic–Adar common-neighbor
    * scoring: for each non-adjacent pair (a,b), score = Σ_{w ∈
    * N(a)∩N(b)} 1/ln(deg(w)) — common neighbors weighted down by how
    * promiscuous they are, the classic "friend of both, and choosy
    * about it" signal. One 2-hop self-join on the symmetric edge list
    * (the same wedge shape q152's triangle count pays), degree joined
    * on the wedge midpoint so it rides the existing w-partitioning,
    * existing edges removed by anti-join. deg(w) ≥ 2 for every wedge
    * midpoint (it touches both a and b), so 1/ln(deg) never divides by
    * zero. Top-20 by rounded score with (a,b) tiebreak — total order,
    * engine-portable.
    */
  def q352AdamicAdar(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.simhashDocEdges(s, dir)
    // NOTE on orientation: q152/q356's degree-oriented wedge bound does
    // NOT apply here — AA's exact score sums over EVERY common
    // neighbor, so the Σ C(deg(w), 2) wedge set IS the output workload;
    // the only hub mitigations are approximations (neighbor top-k).
    val sym = GraphOps.symmetrize(e)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val aw = sym.select(col("src").as("a"), col("dst").as("w"))
    val wb = sym.select(col("src").as("w"), col("dst").as("b"))
    val scored = aw.join(wb, Seq("w")).filter(col("a") < col("b"))
      .join(deg.withColumnRenamed("src", "w"), Seq("w"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(lit(1.0) / log(col("deg"))).as("__score"))
    scored.join(e.select(col("id_a").as("a"), col("id_b").as("b")),
        Seq("a", "b"), "left_anti")
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("common_neighbors"), (round(col("__score"), 4) + lit(0.0)).as("aa_score"))
      .orderBy(col("aa_score").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** q356_clustering_coeff — per-node local clustering coefficient
    * over the simhash near-dup graph (q152's edge source): the
    * fraction of a node's neighbor pairs that are themselves
    * connected, tri(w) / C(deg(w), 2) — the node-level refinement of
    * q152's global triangle count that separates documents sitting in
    * tight duplicate cliques (cc → 1) from chain/hub articulation
    * points (cc → 0). Per-node triangle counts come from
    * [[GraphOps.orientedTriangles]] (each triangle enumerated exactly
    * once under the hub-safe degree orientation) with each triple
    * credited to its three vertices — same numbers as the
    * midpoint-wedge form, but the wedge shuffle is bounded by
    * Σ outdeg² ≤ O(m^1.5) instead of Σ deg(w)² on hubs.
    */
  def q356ClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.simhashDocEdges(s, dir)
    val sym = GraphOps.symmetrize(e)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val tri = GraphOps.orientedTriangles(e)
      .select(explode(array(col("u"), col("v"), col("w"))).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("triangles"))
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("src"), "left")
      .select(col("src").as("doc_id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(coalesce(col("triangles"), lit(0L)).cast("double") /
          (col("deg") * (col("deg") - 1) / 2), 4).as("cc"))
      .orderBy(col("cc").desc, col("triangles").desc, col("doc_id"))
      .limit(20)
  }

  /** q357_assortativity — degree assortativity of the simhash near-dup
    * graph: the Pearson correlation of endpoint degrees over the
    * symmetric edge list (Newman 2002's r, computed on full degrees).
    * r > 0 means duplicate hubs link to other hubs (template families
    * cross-linking), r < 0 means hub-and-spoke boilerplate — the
    * one-number structural signature that tells a dedup pipeline
    * whether cluster resolution will face cliques or stars. One
    * degree aggregation + one broadcast-joined moment pass over the
    * edges; five moments, one output row, engine-exact via
    * try_divide on the degenerate regular-graph case (zero degree
    * variance).
    */
  def q357Assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.simhashDocEdges(s, dir)
    val sym = GraphOps.symmetrize(e)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // joined on both endpoints
    val ends = sym
      .join(deg.select(col("src"), col("deg").as("dj")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dk")),
        Seq("dst"))
    val m = ends.agg(count(lit(1)).cast("double").as("__m"),
      sum(col("dj")).cast("double").as("__sj"),
      sum(col("dk")).cast("double").as("__sk"),
      sum(col("dj") * col("dk")).cast("double").as("__sjk"),
      sum(col("dj") * col("dj")).cast("double").as("__sjj"),
      sum(col("dk") * col("dk")).cast("double").as("__skk"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    nodes.crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(m)
      .select(col("n_nodes"), col("n_edges"),
        round(try_divide(
          col("__sjk") / col("__m") -
            (col("__sj") / col("__m")) * (col("__sk") / col("__m")),
          sqrt((col("__sjj") / col("__m") -
              pow(col("__sj") / col("__m"), 2)) *
            (col("__skk") / col("__m") -
              pow(col("__sk") / col("__m"), 2)))), 4)
          .as("assortativity"))
  }


  /** q387_kmv_intersect — KMV/theta-sketch set INTERSECTION estimation
    * (Beyer et al. 2007; the Theta-sketch framework): each audience
    * (view users, purchase users) keeps only its k = 128 smallest
    * md5-uniform hash values; |A| ≈ (k−1)/θ_A with θ the k-th minimum,
    * and the intersection comes from the UNION sketch — jaccard = (how
    * many of the union sketch's k values lie in both sets)/k, |A∩B| ≈
    * jaccard · |A∪B|. This is the capability q212's HLL family
    * structurally lacks: HLL only unions — set algebra (overlap,
    * jaccard) needs KMV/theta. Everything after the two distinct
    * aggregations is k-bounded: the sketches are TakeOrdered heaps
    * (no global sort), membership tests are semi-joins against the
    * 128-row frames, and the oracle replays every rank and estimate
    * exactly (md5 hashing is engine-portable).
    */
  def q387KmvIntersect(s: SparkSession, dir: String): DataFrame = {
    val k = 128
    val e = Tables.events(s, dir)
    def users(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id")).distinct()
      .withColumn("__u",
        TextOps.hash32(col("user_id").cast("string"), "kmv:")
          .cast("double") / lit(4294967296.0))
    val a = users("view").localCheckpoint()
    val b = users("purchase").localCheckpoint()
    def sketch(df: DataFrame) =
      df.orderBy(col("__u"), col("user_id")).limit(k).localCheckpoint()
    val skA = sketch(a)
    val skB = sketch(b)
    val skU = sketch(a.unionByName(b).dropDuplicates("user_id"))
    // Standard KMV small-set rule: a sketch that never filled (fewer
    // than k distinct members) IS the set — its size is the exact
    // cardinality; (k−1)/θ on an unfull sketch is a biased
    // overestimate.
    def kmvEst(alias: String): org.apache.spark.sql.Column =
      when(count(lit(1)) < k, count(lit(1)).cast("double"))
        .otherwise(lit(k - 1) / max(col("__u"))).as(alias)
    val estA = skA.agg(kmvEst("__ea"))
    val estB = skB.agg(kmvEst("__eb"))
    val uFlag = skU
      .join(a.select(col("user_id"), lit(1).as("__ina")),
        Seq("user_id"), "left")
      .join(b.select(col("user_id"), lit(1).as("__inb")),
        Seq("user_id"), "left")
    val inter = uFlag.agg(
      kmvEst("__eu"),
      (count(when(col("__ina") === 1 && col("__inb") === 1, 1))
        .cast("double") /
        greatest(count(lit(1)), lit(1L)).cast("double")).as("__j"))
    val exact = a.join(b, Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_intersect"))
      .crossJoin(broadcast(a.agg(count(lit(1)).as("exact_a"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("exact_b"))))
    exact.crossJoin(broadcast(estA)).crossJoin(broadcast(estB))
      .crossJoin(broadcast(inter))
      .select(lit(k).as("k"), col("exact_a"), col("exact_b"),
        col("exact_intersect"),
        round(col("__ea"), 1).as("est_a"),
        round(col("__eb"), 1).as("est_b"),
        round(col("__j") * col("__eu"), 1).as("est_intersect"),
        (abs(col("__j") * col("__eu") - col("exact_intersect")) <=
          col("exact_intersect") * 0.35 + lit(5.0)).as("within_bound"))
  }


  /** q394_personalized_pagerank — PERSONALIZED PageRank from a seed
    * set (doc_id % 100 == 0): identical BSP scaffold to q172
    * ([[GraphOps.unrolledRounds]] over the checkpointed symmetric
    * simhash graph) but the teleport mass returns to the SEEDS, not
    * uniformly — which turns global centrality into "similarity to
    * THESE documents", the random-walk relevance measure behind
    * related-item recommendation and seed-expansion labeling (find
    * more docs like the flagged ones). Global PR (q172) answers "what
    * is a hub"; PPR answers "a hub NEAR my seeds". Scores concentrate
    * on the seeds' components; everything off-component is exactly 0
    * and is filtered before the top-k.
    */
  def q394PersonalizedPagerank(s: SparkSession, dir: String): DataFrame = {
    val sym = GraphOps.symmetrize(GraphOps.simhashDocEdges(s, dir))
      .localCheckpoint() // 3 iterations + degree read this
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val isSeed = (col("src") % 100 === 0)
    val seedN = deg.filter(isSeed)
      .agg(count(lit(1)).cast("double").as("n_seeds"))
    val init = deg.crossJoin(broadcast(seedN))
      .select(col("src").as("node"), col("deg"), col("n_seeds"),
        when(isSeed, lit(1.0) / col("n_seeds")).otherwise(lit(0.0))
          .as("p"))
    val ranks = GraphOps.unrolledRounds(init, 3) { (r, _) =>
      val contrib = r.join(sym, r("node") === sym("src"))
        .select(col("dst").as("node"), (col("p") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("__in"))
      deg.crossJoin(broadcast(seedN))
        .select(col("src").as("node"), col("deg"), col("n_seeds"),
          when(col("src") % 100 === 0, lit(0.15) / col("n_seeds"))
            .otherwise(lit(0.0)).as("__tp"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("n_seeds"),
          (col("__tp") + lit(0.85) * coalesce(col("__in"), lit(0.0)))
            .as("p"))
    }
    ranks.filter(col("p") > 0)
      .select(col("node").as("doc_id"), (round(col("p"), 5) + lit(0.0)).as("ppr"),
        col("deg"), (col("node") % 100 === 0).as("is_seed"))
      .orderBy(col("ppr").desc, col("doc_id")).limit(15)
  }

  val queries: Map[String, Q] = Map(
    "q394_personalized_pagerank" -> (q394PersonalizedPagerank _),
    "q387_kmv_intersect" -> (q387KmvIntersect _),
    "q356_clustering_coeff" -> (q356ClusteringCoeff _),
    "q357_assortativity" -> (q357Assortativity _),
    "q352_adamic_adar" -> (q352AdamicAdar _),
    "q351_hits" -> (q351Hits _),
    "q72_having" -> (q72Having _),
    "q73_union_distinct" -> (q73UnionDistinct _),
    "q71_session_window" -> (q71SessionWindow _),
    "q70_rank_dist" -> (q70RankDist _),
    "q69_range_frame" -> (q69RangeFrame _),
    "q68_corpus_prep" -> (q68CorpusPrep _),
    "q67_incremental_agg" -> (q67IncrementalAgg _),
    "q66_dedup_clusters" -> (q66DedupClusters _),
    "q62_tfidf_keywords" -> (q62TfidfKeywords _),
    "q63_argminmax" -> (q63ArgMinMax _),
    "q64_salted_agg" -> (q64SaltedAgg _),
    "q65_approx_percentiles" -> (q65ApproxPercentiles _),
    "q58_group_topk_agg" -> (q58GroupTopKAgg _),
    "q59_simhash_neardup" -> (q59SimhashNearDup _),
    "q60_funnel" -> (q60Funnel _),
    "q202_seq_pattern" -> (q202SeqPattern _),
    "q61_retention" -> (q61Retention _),
    "q49_explode_wordcount" -> (q49ExplodeWordcount _),
    "q50_pivot" -> (q50Pivot _),
    "q51_cube" -> (q51Cube _),
    "q52_text_sim" -> (q52TextSim _),
    "q53_map_funcs" -> (q53MapFuncs _),
    "q54_range_join" -> (q54RangeJoin _),
    "q55_month_series" -> (q55MonthSeries _),
    "q56_geomean" -> (q56Geomean _),
    "q57_approx_distinct" -> (q57ApproxDistinct _),
    "q212_hll_overlap" -> (q212HllOverlap _),
    "q216_cooccur_lift" -> (q216CooccurLift _),
    "q221_skyline" -> (q221Skyline _),
    "q222_session_window" -> (q222SessionWindow _),
    "q151_frequent_itemsets" -> (q151FrequentItemsets _),
    "q342_prefixspan" -> (q342Prefixspan _),
    "q152_triangles" -> (q152Triangles _),
    "q172_pagerank" -> (q172Pagerank _),
    "q180_typed_cogroup" -> (q180TypedCogroup _),
    "q181_exists_subquery" -> (q181ExistsSubquery _),
    "q182_ntile" -> (q182Ntile _),
    "q153_target_encoding" -> (q153TargetEncoding _),
    "q154_dedup_survivors" -> (q154DedupSurvivors _),
  )

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"

  // mirrors TextOps.hash32 / DedupOps.withSimhash(_, 32, _)
  private[queries] val simhash32Sql: String = (0 until 32).map { j =>
    s"CASE WHEN list_sum(list_transform(toks, t -> ((('0x' || substr(md5(t), 1, 8))::BIGINT >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END"
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "q394_personalized_pagerank" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |sym AS (SELECT ea AS src, eb AS dst FROM e
         |        UNION ALL SELECT eb, ea FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |sn AS (SELECT count(*)::DOUBLE AS ns FROM deg
         |  WHERE src % 100 = 0),
         |p0 AS (SELECT src AS node, deg,
         |    CASE WHEN src % 100 = 0 THEN 1.0 / (SELECT ns FROM sn)
         |      ELSE 0.0 END AS p FROM deg),
         |p1 AS (SELECT d.src AS node, d.deg,
         |    (CASE WHEN d.src % 100 = 0
         |      THEN 0.15 / (SELECT ns FROM sn) ELSE 0.0 END)
         |    + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p0.p / p0.deg) AS sin
         |    FROM p0 JOIN sym ON p0.node = sym.src
         |    GROUP BY sym.dst) c
         |  ON c.node = d.src),
         |p2 AS (SELECT d.src AS node, d.deg,
         |    (CASE WHEN d.src % 100 = 0
         |      THEN 0.15 / (SELECT ns FROM sn) ELSE 0.0 END)
         |    + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p1.p / p1.deg) AS sin
         |    FROM p1 JOIN sym ON p1.node = sym.src
         |    GROUP BY sym.dst) c
         |  ON c.node = d.src),
         |p3 AS (SELECT d.src AS node, d.deg,
         |    (CASE WHEN d.src % 100 = 0
         |      THEN 0.15 / (SELECT ns FROM sn) ELSE 0.0 END)
         |    + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p2.p / p2.deg) AS sin
         |    FROM p2 JOIN sym ON p2.node = sym.src
         |    GROUP BY sym.dst) c
         |  ON c.node = d.src),
         |f AS (SELECT node, p, deg FROM p3 WHERE p > 0)
         |SELECT node AS doc_id, (round(p, 5) + 0.0) AS ppr, deg,
         |  node % 100 = 0 AS is_seed
         |FROM f ORDER BY ppr DESC, doc_id LIMIT 15""".stripMargin,
    "q387_kmv_intersect" ->
      """WITH au AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'view'),
        |bu AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'),
        |ah AS (SELECT user_id, ('0x' || substr(md5('kmv:' ||
        |    user_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u
        |  FROM au),
        |bh AS (SELECT user_id, ('0x' || substr(md5('kmv:' ||
        |    user_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS u
        |  FROM bu),
        |uh AS (SELECT user_id, u FROM ah UNION SELECT user_id, u
        |  FROM bh),
        |ska AS (SELECT * FROM ah ORDER BY u, user_id LIMIT 128),
        |skb AS (SELECT * FROM bh ORDER BY u, user_id LIMIT 128),
        |sku AS (SELECT * FROM uh ORDER BY u, user_id LIMIT 128),
        |ea AS (SELECT CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |    ELSE 127 / max(u) END AS ea FROM ska),
        |eb AS (SELECT CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |    ELSE 127 / max(u) END AS eb FROM skb),
        |iu AS (SELECT CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |      ELSE 127 / max(u) END AS eu,
        |    count(CASE WHEN user_id IN (SELECT user_id FROM au)
        |      AND user_id IN (SELECT user_id FROM bu) THEN 1 END)
        |      / greatest(count(*), 1)::DOUBLE AS j
        |  FROM sku),
        |ex AS (SELECT
        |    (SELECT count(*) FROM au WHERE user_id IN
        |      (SELECT user_id FROM bu))::BIGINT AS exact_intersect,
        |    (SELECT count(*) FROM au)::BIGINT AS exact_a,
        |    (SELECT count(*) FROM bu)::BIGINT AS exact_b)
        |SELECT 128 AS k, exact_a, exact_b, exact_intersect,
        |  round(ea, 1) AS est_a, round(eb, 1) AS est_b,
        |  round(j * eu, 1) AS est_intersect,
        |  abs(j * eu - exact_intersect) <=
        |    exact_intersect * 0.35 + 5.0 AS within_bound
        |FROM ex, ea, eb, iu""".stripMargin,
    "q356_clustering_coeff" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |sym AS (SELECT ea AS src, eb AS dst FROM e
         |        UNION ALL SELECT eb, ea FROM e),
         |deg AS (SELECT src, count(*)::BIGINT AS deg FROM sym
         |  GROUP BY src),
         |tri AS (SELECT aw.dst AS w, count(*)::BIGINT AS triangles
         |  FROM sym aw JOIN sym wb ON aw.dst = wb.src
         |    AND aw.src < wb.dst
         |  WHERE EXISTS (SELECT 1 FROM e
         |    WHERE e.ea = aw.src AND e.eb = wb.dst)
         |  GROUP BY 1)
         |SELECT deg.src AS doc_id, deg.deg,
         |  coalesce(tri.triangles, 0)::BIGINT AS triangles,
         |  round(coalesce(tri.triangles, 0)::DOUBLE /
         |    (deg.deg * (deg.deg - 1) / 2), 4) AS cc
         |FROM deg LEFT JOIN tri ON deg.src = tri.w
         |WHERE deg.deg >= 2
         |ORDER BY cc DESC, triangles DESC, doc_id
         |LIMIT 20""".stripMargin,
    "q357_assortativity" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |sym AS (SELECT ea AS src, eb AS dst FROM e
         |        UNION ALL SELECT eb, ea FROM e),
         |deg AS (SELECT src, count(*)::BIGINT AS deg FROM sym
         |  GROUP BY src),
         |ends AS (SELECT a.deg AS dj, b.deg AS dk
         |  FROM sym JOIN deg a ON sym.src = a.src
         |           JOIN deg b ON sym.dst = b.src),
         |m AS (SELECT count(*)::DOUBLE AS m, sum(dj)::DOUBLE AS sj,
         |    sum(dk)::DOUBLE AS sk, sum(dj * dk)::DOUBLE AS sjk,
         |    sum(dj * dj)::DOUBLE AS sjj, sum(dk * dk)::DOUBLE AS skk
         |  FROM ends)
         |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
         |  (SELECT count(*) FROM e)::BIGINT AS n_edges,
         |  round((sjk / m - (sj / m) * (sk / m)) /
         |    nullif(sqrt((sjj / m - pow(sj / m, 2)) *
         |      (skk / m - pow(sk / m, 2))), 0), 4) AS assortativity
         |FROM m""".stripMargin,
    "q352_adamic_adar" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |sym AS (SELECT ea AS src, eb AS dst FROM e
         |        UNION ALL SELECT eb, ea FROM e),
         |deg AS (SELECT src, count(*)::BIGINT AS deg FROM sym
         |  GROUP BY src),
         |wedge AS (SELECT aw.src AS a, wb.dst AS b, aw.dst AS w
         |  FROM sym aw JOIN sym wb ON aw.dst = wb.src
         |  WHERE aw.src < wb.dst),
         |sc AS (SELECT a, b, count(*)::BIGINT AS common_neighbors,
         |    sum(1.0 / ln(deg.deg)) AS score
         |  FROM wedge JOIN deg ON wedge.w = deg.src GROUP BY a, b),
         |nw AS (SELECT * FROM sc WHERE NOT EXISTS
         |  (SELECT 1 FROM e WHERE e.ea = sc.a AND e.eb = sc.b))
         |SELECT a AS doc_a, b AS doc_b, common_neighbors,
         |  (round(score, 4) + 0.0) AS aa_score
         |FROM nw ORDER BY aa_score DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin,
    "q351_hits" ->
      """WITH e AS (SELECT user_id, event_type, count(*)::DOUBLE AS w
        |  FROM events GROUP BY 1, 2),
        |a1r AS (SELECT event_type, sum(w) AS a FROM e GROUP BY 1),
        |a1n AS (SELECT sqrt(sum(a * a)) AS na FROM a1r),
        |a1 AS (SELECT event_type, a / na AS a0 FROM a1r, a1n),
        |h1r AS (SELECT e.user_id, sum(e.w * a1.a0) AS h
        |  FROM e JOIN a1 USING (event_type) GROUP BY 1),
        |h1n AS (SELECT sqrt(sum(h * h)) AS nh FROM h1r),
        |h1 AS (SELECT user_id, h / nh AS h1 FROM h1r, h1n),
        |a2r AS (SELECT e.event_type, sum(e.w * h1.h1) AS a2
        |  FROM e JOIN h1 USING (user_id) GROUP BY 1),
        |a2n AS (SELECT sqrt(sum(a2 * a2)) AS na2 FROM a2r)
        |SELECT event_type, (round(a0, 6) + 0.0) AS authority_iter0,
        |  (round(a2 / na2, 6) + 0.0) AS authority
        |FROM a2r JOIN a1 USING (event_type) CROSS JOIN a2n
        |ORDER BY event_type""".stripMargin,
    "q221_skyline" ->
      """WITH p AS (
        |  SELECT DISTINCT l_extendedprice::DOUBLE AS x,
        |    l_quantity::DOUBLE AS y
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |w AS (
        |  SELECT x, y,
        |    max(y) OVER (ORDER BY x DESC, y DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my
        |  FROM p)
        |SELECT round(x, 2) AS price, y AS qty
        |FROM w WHERE my IS NULL OR y > my
        |ORDER BY price""".stripMargin,
    "q222_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, value, event_id,
        |    CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id)
        |      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q216_cooccur_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT count(DISTINCT user_id) AS nu FROM ut),
        |marg AS (SELECT event_type, count(*) AS n_u FROM ut GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |  round((n_both * nu)::DOUBLE / (ma.n_u * mb.n_u), 4) AS lift
        |FROM p
        |JOIN marg ma ON ma.event_type = type_a
        |JOIN marg mb ON mb.event_type = type_b
        |CROSS JOIN n
        |ORDER BY 1, 2""".stripMargin,
    "q212_hll_overlap" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS a,
        |    max(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
        |      AS b
        |  FROM orders GROUP BY 1)
        |SELECT sum(a)::BIGINT AS n_a_exact, sum(b)::BIGINT AS n_b_exact,
        |  sum(a * b)::BIGINT AS n_inter_exact, true AS est_ok
        |FROM f""".stripMargin,
    "q57_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  true AS est_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q65_approx_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
        |  true AS p50_ok, true AS p95_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q72_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12 AND round(sum(o_totalprice), 2) > 1500000.0
        |ORDER BY o_custkey""".stripMargin,
    "q73_union_distinct" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0)
        |ORDER BY custkey""".stripMargin,
    "q71_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts::TIMESTAMP) AS us,
        |    lag(epoch_us(ts::TIMESTAMP)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id)
        |), flagged AS (
        |  SELECT user_id, value, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), sess AS (
        |  SELECT user_id, value, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, make_timestamp(min(us)) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q70_rank_dist" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q69_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  round(sum(o_totalprice) OVER w30, 2) AS trailing_30d,
        |  first_value(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY epoch(o_orderdate)) AS first_order
        |FROM orders
        |WINDOW w30 AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q68_corpus_prep" ->
      s"""WITH RECURSIVE d1 AS (
         |  SELECT doc_id, text, source, $toksSql AS toks
         |  FROM documents WHERE lang = 'en'),
         |d2 AS (SELECT doc_id, text, source, toks, len(toks) AS ntok
         |       FROM d1 WHERE len(toks) >= 20),
         |d3 AS (SELECT doc_id, source, toks, ntok FROM (
         |  SELECT d2.*, row_number() OVER (PARTITION BY md5(text)
         |                                  ORDER BY doc_id) AS rn FROM d2)
         |  WHERE rn = 1),
         |s AS (SELECT doc_id, source, ntok, ($simhash32Sql)::BIGINT AS sh
         |      FROM d3),
         |edges AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |          FROM s a JOIN s b ON a.doc_id < b.doc_id
         |          WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |reach(node, root) AS (
         |  SELECT doc_id, doc_id FROM s
         |  UNION
         |  SELECT CASE WHEN r.node = e.ea THEN e.eb ELSE e.ea END, r.root
         |  FROM reach r JOIN edges e ON r.node = e.ea OR r.node = e.eb),
         |cc AS (SELECT node, min(root) AS cluster_id FROM reach GROUP BY node)
         |SELECT source, count(*) AS n_docs, sum(ntok)::BIGINT AS total_tokens,
         |  round(avg(ntok), 2) AS avg_tokens
         |FROM s JOIN cc ON s.doc_id = cc.node
         |WHERE s.doc_id = cc.cluster_id
         |GROUP BY source ORDER BY source""".stripMargin,
    "q67_incremental_agg" ->
      """SELECT date_trunc('day', ts::TIMESTAMP) AS day, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q66_dedup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |edges AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |          FROM s a JOIN s b ON a.doc_id < b.doc_id
         |          WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |reach(node, root) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT CASE WHEN r.node = e.ea THEN e.eb ELSE e.ea END, r.root
         |  FROM reach r JOIN edges e ON r.node = e.ea OR r.node = e.eb)
         |SELECT node AS doc_id, min(root) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "q63_argminmax" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS top_order,
        |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS bottom_order,
        |  round(max(o_totalprice), 2) AS max_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q64_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS total_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q62_tfidf_keywords" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |dw AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM dw GROUP BY 1, 2),
         |dfreq AS (SELECT word, count(*) AS dfx FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tf.word,
         |    tf * (ln((n_docs + 1.0) / (dfx + 1.0)) + 1.0) AS score
         |  FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n)
         |SELECT doc_id, rk::INT AS rk, word, (round(score, 4) + 0.0) AS tfidf FROM (
         |  SELECT doc_id, word, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, word) AS rk
         |  FROM scored)
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q60_funnel" ->
      """WITH v AS (SELECT user_id, min(ts::TIMESTAMP) AS t0 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t1 FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts::TIMESTAMP >= v.t0
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2 FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts::TIMESTAMP >= c.t1
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "q202_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, length(seq)::BIGINT AS n_events,
        |  regexp_matches(seq, 'v.*c.*p') AS funnel_matched,
        |  len(regexp_extract_all(seq, 'v[^p]*p'))::BIGINT AS n_vp_runs
        |FROM s ORDER BY user_id""".stripMargin,
    "q61_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('day', min(ts::TIMESTAMP)) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP) AS day
        |      FROM events)
        |SELECT f.cohort, date_diff('day', f.cohort, a.day)::INT AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "q59_simhash_neardup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.sh, b.sh))::INT AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q342_prefixspan" ->
      """WITH ev AS (SELECT user_id, event_type AS t,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos
        |  FROM events),
        |nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n FROM ev),
        |mc AS (SELECT ceil(0.3 * n)::BIGINT AS m, n FROM nu),
        |l1 AS (SELECT user_id, t AS a, min(pos) AS fa FROM ev
        |  GROUP BY 1, 2),
        |l2 AS (SELECT l1.user_id, l1.a, ev.t AS b, min(ev.pos) AS fb
        |  FROM l1 JOIN ev ON l1.user_id = ev.user_id
        |    AND ev.pos > l1.fa
        |  GROUP BY 1, 2, 3),
        |l3 AS (SELECT DISTINCT l2.user_id, l2.a, l2.b, ev.t AS c
        |  FROM l2 JOIN ev ON l2.user_id = ev.user_id
        |    AND ev.pos > l2.fb),
        |u AS (
        |  SELECT a AS pattern, count(*)::BIGINT AS freq FROM l1
        |  GROUP BY 1
        |  UNION ALL
        |  SELECT a || '>' || b, count(*)::BIGINT FROM l2 GROUP BY 1
        |  UNION ALL
        |  SELECT a || '>' || b || '>' || c, count(*)::BIGINT FROM l3
        |  GROUP BY 1)
        |SELECT pattern, freq,
        |  round(freq / (SELECT n FROM mc)::DOUBLE, 4) AS support
        |FROM u WHERE freq >= (SELECT m FROM mc)
        |ORDER BY pattern""".stripMargin,
    "q151_frequent_itemsets" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS total FROM b),
        |i1 AS (SELECT p_brand AS items, count(*) AS freq FROM b GROUP BY 1),
        |i2 AS (SELECT x.p_brand || ',' || y.p_brand AS items, count(*) AS freq
        |  FROM b x JOIN b y
        |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
        |  GROUP BY 1),
        |u AS (SELECT * FROM i1 UNION ALL SELECT * FROM i2)
        |SELECT items, freq FROM u, n
        |WHERE freq >= ceil(0.015 * total)
        |ORDER BY items""".stripMargin,
    "q153_target_encoding" ->
      """WITH o AS (SELECT o_orderpriority, o_totalprice,
        |    ('0x' || substr(md5('fold:' || o_orderkey::VARCHAR), 1, 8))::BIGINT % 5 AS fold
        |  FROM orders),
        |g AS (SELECT o_orderpriority, fold, sum(o_totalprice) AS s, count(*) AS n
        |  FROM o GROUP BY o_orderpriority, fold)
        |SELECT o_orderpriority, fold, n AS n_rows,
        |  (round((sum(s) OVER (PARTITION BY o_orderpriority) - s) /
        |        (sum(n) OVER (PARTITION BY o_orderpriority) - n), 4) + 0.0) AS encoding
        |FROM g ORDER BY o_orderpriority, fold""".stripMargin,
    "q154_dedup_survivors" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |edges AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |reach(node, root) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT CASE WHEN r.node = e.ea THEN e.eb ELSE e.ea END, r.root
         |  FROM reach r JOIN edges e ON r.node = e.ea OR r.node = e.eb),
         |cl AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
         |tok AS (SELECT doc_id, len($toksSql)::BIGINT AS n_tokens FROM documents)
         |SELECT cluster_id, count(*) AS n_members,
         |  arg_max(cl.doc_id, n_tokens * 10000000 + cl.doc_id) AS survivor_id,
         |  max(n_tokens) AS survivor_tokens
         |FROM cl JOIN tok ON cl.doc_id = tok.doc_id
         |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "q180_typed_cogroup" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  count(l.l_orderkey) AS n_items,
        |  coalesce(sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100
        |    + 0.5)::BIGINT), 0) / 100.0 AS items_net
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin,
    "q181_exists_subquery" ->
      """SELECT c_custkey, c_nationkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q182_ntile" ->
      """WITH q AS (SELECT l_returnflag, l_extendedprice,
        |    ntile(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS quartile
        |  FROM lineitem)
        |SELECT l_returnflag, quartile, count(*) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM q GROUP BY 1, 2 ORDER BY l_returnflag, quartile""".stripMargin,
    "q172_pagerank" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |sym AS (SELECT ea AS src, eb AS dst FROM e
         |        UNION ALL SELECT eb, ea FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |n AS (SELECT count(*)::DOUBLE AS nn FROM deg),
         |p0 AS (SELECT src AS node, deg, (SELECT 1.0 / nn FROM n) AS p FROM deg),
         |p1 AS (SELECT d.src AS node, d.deg,
         |    (SELECT 0.15 / nn FROM n) + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p0.p / p0.deg) AS sin
         |    FROM p0 JOIN sym ON p0.node = sym.src GROUP BY sym.dst) c
         |  ON c.node = d.src),
         |p2 AS (SELECT d.src AS node, d.deg,
         |    (SELECT 0.15 / nn FROM n) + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p1.p / p1.deg) AS sin
         |    FROM p1 JOIN sym ON p1.node = sym.src GROUP BY sym.dst) c
         |  ON c.node = d.src),
         |p3 AS (SELECT d.src AS node, d.deg,
         |    (SELECT 0.15 / nn FROM n) + 0.85 * coalesce(c.sin, 0.0) AS p
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(p2.p / p2.deg) AS sin
         |    FROM p2 JOIN sym ON p2.node = sym.src GROUP BY sym.dst) c
         |  ON c.node = d.src)
         |SELECT node AS doc_id, (round(p, 4) + 0.0) AS pagerank, deg
         |FROM p3 ORDER BY pagerank DESC, doc_id LIMIT 25""".stripMargin,
    "q152_triangles" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, ($simhash32Sql)::BIGINT AS sh FROM t),
         |e AS (SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |nodes AS (SELECT count(DISTINCT n) AS n_nodes FROM
         |  (SELECT ea AS n FROM e UNION ALL SELECT eb FROM e)),
         |edges AS (SELECT count(*) AS n_edges FROM e),
         |tri AS (SELECT count(*) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e1.eb = e2.ea
         |    JOIN e e3 ON e1.ea = e3.ea AND e2.eb = e3.eb)
         |SELECT n_nodes, n_edges, n_triangles FROM nodes, edges, tri""".stripMargin,
    "q58_group_topk_agg" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part)
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q49_explode_wordcount" ->
      s"""SELECT word, count(*) AS n
         |FROM (SELECT unnest($toksSql) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin,
    "q50_pivot" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_not_spec,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q51_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  GROUPING_ID(o_orderstatus, o_orderpriority)::BIGINT AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q52_text_sim" ->
      """SELECT p_partkey, levenshtein(p_name, p_type) AS lev_dist,
        |  sha256(p_name) AS name_sha
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q53_map_funcs" ->
      """SELECT o_orderkey, o_orderpriority AS prio,
        |  2::INT AS m_size, 'status,priority' AS keys_csv
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q54_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('micro', 0.0, 50000.0), ('small', 50000.0, 100000.0),
        |  ('mid', 100000.0, 200000.0), ('large', 200000.0, 400000.0),
        |  ('huge', 400000.0, 600000.0))
        |SELECT band, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q55_month_series" ->
      """WITH months AS (
        |  SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
        |                                TIMESTAMP '2001-08-01',
        |                                INTERVAL 1 MONTH)) AS month_start),
        |counts AS (
        |  SELECT date_trunc('month', o_orderdate) AS month_start,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT months.month_start, coalesce(counts.n_orders, 0) AS n_orders
        |FROM months LEFT JOIN counts ON months.month_start = counts.month_start
        |ORDER BY months.month_start""".stripMargin,
    "q56_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 2) AS geo_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
