package graft.queries

import graft.Tables
import graft.ops.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 structural operators: explicit GROUPING SETS, UNPIVOT/melt,
  * window navigation (first/last/nth), ordered string aggregation, and
  * SRP-bucketed approximate nearest neighbors. Completes SURVEY.md §2.4
  * A4 (grouping sets beyond rollup/cube), §2.8 O3 (navigation window
  * functions), and §2.13 X3 (the LSH scale path next to q28's exact
  * baseline), each oracle-checked against DuckDB.
  */
object StructuralQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q74_grouping_sets — explicit GROUPING SETS ((returnflag),
    * (linestatus)): two independent groupings in ONE pass over the fact
    * table (Catalyst expands to a single Expand + hash aggregate — one
    * scan, one shuffle, vs two scans for separate groupBys).
    * grouping_id() disambiguates which set each row belongs to; the
    * bit convention (1 = column aggregated away) matches SQL-standard
    * GROUPING(a, b).
    */
  def q74GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** q75_unpivot — wide→long melt of a per-flag aggregate (the inverse
    * of q50's pivot). Unpivot is a zero-shuffle Expand over the input:
    * rows×measures output, no exchange beyond the upstream aggregate.
    */
  def q75Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_discount")), 2).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** q76_window_nav — navigation window functions over the FULL
    * partition frame: first_value / last_value / nth_value per
    * customer's order history. One shuffle on o_custkey; all three
    * functions share one window sort. The (o_orderdate, o_orderkey)
    * ordering is total, so nth_value is deterministic.
    */
  def q76WindowNav(s: SparkSession, dir: String): DataFrame = {
    val wf = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderdate")).over(wf).as("first_date"),
        last(col("o_orderdate")).over(wf).as("last_date"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q77_string_agg — ordered string aggregation (SQL string_agg /
    * listagg WITHIN GROUP): customer names per nation, ordered by
    * (acctbal, name) INSIDE the aggregate. Spark has no ordered
    * string_agg, so the scalable equivalent is collect_list of
    * (sortkey, value) structs + array_sort + project — the sort runs
    * per group AFTER the shuffle, on grouped arrays, not as a global
    * sort. Group payloads are bounded (≤ thousands of names); for
    * unbounded groups cap with a ranked-window top-k first.
    */
  def q77StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("c_acctbal"), col("c_name")))),
            _.getField("c_name")),
          "|").as("names"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("c_nationkey"))

  /** q78_ann_srp — approximate nearest neighbors via sign-random-
    * projection LSH (the scale path; q28/q44 are the exact baseline):
    * bucket = 4 sign bits of deterministic md5-derived hyperplane dot
    * products, probe ONLY the query's bucket. At corpus scale the probe
    * reads ~1/2^bits of the data (partition pruning when the corpus is
    * written bucketed) instead of every row. Planes are derived from
    * md5(plane:i) so the DuckDB oracle regenerates them bit-for-bit.
    */
  def q78AnnSrp(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftSparkExtensions.register(s)
    val emb = Tables.embeddings(s, dir)
    val bucketed = emb
      .withColumn("bucket", VectorOps.srpBucket(col("embedding"), 64, 4))
    val q = bucketed.filter(col("vec_id") === 2)
      .select(col("embedding").as("qv"), col("bucket"))
    bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= 2)
      .select(col("vec_id"),
        round(VectorOps.cosineNative(col("embedding"), col("qv")), 4).as("cos_sim"),
        VectorOps.cosineNative(col("embedding"), col("qv")).as("raw"))
      .orderBy(col("raw").desc, col("vec_id"))
      .limit(10)
      .drop("raw")
  }

  /** q84_ivf_topk — IVF (inverted-file) ANN probe (SURVEY §2.13 X10):
    * KMeans centroids partition the corpus into cells
    * (`VectorOps.ivfBuild`); the query ranks cells by centroid distance
    * on the driver and brute-forces only the probed cells' rows. At
    * corpus scale the cells are written as partitions, so an
    * nProbe-of-k probe reads nProbe/k of the data via partition
    * pruning. This manifest entry probes ALL cells (nProbe = k), which
    * is exact by construction — the DuckDB brute-force oracle
    * hash-checks the whole build+assign+probe path; partial-probe
    * recall (the approximate regime, not SQL-expressible) is covered
    * by SkewAndIvfSpec's subset/equality properties.
    */
  def q84IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val index = VectorOps.ivfBuild(emb, k = 8)
    VectorOps.ivfTopK(index, VectorOps.embeddingOf(s, dir, 5L),
      topK = 15, nProbe = 8)
  }

  /** q79_correlated_subquery — correlated scalar subquery through
    * spark.sql: orders above 2× THEIR customer's average price.
    * Exercises Catalyst's decorrelation (DecorrelateInnerQuery rewrites
    * the per-row subquery into one aggregate + join — visible as a
    * single Aggregate⋈ in the optimized plan, never a per-row re-scan).
    */
  def q79CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q79")
    s.sql(
      """SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price
        |FROM orders_q79 o
        |WHERE o.o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |                            FROM orders_q79 o2
        |                            WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  /** q80_hash_sample — deterministic per-group sampling: keep the k=5
    * docs per language with the smallest md5(doc_id). Unlike seeded
    * rand() sampling this is reproducible across engines AND across
    * reruns/retries at scale (a retried task re-derives identical
    * output — rand()-based sampling under task retry is not exactly
    * reproducible), which is what corpus-subset selection needs.
    * One shuffle on lang; the ranked window keeps k rows per group.
    * Scale note: a window over a LOW-cardinality key sends each whole
    * group to one reducer — for huge corpora restate on the k-bounded
    * `graft.functions.TopKAgg` aggregate (q58's shape): map-side
    * partial top-k makes the shuffle O(groups × k), not O(rows).
    */
  def q80HashSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** q81_salted_join — skew-resistant join (SkewOps.saltedJoin): the
    * customer side is replicated across 8 salts and order rows scatter
    * over them, so a hot customer key spreads across 8 reducers
    * instead of one straggler. Result is identical to the plain join
    * (the oracle computes the unsalted form); only the partitioning
    * differs. Companion to q64's salted aggregation.
    */
  def q81SaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.SkewOps.saltedJoin(
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
      Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment")),
      "o_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("c_mktsegment"))

  /** q82_clean_text — the reference's `clean_text` Python UDF
    * (`complaints_narrative_LDA.py:44-57`: lowercase → drop xxxx
    * redactions → strip non-alpha → drop length-≤1 tokens) as pure
    * codegen'd expressions (`TopicPipeline.cleanText`) — no Python
    * worker round trip, no serialization wall. Output is the cleaned
    * token count + md5 of the joined tokens so the oracle confirms the
    * EXACT token sequence without shipping megabytes through the
    * comparator.
    */
  def q82CleanText(s: SparkSession, dir: String): DataFrame = {
    val cleaned = graft.ml.TopicPipeline.cleanText("text")
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"),
        size(cleaned).cast("long").as("n_clean_tokens"),
        md5(array_join(cleaned, " ")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  /** q83_multimodal_features — the multimodal pipeline end-to-end
    * (SURVEY §2.13 X5 / MultimodalOps): binary media rows → partition-
    * local feature extraction (one codec per partition, payload never
    * shuffled) → per-modality corpus stats. The media plumbing IS
    * SQL-replayable (payload = UTF-8 text bytes, modality = doc_id%3),
    * so item counts and byte totals hash against DuckDB; the stub
    * codec's feature VALUES are not SQL-expressible, so they enter as
    * contract flags (dim = 16, finite f0) the oracle asserts literally
    * true. Codec determinism is asserted in MultimodalOpsSpec.
    */
  def q83MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.MultimodalOps
    val media = MultimodalOps.syntheticMedia(s, dir)
    MultimodalOps.extractFeatures(media, MultimodalOps.StubCodec, dim = 16,
        parallelism = s.sparkContext.defaultParallelism)
      .toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        every(size(col("feature")) === 16).as("dim_ok"),
        // "finite" means finite: reject NaN AND ±Infinity (abs(x) <
        // +Inf is false for +Inf and for NaN, but NaN is checked
        // explicitly for clarity)
        every(!isnan(element_at(col("feature"), 1)) &&
          abs(element_at(col("feature"), 1).cast("double")) <
            lit(Double.PositiveInfinity)).as("f0_finite_ok"))
      .orderBy(col("modality"))
  }

  /** q132_partitioned_sink — partitioned file sink + partition-pruned
    * read-back (S5 extension): events written `partitionBy(day)`, one
    * day read back through the partition filter — the scan touches ONE
    * directory regardless of corpus size (the layout that makes daily
    * incremental processing O(day), not O(history), at 100 TB).
    * PartitionFilters pruning is asserted in PlanQualitySpec; the
    * aggregate is oracle-checked against the unpartitioned source.
    */
  def q132PartitionedSink(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q132_part_" + graft.ops.Staging.corpusKey(dir)
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    s.read.parquet(path)
      .filter(col("day") === "2024-01-15")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** q201_dpp_join — DYNAMIC partition pruning: q132's static literal
    * filter generalized to a partition filter only known at runtime.
    * The day-partitioned fact joins a selective dim (the campaign days,
    * a literal day-of-month IN-list over the distinct event days);
    * Catalyst inserts a `dynamicpruning` subquery into the fact scan's
    * PartitionFilters reusing the dim's broadcast, so only the 3
    * matching day directories are read — at 100 TB the fact scan is
    * O(selected partitions) with no literal in sight. Asserted in
    * PlanQualitySpec; aggregate oracle-checked against the
    * unpartitioned source.
    */
  def q201DppJoin(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q201_dpp_" + graft.ops.Staging.corpusKey(dir)
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    val fact = s.read.parquet(path)
    val dim = Tables.events(s, dir)
      .select(to_date(col("ts")).cast("string").as("day")).distinct()
      .filter(dayofmonth(to_date(col("day"))).isin(5, 15, 25))
    fact.join(broadcast(dim), Seq("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** q163_range_export — deterministic range-sharded sorted export: the
    * ordered-output sink (data lake snapshots, downstream merge-readers)
    * without `orderBy`'s single global sort pipeline. Shard fences come
    * from `StatOps.exactPercentiles` (deterministic, engine-portable —
    * `repartitionByRange`'s sampled boundaries are not), rows route to
    * their shard by broadcast fence compare, each shard sorts LOCALLY
    * (`sortWithinPartitions`), and `partitionBy(shard)` writes one
    * directory per shard. Read-back per-shard min/max prove the ranges
    * tile: file order within a shard + shard numbering = total order,
    * no stage ever saw more than 1/k of the data.
    */
  def q163RangeExport(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q163_range_" + graft.ops.Staging.corpusKey(dir)
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val fences = graft.ops.StatOps.exactPercentiles(
      li.withColumn("__g", lit(1)), "__g", "l_extendedprice",
      Seq("f1" -> 0.25, "f2" -> 0.5, "f3" -> 0.75)).drop("__g")
    li.crossJoin(broadcast(fences))
      .withColumn("shard",
        when(col("l_extendedprice") <= col("f1"), 1)
          .when(col("l_extendedprice") <= col("f2"), 2)
          .when(col("l_extendedprice") <= col("f3"), 3).otherwise(4))
      .drop("f1", "f2", "f3")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("l_extendedprice"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    s.read.parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy(col("shard"))
  }

  /** q203_global_seq — scalable GLOBAL row numbering: the reference's
    * `rdd.zipWithIndex` (init.py:29) and the naive unpartitioned
    * `row_number() OVER (ORDER BY …)` both funnel the corpus through
    * one task; this is the distributed rewrite, expressed as a
    * cumulative count of ones through the generalized shard-offset op
    * ([[graft.ops.StatOps.shardedCumsum]]): percentile fences route
    * rows to k ordered shards, ranks are computed per-SHARD (balanced
    * window partitions), and a k-row running-offset table broadcast
    * back lifts local ranks to global. No stage sees more than ~1/k of
    * the data; k scales with the cluster. event_id is unique, so the
    * cumulative count IS row_number over the total order.
    */
  def q203GlobalSeq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("event_type"))
      .withColumn("__one", lit(1L))
    graft.ops.StatOps.shardedCumsum(e, "event_id",
        Seq("__one" -> "global_seq"))
      .select(col("event_id"), col("event_type"), col("global_seq"))
      .orderBy(col("event_id"))
  }

  /** q176_pca — PCA dimensionality reduction over the embeddings table
    * (`org.apache.spark.ml.feature.PCA`, k = dim = 64). The covariance
    * pass is one distributed Gramian aggregation; the dim×dim
    * eigensolve is driver-local — the right split at 100 TB, where
    * rows are billions but dim is hundreds. Eigenvectors are
    * sign-ambiguous across solvers, so the manifest hashes what IS
    * engine-independent (the q200 tolerance-flag pattern): the
    * covariance TRACE recomputed from the data (= Σ per-dim sample
    * variances, replayed by DuckDB), plus flags for the full-rank PCA
    * identities — Σ explained-variance ratios = 1, orthonormal
    * loadings, non-increasing spectrum. Per-component numeric
    * invariants stay in `FeatureSurfaceSpec`.
    */
  def q176Pca(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val k = 64
    val emb = Tables.embeddings(s, dir)
      .select(transform(col("embedding"), _.cast("double")).as("emb"))
    val model = new PCA().setInputCol("features").setOutputCol("pc")
      .setK(k).fit(emb.select(array_to_vector(col("emb")).as("features")))
    val ev = model.explainedVariance.toArray
    val pcNorms = (0 until k).map { j =>
      math.sqrt((0 until model.pc.numRows)
        .map(i => model.pc(i, j) * model.pc(i, j)).sum)
    }
    val evsumOk = math.abs(ev.sum - 1.0) < 1e-9
    val normsOk = pcNorms.forall(n => math.abs(n - 1.0) < 1e-9)
    val sortedOk = ev.sliding(2).forall(p => p(0) >= p(1) - 1e-12)
    // trace from the DATA, same arithmetic as the DuckDB replay:
    // posexplode → per-dim sample variance → sum
    val trace = emb
      .select(posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(var_samp(col("v")).as("pvar"))
      .agg((round(sum(col("pvar")), 4) + lit(0.0)).as("trace"))
    trace.select(lit(k).as("n_components"), col("trace"),
      lit(evsumOk).as("evsum_ok"), lit(normsOk).as("norms_ok"),
      lit(sortedOk).as("ev_sorted_ok"))
  }

  /** q210_shard_stats — the data-skipping stats manifest
    * (`StatOps.shardStats`): per-shard row count + min/max/null-count
    * of the sort key and the value column, the per-file metadata a
    * lake writer (Delta/Iceberg-style) maintains so readers prune
    * shards from predicates alone. ONE map-side-combined aggregation;
    * |shards| output rows regardless of input size — the planning
    * frame that turns "scan 100 TB" into "scan the 3 files whose
    * [min,max] straddle the predicate".
    */
  def q210ShardStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.shardStats(Tables.lineitem(s, dir),
      pmod(col("l_orderkey"), lit(16L)),
      Seq("l_orderkey", "l_extendedprice"))
      .select(col("shard"), col("n_rows"),
        col("l_orderkey_min"), col("l_orderkey_max"),
        col("l_orderkey_nulls"),
        round(col("l_extendedprice_min"), 2).as("price_min"),
        round(col("l_extendedprice_max"), 2).as("price_max"))
      .orderBy(col("shard"))

  /** q219_pivot — the `groupBy().pivot()` API surface explicitly
    * (M16 uses it inside the confusion matrix): order counts per
    * priority pivoted by status, with the pivot VALUES pinned
    * (`Seq("F","O","P")`) — the scale-safe form, which skips the
    * distinct-scan job Spark otherwise runs to discover the column
    * set and fixes the output schema regardless of data. Absent cells
    * coalesce to 0 to match SQL's conditional-count semantics.
    */
  def q219Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))

  /** q187_union_evolve — schema-drift union: two batches with
    * different column sets merged via
    * `unionByName(allowMissingColumns = true)` (the READ-side sibling
    * of q144's mergeSchema) — missing columns null-fill, no history
    * rewrite. The report counts rows and non-null presence per column
    * per batch. DuckDB's UNION ALL BY NAME replays it.
    */
  def q187UnionEvolve(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val v1 = ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("batch", lit("v1"))
    val v2 = ord.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")) // the column added in v2
      .withColumn("batch", lit("v2"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("batch"))
  }

  /** q192_snapshot_diff — table-version diff report: per-customer
    * order summaries of two period snapshots full-outer-joined on the
    * key and classified added / removed / changed / unchanged — the
    * audit that validates an incremental re-publish against the prior
    * release (q121's MERGE is the write path; this is the read-side
    * reconciliation). Both snapshots aggregate map-side on the same
    * key the join shuffles on, so each side is one exchange and the
    * diff is co-partitioned — at 100 TB no row ever moves twice.
    */
  def q192SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def snap(lo: String, hi: String, p: String) =
      o.filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(s"${p}_orders"),
          round(sum(col("o_totalprice")), 2).as(s"${p}_total"))
    snap("1995-01-01", "1998-01-01", "a")
      .join(snap("1998-01-01", "2001-01-01", "b"),
        Seq("o_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("a_orders").isNull, lit("added"))
          .when(col("b_orders").isNull, lit("removed"))
          .when(col("a_orders") === col("b_orders") &&
            col("a_total") === col("b_total"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_customers"),
        (round(sum(coalesce(col("b_total"), lit(0.0)) -
          coalesce(col("a_total"), lit(0.0))), 2) + lit(0.0)).as("net_delta"))
      .orderBy(col("change_type"))
  }

  /** q184_bucketed_neardup — embedding near-dup detection, the SCALE
    * path (q45 is the exact all-pairs baseline): candidate pairs form
    * only WITHIN an SRP sign bucket (same 4-bit bucket ⇒ same side of
    * all 4 hyperplanes — cosine-similar vectors collide with high
    * probability), then exact cosine verifies. The bucket equi-join
    * replaces q45's corpus² cross join; at 100 TB the corpus is
    * written bucketed and each bucket joins co-located. Same 0.4
    * threshold as q45, so the two outputs measure the probe's recall
    * directly.
    */
  def q184BucketedNearDup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftSparkExtensions.register(s)
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket", VectorOps.srpBucket(col("embedding"), 64, 4))
    val a = emb.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("__ea"))
    val b = emb.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("__eb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", VectorOps.cosineNative(col("__ea"), col("__eb")))
      .filter(col("__cos") >= 0.4)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 4).as("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q177_zorder — Z-order (Morton) data clustering: interleave the
    * bits of two columns' 10-bit equi-width buckets so that contiguous
    * z ranges are small in BOTH dimensions — the lakehouse layout trick
    * that makes multi-column range predicates prune files. Bucket
    * bounds are in-plan scalars; z is pure integer bit arithmetic
    * (engine-exact); the report groups by the top 4 z bits — contiguous
    * z ranges by construction, NO global sort/window anywhere. The
    * narrow per-bucket x AND y spans in the output are the locality
    * proof.
    */
  def q177Zorder(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_extendedprice").cast("double").as("x"),
        col("l_quantity").cast("double").as("y"))
    val mm = li.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    def bucket(v: org.apache.spark.sql.Column, mn: org.apache.spark.sql.Column,
               mx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(floor((v - mn) / (mx - mn) * 1024).cast("long"), lit(1023L))
    val z = (0 until 10).map { j =>
      shiftleft(shiftright(col("bx"), j).bitwiseAND(lit(1L)), 2 * j + 1) +
        shiftleft(shiftright(col("by"), j).bitwiseAND(lit(1L)), 2 * j)
    }.reduce(_ + _)
    li.crossJoin(broadcast(mm))
      .withColumn("bx", bucket(col("x"), col("xmn"), col("xmx")))
      .withColumn("by", bucket(col("y"), col("ymn"), col("ymx")))
      .withColumn("z_bucket", shiftright(z, 16))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("x")), 2).as("x_lo"), round(max(col("x")), 2).as("x_hi"),
        round(min(col("y")), 2).as("y_lo"), round(max(col("y")), 2).as("y_hi"))
      .orderBy(col("z_bucket"))
  }

  /** q173_skew_report — partition-skew diagnostic: simulate hash
    * partitioning of candidate shuffle keys into 32 reducers (portable
    * hash32 mod 32, so the oracle computes identical buckets) and
    * report per-key max/avg bucket sizes + skew ratio. The planning
    * query a pipeline runs BEFORE picking join/agg keys at 100 TB —
    * the skew it measures is what q64/q81's salting mitigates. Each
    * key's histogram is one map-side-combined count; the report is
    * buckets-sized.
    */
  def q173SkewReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    def report(keyName: String, key: org.apache.spark.sql.Column) =
      li.select(pmod(graft.ops.TextOps.hash32(key.cast("string"),
          seed = "part:"), lit(32L)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_buckets"),
          min(col("n")).as("min_rows"), max(col("n")).as("max_rows"),
          round(avg(col("n")), 2).as("avg_rows"),
          round(max(col("n")) / avg(col("n")), 4).as("skew_ratio"))
        .select(lit(keyName).as("key_name"), col("*"))
    report("l_orderkey", col("l_orderkey"))
      .unionByName(report("l_suppkey", col("l_suppkey")))
      .unionByName(report("l_returnflag", col("l_returnflag")))
      .orderBy(col("key_name"))
  }

  /** q135_bucketed_join — bucketed table sink + shuffle-free co-located
    * join (S5/C1 extension; the storage-layout half of the skew/shuffle
    * toolkit): both fact tables written `bucketBy(8, orderkey)` +
    * `sortBy`, so the join's children arrive pre-partitioned — the
    * sort-merge join runs with NO Exchange on either side (asserted
    * in PlanQualitySpec; a partition-local sort over the pre-sorted
    * per-file runs remains — the v3+ bucketed scan doesn't advertise
    * file order without the legacy outputOrdering conf). At 100 TB this is
    * THE pattern for repeated joins on a stable key: the shuffle is
    * paid once at write time, then every downstream join of the two
    * tables is exchange-free. The merge hint pins SMJ so the
    * demonstration doesn't degrade to broadcast on the small test SF.
    */
  def q135BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // table names forbid '.', so dot-stripped corpusKey (the CRC keeps
    // distinct dirs from colliding on one table name — advice r8)
    val sfx = graft.ops.Staging.corpusKey(dir).replace(".", "_")
    val (ordT, liT) = (s"g_orders_bkt_$sfx", s"g_lineitem_bkt_$sfx")
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .option("path", s"target/tmp/$ordT")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordT)
    Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .option("path", s"target/tmp/$liT")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
    s.table(liT).hint("merge")
      .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** q140_csv_roundtrip — CSV source/sink (S1 extension: the reference
    * reads schema-inferred JSON; real pipelines also land CSV). Orders
    * written as headered CSV, read back with an EXPLICIT schema (no
    * inference pass — at 100 TB schema inference is a full extra scan),
    * then aggregated; the oracle reads the original parquet, so the
    * hash match proves the text round trip is lossless (Spark prints
    * doubles as their shortest round-trippable decimal).
    */
  def q140CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q140_csv_" + graft.ops.Staging.corpusKey(dir)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("day"))
      .write.mode("overwrite").option("header", "true").csv(path)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING," +
        " o_totalprice DOUBLE, day DATE")
      .option("header", "true").csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .orderBy(col("o_orderstatus"))
  }

  /** q228_orc_roundtrip — ORC source/sink (S5's third format) as a
    * manifest query: q140's shape through `Ingest.writeOrc`/`readOrc`.
    * ORC shares Spark's vectorized-read + pushdown machinery with
    * parquet; the oracle reads the ORIGINAL parquet, so the hash match
    * proves the columnar round trip is lossless, and the predicate
    * exercises ORC filter pushdown on the read-back.
    */
  def q228OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q228_orc_" + graft.ops.Staging.corpusKey(dir)
    graft.sources.Ingest.writeOrc(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("day")),
      path)
    graft.sources.Ingest.readOrc(s, path)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .orderBy(col("o_orderstatus"))
  }

  /** q141_centroid_separation — per-class embedding centroids and the
    * inter-class cosine-separation matrix: the clustering / label-
    * quality diagnostic of an embedding store (well-separated classes
    * → low off-diagonal cosine). Centroids via `Summarizer.mean` over
    * ml vectors — ONE pass, no ×dim row explosion (the posexplode
    * formulation puts 64× the rows through the aggregate); the
    * labels-sized centroid frame then self-joins broadcast for the
    * pair matrix. O(labels²) output, O(corpus) input — scale-safe by
    * construction.
    */
  def q141CentroidSeparation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    graft.functions.GraftSparkExtensions.register(s)
    val cent = Tables.embeddings(s, dir)
      .select(col("label"), array_to_vector(col("embedding")).as("v"))
      .groupBy(col("label"))
      .agg(Summarizer.mean(col("v")).as("c"))
      .select(col("label"), vector_to_array(col("c")).as("c"))
    val a = cent.select(col("label").as("label_a"), col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("c").as("cb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(VectorOps.cosineNative(col("ca"), col("cb")), 4).as("cos_sim"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** q144_schema_evolution — mergeSchema read across batches written
    * with DIFFERENT schemas (the ingest reality of a long-lived corpus:
    * columns get added over time). An old batch (2 columns) and a new
    * batch (+o_orderpriority) land under one root; the merged read
    * unions the schemas, null-filling the old batch — no rewrite of
    * history. Schema merging is a footer-only operation (no data scan);
    * the explicit `coalesce` bucket for pre-schema rows keeps the
    * aggregate total — at 100 TB re-writing old batches to add a column
    * is exactly what this avoids.
    */
  def q144SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q144_evo_" + graft.ops.Staging.corpusKey(dir)
    val orders = Tables.orders(s, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$path/batch=1")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$path/batch=2")
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>"))
        .as("priority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("priority"))
  }

  /** q146_ann_recall — recall@10 of the SRP-LSH probe (q78's scale
    * path) against the exact top-10 (q100's batch kNN), per query:
    * what q95 is to MinHash, this is to similarity search — the eval
    * harness that decides whether the approximate index's parameters
    * (bits, planes) are good enough to trust at corpus scale.
    *
    * Scale shape: both sides are one corpus pass — exact via the
    * k-bounded TopKAgg (O(queries × k) exchange), ANN via the
    * bucket-equi-join probe — and the recall join is queries-sized.
    * Output counts only (no id arrays through the comparator).
    */
  def q146AnnRecall(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftSparkExtensions.register(s)
    val bucketed = Tables.embeddings(s, dir)
      .withColumn("bucket", VectorOps.srpBucket(col("embedding"), 64, 4))
      .localCheckpoint() // probed by 3 passes (queries, exact, ANN)
    val queries = bucketed.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qbucket"))
    val exact = VectorOps.batchTopK(bucketed.drop("bucket"),
        queries.drop("qbucket"), k = 10)
      .groupBy(col("query_id")).agg(collect_set(col("vec_id")).as("__ex"))
    val ann = bucketed.join(broadcast(queries), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(10)(
        VectorOps.cosineNative(col("embedding"), col("qv")),
        col("vec_id")).as("__tk"))
      .select(col("query_id"), col("__tk.ks").as("__ann"))
    exact.join(ann, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(size(col("__ann")), lit(0)).as("n_ann"),
        coalesce(size(array_intersect(col("__ex"), col("__ann"))), lit(0))
          .as("n_hit"))
      .withColumn("recall_at_10", round(col("n_hit") / 10.0, 4))
      .orderBy(col("query_id"))
  }

  /** q149_reservoir_sample — q80's deterministic per-group sample
    * restated on the k-bounded `TopKAgg` aggregate (the scale path
    * q80's Scaladoc documents): map-side partial top-k buffers make
    * the shuffle O(groups × k) instead of every row sorting under a
    * window. Selection is identical to q80 — the k smallest
    * md5(doc_id) per language; TopKAgg ranks by the NEGATED 48-bit
    * md5 prefix (exact in double; ties on doc_id asc match the
    * oracle's (md5, doc_id) order). Same oracle as q80.
    */
  def q149ReservoirSample(s: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("lang"), col("doc_id"),
        negate(conv(substring(md5(col("doc_id").cast("string")), 1, 12),
          16, 10).cast("double")).as("__pri"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopKAgg.topK(5)(col("__pri"), col("doc_id"))
        .as("__tk"))
      .select(col("lang"), explode(col("__tk.ks")).as("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  /** q317_recursive_bfs — WITH RECURSIVE breadth-first reachability
    * (Spark 4's recursive CTE support, exercised as engine surface the
    * way q79/q181 exercise subqueries): hop distance from the 'click'
    * node over the directed event-type transition graph (nodes =
    * event types, edges = consecutive types observed per user — the
    * q122 transition edges, distinct pairs only). The ONE corpus pass
    * is the lag-window transition extraction; the recursion then runs
    * on the ≤ |types|² edge frame, depth-capped at 3 with min(hop)
    * dedup outside (path enumeration on a cyclic graph must be
    * bounded — for big graphs the fixed-iteration BSP form (q172
    * PageRank, q280 label propagation) is the scale path; this is the
    * SQL-surface form for small reachability closures: org charts,
    * category trees, state machines).
    */
  def q317RecursiveBfs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("__next", lead(col("event_type"), 1).over(w))
      .filter(col("__next").isNotNull && col("__next") =!= col("event_type"))
      .select(col("event_type").as("src"), col("__next").as("dst"))
      .distinct()
      .createOrReplaceTempView("edges_q317")
    s.sql(
      """WITH RECURSIVE hops(node, hop) AS (
        |  SELECT 'click' AS node, 0 AS hop
        |  UNION ALL
        |  SELECT e.dst AS node, h.hop + 1
        |  FROM hops h JOIN edges_q317 e ON e.src = h.node
        |  WHERE h.hop < 3)
        |SELECT node, min(hop) AS hop FROM hops
        |GROUP BY node ORDER BY node""".stripMargin)
  }

  /** q318_lateral_topk — correlated LATERAL subquery with per-row
    * ORDER BY + LIMIT: each region's top-3 customers by account
    * balance. The SQL-standard spelling of "top-k per group" — Spark
    * plans the correlated limit as a ranked window under the hood
    * (same physical shape as q80's row_number filter), so the lateral
    * form costs nothing extra while reading as the business question.
    * Engine-surface exercise for DecorrelateLateralSubquery beside
    * q79 (correlated scalar) and q181 (EXISTS).
    */
  def q318LateralTopk(s: SparkSession, dir: String): DataFrame = {
    Tables.region(s, dir).createOrReplaceTempView("region_q318")
    Tables.nation(s, dir).createOrReplaceTempView("nation_q318")
    Tables.customer(s, dir).createOrReplaceTempView("customer_q318")
    s.sql(
      """SELECT r.r_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
        |FROM region_q318 r, LATERAL (
        |  SELECT c.c_name, c.c_acctbal
        |  FROM customer_q318 c
        |  JOIN nation_q318 n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3) t
        |ORDER BY r.r_name, acctbal DESC, t.c_name""".stripMargin)
  }

  /** q319_sql_udf — a SQL scalar function (CREATE OR REPLACE TEMPORARY
    * FUNCTION … RETURN, Spark 4 SQL UDFs) defining great-circle
    * haversine distance, applied to hash-synthesized customer
    * coordinates (lat ∈ ±60°, lon ∈ ±180°, md5-derived so both
    * engines reconstruct identical positions) to rank the 10
    * customers nearest the (0, 0) depot. SQL UDFs are declarative
    * macros — Catalyst inlines the body into the plan (full codegen,
    * pushdown-transparent), unlike black-box Scala UDFs; this is the
    * engine-surface demonstration that user abstractions don't cost
    * plan quality. Distance ordering is pinned by 4-dp rounding +
    * custkey tiebreak against libm last-bit drift.
    */
  def q319SqlUdf(s: SparkSession, dir: String): DataFrame = {
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION haversine_q319(
        |    lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
        |RETURNS DOUBLE
        |RETURN 2 * 6371.0088 * asin(sqrt(
        |  pow(sin(radians(lat2 - lat1) / 2), 2) +
        |  cos(radians(lat1)) * cos(radians(lat2)) *
        |    pow(sin(radians(lon2 - lon1) / 2), 2)))""".stripMargin)
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        ((pmod(graft.ops.TextOps.hash32(col("c_custkey").cast("string"),
          "lat:"), lit(1200000)) / 10000.0) - 60.0).as("lat"),
        ((pmod(graft.ops.TextOps.hash32(col("c_custkey").cast("string"),
          "lon:"), lit(3600000)) / 10000.0) - 180.0).as("lon"))
      .createOrReplaceTempView("custgeo_q319")
    s.sql(
      """SELECT c_custkey, round(lat, 4) AS lat, round(lon, 4) AS lon,
        |  round(__d, 2) AS dist_km
        |FROM (SELECT c_custkey, lat, lon,
        |    haversine_q319(lat, lon, 0.0, 0.0) AS __d
        |  FROM custgeo_q319)
        |ORDER BY round(__d, 4), c_custkey
        |LIMIT 10""".stripMargin)
  }

  /** q332_dynamic_overwrite — INSERT OVERWRITE with DYNAMIC partition
    * overwrite mode: the day-partitioned table is fully loaded, then
    * ONE day is re-stated (its values doubled — the classic late-data
    * correction) with `partitionOverwriteMode=dynamic`, which replaces
    * ONLY the partitions present in the incoming frame. Under the
    * default STATIC mode the same write would wipe every other day —
    * the aggregate over the re-read table (patched day vs rest) is
    * therefore a behavioral proof of the mode, not just a smoke test;
    * the oracle replays the corrected semantics relationally. The
    * bread-and-butter warehouse maintenance op beside q132 (static
    * partition sink) and q201 (DPP reads).
    */
  def q332DynamicOverwrite(s: SparkSession, dir: String): DataFrame = {
    val path = "target/tmp/q332_dynover_" +
      graft.ops.Staging.corpusKey(dir)
    val e = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("day"))
    e.write.mode("overwrite").partitionBy("day").parquet(path)
    val patch = e.filter(col("day") === "2024-01-15")
      .withColumn("value", col("value") * 2)
    val key = "spark.sql.sources.partitionOverwriteMode"
    // Try-snapshot like q338: a previously-UNSET conf must be restored
    // by unset(), not pinned to the default's current spelling.
    val prev = scala.util.Try(s.conf.get(key)).toOption
    s.conf.set(key, "dynamic")
    try patch.write.mode("overwrite").partitionBy("day").parquet(path)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
    s.read.parquet(path)
      .groupBy((col("day") === "2024-01-15").as("patched"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("patched"))
  }

  /** q333_reused_exchange — week-over-week comparison compiled with
    * ONE shuffle: the daily aggregate joins a 7-day-shifted copy of
    * ITSELF, and Catalyst's exchange reuse recognizes the two
    * identical aggregate subtrees, planning the second side as a
    * `ReusedExchange` over the first's shuffle output (asserted in
    * PlanQualitySpec). The canonical self-comparative report shape —
    * naive engines scan and shuffle the fact table twice; at 100 TB
    * exchange reuse halves both. Oracle replays the self-join.
    */
  def q333ReusedExchange(s: SparkSession, dir: String): DataFrame = {
    // both join sides must canonicalize to the SAME subtree for
    // exchange reuse: state the null filters the join would infer
    // (isnotnull(day), isnotnull(day+7)) in the shared base, so the
    // optimizer's constraint pushdown adds nothing asymmetric
    val base = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"))
      .filter(col("day").isNotNull &&
        date_add(col("day"), 7).isNotNull)
    val daily = base.groupBy(col("day")).agg(count(lit(1)).as("n"))
    val prev = daily.select(date_add(col("day"), 7).as("day"),
      col("n").as("n_prev"))
    daily.join(prev, Seq("day"))
      .select(col("day").cast("string").as("day"), col("n"),
        col("n_prev"),
        round(col("n") / col("n_prev").cast("double"), 4).as("wow"))
      .orderBy(col("day"))
  }

  /** q338_runtime_bloom_join — row-level runtime filtering: Catalyst's
    * InjectRuntimeFilter builds a Bloom filter over the SELECTIVE dim
    * side's join keys at runtime and pushes `might_contain` onto the
    * fact scan, so non-matching fact rows die before the shuffle — the
    * row-granular sibling of q201's partition-granular DPP, and the
    * optimization that makes selective fact⋈dim joins survive 100 TB
    * when the dim is too big to broadcast. Injection requires
    * shuffle-join geometry (creation side not broadcastable, probe
    * scan above the size threshold) — true by definition at the target
    * scale, forced here at fixture scale via the two confs; they are
    * set only around plan compilation (optimizedPlan is materialized,
    * then confs restored — the cached plan carries the filter).
    * PlanQualitySpec asserts `might_contain`; the aggregate is
    * oracle-checked.
    */
  def q338RuntimeBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(s.conf.get(k)).toOption }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_quantity"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 250000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val df = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("revenue"),
          sum(col("l_quantity")).cast("double").as("total_qty"))
        .orderBy(col("o_orderpriority"))
      df.queryExecution.optimizedPlan // force injection under the confs
      df
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** q339_join_hints — explicit join-strategy hints honored by the
    * planner: the same star join spelled twice, once with
    * `hint("shuffle_hash")` (ShuffledHashJoin — the right call when
    * both sides are large but one side's PER-PARTITION hash table
    * fits, avoiding SMJ's double sort) and once with `hint("merge")`
    * (SortMergeJoin — the safe default for huge×huge). Hints are how
    * an operator author pins the physical strategy when statistics
    * mislead the optimizer at scale; PlanQualitySpec asserts BOTH
    * operators appear. Results from the two spellings are unioned and
    * must agree with the single-oracle replay (each side is tagged).
    */
  def q339JoinHints(s: SparkSession, dir: String): DataFrame = {
    def agg(strategy: String): DataFrame = {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .hint(strategy)
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .withColumn("strategy", lit(strategy))
    }
    agg("shuffle_hash").unionByName(agg("merge"))
      .orderBy(col("strategy"), col("o_orderpriority"))
  }

  /** q343_int8_rerank — the quantized ANN rerank stage: SRP sign
    * buckets (q184's candidate generator) fan each of 10 query
    * vectors out to its bucket-mates, and candidates are re-scored
    * with the native `dot_int8` expression over `quantize_int8`
    * vectors — integer multiply-adds on the 4×-smaller representation,
    * EXACT accumulation (top-k is bit-identical on any engine or
    * partition order, unlike fp32 sums near ties). The fp32 cosine is
    * carried alongside as the rerank-quality readout. This is the
    * standard serving split at scale: cheap int8 scan over the
    * candidate sliver, full-precision only where the number is shown.
    * Both new kernels run fused inside WholeStageCodegen
    * (graft.functions.DotInt8 / QuantizeInt8).
    */
  def q343Int8Rerank(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftSparkExtensions.register(s)
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket",
        graft.ops.VectorOps.srpBucket(col("embedding"), 64, 4))
      .withColumn("__q8", call_function("quantize_int8", col("embedding")))
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("__q8").as("__qq"), col("embedding").as("__qe"))
    val cands = emb.select(col("vec_id").as("cand_id"), col("bucket"),
      col("__q8").as("__cq"), col("embedding").as("__ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_int8").desc, col("cand_id"))
    cands.join(broadcast(qs), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("dot_int8",
        call_function("dot_int8", col("__qq"), col("__cq")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 3)
      .select(col("query_id"), col("__rk").as("rank"), col("cand_id"),
        col("dot_int8"),
        round(graft.ops.VectorOps.cosineNative(col("__qe"), col("__ce")),
          4).as("cos_fp32"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q345_pipe_syntax — SQL pipe syntax (Spark 4's `|>` operator
    * chaining, from the GoogleSQL proposal): the same logical plan as
    * nested SELECTs, written as a linear dataflow — EXTEND computes a
    * derived column, WHERE filters, AGGREGATE groups, ORDER BY sorts,
    * each stage reading top-to-bottom the way the DataFrame API does.
    * Engine-surface exercise: the parser desugars pipes into the
    * ordinary operator tree, so optimization (pushdown through
    * EXTEND, partial aggregation) is identical to the classic
    * spelling the oracle uses.
    */
  def q345PipeSyntax(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q345")
    s.sql(
      """FROM orders_q345
        ||> EXTEND round(o_totalprice / 100000, 0) AS price_band
        ||> WHERE o_orderstatus = 'F'
        ||> AGGREGATE count(*) AS n,
        |     round(avg(o_totalprice), 2) AS avg_price
        |   GROUP BY o_orderpriority, price_band
        ||> ORDER BY o_orderpriority, price_band""".stripMargin)
  }

  /** q346_collated_group — collation-aware aggregation (Spark 4
    * collations): market segments are re-cased per row by a hash coin
    * flip, then grouped under UTF8_LCASE so 'BUILDING' and 'building'
    * land in ONE group while `COLLATE UTF8_BINARY` inside the group
    * still counts the distinct raw spellings. Collations push
    * case/accent semantics into the ENGINE's comparators (group-by,
    * joins, ORDER BY) instead of wrapping every column in lower() —
    * at scale that keeps codegen'd hash-aggregation on the raw bytes'
    * collation key rather than allocating a lowered copy per row.
    * Display key is lower(max(seg)) — deterministic since lowercase
    * sorts above uppercase in binary order.
    */
  def q346CollatedGroup(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        when(pmod(graft.ops.TextOps.hash32(
          col("c_custkey").cast("string"), "case:"), lit(2)) === 0,
          upper(col("c_mktsegment")))
          .otherwise(lower(col("c_mktsegment"))).as("seg"))
      .createOrReplaceTempView("custseg_q346")
    s.sql(
      """SELECT lower(max(seg)) AS segment, count(*) AS n,
        |  count(DISTINCT seg COLLATE UTF8_BINARY) AS n_case_variants
        |FROM custseg_q346
        |GROUP BY seg COLLATE UTF8_LCASE
        |ORDER BY segment""".stripMargin)
  }

  /** q347_param_sql — parameterized SQL (`spark.sql(text, args)`):
    * named `:parameters` bound server-side as typed literals, the
    * injection-safe alternative to string splicing — what every
    * programmatic query layer should emit. The bound plan is
    * identical to the literal spelling (constant folding, pushdown —
    * the parameter IS a literal by the time the optimizer runs), so
    * the oracle replays with the values inlined.
    */
  /** q409_execute_immediate — dynamic SQL through the Spark 4 SQL
    * scripting surface: session VARIABLEs (`DECLARE` / `SET VAR`)
    * hold the statement TEXT and the target table NAME, the statement
    * resolves its table through `IDENTIFIER(var)` (late-bound, but
    * injection-proof: the payload is an identifier, never spliced
    * text), and `EXECUTE IMMEDIATE ... USING` binds the positional
    * `?` parameter at run time — the metadata-driven-pipeline
    * pattern (table names from a config table, thresholds from a
    * job row) beside q347's static named-parameter binding. By
    * execution time the parameter IS a literal, so pushdown and
    * constant folding see the same plan as the inlined spelling,
    * which is exactly what the oracle replays.
    */
  /** q413_distribute_by — the DISTRIBUTE BY / SORT BY physical-layout
    * surface (Hive-inherited, still the canonical SQL spelling of
    * repartition + sortWithinPartitions): the inner SELECT pins a
    * hash distribution on l_suppkey and a within-partition sort, so
    * the downstream per-supplier window consumes an exchange the
    * query AUTHOR placed rather than one the planner infers — the
    * SQL-layer control for the write-then-window and
    * partition-align-before-merge patterns (q163's range export is
    * the DataFrame spelling). Catalyst recognizes the child
    * distribution, so the window adds no second exchange; the window
    * ordering is total (shipdate, orderkey, linenumber), making the
    * running sum deterministic, and the oracle replays the GROUP BY
    * algebra the running-sum endpoints must equal.
    */
  def q413DistributeBy(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_q413")
    s.sql(
      """WITH d AS (SELECT l_suppkey,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
        |    sum(l_quantity) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS running
        |  FROM (SELECT * FROM li_q413
        |        DISTRIBUTE BY l_suppkey
        |        SORT BY l_suppkey, l_shipdate, l_orderkey,
        |          l_linenumber))
        |SELECT l_suppkey, CAST(max(rn) AS BIGINT) AS n_lines,
        |  round(max(running), 2) AS total_qty
        |FROM d GROUP BY 1 ORDER BY l_suppkey LIMIT 10""".stripMargin)
  }

  def q409ExecuteImmediate(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q409")
    s.sql("DECLARE OR REPLACE VARIABLE graft_q409_tbl STRING " +
      "DEFAULT 'orders_q409'")
    s.sql("DECLARE OR REPLACE VARIABLE graft_q409_stmt STRING")
    s.sql(
      """SET VAR graft_q409_stmt =
        |  'SELECT o_orderpriority, count(*) AS n_orders,
        |     round(avg(o_totalprice), 2) AS avg_price,
        |     round(max(o_totalprice), 2) AS max_price
        |   FROM IDENTIFIER(graft_q409_tbl) WHERE o_totalprice >= ?
        |   GROUP BY o_orderpriority ORDER BY o_orderpriority'"""
        .stripMargin)
    s.sql("EXECUTE IMMEDIATE graft_q409_stmt USING 500.0")
  }

  def q347ParamSql(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q347")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders_q347
        |WHERE o_orderpriority = :prio OR o_totalprice > :minPrice
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      Map("prio" -> "1-URGENT", "minPrice" -> 400000.0))
  }

  /** q348_variant_type — the VARIANT data type (Spark 4's
    * semi-structured column): `parse_json` shreds the props JSON into
    * the binary variant encoding ONCE, then `variant_get` extracts
    * typed paths and `schema_of_variant` reports the per-row inferred
    * shape. Against q18's per-path `get_json_object` (which re-parses
    * the string for every path), variant parses once and serves every
    * downstream extraction from the binary form — the 100 TB answer
    * for hot semi-structured columns with many consumers. The oracle
    * replays the extraction through DuckDB's JSON type; the schema
    * string is asserted literally (every row shreds to
    * OBJECT<k: BIGINT>), pinning both the value semantics and the
    * inference surface.
    */
  def q348VariantType(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_q348")
    s.sql(
      """WITH v AS (SELECT event_id, parse_json(props) AS v
        |  FROM events_q348),
        |e AS (SELECT event_id,
        |    variant_get(v, '$.k', 'bigint') AS k,
        |    schema_of_variant(v) AS sch FROM v)
        |SELECT k DIV 10 AS k_band, count(*) AS n, sum(k) AS sum_k,
        |  count(DISTINCT sch) AS n_schemas,
        |  max(sch) AS variant_schema
        |FROM e GROUP BY k DIV 10
        |ORDER BY k_band""".stripMargin)
  }

  /** q349_group_by_all — GROUP BY ALL / ORDER BY ALL (Spark 4 SQL
    * surface, from the DuckDB proposal): every non-aggregate output
    * expression becomes a grouping key and the sort covers all output
    * columns left-to-right — the boilerplate-free spelling that cannot
    * drift out of sync with the SELECT list when columns are added.
    * Resolves at analysis time to the identical plan as the explicit
    * spelling the oracle uses.
    */
  def q349GroupByAll(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q349")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders_q349 GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** q368_xml_roundtrip — XML source/sink round trip through Spark 4's
    * BUILT-IN xml format (SPARK-44751; previously the external
    * spark-xml package), completing the source layer alongside
    * parquet/CSV/ORC (q132/q140/q228): orders are written
    * row-per-element, read back under an EXPLICIT schema (inference
    * would rescan and is banned in pinned pipelines — Ingest.readXml),
    * and rolled up; the oracle aggregates the original parquet, so any
    * value mangled by XML serialization (escaping, numeric text,
    * nulls) breaks the hash. Dates travel as ISO strings — the
    * round-trip contract is at the TEXT layer, so the reader's cast
    * back is part of what's certified.
    */
  def q368XmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val path = "target/tmp/q368_xml_" + graft.ops.Staging.corpusKey(dir)
    graft.sources.Ingest.writeXml(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          col("o_orderpriority")),
      path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType), StructField("day", StringType),
      StructField("o_orderpriority", StringType)))
    graft.sources.Ingest.readXml(s, path, schema)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        count_distinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy(col("o_orderstatus"))
  }

  /** q365_struct_surgery — nested-struct field surgery with
    * `Column.withField` / `dropFields` (SPARK-31317), the API for
    * evolving deeply nested schemas WITHOUT exploding and rebuilding
    * the whole struct (the pre-3.1 idiom that silently reorders
    * fields and breaks writers): orders are packed into a two-level
    * struct, a derived quarter field is grafted INTO the nested date
    * struct by path (`d.q`), a scaled-price field is added at the top
    * level, and the custkey field is dropped — then the query reads back
    * only through the surgically-modified paths, so the oracle (a flat
    * relational replay) certifies every graft/drop landed where
    * addressed. All scan-stage projection: Catalyst rewrites
    * withField/dropFields chains into a single UpdateFields
    * expression, no shuffle until the final rollup.
    */
  def q365StructSurgery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("meta", struct(
        col("o_orderpriority").as("prio"), col("o_custkey").as("cust"),
        struct(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m")).as("d")))
      .withColumn("meta", col("meta")
        .withField("d.q", quarter(col("o_orderdate")))
        .withField("pr_scaled",
          col("o_totalprice").cast("double") / 1000.0)
        .dropFields("cust"))
    // field census read from the ACTUAL post-surgery schema: 3 proves
    // the drop landed (prio, d, pr_scaled) and cust is gone
    val nFields = o.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fields.length
    o.groupBy(col("meta.d.y").as("year"), col("meta.d.q").as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("meta.pr_scaled")), 2).as("sum_price_k"),
        count_distinct(col("meta.prio")).as("n_priorities"),
        max(lit(nFields)).as("n_fields"))
      .orderBy(col("year"), col("qtr"))
  }


  /** q388_skew_join — AQE skew-join mitigation (X13's runtime
    * counterpart): a deliberately Zipf-skewed key (60% of lineitem on
    * one hot key) sort-merge-joined to its dimension with a MERGE hint
    * (broadcast disabled would mask the skew path). At scale,
    * AQE's OptimizeSkewedJoin detects the oversized partition at
    * runtime and splits it across reducers — no salting rewrite
    * needed (q64/q81 implement the MANUAL salting for engines/cases
    * without AQE); PlanQualitySpec executes this query under
    * tightened skew thresholds and asserts the SortMergeJoin carries
    * skew=true. Result is mitigation-invariant, so the oracle replays
    * the plain arithmetic.
    */
  def q388SkewJoin(s: SparkSession, dir: String): DataFrame = {
    // parallelize: a reducer partition splits along MAPPER boundaries,
    // so the skew path needs a genuinely multi-task upstream (a real
    // corpus has thousands; the single-file fixture has one row group)
    val f = Tables.parallelize(Tables.lineitem(s, dir))
      .select(when(col("l_orderkey") % 10 < 6, 0L)
        .otherwise(col("l_orderkey") % 1000 + 1).as("k"),
        col("l_quantity"), col("l_extendedprice"))
    val d = s.range(0, 1001).select(col("id").as("k"),
      (col("id") % 7).as("grp"))
    f.hint("MERGE").join(d, Seq("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("double").as("total_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("grp"))
  }


  /** q389_sql_scripting — SQL scripting (SPARK-48338, the SQL/PSM
    * surface GA'd in Spark 4): a BEGIN…END compound with DECLAREd
    * session variables and a WHILE loop computes an ITERATIVE trimmed
    * mean (3 rounds of "re-average everything ≤ 2× the previous mean"
    * — the poor-man's robust location estimate), then the final
    * statement reads the converged variable in a per-priority census.
    * Control flow lives in the SQL layer itself — no driver-side Scala
    * loop — which is what makes stored-procedure-style maintenance
    * jobs portable to pure-SQL runners; the oracle replays the loop
    * UNROLLED as three CTE stages. Each iteration is one scan-stage
    * aggregate; the variable is a broadcast scalar.
    */
  def q389SqlScripting(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q389")
    val key = "spark.sql.scripting.enabled"
    val prev = scala.util.Try(s.conf.get(key)).toOption
    s.conf.set(key, "true")
    try s.sql(
      """BEGIN
        |  DECLARE mu DOUBLE DEFAULT 0;
        |  DECLARE i INT DEFAULT 0;
        |  SET mu = (SELECT avg(o_totalprice) FROM orders_q389);
        |  WHILE i < 3 DO
        |    SET mu = (SELECT avg(o_totalprice) FROM orders_q389
        |              WHERE o_totalprice <= 2 * mu);
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT o_orderpriority, count(*) AS n_below,
        |    (round(mu, 2) + 0.0) AS trimmed_mu
        |  FROM orders_q389 WHERE o_totalprice <= mu
        |  GROUP BY o_orderpriority ORDER BY o_orderpriority;
        |END""".stripMargin)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }


  /** q392_sql_table_fn — SQL TABLE functions (SQL UDTF, SPARK-46246):
    * a declarative, parameterized "view with arguments" created in
    * pure SQL and invoked in FROM — including LATERAL-correlated
    * invocation where the argument comes from the outer row, the
    * pattern that replaces copy-pasted per-segment queries in a SQL
    * warehouse. The body expresses top-n as a ranked window (a
    * parameter cannot be a LIMIT operand — it must fold to a
    * constant), and the correlated invocation decorrelates to one
    * partitioned window over the fact, not a per-row re-scan.
    * Complements q319 (scalar SQL UDF) and q318 (LATERAL subquery).
    * Oracle replays with a per-priority window.
    */
  def q392SqlTableFn(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q392")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION top_orders_q392(
        |    p STRING, n INT)
        |  RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE)
        |  RETURN SELECT o_orderkey, o_totalprice FROM (
        |    SELECT o_orderkey, o_totalprice, row_number() OVER (
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |    FROM orders_q392 WHERE o_orderpriority = p)
        |  WHERE rk <= n""".stripMargin)
    s.sql(
      """SELECT pri, o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT DISTINCT o_orderpriority AS pri
        |      FROM orders_q392),
        |  LATERAL top_orders_q392(pri, 3)
        |ORDER BY pri, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q392_sql_table_fn" -> (q392SqlTableFn _),
    "q389_sql_scripting" -> (q389SqlScripting _),
    "q388_skew_join" -> (q388SkewJoin _),
    "q368_xml_roundtrip" -> (q368XmlRoundtrip _),
    "q365_struct_surgery" -> (q365StructSurgery _),
    "q348_variant_type" -> (q348VariantType _),
    "q349_group_by_all" -> (q349GroupByAll _),
    "q345_pipe_syntax" -> (q345PipeSyntax _),
    "q346_collated_group" -> (q346CollatedGroup _),
    "q347_param_sql" -> (q347ParamSql _),
    "q409_execute_immediate" -> (q409ExecuteImmediate _),
    "q413_distribute_by" -> (q413DistributeBy _),
    "q343_int8_rerank" -> (q343Int8Rerank _),
    "q338_runtime_bloom_join" -> (q338RuntimeBloomJoin _),
    "q339_join_hints" -> (q339JoinHints _),
    "q332_dynamic_overwrite" -> (q332DynamicOverwrite _),
    "q333_reused_exchange" -> (q333ReusedExchange _),
    "q317_recursive_bfs" -> (q317RecursiveBfs _),
    "q318_lateral_topk" -> (q318LateralTopk _),
    "q319_sql_udf" -> (q319SqlUdf _),
    "q135_bucketed_join" -> (q135BucketedJoin _),
    "q140_csv_roundtrip" -> (q140CsvRoundtrip _),
    "q141_centroid_separation" -> (q141CentroidSeparation _),
    "q144_schema_evolution" -> (q144SchemaEvolution _),
    "q146_ann_recall" -> (q146AnnRecall _),
    "q149_reservoir_sample" -> (q149ReservoirSample _),
    "q82_clean_text" -> (q82CleanText _),
    "q83_multimodal_features" -> (q83MultimodalFeatures _),
    "q132_partitioned_sink" -> (q132PartitionedSink _),
    "q201_dpp_join" -> (q201DppJoin _),
    "q203_global_seq" -> (q203GlobalSeq _),
    "q163_range_export" -> (q163RangeExport _),
    "q173_skew_report" -> (q173SkewReport _),
    "q176_pca" -> (q176Pca _),
    "q177_zorder" -> (q177Zorder _),
    "q184_bucketed_neardup" -> (q184BucketedNearDup _),
    "q187_union_evolve" -> (q187UnionEvolve _),
    "q210_shard_stats" -> (q210ShardStats _),
    "q219_pivot" -> (q219Pivot _),
    "q228_orc_roundtrip" -> (q228OrcRoundtrip _),
    "q192_snapshot_diff" -> (q192SnapshotDiff _),
    "q74_grouping_sets" -> (q74GroupingSets _),
    "q75_unpivot" -> (q75Unpivot _),
    "q76_window_nav" -> (q76WindowNav _),
    "q77_string_agg" -> (q77StringAgg _),
    "q78_ann_srp" -> (q78AnnSrp _),
    "q79_correlated_subquery" -> (q79CorrelatedSubquery _),
    "q80_hash_sample" -> (q80HashSample _),
    "q81_salted_join" -> (q81SaltedJoin _),
    "q84_ivf_topk" -> (q84IvfTopK _),
  )

  private def h32(expr: String, seed: String = ""): String =
    s"('0x' || substr(md5('$seed' || $expr), 1, 8))::BIGINT"

  // shared q78/q184/q232 replay: md5-derived hyperplanes -> 4-bit SRP
  // bucket (label carried through for the label-consensus consumers)
  private[queries] val srpBucketCte: String =
    """WITH planes AS (
      |  SELECT j, list_transform(range(0, 64), i ->
      |    (('0x' || substr(md5('plane' || j || ':' || i), 1, 8))::BIGINT)::DOUBLE / 2147483648 - 1) AS plane
      |  FROM (SELECT unnest(range(0, 4)) AS j)),
      |b AS (
      |  SELECT vec_id, label, embedding,
      |    (SELECT sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
      |                THEN 1 << p.j ELSE 0 END)::BIGINT FROM planes p) AS bucket
      |  FROM embeddings e)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q392_sql_table_fn" ->
      """WITH r AS (SELECT o_orderpriority AS pri, o_orderkey,
        |    o_totalprice, row_number() OVER (
        |      PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |SELECT pri, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM r WHERE rk <= 3
        |ORDER BY pri, o_totalprice DESC, o_orderkey""".stripMargin,
    "q389_sql_scripting" ->
      """WITH m0 AS (SELECT avg(o_totalprice) AS mu FROM orders),
        |m1 AS (SELECT avg(o_totalprice) AS mu FROM orders, m0
        |  WHERE o_totalprice <= 2 * m0.mu),
        |m2 AS (SELECT avg(o_totalprice) AS mu FROM orders, m1
        |  WHERE o_totalprice <= 2 * m1.mu),
        |m3 AS (SELECT avg(o_totalprice) AS mu FROM orders, m2
        |  WHERE o_totalprice <= 2 * m2.mu)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_below,
        |  (round(m3.mu, 2) + 0.0) AS trimmed_mu
        |FROM orders, m3 WHERE o_totalprice <= m3.mu
        |GROUP BY o_orderpriority, m3.mu
        |ORDER BY o_orderpriority""".stripMargin,
    "q388_skew_join" ->
      """WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
        |      ELSE l_orderkey % 1000 + 1 END AS k,
        |    l_quantity, l_extendedprice FROM lineitem)
        |SELECT (k % 7)::BIGINT AS grp, count(*)::BIGINT AS n_lines,
        |  sum(l_quantity)::DOUBLE AS total_qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q368_xml_roundtrip" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n,
        |  round(sum(o_totalprice::DOUBLE), 2) AS total_price,
        |  min(strftime(o_orderdate::DATE, '%Y-%m-%d')) AS first_day,
        |  max(strftime(o_orderdate::DATE, '%Y-%m-%d')) AS last_day,
        |  count(DISTINCT o_orderpriority)::BIGINT AS n_priorities
        |FROM orders WHERE o_totalprice::DOUBLE > 1000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q365_struct_surgery" ->
      """SELECT extract(year FROM o_orderdate::DATE)::INT AS year,
        |  extract(quarter FROM o_orderdate::DATE)::INT AS qtr,
        |  count(*)::BIGINT AS n_orders,
        |  round(sum(o_totalprice::DOUBLE / 1000.0), 2) AS sum_price_k,
        |  count(DISTINCT o_orderpriority)::BIGINT AS n_priorities,
        |  3 AS n_fields
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q348_variant_type" ->
      """WITH e AS (SELECT event_id,
        |    (props::JSON ->> 'k')::BIGINT AS k,
        |    'OBJECT<k: BIGINT>' AS sch FROM events)
        |SELECT k // 10 AS k_band, count(*)::BIGINT AS n,
        |  sum(k)::BIGINT AS sum_k,
        |  count(DISTINCT sch)::BIGINT AS n_schemas,
        |  max(sch) AS variant_schema
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q349_group_by_all" ->
      """SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS n,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q345_pipe_syntax" ->
      """SELECT o_orderpriority,
        |  round(o_totalprice / 100000, 0) AS price_band,
        |  count(*)::BIGINT AS n,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q346_collated_group" ->
      """WITH s AS (SELECT CASE WHEN
        |    ('0x' || substr(md5('case:' || c_custkey::VARCHAR), 1, 8))
        |      ::BIGINT % 2 = 0
        |    THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END
        |      AS seg
        |  FROM customer)
        |SELECT lower(max(seg)) AS segment, count(*)::BIGINT AS n,
        |  count(DISTINCT seg)::BIGINT AS n_case_variants
        |FROM s GROUP BY lower(seg) ORDER BY segment""".stripMargin,
    "q347_param_sql" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' OR o_totalprice > 400000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q409_execute_immediate" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  round(avg(o_totalprice), 2) AS avg_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders WHERE o_totalprice >= 500.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q413_distribute_by" ->
      """SELECT l_suppkey, count(*)::BIGINT AS n_lines,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_suppkey
        |LIMIT 10""".stripMargin,
    "q343_int8_rerank" ->
      s"""$srpBucketCte,
        |qz AS (SELECT vec_id, bucket, embedding,
        |    CASE WHEN greatest(list_max(embedding),
        |        -list_min(embedding)) = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding, x ->
        |        floor(x / greatest(list_max(embedding),
        |          -list_min(embedding))::DOUBLE * 127.0 + 0.5)::INT)
        |    END AS q8
        |  FROM b),
        |q AS (SELECT vec_id AS query_id, bucket, q8 AS qq,
        |    embedding AS qe
        |  FROM qz WHERE vec_id < 10),
        |c AS (SELECT qz.vec_id AS cand_id, q.query_id,
        |    list_dot_product(q.qq::DOUBLE[], qz.q8::DOUBLE[])::BIGINT
        |      AS dot_int8,
        |    list_cosine_similarity(q.qe::DOUBLE[],
        |      qz.embedding::DOUBLE[]) AS cos
        |  FROM q JOIN qz ON q.bucket = qz.bucket
        |    AND qz.vec_id <> q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot_int8 DESC, cand_id) AS rk FROM c)
        |SELECT query_id, rk AS rank, cand_id, dot_int8,
        |  round(cos, 4) AS cos_fp32
        |FROM r WHERE rk <= 3 ORDER BY query_id, rank""".stripMargin,
    "q338_runtime_bloom_join" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |  round(sum(l_extendedprice), 2) AS revenue,
        |  sum(l_quantity)::DOUBLE AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q339_join_hints" ->
      """WITH base AS (
        |  SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |    round(sum(l_extendedprice), 2) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT o_orderpriority, n_lines, revenue,
        |  'shuffle_hash' AS strategy FROM base
        |UNION ALL
        |SELECT o_orderpriority, n_lines, revenue,
        |  'merge' AS strategy FROM base
        |ORDER BY strategy, o_orderpriority""".stripMargin,
    "q332_dynamic_overwrite" ->
      """SELECT (ts::DATE = DATE '2024-01-15') AS patched,
        |  count(*)::BIGINT AS n,
        |  (round(sum(CASE WHEN ts::DATE = DATE '2024-01-15'
        |    THEN value * 2 ELSE value END), 2) + 0.0) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q333_reused_exchange" ->
      """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |p AS (SELECT day + 7 AS day, n AS n_prev FROM d)
        |SELECT d.day::VARCHAR AS day, d.n, p.n_prev,
        |  round(d.n / p.n_prev::DOUBLE, 4) AS wow
        |FROM d JOIN p USING (day) ORDER BY day""".stripMargin,
    "q317_recursive_bfs" ->
      """WITH RECURSIVE ev AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |edges AS (SELECT DISTINCT event_type AS src, nxt AS dst
        |  FROM ev WHERE nxt IS NOT NULL AND nxt <> event_type),
        |hops(node, hop) AS (
        |  SELECT 'click' AS node, 0 AS hop
        |  UNION ALL
        |  SELECT e.dst AS node, h.hop + 1
        |  FROM hops h JOIN edges e ON e.src = h.node
        |  WHERE h.hop < 3)
        |SELECT node, min(hop) AS hop FROM hops
        |GROUP BY node ORDER BY node""".stripMargin,
    "q318_lateral_topk" ->
      """SELECT r.r_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
        |FROM region r, LATERAL (
        |  SELECT c.c_name, c.c_acctbal
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3) t
        |ORDER BY r.r_name, acctbal DESC, t.c_name""".stripMargin,
    "q319_sql_udf" ->
      """WITH g AS (SELECT c_custkey,
        |    (('0x' || substr(md5('lat:' || c_custkey::VARCHAR), 1, 8))
        |      ::BIGINT % 1200000) / 10000.0 - 60.0 AS lat,
        |    (('0x' || substr(md5('lon:' || c_custkey::VARCHAR), 1, 8))
        |      ::BIGINT % 3600000) / 10000.0 - 180.0 AS lon
        |  FROM customer),
        |d AS (SELECT c_custkey, lat, lon,
        |    2 * 6371.0088 * asin(sqrt(
        |      pow(sin(radians(0.0 - lat) / 2), 2) +
        |      cos(radians(lat)) * cos(radians(0.0)) *
        |        pow(sin(radians(0.0 - lon) / 2), 2))) AS dist
        |  FROM g)
        |SELECT c_custkey, round(lat, 4) AS lat, round(lon, 4) AS lon,
        |  round(dist, 2) AS dist_km
        |FROM d ORDER BY round(dist, 4), c_custkey LIMIT 10"""
        .stripMargin,
    "q228_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  min(o_orderdate::DATE) AS first_day,
        |  max(o_orderdate::DATE) AS last_day
        |FROM orders WHERE o_totalprice > 1000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q219_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q210_shard_stats" ->
      """SELECT l_orderkey % 16 AS shard, count(*) AS n_rows,
        |  min(l_orderkey) AS l_orderkey_min,
        |  max(l_orderkey) AS l_orderkey_max,
        |  count(CASE WHEN l_orderkey IS NULL THEN 1 END)
        |    AS l_orderkey_nulls,
        |  round(min(l_extendedprice), 2) AS price_min,
        |  round(max(l_extendedprice), 2) AS price_max
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q83_multimodal_features" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  count(*) AS n_items,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  true AS dim_ok, true AS f0_finite_ok
        |FROM documents
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q176_pca" ->
      """WITH d AS (
        |  SELECT unnest(embedding)::DOUBLE AS v,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |pv AS (SELECT pos, var_samp(v) AS pvar FROM d GROUP BY 1)
        |SELECT 64 AS n_components, (round(sum(pvar), 4) + 0.0) AS trace,
        |  true AS evsum_ok, true AS norms_ok, true AS ev_sorted_ok
        |FROM pv""".stripMargin,
    "q187_union_evolve" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, 'v1' AS batch
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS batch
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT batch, count(*) AS n_rows,
        |  count(o_orderpriority) AS n_with_priority,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM u GROUP BY batch ORDER BY batch""".stripMargin,
    "q192_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_custkey, count(*) AS a_orders,
        |    round(sum(o_totalprice), 2) AS a_total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
        |b AS (
        |  SELECT o_custkey, count(*) AS b_orders,
        |    round(sum(o_totalprice), 2) AS b_total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |    AND o_orderdate < TIMESTAMP '2001-01-01' GROUP BY 1),
        |j AS (SELECT a_orders, a_total, b_orders, b_total
        |  FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
        |SELECT CASE WHEN a_orders IS NULL THEN 'added'
        |    WHEN b_orders IS NULL THEN 'removed'
        |    WHEN a_orders = b_orders AND a_total = b_total
        |      THEN 'unchanged'
        |    ELSE 'changed' END AS change_type,
        |  count(*) AS n_customers,
        |  (round(sum(coalesce(b_total, 0) - coalesce(a_total, 0)), 2) + 0.0)
        |    AS net_delta
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q184_bucketed_neardup" ->
      s"""$srpBucketCte,
        |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |    list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cos
        |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
        |SELECT id_a, id_b, round(cos, 4) AS cos_sim
        |FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "q177_zorder" ->
      """WITH v AS (SELECT l_extendedprice::DOUBLE AS x, l_quantity::DOUBLE AS y
        |           FROM lineitem),
        |mm AS (SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn,
        |              max(y) AS ymx FROM v),
        |b AS (SELECT x, y,
        |    least(floor((x - xmn) / (xmx - xmn) * 1024)::BIGINT, 1023) AS bx,
        |    least(floor((y - ymn) / (ymx - ymn) * 1024)::BIGINT, 1023) AS by
        |  FROM v, mm),
        |z AS (SELECT x, y, ((((bx >> 0) & 1) << 1) + (((by >> 0) & 1) << 0) + (((bx >> 1) & 1) << 3) + (((by >> 1) & 1) << 2) + (((bx >> 2) & 1) << 5) + (((by >> 2) & 1) << 4) + (((bx >> 3) & 1) << 7) + (((by >> 3) & 1) << 6) + (((bx >> 4) & 1) << 9) + (((by >> 4) & 1) << 8) + (((bx >> 5) & 1) << 11) + (((by >> 5) & 1) << 10) + (((bx >> 6) & 1) << 13) + (((by >> 6) & 1) << 12) + (((bx >> 7) & 1) << 15) + (((by >> 7) & 1) << 14) + (((bx >> 8) & 1) << 17) + (((by >> 8) & 1) << 16) + (((bx >> 9) & 1) << 19) + (((by >> 9) & 1) << 18)) AS zv FROM b)
        |SELECT zv >> 16 AS z_bucket, count(*) AS n,
        |  round(min(x), 2) AS x_lo, round(max(x), 2) AS x_hi,
        |  round(min(y), 2) AS y_lo, round(max(y), 2) AS y_hi
        |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
    "q177_zorder" ->
      """WITH v AS (SELECT l_extendedprice::DOUBLE AS x, l_quantity::DOUBLE AS y
        |           FROM lineitem),
        |mm AS (SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn,
        |              max(y) AS ymx FROM v),
        |b AS (SELECT x, y,
        |    least(floor((x - xmn) / (xmx - xmn) * 1024)::BIGINT, 1023) AS bx,
        |    least(floor((y - ymn) / (ymx - ymn) * 1024)::BIGINT, 1023) AS by
        |  FROM v, mm),
        |z AS (SELECT x, y, ((((bx >> 0) & 1) << 1) + (((by >> 0) & 1) << 0) + (((bx >> 1) & 1) << 3) + (((by >> 1) & 1) << 2) + (((bx >> 2) & 1) << 5) + (((by >> 2) & 1) << 4) + (((bx >> 3) & 1) << 7) + (((by >> 3) & 1) << 6) + (((bx >> 4) & 1) << 9) + (((by >> 4) & 1) << 8) + (((bx >> 5) & 1) << 11) + (((by >> 5) & 1) << 10) + (((bx >> 6) & 1) << 13) + (((by >> 6) & 1) << 12) + (((bx >> 7) & 1) << 15) + (((by >> 7) & 1) << 14) + (((bx >> 8) & 1) << 17) + (((by >> 8) & 1) << 16) + (((bx >> 9) & 1) << 19) + (((by >> 9) & 1) << 18)) AS zv FROM b)
        |SELECT zv >> 16 AS z_bucket, count(*) AS n,
        |  round(min(x), 2) AS x_lo, round(max(x), 2) AS x_hi,
        |  round(min(y), 2) AS y_lo, round(max(y), 2) AS y_hi
        |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
    "q173_skew_report" ->
      s"""WITH k AS (
        |  SELECT 'l_orderkey' AS key_name,
        |    ${h32("l_orderkey::VARCHAR", "part:")} % 32 AS bucket FROM lineitem
        |  UNION ALL SELECT 'l_suppkey',
        |    ${h32("l_suppkey::VARCHAR", "part:")} % 32 FROM lineitem
        |  UNION ALL SELECT 'l_returnflag',
        |    ${h32("l_returnflag", "part:")} % 32 FROM lineitem),
        |b AS (SELECT key_name, bucket, count(*) AS n FROM k GROUP BY 1, 2)
        |SELECT key_name, count(*) AS n_buckets, min(n) AS min_rows,
        |  max(n) AS max_rows, round(avg(n), 2) AS avg_rows,
        |  round(max(n) / avg(n), 4) AS skew_ratio
        |FROM b GROUP BY key_name ORDER BY key_name""".stripMargin,
    "q146_ann_recall" ->
      """WITH planes AS (
        |  SELECT j, list_transform(range(0, 64), i ->
        |    (('0x' || substr(md5('plane' || j || ':' || i), 1, 8))::BIGINT)::DOUBLE / 2147483648 - 1) AS plane
        |  FROM (SELECT unnest(range(0, 4)) AS j)),
        |b AS (
        |  SELECT vec_id, embedding,
        |    (SELECT sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
        |                THEN 1 << p.j ELSE 0 END)::BIGINT FROM planes p) AS bucket
        |  FROM embeddings e),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
        |  FROM b WHERE vec_id < 20),
        |ex AS (SELECT query_id, b.vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |        b.vec_id) AS rk
        |  FROM b, q WHERE b.vec_id <> q.query_id),
        |exk AS (SELECT query_id, list(vec_id) AS ids FROM ex WHERE rk <= 10 GROUP BY query_id),
        |an AS (SELECT query_id, b.vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |        b.vec_id) AS rk
        |  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id),
        |ank AS (SELECT query_id, list(vec_id) AS ids FROM an WHERE rk <= 10 GROUP BY query_id)
        |SELECT q.query_id,
        |  coalesce(len(ank.ids), 0) AS n_ann,
        |  coalesce(len(list_intersect(exk.ids, ank.ids)), 0) AS n_hit,
        |  round(coalesce(len(list_intersect(exk.ids, ank.ids)), 0) / 10.0, 4) AS recall_at_10
        |FROM q LEFT JOIN exk ON q.query_id = exk.query_id
        |  LEFT JOIN ank ON q.query_id = ank.query_id
        |ORDER BY q.query_id""".stripMargin,
    "q144_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>'
        |    ELSE o_orderpriority END AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY priority ORDER BY priority""".stripMargin,
    "q140_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  min(o_orderdate::DATE) AS first_day,
        |  max(o_orderdate::DATE) AS last_day
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q141_centroid_separation" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
        |d AS (SELECT label, i, avg(emb[i]) AS m
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY label, i),
        |c AS (SELECT label, list(m ORDER BY i) AS cent FROM d GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(list_cosine_similarity(a.cent, b.cent), 4) AS cos_sim
        |FROM c a JOIN c b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,
    "q135_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q163_range_export" ->
      """WITH v AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |f AS (SELECT quantile_cont(x, 0.25) AS f1, quantile_cont(x, 0.5) AS f2,
        |             quantile_cont(x, 0.75) AS f3 FROM v),
        |b AS (SELECT x, CASE WHEN x <= f1 THEN 1 WHEN x <= f2 THEN 2
        |                     WHEN x <= f3 THEN 3 ELSE 4 END AS shard
        |      FROM v, f)
        |SELECT shard, count(*) AS n_rows, round(min(x), 2) AS lo,
        |  round(max(x), 2) AS hi
        |FROM b GROUP BY shard ORDER BY shard""".stripMargin,
    "q132_partitioned_sink" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events WHERE ts::DATE = DATE '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q201_dpp_join" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events WHERE day(ts::DATE) IN (5, 15, 25)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q203_global_seq" ->
      """SELECT event_id, event_type,
        |  row_number() OVER (ORDER BY event_id) AS global_seq
        |FROM events ORDER BY event_id""".stripMargin,
    "q74_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q75_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price,
        |    round(sum(l_discount), 2) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q76_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderdate) OVER wf AS first_date,
        |  last_value(o_orderdate) OVER wf AS last_date,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders WHERE o_custkey <= 200
        |WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q77_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, '|' ORDER BY c_acctbal, c_name) AS names,
        |  count(*) AS n_cust
        |FROM customer WHERE c_acctbal > 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q78_ann_srp" ->
      s"""$srpBucketCte,
        |q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 2)
        |SELECT b.vec_id, round(list_cosine_similarity(b.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos_sim
        |FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id <> 2
        |ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, b.vec_id
        |LIMIT 10""".stripMargin,
    "q84_ivf_topk" ->
      """SELECT e.vec_id,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos_sim
        |FROM embeddings e,
        |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5) q
        |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |  e.vec_id
        |LIMIT 15""".stripMargin,
    "q79_correlated_subquery" ->
      """SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o.o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |                            FROM orders o2
        |                            WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    // same selection as q80 — the aggregate restatement must pick the
    // identical sample
    "q149_reservoir_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin,
    "q80_hash_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin,
    "q81_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q82_clean_text" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(
        |    regexp_replace(regexp_replace(lower(text), 'x{2,}', ' ', 'g'),
        |                   '[^a-z\s]', ' ', 'g'),
        |    '\s+'), tk -> len(tk) > 1) AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks)::BIGINT AS n_clean_tokens,
        |  md5(array_to_string(toks, ' ')) AS clean_hash
        |FROM t ORDER BY doc_id""".stripMargin,
  )
}
