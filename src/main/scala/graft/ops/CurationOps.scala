package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: the selection
  * and filtering steps that sit between raw ingest and dedup (DedupOps)
  * in a pre-training data flow. No analogue exists in the reference —
  * these extend its text surface (`complaints_narrative_LDA.py`) the way
  * BASELINE.json's north_star mandates.
  *
  * Scale design: repetition scoring is a pure per-row projection (no
  * shuffle); document frequency is one map-side-combined aggregation on
  * a token key; budget selection shuffles once on the group key. None
  * of them ever collect to the driver.
  */
object CurationOps {

  /** Within-document repetition score (the Gopher/MassiveText-style
    * repetition quality filter): the fraction of word n-gram
    * OCCURRENCES that are repeats of an earlier occurrence —
    * `1 - distinct_ngrams / total_ngrams`, 0.0 for docs with fewer
    * than n tokens. Machine-generated / boilerplate text scores high
    * and is filtered before training.
    *
    * Adds `n_ngrams` (long) and `out` (double, 4dp) columns. Pure
    * projection: at 100 TB this runs in the scan stage, no exchange.
    * The token array is materialized once and shared between the
    * count and the shingle transform (HOFs get no CSE, PERF_NOTES §5).
    */
  def withRepetition(df: DataFrame, textCol: String, n: Int,
                     out: String = "rep_frac"): DataFrame = {
    graft.functions.GraftSparkExtensions.register(df.sparkSession)
    val toks = "__rep_toks"
    val total = "__rep_total"
    df.withColumn(toks, TextOps.tokens(col(textCol)))
      .withColumn(total, greatest(size(col(toks)) - (n - 1), lit(0)))
      .withColumn("n_ngrams", col(total).cast("long"))
      .withColumn(out,
        when(col(total) > 0,
          round(lit(1.0) -
            size(TextOps.wordShinglesOf(col(toks), n)).cast("double") /
              col(total).cast("double"), 4))
          .otherwise(lit(0.0)))
      .drop(toks, total)
  }

  /** Token-budget curation: per group (typically language or domain),
    * keep the highest-`score` documents until the group's cumulative
    * token budget is exhausted — how a fixed-size training mix is drawn
    * from an over-sized corpus with per-domain quotas.
    *
    * `score` must be deterministic; ties break on `idCol`, so the
    * selected set is reproducible across engines and retries. Returns
    * (groupCol, idCol, n_tokens, cum_tokens).
    *
    * Scale shape: ONE shuffle on the group key; the running sum is a
    * streaming window frame (UNBOUNDED PRECEDING..CURRENT ROW), so no
    * whole-group buffering. Caveat: a window over a LOW-cardinality
    * group key sends each whole group to one reducer — for huge corpora
    * per group, find the score threshold first with a distributed
    * histogram (StatOps.exactPercentiles' selection shape) and keep
    * `score >= threshold` as a plain filter instead.
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, idCol: String,
                        textCol: String, score: Column,
                        budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("__score", score)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(groupCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic global shuffle of a corpus into training shards —
    * the last step of a pre-training pipeline: break source-order
    * correlation (crawl locality, per-domain runs) so each shard is an
    * i.i.d.-looking sample, WITHOUT an RNG whose state would differ
    * across engines or task retries.
    *
    * shard = hash(id) mod numShards; pos = rank of hash within the
    * shard (ties on id). The hash is the md5-derived
    * [[TextOps.hash32]], so any engine (and the DuckDB oracle)
    * reproduces the exact permutation.
    *
    * Scale shape: one shuffle on the shard key; within-shard ordering
    * is a per-shard window sort (shards are hash-balanced by
    * construction, so no reducer skew). For 100 TB, numShards is
    * thousands — each shard sorts independently, and the output can be
    * written `partitionBy(shard)` for downstream sequential reads.
    */
  def shardShuffle(df: DataFrame, idCol: String,
                   numShards: Int): DataFrame = {
    val h = TextOps.hash32(col(idCol).cast("string"), seed = "shard:")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Corpus-level document frequency with a minimum-share cutoff: the
    * tokens appearing in at least `minFrac` of all documents. The
    * classic boilerplate/stopword discovery pass (df-too-high tokens
    * carry no signal and get dropped from quality scoring / TF-IDF
    * vocabularies).
    *
    * One exchange total: explode of per-doc DISTINCT tokens →
    * map-side-combined count per token. The corpus total rides along
    * as a broadcast scalar, so the cutoff is evaluated in-plan — no
    * driver-side count() round trip.
    */
  def docFrequency(df: DataFrame, textCol: String,
                   minFrac: Double): DataFrame = {
    val total = df.agg(count(lit(1)).cast("double").as("__total"))
    df.select(explode(TextOps.tokenSet(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .filter(col("df") >= col("__total") * minFrac)
      .select(col("token"), col("df"),
        round(col("df") / col("__total"), 4).as("df_frac"))
  }
}
