package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loaders for the driver testdata (TESTDATA.md).
  *
  * All tables are parquet; reading through here keeps scans uniform so
  * Catalyst sees plain `FileSourceScanExec` nodes with pushdown-capable
  * filters (cf. reference `init.py:13`, which reads schema-inferred JSON —
  * we read parquet with its embedded schema, which at 100 TB is the only
  * sane choice: no inference pass, row-group pruning, column pruning).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Restore scan parallelism for compute-heavy pipelines.
    *
    * The testdata parquet files are written as ONE row group, and a row
    * group is Spark's minimum split unit — so every scan here is a
    * single task and everything computed before the first exchange runs
    * on one core of local[32]. This is the classic "one big
    * unsplittable file" ingest problem at any scale. The cure is one
    * explicit round-robin shuffle of the (small) raw columns BEFORE the
    * expensive per-row work; downstream projections then run with full
    * parallelism. Keep heavy expressions in projections ABOVE this call
    * — Catalyst pushes deterministic FILTERS below a repartition, but
    * leaves projections in place.
    */
  def parallelize(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Pushdown fence for filters whose predicate is EXPENSIVE (JSON
    * parse, tokenization): OR-in an always-false nondeterministic term
    * so the filter evaluates where it stands — Catalyst refuses to push
    * nondeterministic conditions — instead of being pushed below a
    * [[parallelize]] repartition into the single-file scan task.
    * Semantically a no-op (`rand() < -1` is never true).
    */
  def fence(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cond || org.apache.spark.sql.functions.rand() <
      org.apache.spark.sql.functions.lit(-1.0)

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) — parquet's nanosecond
    * precision, which Spark's vectorized reader rejects outright
    * ([PARQUET_TYPE_ILLEGAL]). We read the raw int64 nanos via the
    * `nanosAsLong` escape hatch and rebuild a micros timestamp with
    * INTEGER division (`div`): a double-precision detour would lose
    * sub-millisecond digits at 2024-epoch magnitudes (~1.7e18 ns vs
    * ~9e15 exact-double range). DuckDB's `ts::TIMESTAMP` truncates
    * ns→us the same way, so oracles agree bit-for-bit.
    *
    * `spark.sql.legacy.parquet.nanosAsLong=true` must be set WHEN THE
    * SESSION IS BUILT (Bench / Verify / SparkSpec all do) — it is a
    * global reader flag, and setting it here as a read side effect
    * would silently change how every other nanos-typed parquet in the
    * session is read, racily if sessions are shared across threads.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(events.parquet carries TIMESTAMP(NANOS))")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
