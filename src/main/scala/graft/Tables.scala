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
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
