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
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
