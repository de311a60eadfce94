package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The reference ingests line-delimited JSON with INFERRED schema and
  * PERMISSIVE corrupt-record capture (`init.py:13`,
  * `random_forest_final_class_8.py:53-56`), then filters/drops
  * `_corrupt_record`. That is reproduced here — plus the explicit-schema
  * variant that a 100 TB pipeline should actually use: schema inference
  * is a FULL extra pass over the data before the real read, and
  * inferred types drift with content; a pinned StructType reads once
  * and fails loudly.
  */
object Ingest {

  /** S1 (reference-parity): schema-inferred permissive JSON read;
    * malformed lines land in `_corrupt_record` as whole-row strings.
    */
  def readJsonInferred(spark: SparkSession, path: String,
                       corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** S1 (scale form): explicit schema, one pass, no inference job. */
  def readJson(spark: SparkSession, path: String, schema: StructType,
               corruptCol: String = "_corrupt_record",
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .options(options)
      .json(path)

  /** Reference cleaning step: drop rows that failed to parse, then the
    * capture column itself (`init.py:27`,
    * `random_forest_final_class_8.py:56` — which filters AFTER the
    * projection dropped the column, working only via lineage resolution;
    * here the filter correctly precedes the drop, SURVEY §8.6).
    */
  def dropCorrupt(df: DataFrame,
                  corruptCol: String = "_corrupt_record"): DataFrame =
    if (df.columns.contains(corruptCol))
      df.filter(col(corruptCol).isNull).drop(corruptCol)
    else df

  /** CSV with header + explicit schema (engine surface; absent in
    * reference but part of a complete source layer).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S5: partitioned parquet sink — the layout that gives downstream
    * scans partition pruning on the key.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC read/write (columnar alternative to parquet, built into
    * spark-sql; same pushdown/pruning machinery — IngestSpec asserts
    * filters reach the ORC scan too).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML read/write — the Spark 4 BUILT-IN xml source (SPARK-44751,
    * the spark-xml package folded into spark-sql): row-per-element
    * under a configurable rowTag. Read takes an EXPLICIT schema —
    * XML inference samples the data and is both a second scan and a
    * nondeterminism source, neither acceptable in a pinned pipeline.
    */
  def readXml(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", "row").format("xml")
      .load(path)

  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("rootTag", "rows")
      .option("rowTag", "row").format("xml").save(path)
}
