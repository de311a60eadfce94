package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY.md §4 "shuffle/partitioning";
  * 100 TB design surface).
  *
  * Writing both sides of a recurring join bucketed BY THE JOIN KEY into
  * the same bucket count lets Spark plan a sort-merge join with NO
  * exchange on either side: each task reads matching bucket files
  * directly. At 100 TB this converts the dominant repeated cost (full
  * fact-table shuffle per join) into a one-time write-layout cost —
  * the standard warehouse trick for star-schema fact⋈fact joins that
  * are too big to broadcast.
  */
object Bucketing {

  /** Persist df as a bucketed managed table (sorted within buckets so
    * the merge phase needs no sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The resulting
    * physical plan has zero Exchange nodes (asserted in BucketingSpec).
    *
    * The MERGE hint pins the sort-merge strategy: bucketing exists for
    * fact⋈fact joins where neither side broadcasts; without the hint, a
    * test-scale table slips under autoBroadcastJoinThreshold and the
    * planner ignores bucket layout entirely.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("MERGE")
      .join(spark.table(rightTable).hint("MERGE"), Seq(key), joinType)
}
