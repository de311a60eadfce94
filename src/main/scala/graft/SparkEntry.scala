package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module manifests under
  * `graft.queries`; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible query (same column aliases, deterministic ORDER
  * BY — the driver hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature operator: frequency-encode (groupBy-count +
    * broadcast left join, `random_forest_final_class_8.py:77-86`).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q4_freq_encode")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.ExtensionQueries.queries ++
      graft.queries.FunctionQueries.queries ++
      graft.queries.AdvancedQueries.queries ++
      graft.queries.StructuralQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.GovernanceQueries.queries ++
      graft.queries.ModelQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.ExperimentQueries.queries ++
      graft.queries.StatQueries.queries ++
      graft.queries.SpatialQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.ExtensionQueries.oracle ++
      graft.queries.FunctionQueries.oracle ++
      graft.queries.AdvancedQueries.oracle ++
      graft.queries.StructuralQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.TemporalQueries.oracle ++
      graft.queries.QualityQueries.oracle ++
      graft.queries.GovernanceQueries.oracle ++
      graft.queries.ModelQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.ExperimentQueries.oracle ++
      graft.queries.StatQueries.oracle ++
      graft.queries.SpatialQueries.oracle
}
