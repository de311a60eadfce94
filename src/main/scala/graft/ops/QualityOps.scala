package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation (SURVEY.md §2.13 X52): the gate a 100 TB
  * ingest runs before publishing a snapshot — row-level rule violations,
  * primary-key uniqueness, and referential integrity, each reported as a
  * (check, violations) row.
  *
  * Scale shape: ALL row-level rules on one table evaluate in a SINGLE
  * scan-stage aggregation (`sum(when(!rule, 1))` per rule — one pass, no
  * shuffle beyond the final 1-row partial merge). PK checks ride the same
  * aggregation via `count - count(distinct)`. FK checks are left-anti
  * joins (broadcast when the parent's key side is small; shuffled-hash
  * otherwise) counting orphans. The per-check one-row frames union into a
  * driver-scale report.
  *
  * The reference's analogue is its ad-hoc null/blank screening
  * (`random_forest_final_class_8.py:56-60`); this packages that screening
  * as a declarative, composable contract.
  */
object QualityOps {

  /** One row per rule: sum of rows where the rule does NOT hold (nulls
    * count as violations — a data contract is an assertion, and UNKNOWN
    * is not a pass). Single aggregation over one scan of `df`.
    */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, rule) =>
      sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)).as(name)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("check"), col(name).as("violations"))
      }: _*)).as("r"))
      .select(col("r.check"), col("r.violations"))
  }

  /** Duplicate primary-key count: rows minus distinct keys. */
  def pkDuplicates(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
      count_distinct(col(keyCols.head), keyCols.tail.map(col): _*))
      .as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Orphaned foreign keys: child rows whose key has no parent. Left-anti
    * join — Spark broadcasts the parent side when it fits, else
    * shuffled-hash; either way no child row survives past the join.
    */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
                parentKey: String, name: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** The full gate: union of any number of check frames (each one row),
    * ordered by check name for a stable report.
    */
  def gate(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy(col("check"))
}
