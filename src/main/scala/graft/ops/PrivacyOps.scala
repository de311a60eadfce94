package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy / governance primitives a training-data pipeline runs before
  * releasing a corpus snapshot: pattern redaction, deterministic
  * pseudonymization, and the per-document signals (character entropy)
  * release QA reports on.
  *
  * All pure codegen'd Catalyst expressions — redaction and
  * pseudonymization run in the scan stage at 100 TB (no shuffle, no
  * UDF); reports aggregate map-side. The reference has no privacy
  * pass (its narratives arrive pre-redacted as `XXXX` runs —
  * `complaints_narrative_LDA.py:47` strips them); these ops are the
  * producer side of that contract.
  */
object PrivacyOps {

  /** Replace every match of `pattern` with `mask` (global, in-plan). */
  def redact(text: Column, pattern: String, mask: String): Column =
    regexp_replace(text, pattern, mask)

  /** Number of `pattern` matches in `text` — the redaction count a
    * governance report aggregates.
    */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Deterministic keyed surrogate: md5(key || ":" || value). The same
    * value maps to the same surrogate in every table, partition, and
    * engine — referential integrity survives pseudonymization (joins on
    * the surrogate equal joins on the raw key), unlike salted or
    * per-run-random anonymization.
    */
  def surrogate(c: Column, key: String): Column =
    md5(concat(lit(key + ":"), c.cast("string")))

  /** Shannon entropy (nats) of the a-z letter distribution of `text`,
    * lowercased; non-letters ignored. Low entropy flags degenerate /
    * repeated-character documents that length and stopword ratios miss.
    *
    * Formulated as 26 `translate`-delete counts — no explode, no lambda
    * HOF (CodegenFallback, PERF_NOTES §5) — so it fuses into the same
    * scan-stage projection as the other quality signals. Term order is
    * 'a'..'z'; the DuckDB oracle mirrors it, so the double sum is
    * bit-identical.
    */
  def letterEntropy(text: Column): Column = {
    val lc = lower(text)
    val total = greatest(azCount(lc).cast("double"), lit(1.0))
    // single-char counts via replace, not translate: UTF8String.replace
    // is a direct byte search, while translate goes through a boxed
    // Character map lookup PER CHARACTER — ~26 × 3 evaluations per doc
    // made translate the dominant per-task cost (guide §1.2). Values
    // are identical (count of ch = length drop after deleting ch), and
    // the DuckDB oracle already uses the replace spelling.
    ('a' to 'z').map { ch =>
      val cnt = (length(lc) - length(replace(lc, lit(ch.toString), lit(""))))
        .cast("double")
      when(cnt > 0, -(cnt / total) * log(cnt / total)).otherwise(lit(0.0))
    }.reduce(_ + _)
  }

  /** Count of a-z chars in an already-lowercased column: length minus
    * the length after translate-deleting the 26 letters — identical by
    * definition to `length(regexp_replace(lc, "[^a-z]", ""))` (chars
    * removed by [^a-z] retention = chars kept by a-z deletion) but a
    * plain per-char table lookup instead of a regex-engine pass over
    * every document (guide §1.2 per-task work; the same translate
    * idiom the 26 entropy terms already use).
    */
  private def azCount(lc: Column): Column =
    length(lc) - length(translate(lc, "abcdefghijklmnopqrstuvwxyz", ""))

  /** Count of a-z letters (the entropy denominator, reported with it). */
  def letterCount(text: Column): Column =
    azCount(lower(text)).cast("long")

  /** k-anonymity / l-diversity audit over quasi-identifier columns:
    * every row must share its QI combination with >= k−1 others
    * (re-identification resistance), and each equivalence class must
    * contain >= l distinct sensitive values (attribute-disclosure
    * resistance — a k-anonymous class that is all one diagnosis still
    * leaks). One two-level aggregation: rows collapse to |classes|
    * rows, the audit scalar frame collapses from those. The release
    * gate a training-data pipeline runs BEFORE publishing any
    * user-keyed table.
    */
  def kAnonymityAudit(df: org.apache.spark.sql.DataFrame,
      qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col(sensitiveCol)).as("__div"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("__sz")).as("n_rows"),
      min(col("__sz")).as("min_class_size"),
      count(when(col("__sz") < k, 1)).as("classes_below_k"),
      coalesce(sum(when(col("__sz") < k, col("__sz"))), lit(0L))
        .as("rows_below_k"),
      count(when(col("__div") < l, 1)).as("classes_below_l"))
  }
}
