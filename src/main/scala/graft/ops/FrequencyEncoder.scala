package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency encoding: replace a high-cardinality categorical with its
  * occurrence count (reference `random_forest_final_class_8.py:77-86`,
  * `company_response_RF.py:48-51`: `groupBy(company).count` + left join).
  *
  * Scale notes (100 TB): the frequency table has one row per distinct key
  * (~7k companies in the reference, `README.md:21`), so the join side is
  * tiny — we broadcast it explicitly rather than trusting the size
  * estimate, turning a sort-merge shuffle of the full fact table into a
  * map-side broadcast-hash join. The groupBy itself does a partial
  * (map-side) aggregation before the single shuffle of distinct keys.
  */
object FrequencyEncoder {

  /** Attach `<outCol>` = count of rows sharing this row's `keyCol`. */
  def encode(df: DataFrame, keyCol: String, outCol: String,
             broadcastFreq: Boolean = true): DataFrame = {
    val freq = df.groupBy(keyCol).agg(count(lit(1)).as(outCol))
    val right = if (broadcastFreq) broadcast(freq) else freq
    df.join(right, Seq(keyCol), "left")
  }

  /** Chained encoding of several columns (reference chains company then
    * issue, `random_forest_final_class_8.py:77-86`).
    */
  def encodeAll(df: DataFrame, keys: Seq[(String, String)]): DataFrame =
    keys.foldLeft(df) { case (d, (k, out)) => encode(d, k, out) }
}
