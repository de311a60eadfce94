package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora (SURVEY.md §2.13 X1/X2;
  * training-data-pipeline extensions).
  *
  * Scale design: every dedup variant below reduces to hash-partitioned
  * groupBy/join on a SHORT key (a hash, a band id, a bucket) — never a
  * pairwise all-to-all over the corpus. At 100 TB the only shuffles are
  * (a) one map-side-combined aggregation of key→min(id) and (b) a
  * candidate-pair join whose left/right sides are already bucket-pruned.
  */
object DedupOps {

  /** Exact dedup, keep lowest id per identical content. Hashing the
    * content first (md5) keeps the shuffle key 16 bytes instead of
    * shipping full documents through the exchange.
    */
  def exactDedup(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.withColumn("content_hash", md5(col(contentCol)))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep-first dedup via ranked window (SURVEY §2.13 X1): deterministic
    * given a TOTAL ordering.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** MinHash signature column: for each seed, min over the token set of a
    * 32-bit md5-derived hash (TextOps.hash32 — engine-portable so the
    * DuckDB oracle can reproduce it). Approximates Jaccard similarity:
    * P[minhash_a == minhash_b] = J(a, b).
    */
  def minhashSig(tokenSet: Column, seeds: Seq[Int]): Seq[Column] =
    seeds.map { s =>
      array_min(transform(tokenSet, t => TextOps.hash32(t, s"$s:")))
        .as(s"mh$s")
    }

  /** LSH banding: docs sharing any band of the signature become candidate
    * pairs. With b bands of r rows, P[candidate] = 1-(1-J^r)^b — the
    * standard S-curve. Returns (band_id, band_key, id) ready for a
    * self-equi-join; the join key is (band_id, band_key), so Spark
    * shuffles only 3 small columns, and each bucket is tiny by
    * construction.
    */
  def minhashBands(df: DataFrame, idCol: String, sigCols: Seq[String],
                   rowsPerBand: Int): DataFrame = {
    val bands = sigCols.grouped(rowsPerBand).zipWithIndex.map {
      case (grp, i) =>
        struct(lit(i).as("band_id"),
          md5(concat_ws("_", grp.map(col): _*)).as("band_key"))
    }.toSeq
    df.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  /** Candidate near-dup pairs from banded signatures (id_a < id_b). */
  def candidatePairs(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.select(col("band_id"), col("band_key"), col(idCol).as("id_a"))
    val b = banded.select(col("band_id"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard over distinct token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 16-bit SimHash over the token set: bit j is the sign of
    * Σ_tokens (bit j of hash32(token) ? +1 : -1). Near-dups differ in
    * few bits (Hamming distance); 16 bits keeps the oracle SQL tractable
    * while the library variant below goes to 64.
    */
  def simhash(tokenSet: Column, bits: Int = 16): Column = {
    val contribs = (0 until bits).map { j =>
      val votes = aggregate(tokenSet, lit(0L),
        (acc, t) => acc + (shiftright(TextOps.hash32(t), j) % 2) * 2 - 1)
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    contribs.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (for near-dup joins). */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
