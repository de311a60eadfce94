package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.ops.TextOps

/** Measurement probe (PERF_NOTES R10.9): MinHash-LSH banding
  * parameters vs corpus size, the dedup twin of [[SrpProbe]]'s SRP
  * density rule.
  *
  * With banding FIXED, chance band-collisions between non-duplicate
  * docs grow ~n² (a band of r minhashes matches a random pair with
  * probability ≈ J^r, and pairs grow n²) — on the 50 k-doc Zipf
  * fixture that collision floor, not the true 5% duplicate rate, is
  * what q145's verify stage pays. Raising rows-per-band r pushes the
  * floor down EXPONENTIALLY (J^r) while true near-dups (J ≥ 0.8)
  * survive: the s-curve steepens, so the candidate set tracks the
  * true-positive count again. The manifest queries stay pinned at
  * (8, 4) — their oracles replay those exact signatures; this probe
  * exists so "banding must scale with log n" is a measured number.
  *
  * Prints candidate-pair count, verified-edge count (J ≥ 0.8), and
  * wall time per (nHashes, rowsPerBand) configuration.
  *
  * Usage: sbt "runMain graft.LshProbe <sfDir> <nHashes> <rowsPerBand> [nRuns]"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nHashes = args(1).toInt
    val rowsPerBand = args(2).toInt
    val runs = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // k-bounded TopKAgg buffers must stay in hash mode (TopKAgg
      // scaladoc; PERF_NOTES R10.5)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val docs = Tables.parallelize(Tables.documents(spark, sfDir))
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("toks"))
      val verified = DedupOps.minhashAccuracy(docs, "doc_id", col("toks"),
        nHashes, rowsPerBand)
      val agg = verified.agg(count(lit(1)).as("cand"),
        sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("edges"))
        .collect()(0)
      println(f"[lsh-probe] h=$nHashes r=$rowsPerBand run $i: " +
        f"candidates=${agg.getLong(0)} edges_j08=${agg.getLong(1)} " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
