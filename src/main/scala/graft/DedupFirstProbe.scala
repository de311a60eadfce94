package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.ops.TextOps

/** Measurement probe (PERF_NOTES R10.7): the exact-dedup-FIRST
  * composition that every dedup scaladoc prescribes for duplicated
  * corpora, measured against the naive order on the adversarial sf1
  * fixture (10 exact copies of every document — see the verify skill's
  * fixture note).
  *
  * Near-dup candidate generation is quadratic in the per-content
  * duplication factor d: every LSH band groups all d copies of every
  * source doc, so candidates grow ~d² even before vocabulary
  * degeneracy (q136/q145 ran >20 min at sf1 where sf0.1 takes ~6 s).
  * No near-dup algorithm avoids that — the ≥0.8-Jaccard TRUTH itself
  * is d² pairs. The production order is:
  *
  *   1. exact dedup — ONE linear hash aggregate on md5(content)
  *      (16-byte shuffle keys, no document bytes through the
  *      exchange) collapses d copies to 1 survivor;
  *   2. near-dup (sigs → LSH bands → int-rank verify → CC) on the
  *      survivor set, whose candidate volume is duplication-free;
  *   3. re-attach the exact-copy families to their survivor's
  *      cluster — a broadcast-size join on content_hash, so the
  *      final keeper assignment covers the FULL corpus.
  *
  * The probe times each stage separately and prints corpus → survivor
  * → cluster cardinalities, so the claim "exact-first makes the
  * adversarial decade linear again" is a measured number rather than
  * scaladoc prose. Usage:
  *   sbt "runMain graft.DedupFirstProbe <sfDir> [nRuns]"
  */
object DedupFirstProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
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

      // stage 1: exact dedup — linear, content never shuffles
      val docs = Tables.parallelize(Tables.documents(spark, sfDir))
        .withColumn("content_hash", md5(col("text")))
      val families = docs
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .localCheckpoint() // read by the survivor filter AND the re-attach
      val survivors = docs
        .join(families.select(col("keep_id").as("doc_id")), Seq("doc_id"))
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("toks"))
      val nDocs = docs.count()
      val nSurvivors = families.count()
      val t1 = System.nanoTime()

      // stage 2: q145's near-dup machinery on the survivor set
      val edges = DedupOps.minhashAccuracy(survivors, "doc_id",
          col("toks"), nHashes = 8, rowsPerBand = 4)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // CC symmetrizes; don't evaluate verify twice
      val clusters = DedupOps.connectedComponents(
          survivors.select(col("doc_id")), "doc_id",
          edges, "id_a", "id_b")
        .select(col("node").as("keep_id"), col("cluster_id"))
        .localCheckpoint()
      val nEdges = edges.count()
      val t2 = System.nanoTime()

      // stage 3: re-attach every exact copy to its survivor's cluster
      val full = docs.select(col("doc_id"), col("content_hash"))
        .join(families.select(col("content_hash"), col("keep_id")),
          Seq("content_hash"))
        .join(clusters, Seq("keep_id"))
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_keeper"))
      val nFull = full.count()
      val t3 = System.nanoTime()

      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(s"[dedup-first] run $i: docs=$nDocs survivors=$nSurvivors " +
        s"neardup_edges=$nEdges full_assignments=$nFull | " +
        s"exact=${s(t0, t1)}s neardup=${s(t1, t2)}s reattach=${s(t2, t3)}s " +
        s"total=${s(t0, t3)}s")
    }
    spark.stop()
  }
}
