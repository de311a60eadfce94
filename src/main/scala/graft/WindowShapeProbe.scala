package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement probe (judge verdict r10 "Next round" #4): the round-10
  * sharded-window rewrites (q203/q250/q190/q373 family) were
  * oracle-verified at 3 SFs and sped up the sf0.1 bench, but the scale
  * CLAIM — no stage ever sees more than ~1/nShards of a group — had no
  * decade-up measurement. This main drives each site's PRE-rewrite
  * shape (the literal single-task window the manifest used to run,
  * reconstructed here exactly as R10.11/R10.13 retired it) and its
  * POST-rewrite shape (the live manifest body via SparkEntry) on the
  * same sfDir with min-of-N timing, so PERF_NOTES can carry the sf0.1 →
  * sf1 slope of both forms side by side (the R10.4 pattern:
  * pre-shapes live in a probe, the manifest stays clean).
  *
  * Usage: sbt "runMain graft.WindowShapeProbe <sfDir> [nRuns] [site...]"
  * (sites default to all four; sf1 fixture via `graft.Sf1Fixture`).
  * Wall-clock probe — run on an idle machine like Bench.
  */
object WindowShapeProbe {

  /** q203 pre-shape: one unpartitioned row_number over the whole events
    * table (every row through ONE task). */
  private def preQ203(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("global_seq",
        row_number().over(Window.orderBy(col("event_id"))).cast("long"))
      .orderBy(col("event_id"))

  /** q190 pre-shape: rank-sum AUC with the per-group mid-ranks from a
    * partitionBy(priority) cumulative window over the distinct-score
    * frame (each priority's whole frame in one task). */
  private def preQ190(s: SparkSession, dir: String): DataFrame = {
    val perScore = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderpriority"),
        col("o_totalprice").cast("double").as("__score"))
      .agg(count(lit(1)).as("__cnt"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("__pos"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("__score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__rank",
        col("__cum") - col("__cnt") + (col("__cnt") + 1) / 2.0)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("__pos")).as("n_pos"),
        sum(col("__cnt") - col("__pos")).as("n_neg"),
        sum(col("__pos") * col("__rank")).as("__rp"))
      .select(col("o_orderpriority"), col("n_pos"), col("n_neg"),
        (round((col("__rp") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos") * col("n_neg")), 4) + lit(0.0)).as("auc"))
      .orderBy(col("o_orderpriority"))
  }

  /** q250 pre-shape: per-lang percent_rank window over the RAW scored
    * documents (each language's corpus slice in one task), then the
    * same 33-point grid interpolation as the live query. */
  private def preQ250(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.parallelize(Tables.table(s, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        graft.ops.TextOps.tokenCount(col("text")).cast("double").as("score"))
      .localCheckpoint()
    val grid = graft.ops.StatOps.exactPercentiles(
        scored.withColumn("__g", lit(1)),
        "__g", "score", (0 to 32).map(i => s"g$i" -> i / 32.0))
      .select(array((0 to 32).map(i => col(s"g$i")): _*).as("__grid"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score"), col("doc_id"))
    scored
      .withColumn("__r", percent_rank().over(w))
      .crossJoin(broadcast(grid))
      .withColumn("__pos", col("__r") * 32)
      .withColumn("__i", least(floor(col("__pos")).cast("int"), lit(31)))
      .withColumn("normalized", round(
        element_at(col("__grid"), col("__i") + 1) +
          (col("__pos") - col("__i")) *
            (element_at(col("__grid"), col("__i") + 2) -
              element_at(col("__grid"), col("__i") + 1)), 4))
      .select(col("doc_id"), col("lang"), col("normalized"))
      .orderBy(col("doc_id"))
  }

  /** q373 pre-shape: average precision from ONE global
    * `ORDER BY v DESC, id` window carrying both the row_number and the
    * cumulative positive count (the whole filtered event stream in one
    * task). */
  private def preQ373(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id").as("id"),
        col("value").cast("double").as("v"),
        (col("event_type") === "purchase").cast("int").as("pos"))
    val w = Window.orderBy(col("v").desc, col("id"))
    val ranked = e
      .withColumn("__rank", row_number().over(w))
      .withColumn("__posRank", sum(col("pos")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.filter(col("pos") === 1)
      .agg(count(lit(1)).as("n_pos"),
        avg(col("__posRank").cast("double") / col("__rank"))
          .as("__ap"))
      .select(col("n_pos"), (round(col("__ap"), 4) + lit(0.0)).as("ap"))
  }

  /** Tie-density demo (round 11): the SAME per-lang rank over a
    * COARSENED token-count key (floor(score/25) — ~4 distinct values,
    * modal block ~40% of a language) through both rank primitives.
    * `shardedRank` fences on the order key alone, so the modal tie
    * block lands in ONE shard-local sort task (corpus-proportional at
    * any nShards); `shardedRankTied` splits the block across shards on
    * the unique doc_id. Outputs are identical rank sets; only the task
    * decomposition differs. */
  private def scoredCoarse(s: SparkSession, dir: String): DataFrame = {
    // stage the scored frame as parquet ONCE per fixture: tokenizing
    // 500 k docs costs ~800 ms per scan task and would be the critical
    // task of BOTH forms (exactly what the q250 decade row measured),
    // hiding the rank decomposition this site exists to compare
    val key = java.lang.Integer.toHexString(dir.hashCode)
    val path = s"target/fixtures/__tied_scored_$key"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Tables.parallelize(Tables.table(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          floor(graft.ops.TextOps.tokenCount(col("text")) / 25)
            .cast("double").as("score"))
        .repartition(16)
        .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }
  // no output orderBy: a global range sort's ~n/cpus partitions would
  // be the critical task of BOTH forms, hiding the comparison
  private def preTied(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.shardedRank(
        scoredCoarse(s, dir), "lang", "score", "doc_id", "rk")
      .select(col("doc_id"), col("lang"), col("rk"))
  private def postTied(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.shardedRankTied(
        scoredCoarse(s, dir), "lang", "score", "doc_id", "rk")
      .select(col("doc_id"), col("lang"), col("rk"))

  private val sites: Map[String,
      (String, (SparkSession, String) => DataFrame,
        Option[(SparkSession, String) => DataFrame])] =
    Map(
      "q203" -> ("q203_global_seq", preQ203 _, None),
      "q190" -> ("q190_auc", preQ190 _, None),
      "q250" -> ("q250_quantile_normalize", preQ250 _, None),
      "q373" -> ("q373_avg_precision", preQ373 _, None),
      // pre = shardedRank (tie blocks co-located), post = shardedRankTied
      "tied" -> ("shardedRank vs shardedRankTied on a 4-value key",
        preTied _, Some(postTied _)))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val chosen = if (args.length > 2) args.drop(2).toSeq else sites.keys.toSeq.sorted
    // validate BEFORE any measurement: a typo'd site name must not
    // abort the run after earlier sites burned minutes of probing
    val unknown = chosen.filterNot(sites.contains)
    require(unknown.isEmpty, s"unknown site(s): ${unknown.mkString(", ")}" +
      s" — known: ${sites.keys.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ICU warm-up (Bench warm-up 1) so neither form pays class init
    spark.range(1).select(expr(
      "filter(array(lower('Warm Up')), x -> x != '')")).collect()

    // The cluster-size-independent quantity: the LONGEST single task.
    // On a saturated local[8], total wall under-sells distribution (8
    // small sorts + 2 extra passes ≈ one big sort in CPU-seconds); on
    // a 1000-executor cluster the single-task form is CAPPED at one
    // core while the sharded form rides nShards × tasks — so the
    // critical-path task, not the wall, is what survives the
    // extrapolation. Tracked via listener across each timed closure.
    // One pair, atomically: the runtime AND row count of the SAME
    // task (the longest). Tracking two independent maxima mispairs
    // them — a cheap checkpoint-read task can read the most rows
    // while a different task is the critical path (first observed on
    // q250 at sf10: "953 ms / 99,600 rows" were two different tasks).
    val maxTask = new java.util.concurrent.atomic.AtomicReference[(Long, Long)]((0L, 0L))
    // Separately: the most ROWS any single task ingested — the volume
    // that cannot shrink when an indivisible frame (a window partition,
    // a co-located tie block) floors it, however many partitions the
    // session runs. At fixture scale task TIMES are ~100 ms noise, so
    // the volume metric, not the time pair, carries the divisibility
    // story (the `tied` site's floor-vs-share contrast).
    val maxRows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val rows = m.shuffleReadMetrics.recordsRead +
            m.inputMetrics.recordsRead
          maxTask.getAndAccumulate((m.executorRunTime, rows),
            (a, b) => if (b._1 > a._1) b else a)
          maxRows.getAndAccumulate(rows, Math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def measured(fn: => Unit): (Double, Long, Long, Long) = {
      maxTask.set((0L, 0L)); maxRows.set(0L)
      val t = time(fn)
      // listener events drain asynchronously — settle before reading
      // (the bus's waitUntilEmpty is private[spark]; a beat suffices
      // for a probe that just finished its terminal action)
      Thread.sleep(500)
      val (ms, rows) = maxTask.get
      (t, ms, rows, maxRows.get)
    }
    chosen.foreach { key =>
      val (manifestName, pre, postOverride) = sites(key)
      val post = postOverride.getOrElse(SparkEntry.queries(manifestName))
      // one untimed pass each (JIT/codegen), then min-of-N
      try {
        pre(spark, sfDir).write.format("noop").mode("overwrite").save()
        post(spark, sfDir).write.format("noop").mode("overwrite").save()
        val preM = (1 to runs).map(_ => measured(
          pre(spark, sfDir).write.format("noop").mode("overwrite").save()))
        val postM = (1 to runs).map(_ => measured(
          post(spark, sfDir).write.format("noop").mode("overwrite").save()))
        val preT = preM.map(_._1); val postT = postM.map(_._1)
        // report the best run's critical task WITH its own row count
        // (min-ms and max-rows from different runs would mispair, the
        // same defect the listener fix addresses within a run)
        val preBest = preM.minBy(_._2); val postBest = postM.minBy(_._2)
        println(f"[window-shape] $key pre_min=${preT.min}%.3f s " +
          f"post_min=${postT.min}%.3f s " +
          f"pre_max_task=${preBest._2}%d ms/${preBest._3}%d rows " +
          f"post_max_task=${postBest._2}%d ms/${postBest._3}%d rows " +
          f"pre_max_rows=${preM.map(_._4).min}%d " +
          f"post_max_rows=${postM.map(_._4).min}%d " +
          f"(pre=${preT.map(t => f"$t%.2f").mkString(",")} " +
          f"post=${postT.map(t => f"$t%.2f").mkString(",")})")
      } catch {
        case e: Throwable =>
          println(s"[window-shape] $key FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
