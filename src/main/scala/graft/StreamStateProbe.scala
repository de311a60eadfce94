package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming STATE-scale probe (round 10): replays the events table as
  * a K-batch chronological file stream (maxFilesPerTrigger = 1, one
  * time-ordered chunk per micro-batch, so the watermark advances
  * between batches exactly as it would on a live feed) and records
  * each stateful operator's state rows / state memory per batch from
  * `StreamingQuery.recentProgress`.
  *
  * What it proves, per scenario:
  *  - `dedup_ttl` (dropDuplicatesWithinWatermark): state rows PLATEAU —
  *    keys older than the watermark evict, so state is O(keys per
  *    watermark horizon), independent of stream length;
  *  - `dedup_unbounded` (plain dropDuplicates) as the CONTRAST: state
  *    grows monotonically with every new key, the shape that OOMs an
  *    unbounded feed — kept here only to make the TTL curve legible;
  *  - `interval_join`: both sides' state evicts once the watermark
  *    passes the join horizon — state tracks event RATE x horizon,
  *    not corpus length;
  *  - `hourly_agg`: open windows within the watermark only.
  *
  * Usage: `runMain graft.StreamStateProbe <sfDir> <out.json> [chunks]`
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "target/stream_state.json"
    val chunks = if (args.length > 2) args(2).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // one state store per shuffle partition per operator — keep the
      // fan-out at the manifest's pinned replay value (ExtensionQueries
      // withStreamShuffle rationale)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage K chronological chunk files (mtime ascending, so the
    // file source replays them in event-time order) ----
    val stage = java.nio.file.Paths.get("target/fixtures/" +
      s"stream_chunks_${chunks}_${graft.ops.Staging.corpusKey(sfDir)}")
    if (!java.nio.file.Files.isDirectory(stage)) {
      // stage into a tmp sibling and rename at the end: a crash mid-
      // loop must not leave a PARTIAL chunk set that later runs would
      // silently replay as the full stream (the isDirectory check
      // cannot tell 3 chunks from 12)
      val tmp = java.nio.file.Paths.get(stage.toString +
        s".tmp-${ProcessHandle.current().pid()}")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("__chunk",
          ntile(chunks).over(Window.orderBy(col("ts"))))
        .localCheckpoint()
      (1 to chunks).foreach { i =>
        raw.filter(col("__chunk") === i).drop("__chunk")
          .coalesce(1).write.mode("append").parquet(tmp.toString)
        Thread.sleep(60) // distinct mtimes => deterministic batch order
      }
      try java.nio.file.Files.move(tmp, stage,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    val schema = spark.read.parquet(stage.toString).schema
    def src(): DataFrame = Tables.eventsNormalize(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage.toString))

    def run(name: String, df: DataFrame): String = {
      val q = df.writeStream.format("noop")
        .option("checkpointLocation",
          s"target/tmp/ssp_ckpt_${name}_${java.util.UUID.randomUUID()}")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = q.recentProgress.toSeq.sortBy(_.batchId).map { p =>
        val st = p.stateOperators
        val stateRows = st.map(_.numRowsTotal).sum
        val stateMem = st.map(_.memoryUsedBytes).sum
        s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
          s""""state_rows":$stateRows,"state_mem":$stateMem}"""
      }
      println(s"[ssp] $name batches=${rows.size} stateRows=" +
        q.recentProgress.toSeq.sortBy(_.batchId)
          .map(_.stateOperators.map(_.numRowsTotal).sum).mkString(","))
      s""""$name":[${rows.mkString(",")}]"""
    }

    val e = () => src().select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val results = Seq(
      run("dedup_ttl", graft.streaming.StreamingOps.dedupStream(
        e(), Seq("user_id", "event_type"), "1 hour")),
      run("dedup_unbounded",
        e().dropDuplicates("user_id", "event_type")),
      run("interval_join", {
        val s0 = e()
        graft.streaming.StreamingOps.intervalJoinStream(
          s0.filter(col("event_type") === "view").drop("event_type"),
          s0.filter(col("event_type") === "purchase").drop("event_type"),
          "user_id", withinSeconds = 3600, watermarkDelay = "10 minutes")
      }),
      run("hourly_agg",
        graft.streaming.StreamingOps.hourlyAggStream(e(), "2 hours")))
    val json = results.mkString(
      s"""{"sf":"$sfDir","chunks":$chunks,"scenarios":{""", ",", "}}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"[ssp] wrote $out")
    spark.stop()
  }
}
