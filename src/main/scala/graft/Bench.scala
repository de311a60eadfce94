package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology:
  *  - queries execute in sorted name order (deterministic);
  *  - one untimed warm-up query first absorbs JVM/codegen/FileIndex
  *    warm-up so per-query numbers reflect steady state;
  *  - results are fully materialized through the `noop` datasource —
  *    unlike `count()`, which lets Catalyst prune projections and skip
  *    computing most columns, noop forces every output column through
  *    the whole plan (what a real sink would see).
  *
  * MEASUREMENT PROTOCOL (binding for any number that gates a
  * decision; PERF_NOTES R6.4/R7.1 measured why):
  *  1. idle machine — NO co-resident sbt/test/Spark JVM, and none
  *     exited within the previous ~15 s (JVM shutdown still holds
  *     pages and cores; measured inflation up to 2× on shared runs,
  *     5.5× worst-case per query);
  *  2. run the full bench TWICE, compare per query, record the MIN —
  *     a 400-query run shares one JVM, so any single run carries GC
  *     coupling noise that min-of-two removes;
  *  3. regressions are claimed only against min-vs-min at equal query
  *     count; a query whose code is unchanged cannot "regress" — if
  *     its min moved >1.5×, the protocol was violated, re-measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      // parallelismFirst stays at its default TRUE: the byte-advisory
      // alternative (parallelismFirst=false) was A/B'd in round 4 and
      // LOST 156 -> 240 s — small-byte/high-CPU reduce stages (the
      // md5/intersection verify joins: q95 3.7 -> 22.7 s) coalesce to
      // ~1 partition and serialize. Bytes are a bad proxy for work in
      // compute-dense stages; see PERF_NOTES R4.3.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // events.parquet carries TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm-up 1: any lower() evaluated on the interpreted path (i.e.
    // inside a CodegenFallback higher-order function) dispatches through
    // CollationSupport→CollationAwareUTF8String, whose static init
    // builds ICU case-mapping tables — tens of seconds of CPU when the
    // JIT is cold/saturated, serialized under the class-init monitor.
    // Trigger it once, untimed, so no measured query pays it.
    spark.range(1).select(org.apache.spark.sql.functions.expr(
      "filter(array(lower('Warm Up')), x -> x != '')")).collect()
    // Warm-up 2: the flagship freq-encode chain, untimed
    try run(SparkEntry.queries("q4_freq_encode")) catch { case _: Throwable => () }
    // Warm-up 3: the iterative-CC and selection-percentile machinery on
    // toy inputs, untimed. Their loop/window/checkpoint code paths are
    // otherwise cold when q40/q66/q68/q95 arrive mid-manifest, and the
    // first cold pass costs 2-3x the steady state (JIT, not data).
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val edges = (0L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val nodes = (0L to 65L).toDF("id")
      graft.ops.DedupOps.connectedComponents(nodes, "id", edges,
          "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      val vals = (1 to 4096).map(i => ("g", i.toDouble)).toDF("g", "v")
      graft.ops.StatOps.exactPercentiles(vals, "g", "v", Seq("p" -> 0.5))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // min of 2 runs per query: first-run JIT/codegen warm-up would
    // otherwise dominate sub-second queries and add ~2x run-to-run noise
    val results = sorted.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn); true } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    // The driver keeps only the LAST 2000 chars of output, and sbt's
    // trailing "[success] Total time..." line eats ~75 of them: rounds
    // 1-2 printed full query names and the front-truncated JSON never
    // parsed. Keys are therefore the qNN prefix (unique by construction,
    // and the contract's own example uses "q1"); the full-name,
    // full-precision map is written to BENCH_DETAIL.json alongside.
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // A crashed query must not READ as a speedup: report the failure
    // count explicitly and null the headline total when any query failed,
    // so the sum-of-successes can never masquerade as a faster round.
    val failures = results.count(_._2 < 0)
    val total =
      if (failures > 0) "null" else fmt(results.map(_._2).sum)
    val detail = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (s"""{"total":$total,"failures":$failures,"cpus":$cpus,"sf":"$sfDir","queries":$detail}""" + "\n")
        .getBytes("UTF-8"))
    catch { case _: Throwable => () } // detail dump is best-effort
    println(line)
    spark.stop()
  }
}
