package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactPercentiles matches the built-in percentile aggregate " +
    "bit-for-bit on random data") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000)
      .map(i => (s"g${i % 3}", rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val got = StatOps.exactPercentiles(df, "g", "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = df.groupBy("g").agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.95)").as("p95"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("exactPercentiles handles single-row groups and exact positions") {
    val df = Seq(("a", 1.0), ("b", 1.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val out = StatOps.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    // single row: p50 = the row; 3 rows: p50 = middle row exactly
    assert(out.toSeq == Seq(("a", 1.0), ("b", 2.0)))
  }

  test("exactPercentiles skips nulls like the built-in aggregate") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
        ("b", None), ("b", Some(5.0)), ("c", None))
      .toDF("g", "v")
    val got = StatOps.exactPercentiles(df, "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val want = df.filter($"v".isNotNull).groupBy("g").agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // group "c" (all null) is absent by documented contract
    assert(got.toSeq == want.toSeq && got.map(_._1).toSeq == Seq("a", "b"))
  }

  test("profile: null/distinct/min/max per column, exact and approx") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None),
      (Some(2L), Some("y")), (None, Some("x")))
      .toDF("k", "s")
    val got = StatOps.profile(df, Seq("k", "s")).orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("k", 4L, 3L, 2L, "1", "2"),
      ("s", 4L, 3L, 2L, "x", "y")))
    // approx variant: same shape, HLL counts exact at this cardinality
    val ap = StatOps.profile(df, Seq("k", "s"), exact = false)
      .orderBy("column_name").collect()
    assert(ap.map(_.getLong(3)).toSeq == Seq(2L, 2L))
    // and its plan has no Expand (the scale rationale for approx)
    val plan = StatOps.profile(df, Seq("k", "s"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("ksStatistic: 0 for identical cohorts, 1 for disjoint supports") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i =>
      Seq(("g", i.toDouble, 0), ("g", i.toDouble, 1)))
      .toDF("g", "x", "c")
    val ks0 = StatOps.ksStatistic(same, "g", "x",
      org.apache.spark.sql.functions.col("c")).collect().head
    assert(ks0.getAs[Double]("ks") == 0.0)
    assert(ks0.getAs[Long]("n_a") == 50L && ks0.getAs[Long]("n_b") == 50L)
    val disjoint = ((1 to 20).map(i => ("g", i.toDouble, 0)) ++
      (100 to 120).map(i => ("g", i.toDouble, 1))).toDF("g", "x", "c")
    val ks1 = StatOps.ksStatistic(disjoint, "g", "x",
      org.apache.spark.sql.functions.col("c")).collect().head
    assert(ks1.getAs[Double]("ks") == 1.0)
  }

  test("histogram: equi-width buckets, max closes last bucket, counts total") {
    import spark.implicits._
    // g1: values 0..10 over 5 buckets of width 2; 10 lands in bucket 4
    val df = ((0 to 10).map(v => ("g1", v.toDouble)) :+ ("g2", 7.0))
      .toDF("g", "v")
    val out = StatOps.histogram(df, "g", "v", 5)
      .orderBy("g", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("g1", 0L, 0.0, 2.0, 2L),   // 0, 1
      ("g1", 1L, 2.0, 4.0, 2L),   // 2, 3
      ("g1", 2L, 4.0, 6.0, 2L),   // 4, 5
      ("g1", 3L, 6.0, 8.0, 2L),   // 6, 7
      ("g1", 4L, 8.0, 10.0, 3L),  // 8, 9, and max=10 clamped in
      ("g2", 0L, 7.0, 7.0, 1L)))  // single-valued group → bucket 0
    assert(out.map(_._5).sum == df.count())
  }

  test("psi: identical cohorts score exactly zero") {
    val vals = (1 to 200).map(_.toDouble)
    val df = (vals.map(("ref", _)) ++ vals.map(("cur", _))).toDF("cohort", "v")
    val out = StatOps.psi(df, "cohort", "ref", "v", nBins = 5).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0)
      assert(r.getAs[Double]("psi") == 0.0)
    }
  }

  test("psi: a shifted cohort scores positive, empty bins stay finite") {
    // cur sits entirely above ref's 4/5 of mass: bins 1-4 are EMPTY for
    // cur (smoothing must keep their terms finite), bin 5 is all of it
    val df = ((1 to 100).map(v => ("ref", v.toDouble)) ++
      (90 to 189).map(v => ("cur", v.toDouble))).toDF("cohort", "v")
    val out = StatOps.psi(df, "cohort", "ref", "v", nBins = 5)
      .orderBy("bin").collect()
    assert(out.length == 5)
    val psi = out.head.getAs[Double]("psi")
    assert(psi > 1.0, s"strong drift should score high, got $psi")
    out.foreach(r => assert(!r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite))
    // shares on each side sum to 1 (smoothing preserves normalization)
    assert(math.abs(out.map(_.getAs[Double]("ref_share")).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getAs[Double]("cur_share")).sum - 1.0) < 1e-9)
  }

  test("psi: multiple non-reference cohorts each get their own total") {
    val df = ((1 to 50).map(v => ("ref", v.toDouble)) ++
      (1 to 50).map(v => ("same", v.toDouble)) ++
      (51 to 100).map(v => ("far", v.toDouble))).toDF("cohort", "v")
    val out = StatOps.psi(df, "cohort", "ref", "v", nBins = 4).collect()
    val byCohort = out.groupBy(_.getAs[String]("cohort"))
      .map { case (c, rs) => c -> rs.head.getAs[Double]("psi") }
    assert(byCohort("same") == 0.0)
    assert(byCohort("far") > byCohort("same"))
  }

  test("shardStats: hand-computed min/max/null counts per shard") {
    val df = Seq((0L, Some(10.0)), (2L, Some(30.0)), (4L, None),
      (1L, Some(5.0)), (3L, Some(7.0)))
      .toDF("k", "v")
    val out = StatOps.shardStats(df, pmod(col("k"), lit(2L)), Seq("v"))
      .orderBy("shard").collect()
    assert(out.length == 2)
    val even = out(0)
    assert(even.getAs[Long]("shard") == 0L)
    assert(even.getAs[Long]("n_rows") == 3L)
    assert(even.getAs[Double]("v_min") == 10.0 &&
      even.getAs[Double]("v_max") == 30.0)
    assert(even.getAs[Long]("v_nulls") == 1L)
    val odd = out(1)
    assert(odd.getAs[Long]("n_rows") == 2L &&
      odd.getAs[Long]("v_nulls") == 0L)
  }

  test("skyline2d matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(19)
    val pts = (1 to 400).map(_ =>
      (rnd.nextDouble() * 100, rnd.nextDouble() * 50)).distinct
    val out = StatOps.skyline2d(pts.toDF("x", "y"), "x", "y",
        bucketWidth = 10.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val brute = pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
    assert(out == brute)
  }

  test("skyline2d keeps equal-x points only if their y is maximal") {
    // (5,1) dominated by (5,3); (1,9) survives (nothing beats its y)
    val df = Seq((5.0, 3.0), (5.0, 1.0), (1.0, 9.0), (0.5, 2.0))
      .toDF("x", "y")
    val out = StatOps.skyline2d(df, "x", "y", bucketWidth = 2.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(out == Set((5.0, 3.0), (1.0, 9.0)))
  }

  test("rollupMerge of per-bucket state equals the direct aggregate") {
    val raw = Seq(("a", "d1", 1.0), ("a", "d1", 3.0), ("a", "d2", 5.0),
      ("b", "d1", 2.0), ("b", "d2", 8.0), ("b", "d2", 0.5))
      .toDF("g", "day", "v")
    val merged = StatOps.rollupMerge(
      StatOps.dailyState(raw, Seq(col("g"), col("day")), "v"), Seq("g"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"),
        r.getAs[Double]("sum_v"), r.getAs[Double]("min_v"),
        r.getAs[Double]("max_v")))
    val direct = raw.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"),
        r.getAs[Double]("s"), r.getAs[Double]("mn"),
        r.getAs[Double]("mx")))
    assert(merged.toSeq == direct.toSeq)
  }

  test("shardedCumsum is bit-identical to the unpartitioned cumulative " +
    "window on random long data (incl. skewed keys)") {
    val rnd = new scala.util.Random(41)
    // non-contiguous, shuffled unique keys; values include zeros and
    // heavy repeats so fence ties between DIFFERENT keys exist
    val rows = rnd.shuffle((1 to 4000).toList)
      .map(i => (i.toLong * 7 + 3, rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "a", "b").repartition(7)
    val got = StatOps.shardedCumsum(df, "k",
        Seq("a" -> "ca", "b" -> "cb"), nShards = 8)
      .select("k", "ca", "cb").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .select("k", "ca", "cb").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("shardedCumsumBy is bit-identical to the per-group cumulative " +
    "window, including null groups and null order keys") {
    val rnd = new scala.util.Random(47)
    // unique-per-group order keys; one NULL group and one null-order
    // row per group — the window form keeps both (NULL is an ordinary
    // partition; null order keys sort first), so the sharded form must
    val base = (1 to 2000).map { i =>
      (if (i % 5 == 4) null else s"g${i % 3}",
        java.lang.Double.valueOf(i.toDouble), rnd.nextInt(9).toLong)
    }
    val nullOrder = Seq(("g0", null.asInstanceOf[java.lang.Double], 7L),
      (null, null.asInstanceOf[java.lang.Double], 3L))
    val df = (base ++ nullOrder).toDF("g", "v", "a").repartition(6)
    val got = StatOps.shardedCumsumBy(df, "g", "v", Seq("a" -> "ca"))
      .select("g", "v", "ca").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("ca", sum(col("a")).over(w))
      .select("g", "v", "ca").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
    assert(got == want)
    // degenerate: a group narrower than the shard count, and a group
    // of exactly one row
    val tiny = Seq(("a", 1.0, 2L), ("a", 2.0, 3L), ("b", 9.0, 5L))
      .toDF("g", "v", "a")
    val gotTiny = StatOps.shardedCumsumBy(tiny, "g", "v",
        Seq("a" -> "ca")).select("g", "v", "ca")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(gotTiny.toSeq ==
      Seq(("a", 1.0, 2L), ("a", 2.0, 5L), ("b", 9.0, 5L)))
  }

  test("shardedRank is bit-identical to the per-group row_number window " +
    "on random data with duplicate order keys") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 3000).map(i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(40).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(5)
    val got = StatOps.shardedRank(df, "g", "v", "id", "rk")
      .select("g", "id", "rk").orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .select("g", "id", "rk").orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("shardedRankTied is bit-identical to the per-group row_number " +
    "window on tie-DENSE order keys (giant blocks, null group, null value)") {
    val rnd = new scala.util.Random(47)
    // adversarial tie density: 3000 rows over FOUR distinct order
    // values, one of them holding ~60% of the rows (the modal block
    // plain shardedRank would co-locate in one shard), plus a NULL
    // group and NULL order values (window semantics: NULLS FIRST)
    val rows = (1 to 3000).map { i =>
      val v: java.lang.Double =
        if (i % 100 == 0) null
        else if (rnd.nextInt(10) < 6) 7.0
        else rnd.nextInt(3).toDouble
      val g = if (i % 17 == 0) null else s"g${rnd.nextInt(3)}"
      (g, v, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(5)
    val got = StatOps.shardedRankTied(df, "g", "v", "id", "rk")
      .select("g", "id", "rk").orderBy("g", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .select("g", "id", "rk").orderBy("g", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    // the data-scale window is partitioned by (block, shard) — the tie
    // block itself is split across shards, which is the whole point
    val plan = StatOps.shardedRankTied(df, "g", "v", "id", "rk")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__blk"),
      s"expected the within-block window partitioned by __blk (+shard):\n$plan")
  }

  test("shardedCumsum survives degenerate frames: tiny input, one row, " +
    "constant order-key domain narrower than the shard count") {
    // 3 rows, 8 shards: most shards empty
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "a")
    val gotTiny = StatOps.shardedCumsum(tiny, "k", Seq("a" -> "ca"))
      .select("k", "ca").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotTiny.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
    // one row
    val one = Seq((42L, 5L)).toDF("k", "a")
    assert(StatOps.shardedCumsum(one, "k", Seq("a" -> "ca"))
      .select("ca").head().getLong(0) == 5L)
    // the plan carries NO unpartitioned window over the data frame:
    // the only empty-partitionSpec window is the nShards-row offset
    // frame (bounded by construction)
    val big = (1 to 1000).map(i => (i.toLong, 1L)).toDF("k", "a")
    val plan = StatOps.shardedCumsum(big, "k", Seq("a" -> "ca"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__shard"),
      s"expected the data window partitioned by __shard:\n$plan")
  }

  test("shardedCumsumBy with tieCol is bit-identical to the per-group " +
    "window ordered by (orderCol, tieCol) on DUPLICATE order keys") {
    val rnd = new scala.util.Random(53)
    // heavy order-key ties: scores drawn from just 12 values, unique id
    // tiebreak — the q87/q99 budget-selection shape
    val rows = (1 to 3000).map(i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(12).toDouble, s"id$i",
        rnd.nextInt(50).toLong))
    val df = rows.toDF("g", "v", "id", "a").repartition(5)
    val got = StatOps.shardedCumsumBy(df, "g", "v", Seq("a" -> "ca"),
        tieCol = Some("id"))
      .select("g", "id", "ca").orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("ca", sum(col("a")).over(w))
      .select("g", "id", "ca").orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("withMidRanks matches rank() + (ties-1)/2 over the raw rows, " +
    "NULL groups and NULL values included (q190/q259's shared ranks)") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 500).map { i =>
      val g = if (i % 13 == 0) null else s"g${rnd.nextInt(3)}"
      val v: java.lang.Double =
        if (i % 11 == 0) null else rnd.nextInt(6).toDouble
      (g, v, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(5)
    val perV = df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("__cnt"))
    val got = StatOps.withMidRanks(perV, "g", "v", "__cnt", "mr")
      .select("g", "v", "mr").collect()
      .map(r => ((Option(r.getString(0)),
        Option(r.get(1)).map(_.toString)), r.getDouble(2))).toMap
    // reference: the fractional rank every ROW of that value gets
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val want = df
      .withColumn("mr", rank().over(w) +
        (count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g"), col("v"))) - 1) / lit(2.0))
      .select("g", "v", "mr").distinct().collect()
      .map(r => ((Option(r.getString(0)),
        Option(r.get(1)).map(_.toString)), r.getDouble(2))).toMap
    assert(got == want)
  }

  test("spark.graft.assertShardedOrder seeds the total-order " +
    "precondition as a runtime check (round-10 ADVICE made executable)") {
    val dup = Seq(("g0", 1.0, 1L), ("g0", 1.0, 2L), ("g0", 2.0, 3L))
      .toDF("g", "v", "a")
    spark.conf.set("spark.graft.assertShardedOrder", "true")
    try {
      // duplicate (g, v) with no tiebreak → refused
      val e = intercept[IllegalArgumentException] {
        StatOps.shardedCumsumBy(dup, "g", "v", Seq("a" -> "ca")).collect()
      }
      assert(e.getMessage.contains("totally order"))
      // the same frame with a unique tiebreak passes
      StatOps.shardedCumsumBy(dup.withColumn("id", col("a")), "g", "v",
        Seq("a" -> "ca"), tieCol = Some("id")).collect()
      // shardedRank's (orderCol, tieCol) pair is checked too
      StatOps.shardedRank(dup.withColumn("id", col("a")), "g", "v", "id",
        "rk").collect()
      val e2 = intercept[IllegalArgumentException] {
        StatOps.shardedRank(dup.withColumn("id", lit(1L)), "g", "v", "id",
          "rk").collect()
      }
      assert(e2.getMessage.contains("totally order"))
    } finally spark.conf.unset("spark.graft.assertShardedOrder")
    // check off by default: the duplicate frame computes (ambiguous at
    // ties, as documented) instead of throwing
    StatOps.shardedCumsumBy(dup, "g", "v", Seq("a" -> "ca")).collect()
  }

  test("weightedMedian is exact at a fractional-weight half boundary " +
    "(decimal accumulation cannot drift the >= total/2 pick)") {
    // ten 0.1 weights: in double, total = 0.9999999999999999 and the
    // running sum drifts — decimal accumulation keeps total = 1.0 and
    // cum(v=5) = 0.5 exactly, so the lower weighted median is 5
    val df = (1 to 10).map(i => ("g", i.toDouble, 0.1))
      .toDF("g", "v", "w")
    val got = StatOps.weightedMedian(df, "g", "v", "w").collect().head
    assert(got.getAs[Double]("weighted_median") == 5.0, got)
    assert(got.getAs[Double]("total_weight") == 1.0, got)
    // integral weights unchanged (the q193 contract)
    val ints = Seq(("g", 1.0, 3.0), ("g", 2.0, 1.0), ("g", 3.0, 4.0))
      .toDF("g", "v", "w")
    val m = StatOps.weightedMedian(ints, "g", "v", "w").collect().head
    assert(m.getAs[Double]("weighted_median") == 2.0, m)
  }
}
