package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BalanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val maj = (1 to 900).map(i => (i.toLong, "yes"))
    val min = (901 to 1000).map(i => (i.toLong, "no"))
    (maj ++ min).toDF("id", "cls")
  }

  test("oversampleBinary approaches parity in expectation") {
    val out = BalanceOps.oversampleBinary(skewed, "cls", "no", seed = 42L)
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("yes") == 900)
    // Poisson(9.0) per 100 rows → expect ~900, tolerate 4 sigma (~±120)
    assert(math.abs(counts("no") - 900L) < 120,
      s"oversampled minority = ${counts("no")}")
  }

  test("oversampleBinary is seed-deterministic") {
    val a = BalanceOps.oversampleBinary(skewed, "cls", "no", 7L).count()
    val b = BalanceOps.oversampleBinary(skewed, "cls", "no", 7L).count()
    assert(a == b)
  }

  test("resampleToTarget hits ~target per class (single-pass form)") {
    val df = ((1 to 50).map(i => (i, "a")) ++ (1 to 500).map(i => (i, "b")) ++
      (1 to 2000).map(i => (i, "c"))).toDF("id", "cls")
    val out = BalanceOps.resampleToTarget(df, "cls", target = 200, seed = 42L)
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (cls, n) =>
      assert(math.abs(n - 200L) < 70, s"class $cls resampled to $n (target 200)")
    }
  }

  test("resamplePerClassScan (reference-parity form) hits ~target too") {
    val df = ((1 to 100).map(i => (i, "x")) ++ (1 to 1000).map(i => (i, "y")))
      .toDF("id", "cls")
    val out = BalanceOps.resamplePerClassScan(df, "cls", target = 300, seed = 42L)
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (cls, n) =>
      assert(math.abs(n - 300L) < 80, s"class $cls resampled to $n (target 300)")
    }
  }

  test("trainTestSplit partitions the input") {
    val df = (1 to 1000).toDF("id")
    val (tr, te) = BalanceOps.trainTestSplit(df, 0.7, 42L)
    assert(tr.count() + te.count() == 1000)
    assert(tr.intersect(te).count() == 0)
    assert(math.abs(tr.count() - 700L) < 60)
  }

  test("sampleKPerGroup caps every group at exactly min(k, size)") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = BalanceOps.sampleKPerGroup(df, "g", 10, seed = 7L)
    val sizes = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 10L, "small" -> 3L))
    // sampled rows come from the input (no duplication)
    assert(out.exceptAll(df).count() == 0)
    // seeded → reproducible
    val again = BalanceOps.sampleKPerGroup(df, "g", 10, seed = 7L)
    assert(out.exceptAll(again).count() == 0)
    // different seed → (overwhelmingly) different pick from 100 rows
    val other = BalanceOps.sampleKPerGroup(df, "g", 10, seed = 8L)
    assert(out.exceptAll(other).count() > 0)
  }

  test("weightedSampleKPerGroup: caps per group, dominant weight always wins") {
    import org.apache.spark.sql.functions.col
    // one row per group carries (effectively) all the weight: its A-ES
    // key ln(u)/1e9 ≈ 0⁻ beats every ln(u)/1e-6 regardless of u
    val df = ((1 to 50).map(i => (i.toLong, "a", 1e-6)) ++
      Seq((99L, "a", 1e9)) ++
      (201 to 210).map(i => (i.toLong, "b", 1.0))).toDF("id", "g", "wt")
    val out = BalanceOps.weightedSampleKPerGroup(df, "g", "id", col("wt"), 3)
    val byG = out.collect().map(r => (r.getString(1), r.getLong(0))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("a").size == 3 && byG("a").contains(99L))
    assert(byG("b").size == 3)
    // deterministic: no RNG state, so an identical rerun matches
    val again = BalanceOps.weightedSampleKPerGroup(df, "g", "id", col("wt"), 3)
    assert(out.exceptAll(again).count() == 0)
    // zero/negative weights are excluded
    val z = df.withColumn("wt",
      org.apache.spark.sql.functions.when(col("id") === 99L, -1.0)
        .otherwise(col("wt")))
    assert(!BalanceOps.weightedSampleKPerGroup(z, "g", "id", col("wt"), 3)
      .collect().map(_.getLong(0)).contains(99L))
  }
}
