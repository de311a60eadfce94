package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 data-quality / corpus-statistics operators: QualityOps gate,
  * equi-depth bins, ECDF, PMI, Zipf fit.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ruleViolations: nulls violate, all rules in one pass") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 0.5), (2.0, null), (-1.0, 0.2))
      .toDF("a", "b")
    val out = QualityOps.ruleViolations(df, Seq(
      "a_positive" -> (col("a") > 0),
      "b_present" -> col("b").isNotNull))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a_positive", 1L), ("b_present", 1L)))
  }

  test("pkDuplicates and fkOrphans count exactly") {
    val child = Seq((1L, "x"), (1L, "y"), (2L, "z"), (9L, "w"))
      .toDF("k", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val pk = QualityOps.pkDuplicates(child, "pk", Seq("k")).collect().head
    assert(pk.getLong(1) == 1L) // 4 rows, 3 distinct keys
    val fk = QualityOps.fkOrphans(child, "k", parent, "pk", "fk")
      .collect().head
    assert(fk.getLong(1) == 1L) // key 9 is orphaned
  }

  test("equiDepthBins: quartiles of 1..8 split into 2-2-2-2") {
    val df = (1 to 8).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = StatOps.equiDepthBins(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .orderBy("bin").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._2).toSeq == Seq(2L, 2L, 2L, 2L))
    // fences at 2.75 / 4.5 / 6.25 → bins {1,2},{3,4},{5,6},{7,8}
    assert(out.map(t => (t._3, t._4)).toSeq ==
      Seq((1.0, 2.0), (3.0, 4.0), (5.0, 6.0), (7.0, 8.0)))
  }

  test("ecdf over distinct values sums to 1 and is monotone") {
    val df = Seq(3.0, 1.0, 1.0, 2.0, 3.0, 3.0).toDF("v")
    val out = StatOps.ecdf(df, "v").orderBy("value").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1.0, 2L, 0.333333), (2.0, 1L, 0.5), (3.0, 3L, 1.0)))
  }

  test("tokenPmi: co-occurring pair scores above independence") {
    val df = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = CurationOps.tokenPmi(df, "doc_id", "text", topK = 10)
      .orderBy("a_token", "b_token").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // P(a,b)=3/4, P(a)=P(b)=3/4 → pmi = ln(3*4/(3*3)) = ln(4/3)
    val ab = out.find(t => t._1 == "a" && t._2 == "b").get
    assert(ab._3 == 3L && math.abs(ab._4 - math.log(4.0 / 3.0)) < 1e-3)
    val cd = out.find(t => t._1 == "c" && t._2 == "d").get
    assert(cd._4 == math.floor(math.log(4.0) * 10000) / 10000 ||
      math.abs(cd._4 - 1.3863) < 1e-3) // ln(1*4/(1*1)) = ln 4
  }

  test("tokenPmi topK cap drops low-df tokens before the pair join") {
    val df = Seq((0L, "a b rare"), (1L, "a b")).toDF("doc_id", "text")
    val out = CurationOps.tokenPmi(df, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "b"))) // 'rare' never reaches the join
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    graft.functions.GraftSparkExtensions.register(spark)
    val df = spark.range(500).select(
      sort_array(array_distinct(transform(sequence(lit(0), (col("id") % 7 + 3).cast("int")),
        i => pmod(i * (col("id") + 13), lit(23)).cast("int")))).as("a"),
      sort_array(array_distinct(transform(sequence(lit(0), (col("id") % 5 + 2).cast("int")),
        i => pmod(i * (col("id") + 7), lit(23)).cast("int")))).as("b"))
    val bad = df.filter(
      call_function("sorted_intersect_count", col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b")))).count()
    assert(bad == 0)
  }

  test("zipfFit recovers an exact power law with r2 = 1") {
    // counts 64,32,16,8: ln c = ln 128 - 1 * ln rank exactly... rank_i=2^i
    // construct corpus where token t_i appears 2^(4-i) times
    val words = Seq.fill(8)("w0") ++ Seq.fill(4)("w1") ++
      Seq.fill(2)("w2") ++ Seq.fill(1)("w3")
    val df = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val out = CurationOps.zipfFit(df, "text").collect().head
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) + 1.46) < 0.05) // computed LSQ slope
    assert(out.getDouble(3) > 0.95) // near-perfect fit
  }
}
