package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch candidates cover every item above the N/(k+1) guarantee") {
    // 1000 items: "hot" 400×, "warm" 150×, tail 450 distinct singletons
    val data = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 450).map(i => s"t$i")
    val df = data.toDF("x").repartition(7) // force partial merges
    val k = 8
    val out = df.agg(MisraGries.sketch(k)(col("x")).as("mg"))
      .select(explode(col("mg.items")).as("item")).collect()
      .map(_.getString(0)).toSet
    assert(out.size <= k)
    // guarantee: anything with count > 1000/9 ≈ 111 must survive
    assert(out.contains("hot") && out.contains("warm"))
  }

  test("MG counts are underestimates of true counts") {
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map(i => s"t$i")
    val df = data.toDF("x").repartition(3)
    val rows = df.agg(MisraGries.sketch(4)(col("x")).as("mg"))
      .select(explode(arrays_zip(col("mg.items"), col("mg.counts"))))
      .select(col("col.items").as("i"), col("col.counts").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.getOrElse("a", 0L) <= 50L)
    assert(rows.getOrElse("b", 0L) <= 30L)
    assert(rows("a") > 0L)
  }

  test("heavyHitters output is exact and matches a full groupBy") {
    val docs = graft.Tables.documents(spark, sf0001)
    val hh = graft.ops.CurationOps.heavyHitters(docs, "text", 32, 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = exact.map(_._2).sum.toDouble
    val expected = exact.filter(_._2 >= n * 0.05).toMap
    assert(hh == expected)
  }

  test("heavyHitters rejects minFrac below the sketch guarantee") {
    val docs = graft.Tables.documents(spark, sf0001)
    intercept[IllegalArgumentException] {
      graft.ops.CurationOps.heavyHitters(docs, "text", 9, 0.05)
    }
  }
}
