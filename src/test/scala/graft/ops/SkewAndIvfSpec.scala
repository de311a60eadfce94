package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewAndIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 5000 rows, 50 cold keys with 10 each
    val hot = (1 to 5000).map(_ => ("hot", 1.0))
    val cold = (1 to 50).flatMap(k => (1 to 10).map(_ => (s"k$k", 2.0)))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCount(skewed, "k", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 5000L)
  }

  test("saltedAgg (sum) equals plain sum") {
    val salted = SkewOps.saltedAgg(skewed, "k", "v", 8, sum, sum, "total")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = skewed.groupBy("k").agg(sum("v").as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain left join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("missing", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"), "left")
      .groupBy("label").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(skewed, dim, "k", salts = 4)
      .groupBy("label").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("IVF index: full-probe equals brute force; partial probe is subset") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = VectorOps.embeddingOf(spark, sf0001, 5L)
    val index = VectorOps.ivfBuild(emb, k = 8)
    assert(index.bucketed.select(countDistinct(col("cell"))).head().getLong(0) <= 8)

    val brute = VectorOps.bruteForceTopK(emb, q, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = VectorOps.ivfTopK(index, q, 10, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute, "nProbe = k must equal exact search")

    val partial = VectorOps.ivfTopK(index, q, 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(partial.nonEmpty)
    assert(partial.head == 5L, "query's own vector is in its own cell")
    // recall@10 of the partial probe against brute force
    val recall = partial.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.3, s"suspiciously low recall: $recall")
  }
}
