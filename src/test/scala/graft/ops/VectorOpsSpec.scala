package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1f, 2f, 2f), Seq(2f, 0f, 1f))).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0) == 4.0)
    assert(df.select(VectorOps.norm(col("a"))).head().getDouble(0) == 3.0)
    val c = df.select(VectorOps.cosine(col("a"), col("a"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine is symmetric and bounded") {
    val df = Seq((Seq(0.3f, -1.2f, 4f), Seq(-2f, 0.5f, 1f))).toDF("a", "b")
    val ab = df.select(VectorOps.cosine(col("a"), col("b"))).head().getDouble(0)
    val ba = df.select(VectorOps.cosine(col("b"), col("a"))).head().getDouble(0)
    assert(ab == ba && ab >= -1.0 && ab <= 1.0)
  }

  test("bruteForceTopK returns k best, self first when query in corpus") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val q = VectorOps.embeddingOf(spark, sf0001, 3L)
    val top = VectorOps.bruteForceTopK(emb, q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("vec_id") == 3L) // cos(q, q) = 1
    val sims = top.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("srpBucket is deterministic and splits the corpus") {
    graft.functions.GraftSparkExtensions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val b1 = emb.select(VectorOps.srpBucket(col("embedding"), dim, 4).as("b"))
    val counts = b1.groupBy("b").count().collect()
    assert(counts.length > 1, "all vectors in one bucket — planes degenerate")
    val again = emb.select(VectorOps.srpBucket(col("embedding"), dim, 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(again == b1.collect().map(_.getLong(0)).toSeq)
  }

  test("native srp_bucket expression matches the HOF formulation " +
    "bit-for-bit, including degenerate inputs") {
    graft.functions.GraftSparkExtensions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val both = emb.select(col("vec_id"),
        VectorOps.srpBucket(col("embedding"), dim, 6).as("native"),
        VectorOps.srpBucketHof(col("embedding"), dim, 6).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(both.count() == 0)
    // length-mismatched and null-element vectors → bucket 0 (the HOF's
    // null-propagation semantics)
    val edge = Seq(
      (1L, Seq(1.0f, 2.0f)), // shorter than dim
      (2L, Seq.fill(dim)(0.5f)))
      .toDF("id", "v")
      .select(col("id"), VectorOps.srpBucket(col("v"), dim, 6).as("b"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(edge(0) == 0L)
  }

  test("annTopK finds the query's own bucket (self in results)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val q = VectorOps.embeddingOf(spark, sf0001, 7L)
    val top = VectorOps.annTopK(emb, q, dim, 4, 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("vec_id") == 7L)
  }
}
