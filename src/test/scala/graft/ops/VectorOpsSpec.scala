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

  test("normNative is bit-identical to the HOF norm on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val both = emb.select(
      VectorOps.norm(col("embedding")).as("hof"),
      VectorOps.normNative(col("embedding")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    // null array → null; known vector → exact value
    val df = Seq((Some(Seq(3f, 4f)), Option.empty[Seq[Float]]))
      .toDF("v", "nv")
    assert(df.select(VectorOps.normNative(col("v"))).head().getDouble(0) == 5.0)
    assert(df.select(VectorOps.normNative(col("nv"))).head().isNullAt(0))
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

  test("quantizeInt8: range, sign, zero-vector, and round-trip error bound") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),          // all-zero → zeros, scale 0
      (3L, Seq(2.0f)))                 // single element → ±127
      .toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8(df).orderBy("vec_id").collect()
    val q1 = out(0).getSeq[Int](2)
    assert(out(0).getDouble(1) == 1.0)
    assert(q1 == Seq(64, -127, 32, 0)) // 0.5*127+0.5 floor = 64
    assert(out(1).getDouble(1) == 0.0 && out(1).getSeq[Int](2) == Seq(0, 0))
    assert(out(2).getSeq[Int](2) == Seq(127))
    // dequantization error ≤ scale/254 + float eps on every element
    val emb = graft.Tables.embeddings(spark, sf0001)
    val errs = VectorOps.quantizeInt8(emb).join(emb, "vec_id")
      .select(col("scale"),
        expr("aggregate(zip_with(qvec, embedding, (q, x) -> " +
          "abs(q * scale / 127.0 - cast(x as double))), 0d, " +
          "(acc, e) -> greatest(acc, e))").as("max_err"))
      .collect()
    errs.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(0) / 254.0 + 1e-9,
        s"max dequant error ${r.getDouble(1)} vs scale ${r.getDouble(0)}")
    }
  }

  test("annTopK finds the query's own bucket (self in results)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val q = VectorOps.embeddingOf(spark, sf0001, 7L)
    val top = VectorOps.annTopK(emb, q, dim, 4, 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("vec_id") == 7L)
  }

  test("batchTopK agrees with per-query bruteForceTopK") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val qids = Seq(0L, 7L, 13L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = VectorOps.batchTopK(emb, queries, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val single = qids.flatMap { q =>
      VectorOps.bruteForceTopK(
        emb.filter(col("vec_id") =!= q),
        VectorOps.embeddingOf(spark, sf0001, q), 4)
        .collect().zipWithIndex
        .map { case (r, i) => (q, i + 1, r.getLong(0), r.getDouble(1)) }
    }.sortBy(t => (t._1, t._2))
    assert(batch == single)
  }

  test("gridNeighborJoin finds exactly the within-radius pairs, once") {
    // (1,2) dist 0.03 — same-cell pair; (3,4) dist 0.04 straddles a
    // cell boundary; (5,6) dist exactly 0.05 — EXCLUDED (strict <);
    // everything else is far apart
    val pts = Seq(
      (1L, 0.00, 0.00), (2L, 0.03, 0.00),
      (3L, 0.24, 0.20), (4L, 0.28, 0.20),
      (5L, 0.50, 0.50), (6L, 0.55, 0.50),
      (7L, 0.90, 0.90))
      .toDF("id", "x", "y")
    val out = VectorOps.gridNeighborJoin(pts, "id", "x", "y", 0.05)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.03), (3L, 4L, 0.04)))
  }

  test("lofFromKnn: kdist is each point's OWN k-th-NN distance and " +
    "asymmetric-kNN outliers are scored, not dropped") {
    // 1-D line: tight cluster {a=0, b=0.1, c=0.2} plus far outlier
    // z=10. With k=2, z's neighbors are {c, b} but z appears in NO
    // other point's kNN list — under a group-by-pointed-at-endpoint
    // kdist, z would have no kdist (dropped by the join) and c's kdist
    // would absorb z's 9.8 incoming edge. The correct chain (Breunig
    // et al. §3): kdist a=0.2 b=0.1 c=0.2 z=9.9; lrd a=2/0.3 b=2/0.4
    // c=2/0.3 z=2/19.7; LOF(z)=avg(lrd_c,lrd_b)/lrd_z ≈ 57.5.
    val knn = Seq(
      ("a", "b", 0.1), ("a", "c", 0.2),
      ("b", "a", 0.1), ("b", "c", 0.1),
      ("c", "b", 0.1), ("c", "a", 0.2),
      ("z", "c", 9.8), ("z", "b", 9.9))
      .toDF("p", "o", "d")
    val out = VectorOps.lofFromKnn(knn, k = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.size == 4, "every kNN query point must be scored")
    assert(math.abs(out("z")._3 - 9.9) < 1e-9) // z's own 2nd-NN dist
    assert(math.abs(out("c")._3 - 0.2) < 1e-9) // NOT z's 9.8 edge
    val lofZ = out("z")._1
    assert(math.abs(lofZ - (2.0 / 0.3 + 2.0 / 0.4) / 2 / (2.0 / 19.7))
      < 1e-6)
    assert(out.removed("z").values.forall(_._1 < 1.5) && lofZ > 10,
      "outlier must dominate the cluster's near-1 scores")
  }

  test("lofFromKnn: a neighbor that never queried falls back to " +
    "reach-dist = d and a neutral lrd ratio instead of dropping the " +
    "edge (advice r8)") {
    // x appears only as a NEIGHBOR (never as a query p). Old inner
    // joins dropped the (a,x)/(b,x) edges: lrd summed 1 reach term
    // instead of k=2 and was silently inflated.
    val knn = Seq(
      ("a", "b", 0.1), ("a", "x", 0.5),
      ("b", "a", 0.1), ("b", "x", 0.6))
      .toDF("p", "o", "d")
    val out = VectorOps.lofFromKnn(knn, k = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("a", "b"))
    // kdist(a)=0.5, kdist(b)=0.6
    // reach(a,b)=max(kdist(b),0.1)=0.6; reach(a,x)=d=0.5 (no kdist(x))
    // => lrd(a)=2/1.1; reach(b,a)=0.5, reach(b,x)=0.6 => lrd(b)=2/1.1
    assert(math.abs(out("a")._2 - 2.0 / 1.1) < 1e-9,
      s"lrd(a) must sum BOTH reach terms: ${out("a")._2}")
    assert(math.abs(out("b")._2 - 2.0 / 1.1) < 1e-9)
    // x contributes a neutral 1.0 ratio; lrd(a)==lrd(b) => LOF = 1.0
    assert(math.abs(out("a")._1 - 1.0) < 1e-9)
    assert(math.abs(out("b")._1 - 1.0) < 1e-9)
  }

  test("gridNeighborJoin matches brute force on random points") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextDouble() * 0.5, rnd.nextDouble() * 0.5))
    val df = pts.toDF("id", "x", "y")
    val grid = VectorOps.gridNeighborJoin(df, "id", "x", "y", 0.05)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d = math.sqrt((a._2 - b._2) * (a._2 - b._2) +
        (a._3 - b._3) * (a._3 - b._3)) if d < 0.05
    } yield (a._1, b._1)).toSet
    assert(grid == brute)
  }
}
