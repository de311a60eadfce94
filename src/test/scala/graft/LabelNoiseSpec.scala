package graft

import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** Bounds q232's SRP-bucketed label-noise screen against the exact
  * all-neighbor form: the bucketed screen restricts each query's
  * neighbor pool to its sign bucket (that's what makes it an equi-join
  * instead of an O(n²) broadcast), so its consensus is approximate —
  * this spec proves the approximation is a SCREEN, not noise, by
  * checking per-label average agreement lands within tolerance of the
  * exact kNN consensus on the fixture.
  */
class LabelNoiseSpec extends SparkSpec {

  test("bucketed consensus tracks exact kNN consensus within 0.2") {
    val bucketed = queries.CorpusQueries.q232LabelNoise(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap

    // exact form: every other vector is a candidate (the pre-r6 shape,
    // kept here as the oracle of record for the approximation)
    val emb = Tables.embeddings(spark, sf0001)
    val exact = VectorOps.batchTopK(emb,
        emb.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")), k = 10)
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("qlabel")), Seq("query_id"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("query_id"), col("qlabel"))
      .agg(avg((col("label") === col("qlabel")).cast("double"))
        .as("agree"))
      .groupBy(col("qlabel"))
      .agg(avg(col("agree")).as("avg_agreement"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    assert(bucketed.nonEmpty && exact.nonEmpty)
    bucketed.foreach { case (label, agree) =>
      val e = exact(label)
      assert(math.abs(agree - e) <= 0.2,
        s"label $label: bucketed consensus $agree vs exact $e drifts > 0.2")
    }
  }
}
