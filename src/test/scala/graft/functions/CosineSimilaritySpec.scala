package graft.functions

import graft.{SparkSpec, Tables}
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftSparkExtensions.register(spark)

  test("native expression matches the HOF formulation on the corpus") {
    registered()
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    val q = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      call_function("cosine_sim", col("embedding"), col("qv")).as("native"),
      VectorOps.cosine(col("embedding"), col("qv")).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("SQL surface: cosine_sim callable after extension registration") {
    registered()
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(r.getDouble(0) == 1.0)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").head()
    assert(orth.getDouble(0) == 0.0)
  }

  test("null semantics: mismatched length and zero norm yield null") {
    registered()
    assert(spark.sql(
      "SELECT cosine_sim(array(1.0D), array(1.0D, 2.0D)) AS c").head().isNullAt(0))
    assert(spark.sql(
      "SELECT cosine_sim(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c").head().isNullAt(0))
    assert(spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c").head().isNullAt(0))
  }

  test("float arrays accepted (corpus element type)") {
    registered()
    val df = Seq((Seq(1f, 2f), Seq(2f, 4f))).toDF("a", "b")
    val c = df.select(call_function("cosine_sim", col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("interpreted eval path (nullSafeEval) agrees with codegen") {
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 2.0, 1.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val expected = 10.0 / 14.0 // dot=10, norms=sqrt(14)
    assert(math.abs(e.eval(null).asInstanceOf[Double] - expected) < 1e-12)
  }
}
