package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DotInt8Spec extends SparkSpec {

  private def registered() = GraftSparkExtensions.register(spark)

  test("native dot matches the HOF zip_with formulation on the corpus") {
    registered()
    val q8 = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        call_function("quantize_int8", col("embedding")).as("q"))
    val probe = q8.filter(col("vec_id") === 0)
      .select(col("q").as("p"))
    val both = q8.limit(200).crossJoin(broadcast(probe)).select(
      col("vec_id"),
      call_function("dot_int8", col("q"), col("p")).as("native"),
      expr("aggregate(zip_with(q, p, (a, b) -> a * CAST(b AS BIGINT)), " +
        "0L, (acc, x) -> acc + x)").as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("SQL surface, null elements and mismatched lengths") {
    registered()
    // basic arithmetic
    assert(spark.sql("SELECT dot_int8(array(1, 2, 3), array(4, 5, 6)) AS d")
      .head().getLong(0) == 32L)
    // a null element contributes 0 on either side
    assert(spark.sql(
      "SELECT dot_int8(array(1, NULL, 3), array(4, 5, 6)) AS d")
      .head().getLong(0) == 22L)
    // shorter array wins (tolerant zip)
    assert(spark.sql("SELECT dot_int8(array(2, 3), array(10)) AS d")
      .head().getLong(0) == 20L)
    // a NULL array yields NULL (BinaryExpression null-safety)
    assert(spark.sql(
      "SELECT dot_int8(CAST(NULL AS ARRAY<INT>), array(1)) AS d")
      .head().isNullAt(0))
  }

  test("exact accumulation at int8 extremes cannot overflow") {
    registered()
    val d = spark.sql(
      "SELECT dot_int8(array_repeat(127, 4096), array_repeat(-127, 4096))" +
        " AS d").head().getLong(0)
    assert(d == -127L * 127L * 4096L)
  }
}
