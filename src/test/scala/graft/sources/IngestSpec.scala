package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class IngestSpec extends SparkSpec {

  private def writeTempJson(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    val f = new java.io.File(dir, "data.json")
    Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    f.getAbsolutePath
  }

  private val goodAndBad = Seq(
    """{"id": 1, "name": "a", "amount": 10.5}""",
    """{"id": 2, "name": "b", "amount": 20.0}""",
    """this is not json at all""",
    """{"id": 3, "name": "c", "amount": -1}""")

  test("inferred permissive read captures corrupt rows") {
    val path = writeTempJson(goodAndBad)
    val df = Ingest.readJsonInferred(spark, path).cache()
    assert(df.count() == 4)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() == 1)
    assert(corrupt.head().getAs[String]("_corrupt_record")
      .contains("not json"))
  }

  test("explicit-schema read parses without inference and types stick") {
    val path = writeTempJson(goodAndBad)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DoubleType)))
    val df = Ingest.readJson(spark, path, schema)
    assert(df.schema("amount").dataType == DoubleType)
    assert(df.filter(col("id").isNotNull).count() == 3)
  }

  test("dropCorrupt removes failed rows then the capture column") {
    val path = writeTempJson(goodAndBad)
    // cache() first: Spark refuses corrupt-column-only queries on raw
    // JSON (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val clean = Ingest.dropCorrupt(
      Ingest.readJsonInferred(spark, path).cache())
    assert(clean.count() == 3)
    assert(!clean.columns.contains("_corrupt_record"))
    // no-op when the column is absent
    assert(Ingest.dropCorrupt(clean).count() == 3)
  }

  test("csv round trip with schema") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "d.csv")
    Files.write(f.toPath, "id,v\n1,x\n2,y\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = Ingest.readCsv(spark, f.getAbsolutePath, schema)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "x"), (2L, "y")))
  }

  test("ORC roundtrip with predicate pushdown into the scan") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath
    val df = (1L to 100L).map(i => (i, s"row$i", i * 1.5)).toDF("id", "name", "v")
    Ingest.writeOrc(df, out)
    val back = Ingest.readOrc(spark, out)
    assert(back.count() == 100)
    val filtered = back.filter(col("id") > 90L).select("id", "name")
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90)"),
      plan)
    assert(!plan.contains("ReadSchema: struct<id:bigint,name:string,v:double>"),
      s"column pruning missing: $plan")
  }

  test("partitioned parquet sink prunes partitions on read") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v")
    Ingest.writePartitioned(df, out, Seq("k"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    val pruned = back.filter(col("k") === "a")
    assert(pruned.count() == 2)
    // partition pruning visible in the scan: only k=a directory read
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(back.select(countDistinct(col("k"))).head().getLong(0) == 2)
  }
}
