package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler

class FrequencyEncoderModelSpec extends SparkSpec {
  import spark.implicits._

  test("composes inside an ML Pipeline and feeds the assembler") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "x")
    val enc = new FrequencyEncoderModel()
      .setInputCol("k").setOutputCol("k_freq")
    val assembler = new VectorAssembler()
      .setInputCols(Array("k_freq", "x")).setOutputCol("features")
    val out = new Pipeline().setStages(Array(enc, assembler))
      .fit(df).transform(df)
    val rows = out.select("k", "k_freq").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L))
    assert(out.schema("features").dataType.typeName == "vector")
  }

  test("transformSchema validates input and appends output") {
    val enc = new FrequencyEncoderModel()
      .setInputCol("k").setOutputCol("k_freq")
    val schema = Seq(("a", 1.0)).toDF("k", "x").schema
    val out = enc.transformSchema(schema)
    assert(out.fieldNames.contains("k_freq"))
    intercept[IllegalArgumentException] {
      enc.transformSchema(Seq((1, 2)).toDF("p", "q").schema)
    }
  }
}
