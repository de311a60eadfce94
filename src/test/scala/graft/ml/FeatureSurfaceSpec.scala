package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{StringIndexerModel, VectorAssembler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeatureSurfaceSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("one-hot encoding produces k-1 sized sparse vectors") {
    val df = Tables.orders(spark, sf)
    val model = new Pipeline()
      .setStages(FeatureSurface.oneHotStages("o_orderpriority")).fit(df)
    val out = model.transform(df)
    val v = out.select("o_orderpriority_onehot").head.getAs[Vector](0)
    // 5 priorities + handleInvalid=keep bucket = 6 indices, dropLast → 5
    assert(v.size == 5)
    val sizes = out.select(col("o_orderpriority_onehot")).distinct().count()
    assert(sizes >= 5)
  }

  test("min-max scaler bounds features to [0, 1]") {
    val df = new VectorAssembler().setInputCols(Array("o_totalprice"))
      .setOutputCol("features").transform(Tables.orders(spark, sf))
    val scaled = FeatureSurface.minMaxScaler("features", "scaled")
      .fit(df).transform(df)
      .select($"scaled").collect().map(_.getAs[Vector](0)(0))
    assert(scaled.min >= 0.0 && scaled.max <= 1.0)
    assert(math.abs(scaled.min) < 1e-9 && math.abs(scaled.max - 1) < 1e-9)
  }

  test("index-to-string roundtrips labels") {
    val df = Tables.orders(spark, sf)
    val pipe = new Pipeline().setStages(Array(
      new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol("o_orderstatus").setOutputCol("idx")))
    val model = pipe.fit(df)
    val labels = model.stages.head.asInstanceOf[StringIndexerModel]
      .labelsArray.head
    val back = FeatureSurface.indexToString("idx", "status_back", labels)
      .transform(model.transform(df))
    assert(back.filter($"o_orderstatus" =!= $"status_back").count() == 0)
  }

  test("hashing TF-IDF is vocabulary-free and deterministic") {
    val docs = Tables.documents(spark, sf).limit(100)
    def fit(): Map[Long, Vector] = FeatureSurface.tfidfByHashing(docs, "text")
      .select($"doc_id", $"tfidf").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    val (a, b) = (fit(), fit())
    assert(a.keySet.nonEmpty && a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v == b(k)) }
    assert(a.values.forall(_.numNonzeros > 0))
  }

  test("bisecting k-means clusters embeddings into k cells") {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", array_to_vector($"embedding").as("features"))
    val model = FeatureSurface.bisectingKMeans("features", 4).fit(emb)
    val assigned = model.transform(emb)
    assert(assigned.select($"cluster").distinct().count() == 4)
    // seeded → reproducible assignment
    val again = FeatureSurface.bisectingKMeans("features", 4).fit(emb)
      .transform(emb)
    assert(assigned.select($"vec_id", $"cluster").exceptAll(
      again.select($"vec_id", $"cluster")).count() == 0)
  }

  test("tokenizer lowercases and splits on whitespace") {
    val df = Seq((1L, "Quick Brown Fox")).toDF("id", "text")
    val toks = FeatureSurface.tokenizer("text", "tokens").transform(df)
      .select("tokens").head.getSeq[String](0)
    assert(toks == Seq("quick", "brown", "fox"))
  }

  test("vector indexer marks low-cardinality dims categorical") {
    val df = new VectorAssembler()
      .setInputCols(Array("o_shippriority", "o_totalprice"))
      .setOutputCol("features")
      .transform(Tables.orders(spark, sf)
        .withColumn("o_shippriority", lit(0)))
    val model = FeatureSurface.vectorIndexer("features", "indexed").fit(df)
    // constant priority dim (1 distinct value) is categorical;
    // continuous price is not
    assert(model.categoryMaps.contains(0))
    assert(!model.categoryMaps.contains(1))
  }

  test("PCA components are orthonormal and variance-ordered (q176)") {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .select(array_to_vector(
        transform(col("embedding"), _.cast("double"))).as("features"))
    val m = new PCA().setInputCol("features").setOutputCol("pc")
      .setK(4).fit(emb)
    val ev = m.explainedVariance.toArray
    assert(ev.forall(v => v > 0 && v <= 1.0))
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b },
      "explained variance must be non-increasing")
    val pc = m.pc
    for (i <- 0 until 4; j <- i until 4) {
      val dot = (0 until pc.numRows).map(r => pc(r, i) * pc(r, j)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"pc($i)·pc($j) = $dot")
    }
    // projection is deterministic across refits
    val m2 = new PCA().setInputCol("features").setOutputCol("pc")
      .setK(4).fit(emb)
    assert(m2.explainedVariance.toArray.sameElements(ev))
  }

  test("pipeline model save/load roundtrip (MLWritable)") {
    val df = Tables.orders(spark, sf)
    val model: PipelineModel = new Pipeline()
      .setStages(FeatureSurface.oneHotStages("o_orderstatus")).fit(df)
    val path = java.nio.file.Files
      .createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val a = model.transform(df).select("o_orderstatus_onehot")
    val b = loaded.transform(df).select("o_orderstatus_onehot")
    assert(a.exceptAll(b).count() == 0)
  }
}
