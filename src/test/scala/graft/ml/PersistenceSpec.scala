package graft.ml

import graft.SparkSpec
import graft.Tables
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** Model persistence (MLWritable/MLReader) round trips — the serving
  * surface q417_model_persistence exercises at manifest scale: a
  * production engine loads models it did NOT just train (the reference
  * retrains per run, `random_forest_final_class_8.py:199-243`). A
  * reloaded model must transform identically, keep its params, and be
  * loadable into a FRESH transform chain with no reference to the
  * fitting session state.
  */
class PersistenceSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf0001)
    .select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice"),
      when(col("o_totalprice") > 150000, "hi").otherwise("lo")
        .as("bucket"))

  private def fitModel(): (PipelineModel,
      org.apache.spark.sql.DataFrame) = {
    val Array(train, test) =
      orders.randomSplit(Array(0.7, 0.3), seed = 42L)
    val pipe = ClassifierPipelines.pipeline(
      Seq("o_orderpriority"), Seq("o_totalprice"), "bucket",
      ClassifierPipelines.randomForest(numTrees = 4, maxDepth = 3))
    (pipe.fit(train), test)
  }

  private def preds(m: PipelineModel,
      test: org.apache.spark.sql.DataFrame) =
    m.transform(test)
      .select(col("o_orderkey"), col("prediction"),
        round(element_at(vector_to_array(col("probability")), 1), 6)
          .as("p0"))
      .collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)

  test("PipelineModel save/load: reloaded transform is identical") {
    val (model, test) = fitModel()
    val path = java.nio.file.Files
      .createTempDirectory("graft_persist").resolve("m").toString
    model.write.overwrite().save(path)
    val reloaded = PipelineModel.load(path)
    assert(preds(model, test).sameElements(preds(reloaded, test)))
  }

  test("save/load keeps stage params and tree structure") {
    val (model, test) = fitModel()
    val path = java.nio.file.Files
      .createTempDirectory("graft_persist").resolve("m").toString
    model.write.overwrite().save(path)
    val reloaded = PipelineModel.load(path)
    assert(reloaded.stages.length == model.stages.length)
    val (a, b) = (
      model.stages.last.asInstanceOf[RandomForestClassificationModel],
      reloaded.stages.last.asInstanceOf[RandomForestClassificationModel])
    assert(b.getNumTrees == a.getNumTrees)
    assert(b.getMaxDepth == a.getMaxDepth)
    assert(b.toDebugString == a.toDebugString,
      "every split threshold must survive the round trip")
    // overwrite().save onto the same path must also work (idempotent
    // re-publish, the q417 staged-dir contract)
    model.write.overwrite().save(path)
    assert(PipelineModel.load(path)
      .stages.last.asInstanceOf[RandomForestClassificationModel]
      .toDebugString == a.toDebugString)
    preds(model, test) // exercise the original post-save (still usable)
  }

  test("CrossValidatorModel save/load: best model and avgMetrics " +
    "survive, reloaded transform identical") {
    import org.apache.spark.ml.tuning.CrossValidatorModel
    val Array(train, test) =
      orders.randomSplit(Array(0.7, 0.3), seed = 42L)
    val pipe = ClassifierPipelines.pipeline(
      Seq("o_orderpriority"), Seq("o_totalprice"), "bucket",
      ClassifierPipelines.randomForest(numTrees = 2, maxDepth = 2))
    val rf = pipe.getStages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassifier]
    val grid = ClassifierPipelines.rfGrid(rf,
      numTrees = Seq(2), maxDepth = Seq(2, 3))
    val cv = ClassifierPipelines.crossValidate(
      pipe, grid, folds = 2, evaluatorMetric = "accuracy", train)
    val path = java.nio.file.Files
      .createTempDirectory("graft_persist").resolve("cv").toString
    cv.write.overwrite().save(path)
    val reloaded = CrossValidatorModel.load(path)
    assert(reloaded.avgMetrics.toSeq == cv.avgMetrics.toSeq,
      "fold-averaged grid metrics must survive")
    assert(preds(reloaded.bestModel.asInstanceOf[PipelineModel], test)
      .sameElements(preds(cv.bestModel.asInstanceOf[PipelineModel], test)))
  }

  test("a Pipeline containing the custom FrequencyEncoderModel " +
    "saves and reloads") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    val enc = new FrequencyEncoderModel()
      .setInputCol("o_orderpriority").setOutputCol("freq_pri")
    val asm = new VectorAssembler()
      .setInputCols(Array("freq_pri", "o_totalprice"))
      .setOutputCol("features")
    val fitted = new Pipeline().setStages(Array(enc, asm)).fit(orders)
    val path = java.nio.file.Files
      .createTempDirectory("graft_persist").resolve("fe").toString
    fitted.write.overwrite().save(path)
    val reloaded = PipelineModel.load(path)
    val re = reloaded.stages.head.asInstanceOf[FrequencyEncoderModel]
    assert(re.getOrDefault(re.inputCol) == "o_orderpriority" &&
      re.getOrDefault(re.outputCol) == "freq_pri")
    val a = fitted.transform(orders)
      .select("o_orderkey", "freq_pri").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = reloaded.transform(orders)
      .select("o_orderkey", "freq_pri").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
