package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classification pipelines re-expressing the reference's model programs
  * (SURVEY.md §2.12):
  *  - binary: LogisticRegression (`timely_LR.py`), LinearSVC
  *    (`timely_SVM.py`), GBT (promised by `README.md:33`, script absent);
  *  - 8-class: RandomForest (`random_forest_final_class_8.py`),
  *    DecisionTree (`decision_tree_final_class_8.py`).
  *
  * Differences from the reference, by design (SURVEY §8):
  *  - no RDD detours: the confusion matrix is a DataFrame pivot
  *    (`groupBy(label).pivot(prediction).count`), not
  *    `MulticlassMetrics(rdd)` — same numbers, stays in Tungsten;
  *  - feature importances stay a DataFrame (no pandas hand-off);
  *  - labels are 0-based StringIndexer indices, documented (the
  *    reference misattributes classes 1-8, §8.4).
  *
  * All builders are column-name-parameterized: the engine is a library,
  * not a script tied to the CFPB schema.
  */
object ClassifierPipelines {

  /** Shared feature front-end (M1-M3): StringIndexer per categorical
    * (handleInvalid=keep so unseen test categories survive), then
    * VectorAssembler over indexed + passthrough numeric columns.
    */
  def featureStages(catCols: Seq[String], numCols: Seq[String],
                    labelCol: String): (Seq[PipelineStage], String) = {
    val indexers = catCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep")
    }
    val labelIndexer = new StringIndexer().setInputCol(labelCol)
      .setOutputCol("label").setHandleInvalid("skip")
    val assembler = new VectorAssembler()
      .setInputCols((catCols.map(c => s"${c}_idx") ++ numCols).toArray)
      .setOutputCol("features")
    (indexers :+ labelIndexer :+ assembler, "features")
  }

  // ---- binary estimators (M5, M6, M9) ----

  def logistic(maxIter: Int = 100): LogisticRegression =
    new LogisticRegression().setMaxIter(maxIter)
      .setFeaturesCol("features").setLabelCol("label")

  def linearSvc(maxIter: Int = 10, regParam: Double = 0.1): LinearSVC =
    new LinearSVC().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")

  def gbt(maxIter: Int = 20, seed: Long = 42L): GBTClassifier =
    new GBTClassifier().setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label")

  // ---- multiclass estimators (M7, M8) ----

  def randomForest(numTrees: Int = 20, maxDepth: Int = 5,
                   seed: Long = 42L): RandomForestClassifier =
    new RandomForestClassifier().setNumTrees(numTrees).setMaxDepth(maxDepth)
      .setSeed(seed).setFeaturesCol("features").setLabelCol("label")

  def decisionTree(maxDepth: Int = 5, seed: Long = 42L): DecisionTreeClassifier =
    new DecisionTreeClassifier().setMaxDepth(maxDepth).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label")

  /** M10 — full pipeline: feature front-end + estimator. */
  def pipeline(catCols: Seq[String], numCols: Seq[String], labelCol: String,
               estimator: PipelineStage): Pipeline = {
    val (stages, _) = featureStages(catCols, numCols, labelCol)
    new Pipeline().setStages((stages :+ estimator).toArray)
  }

  // ---- tuning (M11-M13) ----

  /** M11 — k-fold CV with a param grid (reference: 5-fold LR
    * `timely_LR.py:123`, 3-fold RF `random_forest_final_class_8.py:231`).
    */
  def crossValidate(pipe: Pipeline, grid: Array[ParamMap], folds: Int,
                    evaluatorMetric: String, train: DataFrame,
                    seed: Long = 42L): CrossValidatorModel = {
    val eval = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setMetricName(evaluatorMetric)
    new CrossValidator().setEstimator(pipe).setEstimatorParamMaps(grid)
      .setEvaluator(eval).setNumFolds(folds).setSeed(seed)
      .setParallelism(4)
      .fit(train)
  }

  /** M12 — TrainValidationSplit selection, trainRatio=0.8
    * (`random_forest_final_class_8.py:375-378`).
    */
  def trainValSelect(pipe: Pipeline, grid: Array[ParamMap],
                     train: DataFrame, trainRatio: Double = 0.8,
                     seed: Long = 42L): TrainValidationSplitModel = {
    val eval = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setMetricName("accuracy")
    new TrainValidationSplit().setEstimator(pipe).setEstimatorParamMaps(grid)
      .setEvaluator(eval).setTrainRatio(trainRatio).setSeed(seed)
      .setParallelism(4)
      .fit(train)
  }

  /** M13 — the reference's RF grid shape
    * (`random_forest_final_class_8.py:221-225`), scaled down by default
    * for test runtimes.
    */
  def rfGrid(rf: RandomForestClassifier,
             numTrees: Seq[Int] = Seq(10, 20),
             maxDepth: Seq[Int] = Seq(3, 5)): Array[ParamMap] =
    new ParamGridBuilder()
      .addGrid(rf.numTrees, numTrees)
      .addGrid(rf.maxDepth, maxDepth)
      .build()

  /** M13 — random hyperparameter search. The reference imports a
    * non-existent `RandomParamGridBuilder` (`timely_LR.py:114`, SURVEY
    * §8.2); Spark 3.2-3.5 shipped `ParamRandomBuilder` for this intent
    * but Spark 4 removed it, so the engine draws the maps directly:
    * `n` seeded-uniform (regParam, elasticNetParam) samples, pluggable
    * into CrossValidator/TrainValidationSplit like any grid.
    */
  def lrRandomGrid(lr: LogisticRegression, n: Int = 4,
                   seed: Long = 42L): Array[ParamMap] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n) {
      new ParamMap()
        .put(lr.regParam, 0.01 + rnd.nextDouble() * (0.5 - 0.01))
        .put(lr.elasticNetParam, rnd.nextDouble())
    }
  }

  // ---- evaluation (M14-M17) ----

  /** M14 — areaUnderROC (`timely_LR.py:106`). */
  def auc(predictions: DataFrame): Double =
    new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction").setMetricName("areaUnderROC")
      .evaluate(predictions)

  /** M15 — accuracy / weightedPrecision / weightedRecall
    * (`company_response_RF.py:130-145`).
    */
  def multiclassMetrics(predictions: DataFrame): Map[String, Double] = {
    val eval = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    Seq("accuracy", "weightedPrecision", "weightedRecall").map { m =>
      m -> eval.setMetricName(m).evaluate(predictions)
    }.toMap
  }

  /** Manual TP/FP/TN/FN cells (`timely_LR.py:157-160`) in ONE pass —
    * the reference runs 4 filter+count jobs; this is a single
    * conditional aggregation.
    */
  def binaryCells(predictions: DataFrame): Map[String, Long] = {
    val r = predictions.agg(
      count(when(col("prediction") === 1.0 && col("label") === 1.0, 1)).as("tp"),
      count(when(col("prediction") === 1.0 && col("label") === 0.0, 1)).as("fp"),
      count(when(col("prediction") === 0.0 && col("label") === 0.0, 1)).as("tn"),
      count(when(col("prediction") === 0.0 && col("label") === 1.0, 1)).as("fn"))
      .head()
    Seq("tp", "fp", "tn", "fn").map(k => k -> r.getAs[Long](k)).toMap
  }

  /** M16 — confusion matrix as a DataFrame pivot (label rows, prediction
    * columns), replacing the reference's RDD `MulticlassMetrics` detour
    * (`random_forest_final_class_8.py:308-315`). Same counts, no plan
    * break, scales as one shuffle of (label, prediction) pairs.
    */
  def confusionMatrix(predictions: DataFrame): DataFrame =
    predictions.groupBy(col("label"))
      .pivot("prediction")
      .count().na.fill(0L)
      .orderBy(col("label"))

  /** Per-class precision/recall from the (label, prediction) pair counts
    * (`random_forest_final_class_8.py:321-329`, numpy → DataFrame).
    */
  def perClassMetrics(predictions: DataFrame): DataFrame = {
    val pairs = predictions.groupBy(col("label"), col("prediction")).count()
    val tp = pairs.filter(col("label") === col("prediction"))
      .select(col("label").as("cls"), col("count").as("tp"))
    val actual = pairs.groupBy(col("label")).agg(sum("count").as("n_actual"))
      .withColumnRenamed("label", "cls")
    val predicted = pairs.groupBy(col("prediction")).agg(sum("count").as("n_predicted"))
      .withColumnRenamed("prediction", "cls")
    actual.join(predicted, Seq("cls"), "outer").join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "n_actual", "n_predicted"))
      .select(col("cls"),
        (col("tp") / col("n_actual")).as("recall"),
        (col("tp") / col("n_predicted")).as("precision"))
      .orderBy("cls")
  }

  /** M17 — Gini feature importances from a fitted tree-ensemble stage,
    * as a (feature, importance) DataFrame sorted descending — replaces
    * the reference's pandas hand-off
    * (`random_forest_final_class_8.py:264-288`).
    */
  def featureImportances(model: PipelineModel,
                         featureNames: Seq[String]): DataFrame = {
    val imp: Vector = model.stages.last match {
      case m: RandomForestClassificationModel => m.featureImportances
      case m: DecisionTreeClassificationModel => m.featureImportances
      case m: GBTClassificationModel => m.featureImportances
      case other => sys.error(s"no importances on ${other.getClass}")
    }
    val rows = featureNames.zip(imp.toArray).sortBy(-_._2)
    val s = org.apache.spark.sql.SparkSession.active
    import s.implicits._
    rows.toDF("feature", "importance")
  }
}
