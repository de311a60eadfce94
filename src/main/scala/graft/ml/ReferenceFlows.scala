package graft.ml

import graft.ops.{BalanceOps, CleanOps, FrequencyEncoder}
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.DataFrame

/** End-to-end compositions mirroring the reference's three entry points
  * (SURVEY.md §3), parameterized by schema so they run on any table.
  *
  * Entry A (`timely_LR.py`/`timely_SVM.py`): clean → oversample minority
  * → 70/30 split → pipeline fit → AUC + cells.
  * Entry B (`random_forest_final_class_8.py`): frequency-encode →
  * balance to N/class → split → CV-tuned tree model → confusion matrix.
  * Entry C (`complaints_narrative_LDA.py`): see TopicPipeline.
  */
object ReferenceFlows {

  case class BinaryResult(auc: Double, cells: Map[String, Long],
                          predictions: DataFrame)

  /** Entry A: binary classification with minority oversampling.
    * `estimatorKind`: "lr" | "svc" | "gbt" (GBT is M9 — promised by the
    * reference README, script absent).
    */
  def binaryFlow(df: DataFrame, catCols: Seq[String], numCols: Seq[String],
                 labelCol: String, minorityValue: String,
                 estimatorKind: String = "lr", seed: Long = 42L): BinaryResult = {
    val cleaned = CleanOps.filterNotBlank(df, labelCol)
    val balanced = BalanceOps.oversampleBinary(cleaned, labelCol, minorityValue, seed)
    val (train, test) = BalanceOps.trainTestSplit(balanced, 0.7, seed)
    val est = estimatorKind match {
      case "lr"  => ClassifierPipelines.logistic()
      case "svc" => ClassifierPipelines.linearSvc()
      case "gbt" => ClassifierPipelines.gbt(seed = seed)
    }
    val pipe = ClassifierPipelines.pipeline(catCols, numCols, labelCol, est)
    val model = pipe.fit(train)
    val preds = model.transform(test)
    BinaryResult(ClassifierPipelines.auc(preds),
      ClassifierPipelines.binaryCells(preds), preds)
  }

  case class MulticlassResult(metrics: Map[String, Double],
                              confusion: DataFrame, perClass: DataFrame,
                              importances: DataFrame,
                              predictions: DataFrame)

  /** Entry B: multiclass classification with frequency encoding and
    * per-class rebalancing. `treeKind`: "rf" | "dt";
    * `tune`: "cv" (3-fold, as `random_forest_final_class_8.py:231`) |
    * "tvs" (trainRatio 0.8, `:375-378`) | "none".
    */
  def multiclassFlow(df: DataFrame, freqCols: Seq[String], catCols: Seq[String],
                     numCols: Seq[String], labelCol: String,
                     targetPerClass: Long, treeKind: String = "rf",
                     tune: String = "none", seed: Long = 42L,
                     rfNumTrees: Int = 20): MulticlassResult = {
    // C1 — persist the frequency-encoded frame across its consumers
    // (the balancer's count pass + sampled scan), same placement as the
    // reference (`random_forest_final_class_8.py:104-106`) but
    // MEMORY_AND_DISK: MEMORY_ONLY silently recomputes evicted
    // partitions, which at scale re-runs the encode joins per CV fold
    val encoded = FrequencyEncoder.encodeAll(df,
      freqCols.map(c => c -> s"frequency_$c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NB reference order: encode BEFORE balancing, so resampled
    // duplicates share frequencies (SURVEY §3.2)
    val balanced = BalanceOps.resampleToTarget(encoded, labelCol, targetPerClass, seed)
    val (train0, test) = BalanceOps.trainTestSplit(balanced, 0.7, seed)
    // the training frame is re-read folds × grid-points times by
    // CrossValidator — pin it too
    val train = train0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allNum = numCols ++ freqCols.map(c => s"frequency_$c")

    val featureNames = catCols.map(c => s"${c}_idx") ++ allNum
    val (model, preds) = treeKind match {
      case "rf" =>
        val rf = ClassifierPipelines.randomForest(numTrees = rfNumTrees,
          seed = seed)
        val pipe = ClassifierPipelines.pipeline(catCols, allNum, labelCol, rf)
        tune match {
          case "cv" =>
            val m = ClassifierPipelines.crossValidate(pipe,
              ClassifierPipelines.rfGrid(rf), folds = 3, "accuracy", train, seed)
            val best = m.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
            (best, best.transform(test))
          case "tvs" =>
            val m = ClassifierPipelines.trainValSelect(pipe,
              ClassifierPipelines.rfGrid(rf), train, 0.8, seed)
            val best = m.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
            (best, best.transform(test))
          case _ =>
            val m = pipe.fit(train); (m, m.transform(test))
        }
      case "dt" =>
        val dt = ClassifierPipelines.decisionTree(seed = seed)
        val pipe = ClassifierPipelines.pipeline(catCols, allNum, labelCol, dt)
        lazy val grid = new ParamGridBuilder()
          .addGrid(dt.maxDepth, Seq(3, 5)).build()
        tune match {
          // the reference publishes BOTH tuned DT matrices
          // (desicion_tree_confusion_matrix.py:16-31 CV, :52-67 TV)
          case "cv" =>
            val m = ClassifierPipelines.crossValidate(pipe, grid,
              folds = 3, "accuracy", train, seed)
            val best = m.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
            (best, best.transform(test))
          case "tvs" =>
            val m = ClassifierPipelines.trainValSelect(pipe, grid, train, 0.8, seed)
            val best = m.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
            (best, best.transform(test))
          case _ =>
            val m = pipe.fit(train); (m, m.transform(test))
        }
    }
    // Materialize the predictions WHILE the upstream caches are live:
    // every metric below (and any caller action on confusion/perClass)
    // re-derives the test set otherwise, re-running the seeded
    // resample/split lineage per action with no cache behind it. The
    // persisted preds frame is returned in the result — the caller owns
    // its lifecycle (unpersist when done).
    val pinned = preds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.count()
    encoded.unpersist(false)
    train.unpersist(false)
    MulticlassResult(
      ClassifierPipelines.multiclassMetrics(pinned),
      ClassifierPipelines.confusionMatrix(pinned),
      ClassifierPipelines.perClassMetrics(pinned),
      ClassifierPipelines.featureImportances(model, featureNames),
      pinned)
  }
}
